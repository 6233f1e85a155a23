"""Query-side catalog over a crawl state directory.

The reference's consumers query its Postgres tables (database.go DDL:
contents, link rels/keywords, sites/domains/content_types, perceptual
hashes, EXIF, faces, errors). This module gives the Spark engine the
same switch-over surface: register every sink as a SQL view over the
state directory and ship the canned searches a search-engine user
actually runs — keyword search ranked by link rating, perceptual-hash
near-image lookup (F15), and face-descriptor match (F16,
faceRecognition.go capability).

Views are plain reads over the round-partitioned sink globs; at
warehouse scale the same calls point at the Iceberg tables instead
(the paths come from CrawlState, which is format-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..media.faces import face_distance
from .state import CrawlState

SINK_SCHEMAS = {
    "contents": schemas.CONTENTS,
    "content_blobs": schemas.CONTENT_BLOBS,
    "link_rels": schemas.LINK_RELS,
    "link_keywords": schemas.LINK_KEYWORDS,
    "errors": schemas.ERRORS,
    "metrics": schemas.METRICS,
    "perceptual_hashes": schemas.PERCEPTUAL_HASHES,
    "exif_info": schemas.EXIF_INFO,
    "faces": schemas.FACES,
    "sites": schemas.SITES,
    "domains": schemas.DOMAINS,
    "content_types": schemas.CONTENT_TYPES,
    "robots": schemas.ROBOTS,
}


def register_sinks(
    spark: SparkSession, state_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per sink present under the
    state dir; returns the view names. ``prefix`` namespaces the views
    when multiple crawls are mounted in one session."""
    state = CrawlState(state_dir)
    registered = []
    for name, schema in SINK_SCHEMAS.items():
        if not state.sink_exists(name):
            continue
        df = spark.read.schema(schema).parquet(state.sink_glob(name))
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        registered.append(view)
    return registered


def keyword_search(
    spark: SparkSession, term: str, limit: int = 20, prefix: str = ""
) -> DataFrame:
    """Pages ranked by the summed rating of inbound links whose anchor
    keywords contain ``term`` (the reference's core search: flagged
    keyword text drives link ratings)."""
    # dedup to one row per LINK before joining ratings: a link whose
    # anchor has N keywords containing the term must contribute its
    # rating once, and n_matching_links counts links, not keyword rows
    kw = (
        spark.table(f"{prefix}link_keywords")
        .filter(F.col("text").contains(term))
        .select("link_id")
        .distinct()
    )
    rels = spark.table(f"{prefix}link_rels")
    return (
        kw.join(rels, "link_id")
        .groupBy(F.col("dest_url").alias("url"))
        .agg(
            F.sum("rating").alias("score"),
            F.count(F.lit(1)).alias("n_matching_links"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(limit)
    )


def top_pages(
    spark: SparkSession, k: int = 20, n_iter: int = 10, prefix: str = ""
) -> DataFrame:
    """PageRank over the crawled link graph (link_rels sink) → the k
    highest-authority pages with their rank. The canonical search-
    engine ranking signal the reference stores the graph for but
    never computes; operator in operators/graph.py (iterative
    DataFrame loop, oracle-checked as q:pagerank)."""
    from ..operators.graph import pagerank

    rels = spark.table(f"{prefix}link_rels")
    edges = rels.select(
        F.col("origin_id").alias("src"), F.col("dest_id").alias("dst")
    ).distinct()
    ranks = pagerank(edges, n_iter=n_iter, persist_each=True)
    names = (
        rels.select(F.col("origin_id").alias("vertex"), F.col("origin_url").alias("url"))
        .unionByName(
            rels.select(F.col("dest_id").alias("vertex"), F.col("dest_url").alias("url"))
        )
        .distinct()
    )
    return (
        ranks.join(names, "vertex")
        .select("url", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("url"))
        .limit(k)
    )


def similar_images(
    spark: SparkSession, phash: int, max_hamming: int = 8, prefix: str = ""
) -> DataFrame:
    """F15: crawled images within Hamming distance of a query pHash."""
    ph = spark.table(f"{prefix}perceptual_hashes")
    return (
        ph.withColumn(
            "hamming",
            F.bit_count(F.col("phash").bitwiseXOR(F.lit(phash).cast("bigint"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy(F.asc("hamming"), F.asc("content_id"))
    )


def match_faces(
    spark: SparkSession,
    descriptor: list[float],
    k: int = 5,
    max_distance: float | None = 0.6,
    prefix: str = "",
) -> DataFrame:
    """F16: nearest stored face descriptors to a query descriptor —
    the reference's face-search capability over its Face table."""
    faces = spark.table(f"{prefix}faces")
    qd = F.array(*[F.lit(float(x)).cast("float") for x in descriptor])
    scored = faces.withColumn("dist", face_distance(F.col("descriptor"), qd))
    if max_distance is not None:
        scored = scored.filter(F.col("dist") <= max_distance)
    return scored.select("content_id", "rectangle", "dist").orderBy(
        F.asc("dist"), F.asc("content_id")
    ).limit(k)
