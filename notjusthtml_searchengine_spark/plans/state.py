"""Snapshot/checkpoint layer (SURVEY.md §2.9, §4.2).

The reference recovers by rescanning Postgres into a fresh Bloom
filter (main.go:100-111) and loses in-flight channel state. This
engine checkpoints the full round state atomically: each round R
writes its outputs under ``<root>/rounds/r{R:05d}/`` and finally an
atomic ``manifest.json`` (tmp + rename). A round directory without a
manifest is garbage from a killed run and is ignored on resume —
resume = highest manifested round; no re-fetch, no seen-set
divergence (strictly stronger than the reference).

This is the plain-parquet stand-in for Iceberg snapshots (no Iceberg
jars in the sandbox); the interface is format-agnostic so an Iceberg
implementation can slot in behind it.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

# DDL for the bucketed state tables (used to re-register the external
# tables in a fresh session after a restart — the bucket spec lives in
# the catalog entry; the data files carry bucket ids in their names).
SEEN_DDL = "url_norm STRING, url_hash BIGINT, round_seen INT"
FRONTIER_DDL = (
    "url_norm STRING, host STRING, priority INT, depth INT, "
    "round_added INT, url_hash BIGINT"
)
# tombstones for the incremental frontier: urls drained (fetched) in a
# round are dead in every part whose copy was added BEFORE that round
DRAINED_DDL = "url_hash BIGINT, drained_round INT"
SITES_KEYS_DDL = "site_id BIGINT"


class CrawlState:
    FRONTIER = "frontier"
    SEEN = "seen"
    BLOOM = "bloom"
    SINKS = (
        "contents",
        "content_blobs",
        "link_rels",
        "link_keywords",
        "errors",
        "metrics",
        "round_stats",
        "perceptual_hashes",
        "exif_info",
        "faces",
        "sites",
        "domains",
        "content_types",
        "robots",
    )

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "rounds"), exist_ok=True)

    # -- layout ------------------------------------------------------
    def round_dir(self, r: int) -> str:
        return os.path.join(self.root, "rounds", f"r{r:05d}")

    def table_path(self, r: int, name: str) -> str:
        return os.path.join(self.round_dir(r), name)

    def manifest_path(self, r: int) -> str:
        return os.path.join(self.round_dir(r), "manifest.json")

    # -- commit / recovery -------------------------------------------
    def commit_round(self, r: int, stats: dict) -> None:
        """Atomic commit: manifest written via tmp+rename, last."""
        payload = {"round": r, "stats": stats, "tables": sorted(os.listdir(self.round_dir(r)))}
        fd, tmp = tempfile.mkstemp(dir=self.round_dir(r), suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, self.manifest_path(r))

    def manifest(self, r: int) -> dict | None:
        p = self.manifest_path(r)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def latest_committed_round(self) -> int | None:
        rounds_dir = os.path.join(self.root, "rounds")
        best = None
        for name in os.listdir(rounds_dir):
            if name.startswith("r") and name[1:].isdigit():
                r = int(name[1:])
                if self.manifest(r) is not None and (best is None or r > best):
                    best = r
        return best

    # state tables are superseded by newer rounds; sinks are the
    # engine's OUTPUT and are never touched by retention. ("frontier"
    # is the legacy pre-delta full-rewrite table name, kept so GC can
    # clean up old state dirs.)
    STATE_TABLES = (
        "frontier",
        "frontier_full",
        "frontier_delta",
        "drained",
        "seen_full",
        "seen_delta",
        "sites_keys",
        "bloom",
    )

    def gc_state(self, latest: int, keep_rounds: int = 1, spark=None) -> list[str]:
        """Expire superseded state tables (Iceberg snapshot-expiry
        analog). Keeps everything referenced by the manifest of
        ``latest`` plus the state of the last ``keep_rounds`` rounds;
        deletes older frontier/seen/bloom copies (each round rewrites
        the frontier and bloom, so a long crawl otherwise accumulates
        O(rounds × frontier) dead state). Sinks are never removed.
        Resume always starts from the latest manifest, which stays
        fully readable; time-travel to GC'd rounds is given up —
        that's the retention trade, same as any snapshot expiry.
        """
        m = self.manifest(latest)
        if m is None:
            return []
        referenced = set(m["stats"].get("seen_parts", []))
        referenced.update(m["stats"].get("frontier_parts", []))
        referenced.update(m["stats"].get("drained_parts", []))
        referenced.update(m["stats"].get("sites_parts", []))
        if m["stats"].get("frontier"):  # legacy single-table layout
            referenced.add(m["stats"]["frontier"])
        if m["stats"].get("bloom"):
            referenced.add(m["stats"]["bloom"])
        removed = []
        rounds_dir = os.path.join(self.root, "rounds")
        for name in sorted(os.listdir(rounds_dir)):
            if not (name.startswith("r") and name[1:].isdigit()):
                continue
            r = int(name[1:])
            if r > latest - keep_rounds:
                continue
            for tbl in self.STATE_TABLES:
                rel = f"r{r:05d}/{tbl}"
                path = os.path.join(rounds_dir, rel)
                if rel not in referenced and os.path.isdir(path):
                    shutil.rmtree(path)
                    removed.append(rel)
                    if spark is not None:
                        spark.sql(
                            f"DROP TABLE IF EXISTS {self.bucketed_table_name(rel)}"
                        )
        return removed

    def drop_uncommitted(self) -> list[int]:
        """Remove round dirs that have no manifest (killed mid-round)."""
        dropped = []
        rounds_dir = os.path.join(self.root, "rounds")
        for name in sorted(os.listdir(rounds_dir)):
            if name.startswith("r") and name[1:].isdigit():
                r = int(name[1:])
                if self.manifest(r) is None:
                    shutil.rmtree(self.round_dir(r))
                    dropped.append(r)
        return dropped

    def write_round_stats(
        self,
        r: int,
        pages_fetched: int,
        links_found: int,
        new_frontier: int,
        errors: int,
        wall_ms: int,
    ) -> None:
        """Write the one-row round_stats sink directly with pyarrow —
        byte-compatible with the former Spark-written parquet (same
        column names/types as schemas.ROUND_STATS) without paying a
        Spark job launch for a single driver-known row per round."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        out = self.table_path(r, "round_stats")
        os.makedirs(out, exist_ok=True)
        tbl = pa.table(
            {
                "round": pa.array([r], pa.int32()),
                "pages_fetched": pa.array([pages_fetched], pa.int64()),
                "links_found": pa.array([links_found], pa.int64()),
                "new_frontier": pa.array([new_frontier], pa.int64()),
                "errors": pa.array([errors], pa.int64()),
                "wall_ms": pa.array([wall_ms], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(out, "part-00000.parquet"))

    def sink_rows(self, r: int, name: str) -> int:
        """Row count of a just-written round table from the parquet
        FOOTERS — pure metadata, no scan, no Spark job. The sinks are
        exactly the frames the round counters need (contents = fetched
        pages, link_rels = links, errors, frontier_delta = new
        frontier rows), so reading their footers replaces a per-round
        union-aggregate job that re-scanned every cached frame
        (measured ~6s CPU/round at AQE-off, guide §1.2 'don't compute
        things you throw away')."""
        import pyarrow.parquet as pq

        path = self.table_path(r, name)
        total = 0
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        return total

    def sink_column_sum(self, r: int, name: str, col: str) -> int:
        """Sum of one numeric column of a just-written round table via
        a single-column pyarrow read (driver-side, bounded: one skinny
        column of one round's sink)."""
        import pyarrow.parquet as pq

        path = self.table_path(r, name)
        total = 0
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(path, f), columns=[col])
                s = 0
                for chunk in t.column(0).chunks:
                    import pyarrow.compute as pc

                    v = pc.sum(chunk).as_py()
                    s += v or 0
                total += s
        return total

    def sink_glob(self, name: str) -> str:
        """Read-path glob for a sink across all rounds."""
        return os.path.join(self.root, "rounds", "r*", name)

    def sink_exists(self, name: str) -> bool:
        """True iff any committed-or-not round dir has written ``name``
        (guards glob reads: a matching-nothing glob raises on read —
        e.g. resuming with a sink newly enabled mid-crawl)."""
        rounds_dir = os.path.join(self.root, "rounds")
        return any(
            os.path.isdir(os.path.join(rounds_dir, d, name))
            for d in os.listdir(rounds_dir)
        )

    # -- bucketed state tables (SURVEY §4.2) ---------------------------
    # seen/frontier are written as parquet tables bucketed by
    # pmod-hash(url_hash) so the load-bearing anti-joins (J2/E1) never
    # exchange the state side: the scan reports HashPartitioning and
    # only the (much smaller) per-round candidate side shuffles — once,
    # reused across the whole per-part join chain. This is the
    # plain-parquet stand-in for an Iceberg bucket-transform table; the
    # interface stays format-agnostic.

    def bucketed_table_name(self, rel: str) -> str:
        h = hashlib.md5(f"{self.root}:{rel}".encode()).hexdigest()[:12]
        return f"njh_bkt_{h}"

    def write_bucketed(
        self, df, r: int, name: str, n_buckets: int, bucket_col: str = "url_hash"
    ) -> str:
        """Write + register a bucketed state table for round ``r``.

        The repartition aligns tasks with buckets (HashPartitioning and
        the bucket-id expression use the same hash), so each bucket is
        exactly one file — keeps file counts flat across rounds.
        """
        from pyspark.sql import functions as F

        rel = f"r{r:05d}/{name}"
        tbl = self.bucketed_table_name(rel)
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.repartition(n_buckets, F.col(bucket_col))
            .write.format("parquet")
            .option("path", self.table_path(r, name))
            .mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .saveAsTable(tbl)
        )
        return rel

    def read_bucketed(
        self, spark, rel: str, ddl: str, n_buckets: int, bucket_col: str = "url_hash"
    ):
        """Resolve a bucketed state table, re-registering the external
        table from DDL if this session has not seen it (restart)."""
        tbl = self.bucketed_table_name(rel)
        path = os.path.join(self.root, "rounds", rel)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {tbl} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({bucket_col}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
        return spark.table(tbl)
