"""Iceberg-backed crawl state (feature-flagged skeleton).

``CrawlState`` (state.py) is the plain-parquet implementation of the
snapshot layer: bucketed external tables + per-round manifest.json +
manual GC. This module is the Iceberg implementation of the SAME
interface, so a cluster with the Iceberg runtime can swap it in via
``CrawlConfig.extra["state_backend"] = "iceberg"`` and get:

  * bucket-transform partitioned ``seen`` / ``frontier`` tables
    (``PARTITIONED BY (bucket(N, url_hash))``) — storage-partitioned
    joins replace the external bucketed-table trick;
  * per-round ATOMIC multi-table commits as Iceberg snapshots (the
    round id is a snapshot tag) instead of manifest.json + rename;
  * ``expire_snapshots`` replacing ``gc_state``;
  * MERGE INTO for the dim upserts and the frontier delta/tombstone
    fold (one MERGE instead of delta parts + view-side filter).

The sandbox ships no Iceberg jars, so the LIVE path is exercised only
when ``iceberg_available(spark)`` (tests skip otherwise); the SQL the
backend would execute is built by pure functions below and pinned by
unit tests — the swap-in point is real, not a comment.

No reference counterpart (the reference's "state" is Postgres +
an in-memory Bloom, main.go:100-111); this is north_rule lakehouse
posture.
"""

from __future__ import annotations

CATALOG = "njh"
NAMESPACE = "crawl"

#: spark-submit confs that enable the backend (hadoop catalog form):
REQUIRED_CONFS = {
    f"spark.sql.catalog.{CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
    f"spark.sql.catalog.{CATALOG}.type": "hadoop",
    f"spark.sql.catalog.{CATALOG}.warehouse": "<state_dir>",
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
}


def iceberg_available(spark) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# SQL builders (pure; unit-tested without a cluster)
# ---------------------------------------------------------------------------
def qualified(name: str) -> str:
    return f"{CATALOG}.{NAMESPACE}.{name}"


def create_state_table_sql(
    name: str, ddl: str, bucket_col: str, n_buckets: int
) -> str:
    """Bucket-transform partitioned state table (seen / frontier /
    drained) — the Iceberg analog of CrawlState.write_bucketed's
    CLUSTERED BY external table."""
    return (
        f"CREATE TABLE IF NOT EXISTS {qualified(name)} ({ddl}) "
        f"USING iceberg "
        f"PARTITIONED BY (bucket({n_buckets}, {bucket_col}))"
    )


def merge_dim_sql(name: str, key: str, cols: list[str]) -> str:
    """Insert-if-absent dim upsert (sites/domains/content_types):
    replaces the glob-read + left-anti-join + append of the parquet
    backend with one MERGE."""
    col_list = ", ".join(cols)
    val_list = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {qualified(name)} t USING {{source}} s "
        f"ON t.{key} = s.{key} "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({val_list})"
    )


def merge_frontier_sql() -> str:
    """One MERGE folds a round's drain + additions into the frontier:
    matched drained rows are deleted, new urls inserted — the Iceberg
    analog of frontier_delta + drained tombstones + compaction."""
    return (
        f"MERGE INTO {qualified('frontier')} t USING {{batch_and_new}} s "
        f"ON t.url_hash = s.url_hash "
        f"WHEN MATCHED AND s.op = 'drain' THEN DELETE "
        f"WHEN NOT MATCHED AND s.op = 'add' THEN INSERT *"
    )


#: every table gc_state must expire — the parquet backend's gc_state
#: expires ALL superseded state; expiring only 'frontier' would let
#: seen/drained/dim snapshots accumulate unboundedly (ADVICE r3)
STATE_TABLES = ("frontier", "seen", "drained")
DIM_TABLES = ("sites", "domains", "content_types")


def expire_snapshots_sql(
    table: str, older_than_ts: str, retain_last: int = 2
) -> str:
    """gc_state analog (Iceberg snapshot expiry procedure), per table."""
    return (
        f"CALL {CATALOG}.system.expire_snapshots("
        f"table => '{NAMESPACE}.{table}', "
        f"older_than => TIMESTAMP '{older_than_ts}', "
        f"retain_last => {retain_last})"
    )


def tag_round_sql(table: str, r: int) -> str:
    """Round commit marker: tag the current snapshot so resume can
    time-travel to 'round r' (`VERSION AS OF` the tag)."""
    return (
        f"ALTER TABLE {qualified(table)} "
        f"CREATE OR REPLACE TAG round_{r:05d}"
    )


class IcebergCrawlState:
    """CrawlState drop-in backed by an Iceberg catalog.

    Only the surface CrawlEngine actually calls is implemented; every
    Spark-touching method first checks ``iceberg_available`` and
    raises ``IcebergUnavailable`` otherwise, so misconfiguration fails
    loudly at bootstrap rather than mid-crawl.
    """

    def __init__(self, spark, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        if not iceberg_available(spark):
            raise IcebergUnavailable(
                "Iceberg runtime not on the classpath; submit with "
                "iceberg-spark-runtime and the confs in "
                "iceberg_state.REQUIRED_CONFS"
            )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.{NAMESPACE}")

    # -- state tables -------------------------------------------------
    def create_state_tables(self, n_buckets: int) -> None:
        from .state import DRAINED_DDL, FRONTIER_DDL, SEEN_DDL

        for name, ddl in (
            ("seen", SEEN_DDL),
            ("frontier", FRONTIER_DDL),
            ("drained", DRAINED_DDL),
        ):
            self.spark.sql(
                create_state_table_sql(name, ddl, "url_hash", n_buckets)
            )

    def read_state(self, name: str):
        return self.spark.table(qualified(name))

    def append_state(self, df, name: str) -> None:
        df.writeTo(qualified(name)).append()

    def merge_frontier(self, batch_and_new_view: str) -> None:
        self.spark.sql(
            merge_frontier_sql().format(batch_and_new=batch_and_new_view)
        )

    def commit_round(self, r: int) -> None:
        for t in ("seen", "frontier"):
            self.spark.sql(tag_round_sql(t, r))

    def gc_state(self, older_than_ts: str, retain_last: int = 2) -> None:
        """Expire superseded snapshots of EVERY state and dim table
        (the parquet backend's gc_state removes all superseded state,
        not just the frontier)."""
        for t in STATE_TABLES + DIM_TABLES:
            self.spark.sql(expire_snapshots_sql(t, older_than_ts, retain_last))


class IcebergUnavailable(RuntimeError):
    pass
