"""Iceberg backend skeleton: the SQL the backend would run is pinned
here (no cluster needed); the live path is exercised only where the
Iceberg runtime is actually on the classpath (skipped in this
sandbox — no jars ship)."""

import pytest

from notjusthtml_searchengine_spark.plans import iceberg_state as ice
from notjusthtml_searchengine_spark.plans.state import (
    DRAINED_DDL,
    FRONTIER_DDL,
    SEEN_DDL,
)


def test_state_table_sql_uses_bucket_transform():
    sql = ice.create_state_table_sql("seen", SEEN_DDL, "url_hash", 32)
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(32, url_hash))" in sql
    assert sql.startswith("CREATE TABLE IF NOT EXISTS njh.crawl.seen")
    assert SEEN_DDL in sql
    # frontier/drained share the same identity column
    for ddl, name in ((FRONTIER_DDL, "frontier"), (DRAINED_DDL, "drained")):
        s = ice.create_state_table_sql(name, ddl, "url_hash", 8)
        assert "bucket(8, url_hash)" in s


def test_dim_merge_is_insert_if_absent():
    sql = ice.merge_dim_sql("sites", "site_id", ["site_id", "url"])
    assert "MERGE INTO njh.crawl.sites" in sql
    assert "WHEN NOT MATCHED THEN INSERT (site_id, url)" in sql
    assert "WHEN MATCHED" not in sql  # pure insert-if-absent, no update


def test_frontier_merge_folds_drain_and_add():
    sql = ice.merge_frontier_sql()
    assert "WHEN MATCHED AND s.op = 'drain' THEN DELETE" in sql
    assert "WHEN NOT MATCHED AND s.op = 'add' THEN INSERT *" in sql
    assert "ON t.url_hash = s.url_hash" in sql


def test_gc_and_round_tag_sql():
    sql = ice.expire_snapshots_sql("seen", "2026-01-01 00:00:00", retain_last=3)
    assert "expire_snapshots" in sql and "retain_last => 3" in sql
    assert "table => 'crawl.seen'" in sql
    tag = ice.tag_round_sql("frontier", 7)
    assert tag.endswith("CREATE OR REPLACE TAG round_00007")


def test_gc_expires_every_state_and_dim_table():
    """ADVICE r3: expiring only 'frontier' lets seen/drained/dim
    snapshots accumulate unboundedly — gc_state must call the expiry
    procedure once per table."""
    ran = []

    class FakeSpark:
        def sql(self, q):
            ran.append(q)

    st = object.__new__(ice.IcebergCrawlState)
    st.spark = FakeSpark()
    st.gc_state("2026-01-01 00:00:00", retain_last=2)
    tables = {q.split("table => '")[1].split("'")[0] for q in ran}
    assert tables == {
        f"{ice.NAMESPACE}.{t}" for t in ice.STATE_TABLES + ice.DIM_TABLES
    }
    assert len(ran) == len(ice.STATE_TABLES) + len(ice.DIM_TABLES)


def test_engine_dispatches_state_backend(spark, tmp_path):
    """CrawlConfig.extra['state_backend']='iceberg' must reach the
    backend at CONSTRUCTION: with the runtime jars absent the engine
    raises IcebergUnavailable before any round runs (not mid-crawl);
    an unknown backend name is rejected loudly too."""
    from notjusthtml_searchengine_spark.plans.rounds import CrawlConfig, CrawlEngine

    if ice.iceberg_available(spark):
        pytest.skip("Iceberg runtime present — live path applies")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [],
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us", tz="UTC")),
                    ("html", pa.binary()),
                ]
            ),
        ),
        pages,
    )
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("http://a.example/\n")
    flagged = tmp_path / "flagged.csv"
    flagged.write_text("word,5\n")

    def build(backend):
        return CrawlEngine(
            spark,
            pages_path=pages,
            seeds_path=str(seeds),
            flagged_path=str(flagged),
            robots_path=None,
            cfg=CrawlConfig(
                state_dir=str(tmp_path / "state"),
                extra={"state_backend": backend},
            ),
        )

    with pytest.raises(ice.IcebergUnavailable):
        build("iceberg")
    with pytest.raises(ValueError, match="state_backend"):
        build("duck")


def test_unavailable_raises_loudly(spark):
    if ice.iceberg_available(spark):
        pytest.skip("Iceberg runtime present — live path applies")
    with pytest.raises(ice.IcebergUnavailable):
        ice.IcebergCrawlState(spark, warehouse="/tmp/x")


def test_live_roundtrip_when_runtime_present(spark, tmp_path):
    """Runs only with iceberg-spark-runtime on the classpath."""
    if not ice.iceberg_available(spark):
        pytest.skip("no Iceberg jars in this sandbox")
    st = ice.IcebergCrawlState(spark, warehouse=str(tmp_path))
    st.create_state_tables(n_buckets=8)
    assert spark.table(ice.qualified("seen")).count() == 0
