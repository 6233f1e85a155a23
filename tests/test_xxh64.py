"""Pure-Python XXH64 vs Spark's xxhash64 — the engine-wide surrogate
id / tie-break hash must be bit-identical in both worlds (the
reference simulator and checkpoint layer rely on it)."""

import random

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.functions.xxh64 import xxh64, xxhash64_str


def test_spark_parity_random_strings(spark):
    rng = random.Random(99)
    strs = [""]
    for _ in range(60):
        n = rng.randrange(0, 120)
        strs.append("".join(chr(rng.randrange(32, 0x2FF)) for _ in range(n)))
    strs += ["http://host1.example/p/1", "a" * 31, "b" * 32, "c" * 33, "日本語テスト"]
    df = spark.createDataFrame([(s,) for s in strs], "u string").select(
        "u", F.xxhash64("u").alias("h")
    )
    got = {r["u"]: r["h"] for r in df.collect()}
    for s in strs:
        assert got[s] == xxhash64_str(s), repr(s)


def test_all_length_classes():
    # exercise the <4, <8, <32 and >=32 byte code paths deterministically
    vals = {len(b): xxh64(b) for b in (b"", b"abc", b"abcdefg", b"x" * 31, b"y" * 100)}
    assert len(set(vals.values())) == len(vals)


def test_seed_changes_hash():
    assert xxh64(b"abc", seed=42) != xxh64(b"abc", seed=43)
