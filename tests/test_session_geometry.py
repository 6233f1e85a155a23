"""GC-nursery bound: cores-only at small/unknown volume (the driver
bench shape), volume-scaled at 10x data (the sf1 shape), always capped
at heap/4. Pins the r6 geometry so a refactor can't silently regress
either end."""

import os
from unittest import mock

from notjusthtml_searchengine_spark.session import (
    _expected_input_bytes,
    _mem_to_g,
    _nursery_g,
)


def test_mem_to_g_parses_spark_mem_strings():
    assert _mem_to_g("48g") == 48
    assert _mem_to_g("8G") == 8
    assert _mem_to_g("4096m") == 4
    assert _mem_to_g("512m") == 1  # floor 1
    assert _mem_to_g(str(2 << 30)) == 2
    assert _mem_to_g("weird") == 8


def test_cores_only_bound_unchanged_without_volume_signal():
    # the exact r6 cores-only values (frozen-bench local[2]/[8]/[32])
    assert _nursery_g(2, 48, 0) == 2
    assert _nursery_g(8, 48, 0) == 4
    assert _nursery_g(32, 48, 0) == 8
    # small heap: heap/4 cap (floor 1)
    assert _nursery_g(8, 8, 0) == 2
    assert _nursery_g(4, 2, 0) == 1


def test_volume_scales_nursery_up_to_heap_quarter():
    gb = 1 << 30
    # sub-GB volume: no change (the sf0.1 bench corpus is ~0.7 GB)
    assert _nursery_g(8, 48, 700 * (1 << 20)) == 4
    # sf1-shaped volume (960k pages * 8 KiB est): 4 + 7 = 11 < 12 cap
    assert _nursery_g(8, 48, 960_000 * 8192) == 11
    # huge volume: capped at heap/4
    assert _nursery_g(8, 48, 100 * gb) == 12
    assert _nursery_g(8, 16, 100 * gb) == 4


def test_expected_input_bytes_priority():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SPARK_GRAFT_INPUT_BYTES", None)
        os.environ.pop("SPARK_GRAFT_BENCH_PAGES", None)
        assert _expected_input_bytes(None) == 0
        assert _expected_input_bytes(123) == 123
        os.environ["SPARK_GRAFT_BENCH_PAGES"] = "960000"
        assert _expected_input_bytes(None) == 960_000 * 8192
        os.environ["SPARK_GRAFT_INPUT_BYTES"] = "555"
        assert _expected_input_bytes(None) == 555  # env bytes beat pages
        assert _expected_input_bytes(777) == 777  # caller beats env
        os.environ.pop("SPARK_GRAFT_INPUT_BYTES")
        os.environ.pop("SPARK_GRAFT_BENCH_PAGES")
