"""SparkSession factory with the engine's standard configuration.

Scale posture (SURVEY.md §4.3): AQE on with skew-join handling,
Arrow-based pandas UDF transfer on, modest Arrow batch sizes because
the ``html`` column carries fat binaries (reference caps pages at
20 MB — /root/reference/main.go:20), and runtime bloom-filter join
pushdown enabled so in-round semi/anti joins get a bloom pre-filter
for free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Reference design envelope: 20 MB per-page cap (main.go:20).
MAX_FILESIZE = 20_000_000

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # html bodies are fat; keep Arrow batches small enough that a
    # batch of near-cap pages stays well under executor memory.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    # Same concern on the scan side: the vectorized parquet reader's
    # default 4096-row column batch over a binary html column means
    # 4096 × page_size per task — OOM at realistic page weights.
    "spark.sql.parquet.columnarReaderBatchSize": "512",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # The round flush runs many sink-write JOBS concurrently; a
    # broadcast future inside one of them can wait far longer than the
    # 300 s default on a busy low-core scheduler (observed: local[2]
    # at sf1 with 64 shuffle partitions aborted a sink write at
    # exactly 300 s). Long-batch engines want a generous timeout —
    # the broadcast itself is not the slow part, the queueing is.
    "spark.sql.broadcastTimeout": "3600",
    # bucketed state tables are EXTERNAL (option("path")); the
    # warehouse dir only hosts catalog scratch — keep it out of cwd
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/njh_spark_warehouse"
    ),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Throughput GC: G1's region machinery collapses under many task
    # threads churning fat (tens-of-KB) byte[] rows — measured 20x
    # slowdown on a 32-thread shuffle of 60KB html bodies vs
    # ParallelGC. Batch engines want throughput GC; same flag goes in
    # spark.executor.extraJavaOptions on a real cluster.
    #
    # (MaxNewSize is appended per-session in get_spark — it scales
    # with the session's core count, see there.)
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC",
}


def get_spark(
    app_name: str = "notjusthtml-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to the parallelism level so that
    small-scale tests don't pay 200-partition scheduling overhead;
    on a real cluster this is sized to ~2-3x total cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    # Bound the ParallelGC nursery, scaled to the session's core count
    # (~0.5 GB per concurrent task, floor 2g, cap 8g). ParallelGC
    # defaults the young gen to ~1/3 of the heap, and on a large heap
    # (the bench runs 48g) every batch's allocations cold-sweep a
    # ~16 GB eden — page zeroing and TLB misses, not GC pauses: the
    # SAME frozen-bench crawl leg measured 205-260s at 48g vs 138s at
    # 8g, and 142s at 48g with a 2g nursery (r6). Too small starves
    # concurrent tasks instead (local[8] crawl: 112s at 2g vs 73s at
    # 4g), so the bound follows parallelism — which also matches
    # production executors (4-8 cores -> 2-4g nursery).
    try:
        cores = int(master.split("[")[1].rstrip("]*")) if "[" in master else 0
    except ValueError:
        cores = 0
    cores = cores or (os.cpu_count() or 8)
    try:
        heap_g = int(
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g").lower().rstrip("g")
        )
    except ValueError:
        heap_g = 8
    nursery_g = min(max(cores // 2, 2), 8, max(heap_g // 4, 1))
    confs = dict(DEFAULT_CONFS)
    for key in ("spark.driver.extraJavaOptions", "spark.executor.extraJavaOptions"):
        confs[key] = f"{confs[key]} -XX:MaxNewSize={nursery_g}g"

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in confs.items():
        builder = builder.config(k, v)
    # Debug/ops hook: extra session confs from the environment as a
    # JSON object (e.g. event logging for profiling a run whose
    # launcher cannot be edited). Applied before caller extra_confs so
    # explicit caller settings still win.
    env_confs = os.environ.get("SPARK_GRAFT_EXTRA_CONFS")
    if env_confs:
        import json

        for k, v in json.loads(env_confs).items():
            builder = builder.config(k, str(v))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.default.parallelism", str(shuffle_partitions))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
