"""SparkSession builder tuned for the extraction workload.

Scale rationale (100 TB / 1000-executor target, tested on local[N]):

* AQE on: runtime coalescing + skew-join splitting for the relational
  shell (dedup/metrics aggregations).
* Arrow batches capped at 256 rows: html payloads are MB-sized on real
  Common-Crawl data; 10k-row default batches would buffer gigabytes in
  the Python worker. Extraction output is re-chunked by byte budget in
  the operator itself as a second guard.
* maxPartitionBytes 128m keeps scan partitions executor-memory-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "readabilitysax-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # AQE coalescing floor (round 6): byte-based coalescing
    # under-parallelizes CPU-DENSE post-shuffle stages — rows carrying
    # array/set payloads (shingle-set verify joins, cosine pair
    # stages) do 100-1000 CPU ops per byte, so a few-MB stage coalesced
    # to the 1 MB-default floor runs on a handful of cores while the
    # rest idle (measured: ngram_jaccard 2.9 s -> 1.5 s at sf0.1 from
    # this floor alone; the effect exists at ANY cluster size — a 5 MB
    # compute-bound stage on 1000 cores would coalesce to 5 tasks).
    # Coalescing itself stays ON (essential against small-partition
    # floods at 100 TB); only the minimum size is lowered, and it is
    # env-tunable: raise it (e.g. back to 1m-8m) for IO-bound ETL
    # where task-launch overhead dominates per-partition work.
    min_coalesced = os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k")
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                min_coalesced)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _warm_batches(batches):
    # runs in the Python worker: importing this module pulls in pyspark
    # + the core extraction stack, and one tiny extract() warms the
    # tokenizer/entity regex caches — the per-worker one-time costs
    # every later Arrow task would otherwise pay inside its own wall
    from readabilitysax_spark.core.api import extract

    extract(b"<div class='content'><p>warm, pool</p></div>",
            url="http://warm.example/")
    yield from batches


def warm_python_workers(spark: SparkSession) -> None:
    """Fork and warm the Python worker pool: one trivial mapInArrow
    task per core, so the pool's fork + module-import cost is paid at
    session init instead of inside the first Arrow-stage query.

    This is the same steady-state policy the bench's extraction and
    streaming sections already apply with their own pre-timed warm-up
    passes (bench.py documents the rationale: on a long cluster run
    worker cold-start amortizes to zero, so per-query walls should
    measure the query). Reused workers (spark.python.worker.reuse,
    default on) keep the warmed pool for the whole session.
    """
    n = spark.sparkContext.defaultParallelism
    (
        spark.range(n).repartition(n)
        .mapInArrow(_warm_batches, "id long")
        .write.format("noop").mode("overwrite").save()
    )
