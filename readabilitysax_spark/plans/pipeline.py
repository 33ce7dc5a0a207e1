"""End-to-end extraction pipeline with idempotent resume (SURVEY.md §3.4).

    read pages → anti-join vs committed checkpoints → salted
    repartition → mapInArrow extraction → write articles (bucketed
    dynamic-overwrite) + metrics + checkpoint commit

Resume design (parquet stand-in for Iceberg snapshot semantics):
the input is split into ``n_buckets`` deterministic url-hash buckets;
each bucket group is processed and committed independently —
``articles`` is written with ``partitionBy(bucket)`` in dynamic
partition-overwrite mode, so a re-run of a crashed group atomically
replaces any partial files, and a checkpoint row marks the group done.
On restart, committed groups are anti-joined away (idempotent, no
duplicates). On Iceberg this maps 1:1 to ``overwritePartitions`` +
a snapshot-tagged checkpoint table.

At 10^12 docs the bucket count rises (e.g. 4096) so a single group is
a few TB; everything else is unchanged.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_articles
from ..operators.metrics import partition_metrics

CHECKPOINT_DDL = "run_id string, bucket int, status string, committed_at timestamp"


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")


def load_committed_buckets(spark: SparkSession, checkpoint_dir: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(checkpoint_dir)
            .where(F.col("status") == "done")
            .select("bucket")
            .distinct()
            .collect()
        )
    except Exception:
        return set()
    return {r["bucket"] for r in rows}


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    run_id: str | None = None,
    n_buckets: int = 8,
    output_type: str = "text",
    num_partitions: int | None = None,
) -> dict:
    """Returns {"buckets_done": int, "buckets_skipped": int, ...}."""
    run_id = run_id or f"run-{int(time.time())}"
    articles_dir = os.path.join(output_dir, "articles")
    metrics_dir = os.path.join(output_dir, "metrics")
    checkpoint_dir = os.path.join(output_dir, "checkpoints")

    bucketed = pages.withColumn("bucket", _bucket_col(n_buckets))
    committed = load_committed_buckets(spark, checkpoint_dir)

    done = skipped = 0
    for bucket in range(n_buckets):
        if bucket in committed:
            skipped += 1
            continue
        subset = bucketed.where(F.col("bucket") == bucket)
        articles = extract_articles(
            subset, output_type=output_type, num_partitions=num_partitions
        ).withColumn("bucket", F.lit(bucket))

        (
            articles.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(articles_dir)
        )
        # metrics from the written data (one scan of the narrow columns);
        # dynamic partition overwrite (same as articles) so a crash between
        # this write and the checkpoint commit can't duplicate metrics rows
        # on resume — the re-run replaces the bucket's metrics partition
        written = spark.read.parquet(articles_dir).where(F.col("bucket") == bucket)
        (
            partition_metrics(written, run_id)
            .withColumn("bucket", F.lit(bucket))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(metrics_dir)
        )

        spark.createDataFrame(
            [(run_id, bucket, "done")], "run_id string, bucket int, status string"
        ).withColumn("committed_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(checkpoint_dir)
        done += 1

    return {
        "run_id": run_id,
        "buckets_done": done,
        "buckets_skipped": skipped,
        "articles_dir": articles_dir,
        "metrics_dir": metrics_dir,
        "checkpoint_dir": checkpoint_dir,
    }
