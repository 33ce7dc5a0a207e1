"""Per-partition lineage + counter metrics (FIXTURES.md §2 `metrics`).

Derived from the lineage columns the extraction operator stamps on
every article row — a single narrow groupBy, no second extraction
pass. At cluster scale this is a map-side-combinable aggregation on an
int key: negligible next to the extraction stage it measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(articles: DataFrame, run_id: str) -> DataFrame:
    return (
        articles.groupBy("partition_id")
        .agg(
            F.count("*").alias("input_rows"),
            F.sum(F.when(~F.col("error"), 1).otherwise(0)).alias("ok_rows"),
            F.sum(F.when(F.col("error"), 1).otherwise(0)).alias("error_rows"),
            F.sum("html_bytes").alias("html_bytes"),
            F.max("wall_ms").alias("wall_ms"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn(
            "docs_per_sec",
            F.when(
                F.col("wall_ms") > 0,
                F.col("input_rows") / (F.col("wall_ms") / 1000.0),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "run_id", "partition_id", "input_rows", "ok_rows", "error_rows",
            "html_bytes", "wall_ms", "docs_per_sec",
        )
    )
