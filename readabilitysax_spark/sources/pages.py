"""Pages source: real pages tables and the deterministic documents bridge.

``pages`` schema (BASELINE.json input_hint / SURVEY.md §1.3):
    url string, warc_ts timestamp, html binary, text string, lang string

At production scale this is `spark.read.format("iceberg").load(...)`;
in this sandbox it is parquet plus a deterministic synthesis step from
the driver's ``documents`` tables (FIXTURES.md §5). Synthesis runs as a
vectorized Arrow batch transform — no per-row Python UDF — so the same
code path exercises the JVM↔Python transport the extractor uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pagegen import synth_page, synth_warc_ts

PAGES_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _synth_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sources = batch.column("source").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls: list[str] = []
        htmls: list[bytes] = []
        ts: list[int] = []
        for doc_id, text, source in zip(doc_ids, texts, sources):
            url, html = synth_page(doc_id, text, source)
            urls.append(url)
            htmls.append(html.encode("utf-8"))
            ts.append(synth_warc_ts(doc_id) * 1_000_000)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(ts, pa.timestamp("us")),
                pa.array(htmls, pa.binary()),
                pa.array(texts, pa.string()),
                pa.array(langs, pa.string()),
            ],
            schema=PAGES_ARROW_SCHEMA,
        )


def synthesize_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) → pages (deterministic)."""
    return documents.select("doc_id", "text", "source", "lang").mapInArrow(
        _synth_batches, PAGES_DDL
    )


# split-count probe cache: (applicationId, key, parallelism) → n.
# ``df.rdd.getNumPartitions()`` converts the whole logical plan to an
# RDD on the driver (no job, but tens of ms of py4j + planning) and the
# answer is a pure function of the file layout — every query paid it
# once per source read. Metadata only; never caches data or results.
_SPLIT_COUNT_CACHE: dict[tuple, int] = {}


def spread_small_scan(
    spark: SparkSession, df: DataFrame, cache_key: str | None = None
) -> DataFrame:
    """Round-robin a scan whose split count is below the core count.

    Parquet splits align to row groups, so a small corpus written as one
    row group arrives as ONE partition no matter what
    ``maxPartitionBytes``/``openCostInBytes`` say — and every downstream
    CPU-bound map stage (md5 shingling, page synthesis, extraction) then
    runs single-core. The repartition is a tiny shuffle at the scales
    where it fires and a structural NO-OP at production scale: a 100 TB
    table scans as thousands of splits, so the branch never triggers and
    no full-corpus shuffle is ever added.

    ``cache_key``: pass a stable source identifier (e.g. the parquet
    path) to memoize the split-count probe per session — sound because
    the count depends only on the file layout and session parallelism.
    """
    parallelism = spark.sparkContext.defaultParallelism
    key = (
        (spark.sparkContext.applicationId, cache_key, parallelism)
        if cache_key else None
    )
    n = _SPLIT_COUNT_CACHE.get(key) if key else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key:
            _SPLIT_COUNT_CACHE[key] = n
    if n < parallelism:
        return df.repartition(parallelism)
    return df


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/documents.parquet"
    return spread_small_scan(
        spark, spark.read.parquet(path), cache_key=path
    )


def read_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's canonical input: synthesized pages for this sandbox,
    `spark.read.parquet(path)` / iceberg for a real pages table."""
    return synthesize_pages(read_documents(spark, sf_dir))


def read_pages_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pages table WITHOUT the html payload: (url, warc_ts, text,
    lang) — for queries that never read html (domain rollups, URL
    blocklists). On a real pages table this is plain column pruning at
    the parquet/iceberg scan (ReadSchema drops the heavy html column —
    guide §6); in this sandbox the synthesis mapInArrow is opaque to
    Catalyst, so pruning must happen HERE: the metadata columns are
    the same deterministic functions of the documents row that
    ``functions.pagegen.synth_page``/``synth_warc_ts`` compute (url =
    page_url(source, doc_id), warc_ts = 2020-01-01 + doc_id seconds),
    expressed as JVM expressions so no Python pass or html build runs
    at all. Value-equality with ``read_pages`` on the shared columns is
    pinned by tests/test_plans.py::test_read_pages_meta_matches_pages.
    """
    docs = read_documents(spark, sf_dir)
    return docs.select(
        F.concat(
            F.lit("http://"), F.col("source"),
            F.lit(".example/articles/doc-"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_577_836_800) + F.col("doc_id")).alias(
            "warc_ts"
        ),
        F.col("text"),
        F.col("lang"),
    )


def replicate_documents(documents: DataFrame, copies: int) -> DataFrame:
    """Deterministically scale up a documents table for bench runs:
    doc_id' = doc_id * copies + k keeps ids unique and synthesis pure."""
    if copies <= 1:
        return documents
    k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k")
    return (
        documents.select("doc_id", "text", "source", "lang", k)
        .withColumn("doc_id", F.col("doc_id") * copies + F.col("k"))
        .drop("k")
    )
