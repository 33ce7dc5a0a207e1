"""Physical-plan regression tests: the plan properties PLANS.md claims.

A correct-but-degraded plan (lost pruning, surprise shuffle, full sort
for a top-k) is a performance bug at 100 TB even when results match —
these tests pin the plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from readabilitysax_spark.operators.extract import extract_articles

from .conftest import SF_TINY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    from readabilitysax_spark.sources.pages import read_pages

    p = str(tmp_path_factory.mktemp("plans") / "pages")
    read_pages(spark, SF_TINY).write.parquet(p)
    return spark.read.parquet(p)


def test_extraction_scan_prunes_columns(spark, pages_parquet):
    plan = _plan(extract_articles(pages_parquet, passthrough=("lang",)))
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "url" in read_schema and "html" in read_schema and "lang" in read_schema
    assert "warc_ts" not in read_schema


def test_extraction_is_map_only(spark, pages_parquet):
    assert "Exchange" not in _plan(extract_articles(pages_parquet))


def test_lang_rollup_single_exchange_partial_agg(spark, pages_parquet):
    agg = extract_articles(pages_parquet, passthrough=("lang",)).groupBy(
        "lang").agg(F.count("*"))
    plan = _plan(agg)
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan


def test_dedup_single_shuffle(spark):
    for name in ("dedup_exact", "dedup_minhash_lsh"):
        plan = _plan(entry.queries()[name](spark, SF_TINY))
        assert plan.count("Exchange") == 1, name


def test_topk_uses_take_ordered(spark):
    plan = _plan(entry.queries()["similarity_topk"](spark, SF_TINY))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
