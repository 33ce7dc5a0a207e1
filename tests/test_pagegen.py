"""Generator invariants: extraction of every synthesized page matches
the analytic (SQL-expressible) prediction — the bridge that makes the
Spark pipeline oracle-checkable (FIXTURES.md §5)."""

from __future__ import annotations

import duckdb
import pytest

from readabilitysax_spark.core.api import extract
from readabilitysax_spark.functions.pagegen import expected_article, synth_page

from .conftest import SF_TINY


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"select doc_id, text, source from '{SF_TINY}/documents.parquet'"
    ).fetchall()


def test_determinism(docs):
    doc_id, text, source = docs[0]
    assert synth_page(doc_id, text, source) == synth_page(doc_id, text, source)


def test_all_variants_match_prediction(docs):
    for doc_id, text, source in docs:
        url, html = synth_page(doc_id, text, source)
        art = extract(html, url=url)
        exp = expected_article(doc_id, text, source)
        assert art["title"] == exp["title"], doc_id
        assert art["text"] == exp["text"], doc_id
        assert art["textLength"] == exp["text_length"], doc_id
        assert art["score"] == exp["score"], doc_id
        assert art["nextPage"] == exp["next_page"], doc_id
        assert art["skipLevel"] == 0, doc_id
        assert art["error"] is False, doc_id


def test_variants_exercise_distinct_paths(docs):
    htmls = {doc_id % 5: synth_page(doc_id, text, source)[1]
             for doc_id, text, source in docs[:10]}
    assert 'width="600"' in htmls[1]
    assert "youtube.com" in htmls[2]
    assert "&uuml;" in htmls[3]
    assert "vimeo.com" in htmls[4]
