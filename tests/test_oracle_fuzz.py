"""Adversarial cross-engine gate: every queries()/oracle_sql() pair is
compared Spark-vs-DuckDB over a HAND-HOSTILE table set, not just the
well-behaved synthetic corpus the driver uses.

The driver's generator produces lowercase ASCII prose with regular
shapes, so a query and its oracle can share a bug and still hash-match
(round-3 ADVICE found exactly that for the Gopher alpha rule). This
suite rebuilds the three tables with the edge shapes production data
actually contains — single-word docs (NULL minhash signatures), exact
and near duplicates, a shared boilerplate span, all-stopword and
digit-only docs, CJK/Cyrillic/Arabic/mixed-case text, a zero embedding
(division guard), identical and 2x-scaled embeddings (cosine ties at
every rounding width), same-timestamp and exactly-gap-boundary events —
and requires every pair to stay value-hash identical.

Domain notes (contract, not gaps): document text is non-empty,
single-space-separated, BMP-only, with no <, > or & — the extraction
oracles are the analytic inverse of the page GENERATOR, which defines
exactly that input domain (astral chars would diverge textLength's
UTF-16 units from DuckDB's code-point length; markup chars would parse
as markup). Those shapes are covered by the core fuzz/golden suites
instead (tests/test_fuzz.py, tests/test_reference_goldens.py).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

from .harness import compare_query

_BOILER = "subscribe to our newsletter"  # shared 3-word span + tail


def _texts() -> list[str]:
    dup = "the quick brown fox jumps over the lazy dog today"
    rows = [
        "a",                                   # 1 word, no shingle
        "b c",                                 # 2 words, no 3-shingle
        dup, dup, dup,                         # exact-dup triple
        dup.replace("today", "tomorrow"),      # near dup
        "the quick brown fox",                 # strict prefix of dup
        "the and of to in is it that for on",  # all stopwords
        "111 222 333 444 555 666 777",         # digit soup
        "漢字文書",                             # CJK, one word
        "漢字 文書 解析 器 の 試験",              # CJK words
        "NASA I Mars THE Rover",               # uppercase-only words
        "café au lait réchauffé",              # Latin-1 accents
        "مرحبا بالعالم مرة أخرى",               # Arabic (RTL)
        "привет мир снова и снова",            # Cyrillic
        "don't stop; can't won't... end. yes, no," ,  # punctuation-heavy
        " ".join(f"w{i % 97} t{i % 13}" for i in range(200)),  # long doc
    ]
    # 20 docs sharing one boilerplate span with unique tails (span dedup
    # must keep exactly the first occurrence corpus-wide)
    rows += [f"{_BOILER} issue {i} of the weekly cellar dispatch"
             for i in range(20)]
    # filler with overlapping vocab (mixture sampling / vocab top-k)
    rows += [f"spark shuffle join scan batch row group {i % 5} filter"
             for i in range(20)]
    return rows


def _documents() -> pa.Table:
    texts = _texts()
    langs, sources = [], []
    lang_cycle = ["en", "en", "de", "fr", "xx", "zz", "en", "de"]
    for i in range(len(texts)):
        langs.append(lang_cycle[i % len(lang_cycle)])
        sources.append(f"src{i % 20}")  # includes blocked src0/src7/src13
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _embeddings(n: int = 40, dim: int = 64) -> pa.Table:
    def vec(seed: int) -> list[float]:
        return [(((seed * 64 + i) * 2654435761) % 1999) / 999.5 - 1.0
                for i in range(dim)]

    vecs = [vec(v) for v in range(n)]
    vecs[3] = [0.0] * dim            # zero vector (guard), also a recall
    vecs[7] = list(vecs[5])          # identical pair -> exact cosine tie
    vecs[9] = [2.0 * x for x in vecs[5]]   # scaled copy -> same direction
    vecs[11] = list(vecs[5])
    vecs[11][0] += 1e-9              # tie at round-6 AND round-9
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(
            [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array([v % 7 for v in range(n)], pa.int32()),
    })


def _events() -> pa.Table:
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []  # (event_id, ts, user_id, event_type, value, props)
    # user 1: one session, including two events at the SAME timestamp
    for k, mins in enumerate([0, 5, 5, 20, 40]):
        rows.append((k, t0 + dt.timedelta(minutes=mins), 1, "click",
                     float(k), '{"k": 1}'))
    # user 2: events exactly at the 30-minute gap boundary
    for k, mins in enumerate([0, 30, 60, 120]):
        rows.append((10 + k, t0 + dt.timedelta(minutes=mins), 2, "view",
                     0.0, '{"k": 2}'))
    # user 3: a single event, extreme value, crossing an hour boundary
    rows.append((20, t0 + dt.timedelta(minutes=59, seconds=59), 3,
                 "error", 1e9, '{"k": 3}'))
    rows.append((21, t0 + dt.timedelta(hours=1), 3, "error", -5.5,
                 '{"k": 3}'))
    ids, ts, users, types, vals, props = zip(*rows)
    return pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("hostile_sf")
    pq.write_table(_documents(), str(d / "documents.parquet"))
    pq.write_table(_embeddings(), str(d / "embeddings.parquet"))
    pq.write_table(_events(), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_query_matches_oracle_on_hostile_tables(spark, name, hostile_dir):
    res = compare_query(spark, name, entry.queries()[name],
                        entry.oracle_sql()[name], hostile_dir)
    assert res["status"] == "OK", res
