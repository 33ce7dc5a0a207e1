"""The extraction operator: pages → articles, as ONE vectorized Arrow UDF.

The whole readabilitySAX dataflow (SURVEY.md §2.2-2.3, rows S1-S24 /
O1-O5) runs inside ``mapInArrow`` over (url, html) batches — Spark
never sees the element tree, only the input scan and the output
articles. No per-row Python UDFs anywhere (north_rule).

Scale design:
* **Skew defusal** — page size is heavy-tailed (a 100 MB page among
  4 KB pages stalls a task). ``salted_repartition`` spreads rows by
  ``(xxhash64(url), floor(log2(len(html))))`` so each task gets a mix
  of sizes; at 1000 executors the same call defuses host-level skew
  from crawl ordering.
* **Memory** — input Arrow batches are capped by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py);
  output batches are additionally flushed by byte budget so a run of
  huge articles cannot blow the Python worker.
* **Lineage** — every article row carries ``partition_id`` and the
  partition-cumulative ``wall_ms`` at emit time; the metrics table is
  a cheap groupBy over these (operators/metrics.py) instead of a
  second pass.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.api import extract

ARTICLES_DDL = (
    "url string, title string, text string, text_length bigint, "
    "score double, next_page string, skip_level int, error boolean, "
    "html_bytes bigint, partition_id int, wall_ms bigint"
)

ARTICLES_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("title", pa.string()),
        pa.field("text", pa.string()),
        pa.field("text_length", pa.int64()),
        pa.field("score", pa.float64()),
        pa.field("next_page", pa.string()),
        pa.field("skip_level", pa.int32()),
        pa.field("error", pa.bool_()),
        pa.field("html_bytes", pa.int64()),
        pa.field("partition_id", pa.int32()),
        pa.field("wall_ms", pa.int64()),
    ]
)

# flush output batches beyond this many article-text bytes
_OUT_BYTE_BUDGET = 32 << 20
_OUT_ROW_BUDGET = 1024


def _make_extract_fn(
    settings: dict | None,
    output_type: str,
    out_schema: pa.Schema,
    passthrough: tuple[str, ...],
    resolve_url_col: str | None = None,
):
    text_key = "html" if output_type == "html" else "text"

    def extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        t0 = time.perf_counter()

        cols: dict[str, list] = {name: [] for name in out_schema.names}
        pending_bytes = 0

        def flush() -> pa.RecordBatch:
            nonlocal cols, pending_bytes
            batch = pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], f.type) for f in out_schema],
                schema=out_schema,
            )
            cols = {name: [] for name in out_schema.names}
            pending_bytes = 0
            return batch

        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            # redirect semantics (get-url.ts:79-85): when the table
            # carries a post-redirect final URL, IT drives base-URL /
            # next-page resolution while the request url stays the key
            resolves = (
                batch.column(resolve_url_col).to_pylist()
                if resolve_url_col else urls
            )
            extras = {name: batch.column(name).to_pylist() for name in passthrough}
            for row_idx, (url, html) in enumerate(zip(urls, htmls)):
                html = html or b""
                art = extract(
                    html, url=resolves[row_idx] or url,
                    type_=output_type, settings=settings,
                )
                text = art.get(text_key, "") or ""
                cols["url"].append(url)
                cols["title"].append(art.get("title", ""))
                cols["text"].append(text)
                cols["text_length"].append(int(art.get("textLength", 0)))
                cols["score"].append(float(art.get("score", 0)))
                cols["next_page"].append(art.get("nextPage", ""))
                cols["skip_level"].append(int(art.get("skipLevel", -1)))
                cols["error"].append(bool(art.get("error", False)))
                cols["html_bytes"].append(len(html))
                cols["partition_id"].append(pid)
                cols["wall_ms"].append(
                    int((time.perf_counter() - t0) * 1000)
                )
                for name in passthrough:
                    cols[name].append(extras[name][row_idx])
                pending_bytes += len(text) + len(html) // 16
                if (
                    pending_bytes >= _OUT_BYTE_BUDGET
                    or len(cols["url"]) >= _OUT_ROW_BUDGET
                ):
                    yield flush()
        if cols["url"]:
            yield flush()

    return extract_batches


def salted_repartition(pages: DataFrame, num_partitions: int) -> DataFrame:
    """Spread by url hash × size bucket to defuse page-size/host skew."""
    return pages.repartition(
        num_partitions,
        F.xxhash64("url"),
        F.floor(F.log2(F.length(F.col("html")) + F.lit(2.0))),
    )


def extract_articles(
    pages: DataFrame,
    output_type: str = "text",
    settings: dict | None = None,
    num_partitions: int | None = None,
    passthrough: tuple[str, ...] = (),
    resolve_url_col: str | None = None,
) -> DataFrame:
    """pages(url, html, ...) → articles DataFrame.

    Column pruning: only (url, html) plus requested ``passthrough``
    columns are selected, so Catalyst pushes the projection into the
    scan (check `.explain`: ReadSchema contains just those columns).

    ``passthrough`` rides narrow columns (lang, warc_ts, ...) through
    the UDF so downstream rollups need NO join back to the pages
    table — at 10^12 rows a url-keyed join is a full shuffle of both
    sides, which this avoids entirely.

    ``resolve_url_col``: name of a post-redirect final-URL column; when
    set, that URL drives base-URL/next-page resolution (the reference
    updates pageURL on redirects, lib/get-url.ts:79-85) while the
    request ``url`` remains the output key.
    """
    from pyspark.sql.pandas.types import to_arrow_type

    clash = set(passthrough) & set(ARTICLES_ARROW_SCHEMA.names)
    if clash:
        raise ValueError(
            f"passthrough columns collide with article columns: {sorted(clash)}"
        )
    extra_src = (
        [resolve_url_col]
        if resolve_url_col and resolve_url_col not in passthrough else []
    )
    src = pages.select("url", "html", *extra_src, *passthrough)
    if num_partitions:
        src = salted_repartition(src, num_partitions)

    out_schema = ARTICLES_ARROW_SCHEMA
    ddl = ARTICLES_DDL
    if passthrough:
        extra_fields = [
            pa.field(f.name, to_arrow_type(f.dataType))
            for f in pages.schema.fields
            if f.name in passthrough
        ]
        out_schema = pa.schema(list(ARTICLES_ARROW_SCHEMA) + extra_fields)
        extra_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pages.schema.fields
            if f.name in passthrough
        )
        ddl = f"{ARTICLES_DDL}, {extra_ddl}"
    return src.mapInArrow(
        _make_extract_fn(
            settings, output_type, out_schema, passthrough, resolve_url_col
        ),
        ddl,
    )
