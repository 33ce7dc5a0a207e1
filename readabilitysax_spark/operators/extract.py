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


def _passthrough_schema(
    df: DataFrame, passthrough: tuple[str, ...], base_schema: pa.Schema,
    base_ddl: str,
) -> tuple[pa.Schema, str]:
    """(arrow schema, ddl) for a base articles schema + passthrough
    columns taken from ``df``'s schema (shared by the pages-input and
    fused documents-input extraction operators)."""
    from pyspark.sql.pandas.types import to_arrow_type

    if not passthrough:
        return base_schema, base_ddl
    extra_fields = [
        pa.field(f.name, to_arrow_type(f.dataType))
        for f in df.schema.fields
        if f.name in passthrough
    ]
    extra_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in passthrough
    )
    return (
        pa.schema(list(base_schema) + extra_fields),
        f"{base_ddl}, {extra_ddl}",
    )


def extract_articles_from_documents(
    documents: DataFrame,
    output_type: str = "text",
    settings: dict | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """documents(doc_id, text, source, …) → articles, page synthesis
    FUSED into the extraction pass (round 6).

    ``synthesize_pages`` → ``extract_articles`` chains two mapInArrow
    stages: although they pipeline inside one task (no shuffle), every
    task runs TWO concurrent Python runners — double the worker pool
    (the first extraction query forked ~2×cores workers), double the
    per-task worker handshakes, and the html payload crosses
    JVM→Python→JVM→Python instead of being consumed where it is built
    (guide §4.1: control how many times columns cross the boundary).
    This operator synthesizes each page and extracts it in the SAME
    batch loop — the html string never leaves the Python worker.
    Values are identical to extract_articles(synthesize_pages(docs))
    by construction: the same ``synth_page`` output feeds the same
    extraction row loop (``_make_extract_fn``), only ``html_bytes``
    — an unexposed lineage column — counts UTF-16-ish str length
    instead of UTF-8 bytes, which no declared query selects.

    The pages-table operator ``extract_articles`` stays the production
    entry point (a real crawl reads pages from storage); this fused
    form is the sandbox-scan analog, and at 100 TB it is what a
    fused scan+extract over an in-worker decompressor would look like.
    """
    clash = set(passthrough) & set(ARTICLES_ARROW_SCHEMA.names)
    if clash:
        raise ValueError(
            f"passthrough columns collide with article columns: {sorted(clash)}"
        )
    out_schema, ddl = _passthrough_schema(
        documents, passthrough, ARTICLES_ARROW_SCHEMA, ARTICLES_DDL
    )
    inner = _make_extract_fn(settings, output_type, out_schema, passthrough, None)
    pages_schema = pa.schema(
        [pa.field("url", pa.string()), pa.field("html", pa.string())]
        + [
            f for f in out_schema
            if f.name in passthrough
        ]
    )

    def fused(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..functions.pagegen import synth_page

        def synthesized() -> Iterator[pa.RecordBatch]:
            for batch in batches:
                doc_ids = batch.column("doc_id").to_pylist()
                texts = batch.column("text").to_pylist()
                sources = batch.column("source").to_pylist()
                urls: list[str] = []
                htmls: list[str] = []
                for doc_id, text, source in zip(doc_ids, texts, sources):
                    url, html = synth_page(doc_id, text, source)
                    urls.append(url)
                    htmls.append(html)
                arrays = [pa.array(urls, pa.string()),
                          pa.array(htmls, pa.string())]
                for f in pages_schema:
                    if f.name in ("url", "html"):
                        continue
                    arrays.append(batch.column(f.name))
                yield pa.RecordBatch.from_arrays(arrays, schema=pages_schema)

        yield from inner(synthesized())

    src_cols = ["doc_id", "text", "source"] + [
        c for c in passthrough if c not in ("doc_id", "text", "source")
    ]
    return documents.select(*src_cols).mapInArrow(fused, ddl)


# ---- outlink extraction (the web-graph pass over the same pages scan) ----

OUTLINKS_DDL = "url string, link_pos int, href string, anchor_text string"

_OUTLINKS_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("link_pos", pa.int32()),
        pa.field("href", pa.string()),
        pa.field("anchor_text", pa.string()),
    ]
)


def collect_outlinks(
    html: str | bytes,
    url: str | None,
    resolve_paths: bool = True,
) -> list[tuple[int, str, str]]:
    """All <a href> links of a page as (pos, resolved_href, anchor_text).

    Resolution mirrors the reference's attribute semantics exactly
    (readability-sax.ts:369-421 S3 + :240-269 _convertLinks): absolute
    hrefs (``^\\w+:``) pass through verbatim, everything else resolves
    against the page URL — including the reference's quirks (href="/"
    → "<protocol>:/"), so link rows agree byte-for-byte with what the
    extractor's own pagination scanner sees. href-less and
    empty-href anchors are dropped (the reference skips empty
    attribute values). A new <a> while one is open implicitly closes
    the previous (browser behavior; HTML forbids nesting).

    Attribute SCOPING also mirrors the reference: onattribute applies
    to ``_currentElement`` (readability-sax.ts:369-373), and noContent
    tags never become ``_currentElement`` (:360-366), so an href on a
    span/b/font INSIDE the anchor is attributed to the anchor itself,
    while an href on a structural descendant (``<a><div href=u>``)
    belongs to the div, NOT the anchor (round-3 ADVICE). We track the
    open-descendant depth: OPEN of a non-noContent tag enters a
    descendant, its CLOSE leaves it (the reference pops one level per
    non-noContent close regardless of name, :427-432), and href is
    captured only at depth 0.
    """
    from ..core.readability import NO_CONTENT
    from ..core.tokenizer import ATTR, CLOSE, OPEN, TEXT, tokenize
    from ..core.urls import RE_PROTOCOL, convert_links, parse_page_url

    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    info = parse_page_url(url) if url else None
    out: list[tuple[str, str]] = []
    in_a = False
    depth = 0  # open non-noContent descendants of the current <a>
    cur_href: str | None = None
    cur_text: list[str] = []

    def close_anchor() -> None:
        nonlocal in_a, depth, cur_href, cur_text
        if cur_href:
            out.append((cur_href, "".join(cur_text)))
        in_a, depth, cur_href, cur_text = False, 0, None, []

    for e in tokenize(html):
        op = e[0]
        if op == OPEN and e[1] == "a":
            if in_a:
                close_anchor()
            in_a = True
        elif op == OPEN and in_a and e[1] not in NO_CONTENT:
            depth += 1
        elif op == ATTR and in_a and depth == 0 and e[1] == "href":
            # last-wins, like the reference: duplicate attributes each
            # fire (no onopentag registered → Parser dedup inactive)
            # and ``element.attributes[name] = value`` overwrites
            v = e[2]
            if v:
                cur_href = (
                    v if RE_PROTOCOL.match(v)
                    else convert_links(v, info, resolve_paths)
                )
        elif op == TEXT and in_a:
            cur_text.append(e[1])
        elif op == CLOSE and in_a and e[1] not in NO_CONTENT:
            if depth > 0:
                depth -= 1
            elif e[1] == "a":
                close_anchor()
    if in_a:
        close_anchor()
    return [(i, h, t) for i, (h, t) in enumerate(out)]


def _outlink_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        o_url: list[str] = []
        o_pos: list[int] = []
        o_href: list[str] = []
        o_text: list[str] = []
        for url, html in zip(urls, htmls):
            try:
                links = collect_outlinks(html or b"", url)
            except Exception:
                links = []  # one hostile page never kills the batch
            for pos, href, text in links:
                o_url.append(url)
                o_pos.append(pos)
                o_href.append(href)
                o_text.append(text)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(o_url, pa.string()),
                pa.array(o_pos, pa.int32()),
                pa.array(o_href, pa.string()),
                pa.array(o_text, pa.string()),
            ],
            schema=_OUTLINKS_ARROW_SCHEMA,
        )


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → (url, link_pos, href, anchor_text): the
    link-graph pass every Common-Crawl pipeline runs beside content
    extraction. Same vectorized-map shape as ``extract_articles``:
    column-pruned (url, html) scan, Arrow batches, zero shuffle —
    link-graph rollups (in-degree, per-domain) aggregate downstream."""
    return pages.select("url", "html").mapInArrow(_outlink_batches, OUTLINKS_DDL)


def extract_outlinks_from_documents(documents: DataFrame) -> DataFrame:
    """documents → outlinks with page synthesis fused into the same
    batch loop — the outlink analog of
    ``extract_articles_from_documents`` (see its docstring for why:
    one Python runner per task instead of two, html never crosses the
    boundary). Values identical to
    ``extract_outlinks(synthesize_pages(docs))`` by construction."""

    def fused(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..functions.pagegen import synth_page

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            sources = batch.column("source").to_pylist()
            o_url: list[str] = []
            o_pos: list[int] = []
            o_href: list[str] = []
            o_text: list[str] = []
            for doc_id, text, source in zip(doc_ids, texts, sources):
                url, html = synth_page(doc_id, text, source)
                try:
                    links = collect_outlinks(html, url)
                except Exception:
                    links = []  # one hostile page never kills the batch
                for pos, href, anchor in links:
                    o_url.append(url)
                    o_pos.append(pos)
                    o_href.append(href)
                    o_text.append(anchor)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_url, pa.string()),
                    pa.array(o_pos, pa.int32()),
                    pa.array(o_href, pa.string()),
                    pa.array(o_text, pa.string()),
                ],
                schema=_OUTLINKS_ARROW_SCHEMA,
            )

    return documents.select("doc_id", "text", "source").mapInArrow(
        fused, OUTLINKS_DDL
    )
