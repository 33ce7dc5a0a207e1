"""Property/fuzz tests: the tokenizer and extractor must be total
functions over arbitrary byte soup — one hostile page at 10^12-doc
scale must never kill a task (SURVEY §5.2 item 5).

Invariants checked on random markup:
* tokenize never raises and is deterministic
* event stream is well-formed: opens/closes balance like a stack,
  names are lowercase, text events are non-empty strings
* extract() never raises and always returns the full article shape
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from readabilitysax_spark.core.api import extract
from readabilitysax_spark.core.tokenizer import (
    ATTR,
    CLOSE,
    OPEN,
    TEXT,
    VOID_ELEMENTS,
    tokenize,
)

_tag_bits = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<span class='sidebar'>", "</span>",
    "<a href='/x/1'>", "</a>", "<br>", "<br/>", "<img src='x.png' width=16>",
    "<script>", "</script>", "<title>", "</title>", "<textarea>",
    "<!--", "-->", "<!doctype html>", "<![CDATA[", "]]>", "<?php",
    "<table><tr><td>", "</table>", "<ul><li>", "<svg><circle/>", "</svg>",
    "&amp;", "&amp", "&#x27;", "&#", "&notit;", "&nbsp", "<", ">", "</",
    "<p", "='", '"', "'", "\x00", "﻿", "é漢👍",
    "text, with commas. ", "<EM>", "</eM >", "<foo bar baz=qux>",
])
_soup = st.lists(_tag_bits, max_size=40).map("".join)
_random_text = st.text(max_size=200)


@given(st.one_of(_soup, _random_text))
@settings(max_examples=300, deadline=None)
def test_tokenize_total_and_wellformed(html):
    ev1 = tokenize(html)
    ev2 = tokenize(html)
    assert ev1 == ev2  # deterministic

    depth = 0
    for e in ev1:
        op = e[0]
        if op == OPEN:
            name = e[1]
            assert name == name.lower()
            if name not in VOID_ELEMENTS:
                depth += 1
        elif op == CLOSE:
            name = e[1]
            if name not in VOID_ELEMENTS:
                depth -= 1
                assert depth >= 0, "close without open"
        elif op == TEXT:
            assert isinstance(e[1], str) and e[1] != ""
        elif op == ATTR:
            assert e[1] == e[1].lower()
    assert depth == 0, "unclosed elements at end of stream"


@given(st.one_of(_soup, _random_text))
@settings(max_examples=150, deadline=None)
def test_extract_total(html):
    art = extract(html, url="http://fuzz.example/a/doc-1")
    assert set(art) >= {"title", "text", "textLength", "score", "nextPage",
                        "skipLevel", "error"}
    assert isinstance(art["textLength"], int)
    assert art["textLength"] >= 0


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_extract_total_on_bytes(data):
    art = extract(data)
    assert isinstance(art["text"], str)


# -- pathological depth: tree walks must be heap-bound, not C-stack-bound --

_deep_page = st.builds(
    lambda depth, tag, payload: (
        f"<{tag}>" * depth
        + "<p>" + payload + " words, more text here again, commas. </p>"
        + f"</{tag}>" * depth
    ),
    st.integers(min_value=1_000, max_value=15_000),
    st.sampled_from(["div", "section", "span", "blockquote"]),
    st.text(min_size=0, max_size=80),
)


@given(_deep_page)
@settings(max_examples=10, deadline=None)
def test_extract_survives_pathological_depth(html):
    """10k+-deep nesting yields an article (or error row), never a
    RecursionError that would kill a Spark worker's Arrow batch."""
    art = extract(html, type_="html")
    assert not art["error"]
    assert art["textLength"] > 0


def test_extract_50k_deep_nesting_text_and_html():
    deep = ("<div>" * 50_000
            + "<p>" + "deep text with words, commas, and more, again. " * 10
            + "</p>" + "</div>" * 50_000)
    t = extract(deep)
    assert not t["error"] and t["textLength"] > 200
    # single-child candidate descent lands on the <p> itself → bare text
    h = extract(deep, type_="html")
    assert not h["error"] and "deep text with words" in h["html"]
