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


# -- end-to-end extract properties (round-3 VERDICT item 4) ----------------
# The cheapest way to shrink the organic-HTML parity risk the Node-golden
# gap leaves: drive core.api.extract (the FULL pipeline — tokenizer,
# scoring, skip-loop, cleaners, serializers) over generated hostile pages
# and check the invariants that must hold for ANY input.

_article_bits = st.sampled_from([
    "<p>Real sentences, with commas, read well. More words follow here, "
    "because scoring counts commas and length. </p>",
    "<p>Another paragraph of body text, short but commaful, here. </p>",
    "<div class='content'>", "</div>", "<div class='sidebar ad'>", "</div>",
    "<div id='comment-7'>skip me maybe</div>",
    "<h1>A Headline Of Four Words</h1>", "<title>Site – Page</title>",
    "<a href='/page/2'>2</a>", "<a href='nextpage'>next</a>",
    "<em>inline</em>", "<b>bold</b>", "<span href='/weird'>x</span>",
    "<table><tr><td>cell</td></tr></table>", "<ul><li>item</li></ul>",
    "<img src='/i.png' width=16 height=16>", "<embed src='//www.youtube.com/v/x'>",
    "<script>var a = '<p>not text</p>';</script>",
    "<!-- comment -->", "&amp;", "&#x1F44D;", "﻿", "é漢👍",
    "<p", "</", ">", "<![CDATA[junk]]>", "<?pi data?>", "\x00",
])
_page_soup = st.lists(_article_bits, min_size=0, max_size=60).map("".join)


def _utf16_units(s: str) -> int:
    return len(s.encode("utf-16-le")) // 2


@given(_page_soup, st.sampled_from(["text", "html"]))
@settings(max_examples=200, deadline=None)
def test_extract_end_to_end_invariants(soup, type_):
    url = "http://fuzz.example/articles/doc-9/"
    a = extract(soup, url=url, type_=type_)
    b = extract(soup, url=url, type_=type_)
    assert a == b  # deterministic
    # bytes input is decode-then-identical (str/bytes parity)
    assert extract(soup.encode("utf-8"), url=url, type_=type_) == a
    # never an exception; the error-article pattern is the ONLY error path
    assert a["error"] is False
    # output key follows the requested type (reference getArticle:741-742)
    assert ("text" in a) == (type_ == "text")
    assert ("html" in a) == (type_ == "html")
    # textLength is the CANDIDATE's accounting (info.textLength), so it
    # is non-negative and bounded by the input's UTF-16 size — but NOT
    # len(output): serialization normalizes whitespace separately
    assert isinstance(a["textLength"], int)
    assert 0 <= a["textLength"] <= _utf16_units(soup) + 1
    # the skip-loop terminates within the reference's 4 passes
    assert 0 <= a["skipLevel"] <= 3
    # nextPage, when found, is an absolute resolved URL
    if a["nextPage"]:
        assert a["nextPage"].startswith("http")


# clean single-candidate pages: textLength must equal the UTF-16 unit
# count of the body (JS .length contract — astral chars count 2)
_clean_body = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="<>&\x00",
        # no whitespace/format chars: serialization normalizes runs of
        # JS-\\s (which includes U+FEFF) and would shift the count
        exclude_categories=("Cs", "Cc", "Cf", "Zs", "Zl", "Zp"),
    ),
    min_size=1,
    max_size=120,
)


@given(_clean_body)
@settings(max_examples=150, deadline=None)
def test_extract_textlength_is_utf16_units(payload):
    body = " ".join([payload] + ["words, more words, and commas, yes."] * 12)
    html = "<div class='content'><p>" + body + "</p></div>"
    a = extract(html, url="http://fuzz.example/articles/doc-9/")
    assert a["error"] is False
    assert a["text"] == body
    assert a["textLength"] == _utf16_units(body)


@given(_page_soup)
@settings(max_examples=50, deadline=None)
def test_extract_reaches_fixed_point(soup):
    """Iterated re-extraction must converge (monotone pruning), never
    oscillate: each pass returns a subset of the previous DOM, so the
    html output reaches a fixed point in a few passes."""
    url = "http://fuzz.example/articles/doc-9/"
    cur = soup
    seen = set()
    for _ in range(8):
        a = extract(cur, url=url, type_="html")
        assert a["error"] is False
        if a["html"] == cur:
            return
        assert a["html"] not in seen, "oscillation in re-extraction"
        seen.add(a["html"])
        cur = a["html"]
    raise AssertionError("no fixed point within 8 passes")


@given(st.binary(max_size=600))
@settings(max_examples=100, deadline=None)
def test_extract_error_article_shape_on_bytes(data):
    """Arbitrary bytes: either a normal article or the exact
    error-article shape (lib/get-url.ts:33-44 pattern) — never a raise."""
    a = extract(data, url="http://fuzz.example/b")
    if a["error"]:
        assert (a["title"], a["text"], a["textLength"], a["skipLevel"]) == (
            "Error", "", 0, -1)
    else:
        assert isinstance(a["textLength"], int) and a["textLength"] >= 0
        assert 0 <= a["skipLevel"] <= 3
