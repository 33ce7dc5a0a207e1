"""Pins for reference branches the golden pages left unexercised.

Found by line-coverage tracing the core under the full parity suites
(golden + reference-goldens + cleaners + parity + tokenizer + fuzz):
each test below targets a branch no other test reached, with the
expected value DERIVED BY HAND from /root/reference/readability-sax.ts
(cited per test) before being run against this port — so a pass pins
reference semantics, not implementation behavior.
"""

from __future__ import annotations

from readabilitysax_spark.core.api import extract
from readabilitysax_spark.core.readability import Readability
from readabilitysax_spark.core.tokenizer import ATTR, CLOSE, OPEN, TEXT, replay, tokenize
from readabilitysax_spark.core.urls import convert_links, parse_page_url

PAR = "<p>" + "alpha beta gamma delta epsilon " * 12 + "</p>"


def _page(head: str, body: str) -> str:
    return f"<html><head>{head}</head><body>{body}</body></html>"


class TestTitleColonBranch:
    """getTitle's ': ' branch (readability-sax.ts:656-665): substr from
    lastIndexOf(': ')+2; if that is not 3 words, substr from
    indexOf(': ') — which KEEPS the ': ' prefix; the result only ships
    if it splits to exactly 5 words, else the original title returns."""

    def _title(self, title: str) -> str:
        html = _page(f"<title>{title}</title>",
                     f"<div class='content'>{PAR}</div>")
        return extract(html)["title"]

    def test_colon_prefix_quirk_ships_five_word_result(self):
        # "W1 W2 W3 W4" is 4 words (≠3) → fall back to indexOf(': '):
        # ": W1 W2 W3 W4" → 5 split-words → returned WITH the ': ' prefix
        assert self._title("Album: W1 W2 W3 W4") == ": W1 W2 W3 W4"

    def test_three_word_tail_fails_five_word_gate(self):
        # tail is exactly 3 words → quirk skipped → 3 ≠ 5 → original
        assert self._title("Album: Alpha Beta Gamma") == "Album: Alpha Beta Gamma"

    def test_double_colon_uses_last_then_first(self):
        # lastIndexOf strips to "W1 W2 W3 W4" (4 ≠ 3), indexOf keeps
        # ": B: W1 W2 W3 W4" → 6 split-words ≠ 5 → original returns
        assert self._title("A: B: W1 W2 W3 W4") == "A: B: W1 W2 W3 W4"


def test_get_title_returns_adopted_header_directly():
    """getTitle():645 returns _headerTitle when the h1 was adopted —
    adoption (ts:447-450) needs the h1 text inside the <title> AND
    exactly 4 words. getArticle reads the field itself, so only a
    direct O3 getTitle() call reaches this return."""
    html = _page(
        "<title>One Two Three Four - site</title>",
        f"<h1>One Two Three Four</h1><div class='content'>{PAR}</div>",
    )
    r = Readability()
    replay(tokenize(html), r)
    assert r.get_title() == "One Two Three Four"


def test_safe_class_is_instant_candidate():
    """re_safe classes (article-body|hentry|instapaper_body,
    ts:78,384-386) add +300 AND set isCandidate directly — a tiny
    instapaper_body div beats a content div with 3× the text.
    Hand-computed score: paragraph adds 1+0+min(260//100,3)=3
    (ts:582-601), div tag base +5 lazily at selection (ts:150), class
    +300 → floor((3+5+300)·(1-0)) = 308."""
    safe = "<div class='instapaper_body'><p>" + "x" * 260 + "</p></div>"
    content = "<div class='content'>" + ("<p>" + "y" * 300 + "</p>") * 3 + "</div>"
    art = extract(_page("<title>T</title>", safe + content))
    assert art["score"] == 308
    assert art["textLength"] == 260
    assert art["text"] == "x" * 260


class TestSiblingJoinBranches:
    """getCandidateSiblings (ts:137-154): the two acceptance paths the
    goldens never fired — same-elementData score merge (with the
    non-p rename to div) and the short-sentence <p> path."""

    def test_same_element_data_merge_renames_section_to_div(self):
        # weak <section class='post'> first: its own totalScore (41 =
        # floor((15+1+25)·1)) clears max(10, 42·0.2)=10 with the
        # +0.2·candidate bonus → joined; name 'section' ≠ 'p' → 'div'
        # (ts:141). Strong div: floor((5+3·4+25)·1) = 42 wins selection.
        weak = "<section class='post'><p>" + "w" * 80 + "</p></section>"
        strong = "<div class='post'>" + ("<p>" + "s" * 300 + "</p>") * 3 + "</div>"
        art = extract(_page("<title>T</title>", weak + strong), type_="html")
        assert art["score"] == 42
        assert art["textLength"] == 980  # 80 + 3·300
        assert art["html"].startswith("<div><p>" + "w" * 80)
        assert "<section" not in art["html"]

    def test_short_sentence_paragraph_joined_only_with_period(self):
        # ts:148-152: a <p> sibling under 80 chars with zero link
        # density joins ONLY if re_sentence (/\. |\.$/) matches
        cand = ("<div class='content'>"
                + ("<p>" + "body text here. " * 20 + "</p>") * 2 + "</div>")
        with_period = extract(_page("<title>T</title>",
                                    cand + "<p>A closing remark.</p>"))
        without = extract(_page("<title>T</title>",
                                cand + "<p>A closing remark</p>"))
        assert "A closing remark." in with_period["text"]
        assert "A closing remark" not in without["text"]


def test_scan_link_negative_number_and_ancestor_break():
    """_scanLink branches missed by the paginator golden
    (ts:305-307,316-332,334-338): linkData negative −50; literal '1'
    −10; and the ancestor walk consuming a pages-ancestor (+25,
    posMatch off) then BREAKING on a negative ancestor (−25).
    Hand-computed: '3' → +7 (10−3) +25 (pagenum href) +25 (pagination
    ancestor) −25 (sidebar ancestor, then break) = 32; 'next' with
    class comment → +50 (next) −50 (negative) +25 (href) = 25;
    '1' → −10 +25 (href) = 15."""
    body = "<div class='content'><p>" + "text with words, commas. " * 15 + "</p></div>"
    links = (
        "<div class='sidebar'><div class='pagination'>"
        "<a href='/posts/7/page/3'>3</a></div></div>"
        "<a href='/posts/7/page/2' class='comment'>next</a>"
        "<a href='/posts/7/page/5'>1</a>"
    )
    r = Readability({"pageURL": "http://s.example/posts/7"})
    replay(tokenize(_page("<title>T</title>", body + links)), r)
    r.get_article()
    scores = {h.rsplit("/", 1)[1]: v[0] for h, v in r._scanned_links.items()}
    assert scores == {"3": 32, "2": 25, "5": 15}


def test_set_skip_level_zero_is_noop():
    """setSkipLevel(0) must not relax anything (ts:631-642 only acts
    for levels ≥1; lib/process.ts:22 calls it only when nonzero)."""
    r = Readability()
    r.set_skip_level(0)
    assert r._settings["stripUnlikelyCandidates"] is True
    assert r._settings["weightClasses"] is True
    assert r._settings["cleanConditionally"] is True


def test_empty_attribute_value_ignored_via_direct_callback():
    """onattribute returns on empty value (ts:370) — the tokenizer
    never emits empty values, but the SRC4 DOM-replay surface can
    deliver them, so the guard is part of the event contract."""
    r = Readability({"pageURL": "http://s.example/a"})
    r.onopentagname("a")
    r.onattribute("href", "")
    assert "href" not in r._current_element.attributes
    r.onattribute("href", "/x")
    assert r._current_element.attributes["href"] == "http://s.example/x"


def test_stray_close_at_root_ignored():
    """onclosetag at the root element is a no-op (ts:430-431) — a
    replayed stray close event must not detach the document root."""
    r = Readability()
    root = r._current_element
    r.onclosetag("div")
    assert r._current_element is root


class TestTokenizerEdgeEvents:
    """htmlparser2-contract edges around whitespace, EOF and rawtext
    that the conformance pages missed. Event tuples: (OPEN, name),
    (ATTR, name, value), (TEXT, text), (CLOSE, name)."""

    def test_whitespace_around_equals(self):
        assert tokenize('<a href = "x">t</a>') == [
            (OPEN, "a"), (ATTR, "href", "x"), (TEXT, "t"), (CLOSE, "a")]

    def test_eof_inside_quoted_value_drops_attribute(self):
        # handleTrailingData ignores an unfinished attribute value; the
        # open tag still registered and EOF closes it
        assert tokenize('<a href="x') == [(OPEN, "a"), (CLOSE, "a")]

    def test_empty_values_never_emit_attr(self):
        for html in ('<a href=>t</a>', '<a href="">t</a>'):
            assert tokenize(html) == [(OPEN, "a"), (TEXT, "t"), (CLOSE, "a")]

    def test_eof_inside_closing_name_ignored(self):
        # "</di" at EOF: the half-written close never fires; the EOF
        # close-out closes the still-open div instead
        assert tokenize("<div>t</di") == [
            (OPEN, "div"), (TEXT, "t"), (CLOSE, "div")]

    def test_eof_inside_declaration_emits_content_as_text(self):
        assert tokenize("<div>t<!doctype") == [
            (OPEN, "div"), (TEXT, "t"), (TEXT, "doctype"), (CLOSE, "div")]

    def test_rcdata_keeps_lt_and_splits_entities(self):
        # '<' inside <title> is text (only '</title' terminates), and
        # the per-entity ontext split applies inside RCDATA too
        assert tokenize("<title>a < b</title>x") == [
            (OPEN, "title"), (TEXT, "a < b"), (CLOSE, "title"), (TEXT, "x")]
        assert tokenize("<title>a &amp; b") == [
            (OPEN, "title"), (TEXT, "a "), (TEXT, "&"), (TEXT, " b"),
            (CLOSE, "title")]

    def test_rawtext_script_keeps_lt_unsplit(self):
        assert tokenize("<script>if (a < b) x();</script>y") == [
            (OPEN, "script"), (TEXT, "if (a < b) x();"),
            (CLOSE, "script"), (TEXT, "y")]


class TestGetBaseUrlPageInUrl:
    """getBaseURL's rePageInURL strip branches (get-base-url.ts:40-52):
    a trailing page-marker segment is removed from BOTH the last path
    component and the final URL component when it matches
    /[_-]?p[a-zA-Z]*[_-]?\\d{1,2}$/."""

    def test_first_component_page_marker_stripped(self):
        from readabilitysax_spark.core.urls import get_base_url
        # first='page-2' is not badFirst, matches pageInURL → stripped
        # to '' (the trailing '/' survives — reference appends '/' + '')
        assert get_base_url(parse_page_url(
            "http://s.example/series/heat/page-2"
        )) == "http://s.example/series/heat/"

    def test_second_component_page_marker_stripped(self):
        from readabilitysax_spark.core.urls import get_base_url
        # second='entry-p2' → '-p2' stripped; first='7' is badFirst (\d+)
        assert get_base_url(parse_page_url(
            "http://s.example/blog/entry-p2/7"
        )) == "http://s.example/blog/entry"


class TestConvertLinksEdges:
    """_convertLinks special cases (ts:240-269) beyond the reference's
    own vectors: empty href resolves to the full page URL; a
    'scheme://'-shaped path that reaches the converter is returned
    unchanged; '//host/...' is protocol-relative."""

    URL = parse_page_url("http://s.example/a/b")

    def test_empty_href_is_full_url(self):
        assert convert_links("", self.URL, False) == "http://s.example/a/b"

    def test_scheme_like_path_returned_unchanged(self):
        assert convert_links("weird://x/y", self.URL, False) == "weird://x/y"

    def test_protocol_relative(self):
        assert convert_links("//cdn.example/i.js", self.URL, False) == (
            "http://cdn.example/i.js")
