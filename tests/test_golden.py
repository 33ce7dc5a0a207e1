"""Reference parity: the published asserts from
/root/reference/tests/readability.test.ts and writable-stream.test.ts,
plus behavioral tests for quirks Q1-Q11 (SURVEY.md §2)."""

from __future__ import annotations

from readabilitysax_spark.core.api import extract, process
from readabilitysax_spark.core.readability import Readability
from readabilitysax_spark.core.tokenizer import replay, tokenize
from readabilitysax_spark.core.urls import convert_links, get_base_url, parse_page_url

SETTINGS = {"pageURL": "http://howtonode.org/heat-tracer/", "resolvePaths": True}


def _parse(html: str, settings=None):
    r = Readability(settings or dict(SETTINGS))
    replay(tokenize(html), r)
    return r


class TestGoldenFixture:
    """tests/readability.test.ts:35-50 — the five published constants."""

    def test_metadata(self, testpage):
        r = _parse(testpage)
        art = r.get_article()
        assert art["title"] == "How To Node - NodeJS"
        assert art["nextPage"] == "http://howtonode.org/heat-tracer/dummy/page/2"
        assert art["textLength"] == 7935
        assert art["score"] == 82
        assert len(r._scanned_links) == 2

    def test_html_sections(self, testpage):
        art = _parse(testpage).get_article()
        for h in ("<h2>System Requirements</h2>", "<h2>Security</h2>",
                  "<h2>Dependencies</h2>"):
            assert h in art["html"]

    def test_process_text_api(self, testpage):
        art = process(testpage, {**SETTINGS, "type": "text"})
        assert "System Requirements" in art["text"]
        assert art["title"] == "How To Node - NodeJS"


class TestUrlVectors:
    """tests/readability.test.ts:52-77."""

    def test_url_decomposition(self):
        u = parse_page_url("http://foo.bar/this.2/is/a/long/path/index?isnt=it")
        assert u.protocol == "http:"
        assert u.domain == "foo.bar"
        assert u.path == ["this.2", "is", "a", "long", "path"]
        assert u.full == "http://foo.bar/this.2/is/a/long/path/index?isnt=it"
        assert get_base_url(u) == "http://foo.bar/this.2/is/a/long/path"

    def test_convert_links(self):
        u = parse_page_url("http://foo.bar/this.2/is/a/long/path/index?isnt=it")
        assert convert_links("../asdf/foo/", u, True) == "http://foo.bar/this.2/is/a/long/asdf/foo/"
        assert convert_links("/asdf/foo/", u, True) == "http://foo.bar/asdf/foo/"
        assert convert_links("foo/", u, True) == "http://foo.bar/this.2/is/a/long/path/foo/"


def test_skip_level_sequence():
    """tests/writable-stream.test.ts:60-85: short doc falls through
    skip levels exactly [1, 2, 3]."""
    calls = []
    orig = Readability.set_skip_level
    Readability.set_skip_level = lambda self, lvl: (calls.append(lvl), orig(self, lvl))[1]
    try:
        art = process("<p>tiny</p>", {})
    finally:
        Readability.set_skip_level = orig
    assert calls == [1, 2, 3]
    assert art["skipLevel"] == 3


PAR = "word, " * 10  # 60 chars, 9 commas → scores


class TestQuirks:
    def test_q1_nocontent_attribute_leak(self):
        # span's class lands on the PARENT element's elementData
        html = f"<div><span class='sidebar'>x</span><p>{PAR}</p></div>"
        r = _parse(html, {})
        # the div was stripped as unlikely candidate because "sidebar"
        # leaked onto it: result falls back to remaining content
        art = r.get_article("text")
        assert "x" not in art["text"] or art["textLength"] == 0

    def test_q2_tiny_img_counts_as_script(self):
        html = f"<div class='content'><p>{PAR}<img src='i.png' width='16'></p></div>"
        art = process(html, {"type": "html"})
        assert "<script" in art["html"]  # renamed, kept, serialized as script

    def test_q3_header_title_four_words(self):
        html = (f"<html><head><title>one two three four - site</title></head>"
                f"<body><h1>one two three four</h1>"
                f"<div class='content'><p>{PAR * 5}</p></div></body></html>")
        art = process(html, {})
        assert art["title"] == "one two three four"

    def test_q3_header_title_wrong_word_count_not_used(self):
        html = (f"<html><head><title>one two three - site</title></head>"
                f"<body><h1>one two three</h1>"
                f"<div class='content'><p>{PAR * 5}</p></div></body></html>")
        art = process(html, {})
        assert art["title"] == "one two three - site"

    def test_q4_q5_unpack_div(self):
        # single-child div chain unpacks; score accumulated on the
        # dropped div is lost
        inner = f"<p>{PAR}</p>"
        html = f"<body><div class='content'>{inner}</div><div><div><img src='x.png' width='500'></div></div></body>"
        art = process(html, {"type": "html"})
        assert "img" in art["html"] or "content" not in art["html"]

    def test_q6_per_chunk_trim(self):
        # "foo &amp; bar" arrives as 3 text chunks; textLength is the
        # sum of per-chunk trimmed lengths (3 + 1 + 3), not len("foo & bar")
        r = Readability({})
        replay(tokenize("<p>foo &amp; bar</p>"), r)
        p = [c for c in r._current_element.children if not isinstance(c, str)][0]
        assert [c for c in p.children if isinstance(c, str)] == ["foo ", "&", " bar"]
        assert p.info_text_length == 7  # 3 + 1 + 3, not 9

    def test_q7_recursive_tag_count(self):
        html = f"<div class='content'><ul><li><p>{PAR}</p></li></ul><p>{PAR}</p></div>"
        r = Readability({})
        replay(tokenize(html), r)
        # root -> div; its tagCount must include nested p (depth 3)
        div = [c for c in r._current_element.children
               if not isinstance(c, str)][0]
        assert div.info_tag_count.get("p", 0) == 2
        assert div.info_tag_count.get("li") == 1

    def test_q8_div_to_p_rename(self):
        # div without divToPElements content is renamed p and scored
        html = f"<body><div id='a'><div>{PAR * 2}</div></div></body>"
        art = process(html, {"type": "html"})
        assert "<p>" in art["html"] or art["textLength"] > 0

    def test_q10_newline_collapse(self):
        html = ("<body><div class='content'>"
                + f"<p>{PAR}</p>" * 3 + "<ul><li>a</li><li>b</li></ul>"
                + "</div></body>")
        art = process(html, {"type": "text"})
        assert "\n\n\n" not in art["text"]

    def test_q11_title_magic(self):
        # "Foo - W1 W2 W3 W4 W5": keep-left "Foo" (1 word ≠ 3) →
        # drop-left "W1..W5" (5 words) → returned shortened
        html = ("<head><title>Foo - W1 W2 W3 W4 W5</title></head>"
                f"<body><div class='content'><p>{PAR * 5}</p></div></body>")
        art = process(html, {})
        assert art["title"] == "W1 W2 W3 W4 W5"

    def test_pagination_link_scoring(self):
        html = (f"<body><div class='content'><p>{PAR * 5}</p></div>"
                "<div class='pagination'><a href='/a/doc-1/page/2'>2</a></div></body>")
        art = process(html, {"pageURL": "http://x.example/a/doc-1"})
        assert art["nextPage"] == "http://x.example/a/doc-1/page/2"


class TestErrorHandling:
    def test_extract_never_raises(self):
        for bad in (b"\xff\xfe\x00", "", "<" * 1000, "&" * 1000,
                    "<div>" * 3000 + "x" + "</div>" * 3000):
            art = extract(bad)
            assert isinstance(art["textLength"], int)

    def test_bytes_str_parity(self, testpage):
        a = extract(testpage, url=SETTINGS["pageURL"],
                    settings={"resolvePaths": True})
        b = extract(testpage.encode(), url=SETTINGS["pageURL"],
                    settings={"resolvePaths": True})
        assert a["text"] == b["text"]
        assert a["textLength"] == b["textLength"] == 7935


class TestSettingsMatrix:
    """Every ReadabilitySettings field (/root/reference/lib/types.ts:7-18)
    must be honored with the reference's semantics — a reference user
    switching engines keeps their settings object."""

    PAGE = ("<body><div class='content'>"
            + f"<p style='color:red'>{PAR * 10}</p>"
            + "<a href='/i/full.jpg'><img src='/i/thumb.png' width='640'></a>"
            + f"<p title='cap'>{PAR * 10}</p></div>"
            + "<div class='pagination'><a href='/a/doc-1/page/2'>2</a></div>"
            + "</body>")
    URL = {"pageURL": "http://x.example/a/doc-1"}

    def test_search_further_pages_off(self):
        assert process(self.PAGE, {**self.URL})["nextPage"]
        art = process(self.PAGE, {**self.URL, "searchFurtherPages": False})
        assert art["nextPage"] == ""

    def test_links_to_skip(self):
        skip = {"http://x.example/a/doc-1/page/2": True}
        art = process(self.PAGE, {**self.URL, "linksToSkip": skip})
        assert art["nextPage"] == ""

    def test_clean_attributes_flag(self):
        keep = process(self.PAGE, {**self.URL, "type": "html",
                                   "cleanAttributes": False})["html"]
        clean = process(self.PAGE, {**self.URL, "type": "html"})["html"]
        assert "style" in keep and "style" not in clean
        assert "title" in keep and "title" in clean  # GOOD_ATTRIBUTES kept

    def test_replace_imgs_flag(self):
        dropped = process(self.PAGE, {**self.URL, "type": "html"})["html"]
        kept = process(self.PAGE, {**self.URL, "type": "html",
                                   "replaceImgs": False})["html"]
        assert "<img" not in dropped  # a>img-url link replaced (S16)
        assert "<img" in kept and "<a " in kept

    def test_strip_unlikely_candidates_flag(self):
        # sidebar body is comma-rich so only the unlikely-candidate
        # strip (not the conditional cleaner) decides its fate
        junk = "sidebar junk, with commas, more commas, and text. " * 4
        page = (f"<body><div class='content'><p>{PAR * 10}</p>"
                f"<div class='sidebar'><p>{junk}</p></div>"
                f"<p>{PAR * 10}</p></div></body>")
        strict = process(page, {"type": "html"})["html"]
        loose = process(page, {"type": "html",
                               "stripUnlikelyCandidates": False})["html"]
        assert "sidebar junk" not in strict
        assert "sidebar junk" in loose

    def test_weight_classes_flag(self):
        # without class weighting the 'content' bonus disappears
        on = process(self.PAGE, {**self.URL})
        off = process(self.PAGE, {**self.URL, "weightClasses": False})
        assert off["score"] < on["score"]

    def test_type_selects_output_key(self):
        t = process(self.PAGE, {**self.URL, "type": "text"})
        h = process(self.PAGE, {**self.URL, "type": "html"})
        assert "text" in t and "html" not in t
        assert "html" in h and "text" not in h
