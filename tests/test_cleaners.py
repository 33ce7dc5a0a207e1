"""Per-branch tests for the close-tag cleaners (SURVEY.md §2.2
S12-S15), each against hand-simulated reference semantics
(readability-sax.ts:484-549)."""

from __future__ import annotations

from readabilitysax_spark.core.readability import Readability
from readabilitysax_spark.core.tokenizer import replay, tokenize


def tree(html: str, settings=None) -> Readability:
    r = Readability(settings or {})
    replay(tokenize(html), r)
    return r


def top_children(r: Readability):
    return [c for c in r._current_element.children if not isinstance(c, str)]


def names(r: Readability):
    return [c.name for c in top_children(r)]


LONG = "some, decent length text content here " * 3  # >25 chars, commas


class TestS12EmbedWhitelist:
    def test_youtube_iframe_kept(self):
        r = tree("<iframe src='http://www.youtube.com/embed/x'></iframe>")
        assert names(r) == ["iframe"]

    def test_vimeo_kept_ad_dropped(self):
        r = tree("<iframe src='http://vimeo.com/v'></iframe>"
                 "<iframe src='http://ads.example/f'></iframe>")
        assert names(r) == ["iframe"]

    def test_https_youtube_dropped(self):
        # re_videos is http-only (readability-sax.ts:70) — quirk kept
        r = tree("<iframe src='https://www.youtube.com/embed/x'></iframe>")
        assert names(r) == []

    def test_embed_no_src_dropped(self):
        r = tree("<embed>")
        assert names(r) == []


class TestS13HeaderCleaner:
    def test_h2_negative_attribute_score_dropped(self):
        r = tree("<title>t</title><h2 class='footer'>Sub heading text</h2>")
        assert names(r) == []

    def test_h2_positive_kept(self):
        r = tree("<title>t</title><h2 class='content'>Sub heading text</h2>")
        assert names(r) == ["h2"]

    def test_h2_high_link_density_dropped(self):
        r = tree("<title>t</title><h2><a href='/x'>all link text here</a></h2>")
        assert names(r) == []


class TestS14ConditionalCleaner:
    def test_empty_table_dropped(self):
        r = tree("<table></table>")
        assert names(r) == []

    def test_table_single_string_child_dropped(self):
        # contentLength==0 needs trimmed-empty text; a lone whitespace
        # string child triggers the single-string-child drop
        r = tree("<table> </table>")
        assert names(r) == []

    def test_short_content_without_img_dropped(self):
        r = tree("<div id='c'>tiny</div>")
        assert names(r) == []

    def test_short_content_with_one_img_kept(self):
        r = tree("<div id='c'>tiny<img src='x.png'></div>")
        assert names(r) == ["div"]

    def test_density_over_half_dropped(self):
        linky = "<a href='/a'>" + "link text " * 5 + "</a>"
        r = tree(f"<div id='c'>{linky}{linky} short</div>")
        assert names(r) == []

    def test_low_attrscore_mid_density_dropped(self):
        # density > 0.2 with attributeScore < 25
        html = f"<div id='zz'><a href='/a'>{'link words ' * 3}</a>{LONG}</div>"
        r = tree(html)
        assert names(r) == []

    def test_positive_class_saves_mid_density(self):
        # same shape but class bonus +25 ⇒ attributeScore not < 25
        html = f"<div class='content'><a href='/a'>{'link words ' * 3}</a>{LONG}</div>"
        r = tree(html)
        assert names(r) == ["div"]

    def test_disabled_at_skip_level_3(self):
        r = Readability({})
        r.set_skip_level(3)
        replay(tokenize("<div id='c'>tiny</div>"), r)
        # cleanConditionally off → falls through to removeIfEmpty set,
        # which doesn't drop non-empty content; the surviving div has
        # no divToPElements content so S18 renames it to "p"
        # (readability-sax.ts:572-579 — rename precedes the >24 check)
        assert names(r) == ["p"]


class TestS15RemoveIfEmpty:
    def test_empty_p_with_children_dropped(self):
        # a <p> containing only an empty <b>-like element: no text, no
        # link, has children → dropped
        r = tree("<p><i></i></p>")
        assert names(r) == []

    def test_p_with_no_children_kept(self):
        # children.length == 0 → the empty check does not fire
        r = tree("<p></p>")
        assert names(r) == ["p"]

    def test_empty_p_with_img_descendant_kept(self):
        r = tree("<p><img src='x.png'></p>")
        assert names(r) == ["p"]

    def test_empty_td_dropped(self):
        r = tree("<table><tbody><tr><td><i></i></td></tr></tbody></table>")
        # the td dropped, then tr/tbody empty-with-children dropped,
        # then the table has a chain... verify no table survives with
        # a td inside
        top = top_children(r)
        flat = []
        def walk(e):
            flat.append(e.name)
            for c in e.children:
                if not isinstance(c, str):
                    walk(c)
        for t in top:
            walk(t)
        assert "td" not in flat
