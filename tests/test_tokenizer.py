"""htmlparser2-v10 conformance tests for the scanning tokenizer
(SURVEY.md §3.5 must-match list)."""

from __future__ import annotations

from readabilitysax_spark.core.tokenizer import ATTR, CLOSE, OPEN, TEXT, tokenize


def fmt(src: str):
    sym = {OPEN: "O", ATTR: "A", TEXT: "T", CLOSE: "C"}
    return [(sym[e[0]], *e[1:]) for e in tokenize(src)]


def test_basic_tree():
    assert fmt("<p>hi</p>") == [("O", "p"), ("T", "hi"), ("C", "p")]


def test_lowercasing_tags_and_attrs():
    assert fmt("<P CLASS='x'>a</P>") == [
        ("O", "p"), ("A", "class", "x"), ("T", "a"), ("C", "p")]


def test_implied_close_p_and_li():
    assert fmt("<p>a<p>b") == [
        ("O", "p"), ("T", "a"), ("C", "p"), ("O", "p"), ("T", "b"), ("C", "p")]
    assert fmt("<ul><li>a<li>b</ul>") == [
        ("O", "ul"), ("O", "li"), ("T", "a"), ("C", "li"),
        ("O", "li"), ("T", "b"), ("C", "li"), ("C", "ul")]


def test_implied_close_table_cells():
    assert fmt("<table><tr><td>a<td>b</table>") == [
        ("O", "table"), ("O", "tr"), ("O", "td"), ("T", "a"), ("C", "td"),
        ("O", "td"), ("T", "b"), ("C", "td"), ("C", "tr"), ("C", "table")]


def test_block_closes_p():
    assert fmt("<p>a<div>b</div>") == [
        ("O", "p"), ("T", "a"), ("C", "p"),
        ("O", "div"), ("T", "b"), ("C", "div")]


def test_void_elements():
    assert fmt("<br>") == [("O", "br"), ("C", "br")]
    assert fmt("<img src='a.png'>") == [
        ("O", "img"), ("A", "src", "a.png"), ("C", "img")]


def test_br_close_tag_is_open_plus_close():
    assert fmt("</br>") == [("O", "br"), ("C", "br")]


def test_void_close_tags_ignored():
    assert fmt("</img>") == []


def test_implicit_p_for_stray_close():
    assert fmt("</p>") == [("O", "p"), ("C", "p")]


def test_end_closes_open_stack():
    assert fmt("<div><span>x") == [
        ("O", "div"), ("O", "span"), ("T", "x"), ("C", "span"), ("C", "div")]


def test_entities_split_text_events():
    assert fmt("x &amp; y") == [("T", "x "), ("T", "&"), ("T", " y")]
    assert fmt("&#8217;s") == [("T", "’"), ("T", "s")]
    # legacy no-semicolon in text
    assert fmt("a&amp b") == [("T", "a"), ("T", "&"), ("T", " b")]
    # failed reference stays one chunk
    assert fmt("a&zzz;b") == [("T", "a&zzz;b")]


def test_attribute_entities():
    assert fmt("<a href=foo&amp;bar>x</a>") == [
        ("O", "a"), ("A", "href", "foo&bar"), ("T", "x"), ("C", "a")]
    # attribute rule: legacy entity followed by alnum does NOT decode
    assert fmt("<a href='a&ampx'>y</a>") == [
        ("O", "a"), ("A", "href", "a&ampx"), ("T", "y"), ("C", "a")]


def test_rawtext_script_style():
    assert fmt("<script>a<b &amp;</script>t") == [
        ("O", "script"), ("T", "a<b &amp;"), ("C", "script"), ("T", "t")]
    assert fmt("<style>p{}</style>") == [
        ("O", "style"), ("T", "p{}"), ("C", "style")]


def test_rcdata_title_textarea_decode():
    assert fmt("<title>a &amp; b</title>") == [
        ("O", "title"), ("T", "a "), ("T", "&"), ("T", " b"), ("C", "title")]
    assert fmt("<textarea><p>&gt;</textarea>") == [
        ("O", "textarea"), ("T", "<p>"), ("T", ">"), ("C", "textarea")]


def test_self_closing_script_not_rawtext():
    assert fmt("<script/>x</script>") == [
        ("O", "script"), ("T", "x"), ("C", "script")]


def test_html_mode_self_closing_div_stays_open():
    assert fmt("<div/>x</div>") == [("O", "div"), ("T", "x"), ("C", "div")]


def test_foreign_context_self_closing():
    assert fmt("<svg><circle/></svg>") == [
        ("O", "svg"), ("O", "circle"), ("C", "circle"), ("C", "svg")]


def test_comments_doctype_pi_cdata_ignored():
    assert fmt("<!-- c --><p>x</p>") == [("O", "p"), ("T", "x"), ("C", "p")]
    assert fmt("<!doctype html><p>x</p>") == [("O", "p"), ("T", "x"), ("C", "p")]
    assert fmt("<?php y ?><p>x</p>") == [("O", "p"), ("T", "x"), ("C", "p")]
    assert fmt("<![CDATA[z]]><p>x</p>") == [("O", "p"), ("T", "x"), ("C", "p")]


def test_short_comment():
    assert fmt("<!--><p>x</p>") == [("O", "p"), ("T", "x"), ("C", "p")]


def test_lt_as_text():
    assert fmt("a<3 b") == [("T", "a"), ("T", "<3 b")]
    assert fmt("text<") == [("T", "text"), ("T", "<")]


def test_duplicate_attributes_all_fire():
    assert fmt("<a href='x' href='y'>z</a>") == [
        ("O", "a"), ("A", "href", "x"), ("A", "href", "y"),
        ("T", "z"), ("C", "a")]


def test_unquoted_and_valueless_attributes():
    assert fmt("<input type=checkbox checked>") == [
        ("O", "input"), ("A", "type", "checkbox"), ("C", "input")]


def test_eof_inside_tag_ignored():
    assert fmt("<p") == []
    assert fmt("<p x=") == [("O", "p"), ("C", "p")]


def test_rawtext_eof():
    assert fmt("<script>var x") == [
        ("O", "script"), ("T", "var x"), ("C", "script")]


def test_unquoted_attr_value_at_eof_dropped():
    """htmlparser2 v10 handleTrailingData ignores InAttributeValueNq:
    an unquoted value terminated by end-of-input never fires ATTR."""
    assert tokenize("<div class=foo") == [(OPEN, "div"), (CLOSE, "div")]
    assert not any(e[0] == ATTR for e in tokenize("<a href=x&amp"))
    # but a ws-terminated attribute before the EOF has already fired
    ev = tokenize("<div class=foo bar")
    assert (ATTR, "class", "foo") in ev
    # and a completed tag still emits the value (entity decoded)
    assert (ATTR, "href", "x&") in tokenize("<a href=x&amp>y</a>")


class TestEntityEdgeCases:
    """WHATWG character-reference corners (the table and rules the
    `entities` v7 decoder implements; htmlparser2 v10 drives the
    reference with exactly these semantics)."""

    def test_numeric_no_semicolon_text(self):
        from readabilitysax_spark.core.entities import split_text_entities
        assert split_text_entities("a&#65b") == ["a", "A", "b"]
        assert split_text_entities("&#x41") == ["A"]

    def test_c1_remap_and_replacement(self):
        from readabilitysax_spark.core.entities import split_text_entities
        assert split_text_entities("&#x80;") == ["€"]   # € (win-1252)
        assert split_text_entities("&#153;") == ["™"]   # ™
        assert split_text_entities("&#0;") == ["�"]
        assert split_text_entities("&#xD800;") == ["�"]  # surrogate
        assert split_text_entities("&#x110000;") == ["�"]  # > max
        assert split_text_entities("&#99999999999999999;") == ["�"]

    def test_longest_match_with_trailing_garbage(self):
        from readabilitysax_spark.core.entities import split_text_entities
        # the spec's own example: &notit; → ¬it;  /  &notin; → ∉
        assert split_text_entities("x&notit;") == ["x", "¬", "it;"]
        assert split_text_entities("&notin;") == ["∉"]
        assert split_text_entities("&notin") == ["¬", "in"]

    def test_bare_and_empty_references_stay_literal(self):
        from readabilitysax_spark.core.entities import split_text_entities
        assert split_text_entities("&") == ["&"]
        assert split_text_entities("&;x") == ["&;x"]
        assert split_text_entities("&#;") == ["&#;"]
        assert split_text_entities("&#x;") == ["&#x;"]
        assert split_text_entities("&fakename;end") == ["&fakename;end"]

    def test_attribute_legacy_rule(self):
        # &name (no ;) followed by '=' or alphanumeric is NOT decoded in
        # attribute values; numeric references decode regardless
        assert (ATTR, "href", "/x?a=1&amp=2&copy=3") in tokenize(
            "<a href='/x?a=1&amp=2&copy=3'>y</a>")
        assert (ATTR, "title", "1 < 2") in tokenize("<a title='1 &lt 2'>y</a>")
        assert (ATTR, "data", "A-B") in tokenize("<a data='&#65;-&#66'>y</a>")
        assert (ATTR, "q", "x&y") in tokenize("<a q='x&amp;y'>z</a>")

    def test_rcdata_decodes_rawtext_does_not(self):
        ev = tokenize("<title>T &copy 1</title><script>S &copy 1</script>")
        title_chunks = [e[1] for e in ev if e[0] == TEXT][:3]
        assert title_chunks == ["T ", "©", " 1"]
        assert (TEXT, "S &copy 1") in ev


class TestImpliedCloseMatrix:
    """htmlparser2's openImpliesClose while-loop semantics, pinned on
    the structures the reference meets constantly in web tables/lists."""

    def _fmt(self, h):
        m = {OPEN: "O", ATTR: "A", TEXT: "T", CLOSE: "C"}
        return [(m[e[0]], *e[1:]) for e in tokenize(h)]

    def test_table_rows_cascade(self):
        # a new <tr> pops BOTH the open td and the open tr (while-loop,
        # not single pop)
        assert self._fmt("<table><tr><td>a<tr><td>b</table>") == [
            ("O", "table"), ("O", "tr"), ("O", "td"), ("T", "a"),
            ("C", "td"), ("C", "tr"), ("O", "tr"), ("O", "td"), ("T", "b"),
            ("C", "td"), ("C", "tr"), ("C", "table")]

    def test_list_items_and_definition_terms(self):
        assert self._fmt("<ul><li>x<li>y</ul>") == [
            ("O", "ul"), ("O", "li"), ("T", "x"), ("C", "li"),
            ("O", "li"), ("T", "y"), ("C", "li"), ("C", "ul")]
        assert self._fmt("<dl><dt>t<dd>d<dt>t2</dl>") == [
            ("O", "dl"), ("O", "dt"), ("T", "t"), ("C", "dt"),
            ("O", "dd"), ("T", "d"), ("C", "dd"),
            ("O", "dt"), ("T", "t2"), ("C", "dt"), ("C", "dl")]

    def test_block_elements_close_p(self):
        assert self._fmt("<p>a<div>b</div>") == [
            ("O", "p"), ("T", "a"), ("C", "p"),
            ("O", "div"), ("T", "b"), ("C", "div")]

    def test_form_controls(self):
        assert self._fmt("<select><option>1<option>2</select>") == [
            ("O", "select"), ("O", "option"), ("T", "1"), ("C", "option"),
            ("O", "option"), ("T", "2"), ("C", "option"), ("C", "select")]

    def test_foreign_self_closing_and_integration_point(self):
        # inside <svg>, '/>' genuinely self-closes (foreign content);
        # <desc> is an integration point where html rules resume
        assert self._fmt("<svg><circle/><desc><p>t</p></desc></svg>") == [
            ("O", "svg"), ("O", "circle"), ("C", "circle"),
            ("O", "desc"), ("O", "p"), ("T", "t"), ("C", "p"),
            ("C", "desc"), ("C", "svg")]

    def test_rawtext_end_tag_with_attributes(self):
        # '</script foo=..>' terminates rawtext; junk up to '>' consumed
        assert self._fmt("<script>x</script foo='y'>after") == [
            ("O", "script"), ("T", "x"), ("C", "script"), ("T", "after")]


def test_self_closing_only_in_foreign_context():
    """htmlparser2 html mode ignores '/>' on non-void HTML elements
    (the div stays open); void elements close regardless; inside
    svg/math foreign content '/>' genuinely self-closes."""
    assert tokenize("<div/>x</div>") == [
        (OPEN, "div"), (TEXT, "x"), (CLOSE, "div")]
    assert tokenize("<br/>y") == [(OPEN, "br"), (CLOSE, "br"), (TEXT, "y")]
    assert tokenize("<svg><rect/></svg>z") == [
        (OPEN, "svg"), (OPEN, "rect"), (CLOSE, "rect"),
        (CLOSE, "svg"), (TEXT, "z")]


def test_exotic_markup_conformance():
    """htmlparser2-default treatment of declarations, PIs, bogus
    comments, CDATA (comment-ish when recognizeCDATA is off), stray
    '<', and unclosed comments — none may crash, none may leak
    declaration bytes as text."""
    from readabilitysax_spark.core.tokenizer import tokenize

    OPEN, ATTR, TEXT, CLOSE = 0, 1, 2, 3
    p_t = [(OPEN, "p"), (TEXT, "t"), (CLOSE, "p")]
    assert tokenize('<svg><![CDATA[x < y]]></svg>') == [(OPEN, "svg"), (CLOSE, "svg")]
    assert tokenize('<! bogus ><p>t</p>') == p_t
    assert tokenize('<!><p>t</p>') == p_t
    assert tokenize('<?php echo "x"; ?><p>t</p>') == p_t
    assert tokenize('</><p>t</p>') == p_t
    assert tokenize('<!- not a comment -><p>t</p>') == p_t
    assert tokenize('<!--[if IE]><p>ie</p><![endif]--><p>t</p>') == p_t
    assert tokenize('<!-- never closed <p>t</p>') == []
    assert tokenize('a\x00b<p>t</p>') == [(TEXT, "a\x00b")] + p_t
    assert tokenize('<p>t</p><') == p_t + [(TEXT, "<")]
    assert tokenize('a < b<p>t</p>') == [(TEXT, "a "), (TEXT, "< b")] + p_t


def test_entity_edge_conformance():
    """WHATWG numeric-reference edge cases (lone surrogate, beyond
    U+10FFFF, NUL, absurd magnitude → U+FFFD), legacy no-semicolon
    decoding in text mode, longest-match on the named table, and the
    prefix-overlap family."""
    from readabilitysax_spark.core.tokenizer import tokenize

    def text(html):
        return "".join(e[1] for e in tokenize(html))

    for ref in ("&#xD800;", "&#x110000;", "&#0;", "&#xFFFFFFFFFF;"):
        assert text(f"a{ref}b") == "a�b", ref
    assert text("a&ampb") == "a&b"            # legacy, text mode
    assert text("a&amp=b") == "a&=b"          # '=' guard is attr-only
    assert text("a&CounterClockwiseContourIntegral;b") == "a∳b"
    assert text("a&notin;b &notit;") == "a∉b \xacit;"


def test_attribute_entity_guard_conformance():
    """Attribute mode inverts the legacy rule: a no-semicolon entity
    followed by [0-9a-zA-Z=] must NOT decode (WHATWG attr guard —
    protects querystring '&amp=' / '&ampb=' params), while the
    semicolon form always decodes."""
    from readabilitysax_spark.core.tokenizer import tokenize

    def attr(html):
        return next(e[2] for e in tokenize(html) if e[0] == 1)

    assert attr('<a href="/x?a&ampb=1">t</a>') == "/x?a&ampb=1"
    assert attr('<a href="/x?a&amp=1">t</a>') == "/x?a&amp=1"
    assert attr('<a href="/x?a&amp;b=1">t</a>') == "/x?a&b=1"
    assert attr('<a title="&notit;">t</a>') == "&notit;"
