"""Element tree node — semantics of /root/reference/lib/element.ts.

Implementation notes for byte-identical parity:

* ``add_info`` accumulates per-string-child ``trim().length`` with JS
  trim/length semantics (lib/element.ts:70-104); tag counts are
  recursive totals (child totals merged, then the child itself).
* ``get_top_candidate`` lazily adds tag base scores and writes
  ``total_score`` only to running winners (lib/element.ts:144-174, Q9).
* ``get_formatted_text`` collapses whitespace per text node and appends
  a newline after h1-h6/br/li/p (lib/element.ts:129-138).
* Scores are IEEE doubles in JS; Python floats match exactly
  (grandparent propagation adds ``addScore / 2``).
"""

from __future__ import annotations

import math

from .jsstr import RE_COMMAS, RE_WHITESPACE, js_len, js_trim

HEADER_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
_NEWLINES_AFTER = frozenset((*HEADER_TAGS, "br", "li", "p"))
_SELF_CLOSING = frozenset(("br", "hr"))

TAG_SCORES = {
    "address": -3, "article": 30, "blockquote": 3, "body": -5, "dd": -3,
    "div": 5, "dl": -3, "dt": -3, "form": -3, "h2": -5, "h3": -5,
    "h4": -5, "h5": -5, "h6": -5, "li": -3, "ol": -3, "pre": 3,
    "section": 15, "td": 3, "th": -5, "ul": -3,
}


class Element:
    __slots__ = (
        "name", "parent", "attributes", "children", "tag_score",
        "attribute_score", "total_score", "element_data", "info_text_length",
        "info_link_length", "info_commas", "info_density", "info_tag_count",
        "is_candidate",
    )

    def __init__(self, tag_name: str, parent: "Element | None" = None) -> None:
        self.name = tag_name
        self.parent = parent
        self.attributes: dict[str, str] = {}
        self.children: list[Element | str] = []
        self.tag_score = 0.0
        self.attribute_score = 0.0
        self.total_score = 0.0
        self.element_data = ""
        self.info_text_length = 0
        self.info_link_length = 0
        self.info_commas = 0
        self.info_density = 0.0
        self.info_tag_count: dict[str, int] = {}
        self.is_candidate = False

    def add_info(self) -> None:
        text_length = self.info_text_length
        link_length = self.info_link_length
        commas = self.info_commas
        tag_count = self.info_tag_count
        for child in self.children:
            if type(child) is str:
                text_length += js_len(js_trim(child))
                # reCommas.test + split-count (lib/element.ts:75-78)
                if "," in child:
                    commas += len(RE_COMMAS.findall(child))
                continue
            if child.name == "a":
                link_length += child.info_text_length + child.info_link_length
            else:
                text_length += child.info_text_length
                link_length += child.info_link_length
            commas += child.info_commas
            for tag, count in child.info_tag_count.items():
                tag_count[tag] = tag_count.get(tag, 0) + count
            tag_count[child.name] = tag_count.get(child.name, 0) + 1

        self.info_text_length = text_length
        self.info_link_length = link_length
        self.info_commas = commas
        if link_length > 0:
            self.info_density = link_length / (text_length + link_length)

    def get_outer_html(self) -> str:
        parts = ["<", self.name]
        for name, value in self.attributes.items():
            parts.append(f' {name}="{value}"')
        if not self.children:
            if self.name in _SELF_CLOSING:
                parts.append("/>")
            else:
                parts.append(f"></{self.name}>")
            return "".join(parts)
        parts.append(">")
        parts.append(self.get_inner_html())
        parts.append(f"</{self.name}>")
        return "".join(parts)

    def get_inner_html(self) -> str:
        return "".join(
            child if type(child) is str else child.get_outer_html()
            for child in self.children
        )

    def get_formatted_text(self) -> str:
        out: list[str] = []
        for child in self.children:
            if type(child) is str:
                out.append(RE_WHITESPACE.sub(" ", child))
            else:
                out.append(child.get_formatted_text())
                if child.name in _NEWLINES_AFTER:
                    out.append("\n")
        return "".join(out)

    def to_string(self) -> str:
        """Array.prototype.join("") over children (Element → recursive)."""
        return "".join(
            child if type(child) is str else child.to_string()
            for child in self.children
        )

    def get_top_candidate(self) -> "Element | None":
        top_score = -math.inf
        top_candidate: Element | None = None
        for child in self.children:
            if type(child) is str:
                continue
            if child.is_candidate:
                # lazily add tag-name base points (Q9: only on visit)
                child.tag_score += TAG_SCORES.get(child.name, 0)
                score = math.floor(
                    (child.tag_score + child.attribute_score)
                    * (1 - child.info_density)
                )
                if top_score < score:
                    child.total_score = score
                    top_score = score
                    top_candidate = child
            child_candidate = child.get_top_candidate()
            if child_candidate is not None and top_score < child_candidate.total_score:
                top_score = child_candidate.total_score
                top_candidate = child_candidate
        return top_candidate
