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

    # All tree walks below are ITERATIVE (explicit stacks): adversarial
    # 50k-deep nesting must never overflow the C stack inside a Spark
    # worker — one such page would kill the whole Arrow batch. Each is
    # a mechanical unrolling of the reference's recursion, preserving
    # visit order and the lazy score mutations exactly.

    def get_outer_html(self) -> str:
        out: list[str] = []
        stack: list[tuple[bool, "Element | str"]] = [(False, self)]
        while stack:
            is_text, item = stack.pop()
            if is_text:
                out.append(item)  # type: ignore[arg-type]
                continue
            el: Element = item  # type: ignore[assignment]
            out.append("<" + el.name)
            for name, value in el.attributes.items():
                out.append(f' {name}="{value}"')
            if not el.children:
                out.append("/>" if el.name in _SELF_CLOSING
                           else f"></{el.name}>")
                continue
            out.append(">")
            stack.append((True, f"</{el.name}>"))
            for child in reversed(el.children):
                stack.append((type(child) is str, child))
        return "".join(out)

    def get_inner_html(self) -> str:
        return "".join(
            child if type(child) is str else child.get_outer_html()
            for child in self.children
        )

    def get_formatted_text(self) -> str:
        out: list[str] = []
        stack = [iter(self.children)]
        tails: list[str | None] = [None]
        while stack:
            child = next(stack[-1], None)
            if child is None:
                stack.pop()
                tail = tails.pop()
                if tail is not None:
                    out.append(tail)
                continue
            if type(child) is str:
                # fast path: an ASCII chunk with no non-space ws and no
                # double space is already collapsed (C-speed scans beat
                # the regex sub, which always allocates)
                if child.isascii() and (
                    "\t" not in child and "\n" not in child
                    and "\r" not in child and "\x0b" not in child
                    and "\x0c" not in child and "  " not in child
                ):
                    out.append(child)
                else:
                    out.append(RE_WHITESPACE.sub(" ", child))
            else:
                stack.append(iter(child.children))
                tails.append("\n" if child.name in _NEWLINES_AFTER else None)
        return "".join(out)

    def to_string(self) -> str:
        """Array.prototype.join("") over children (depth-first text)."""
        out: list[str] = []
        stack = [iter(self.children)]
        while stack:
            child = next(stack[-1], None)
            if child is None:
                stack.pop()
            elif type(child) is str:
                out.append(child)
            else:
                stack.append(iter(child.children))
        return "".join(out)

    def get_top_candidate(self) -> "Element | None":
        """Iterative emulation of lib/element.ts:144-174 (Q9), one stack
        frame per recursive call: per-level local top_score starting at
        -inf, ``total_score`` written only to that level's running
        winners (the sibling-merge step later reads those non-global
        ``total_score`` values, so the local bookkeeping is semantics,
        not an optimization), and the bubbled winner compared strictly.
        """
        # frame = [children_iterator, local_top_score, local_top_candidate]
        stack: list[list] = [[iter(self.children), -math.inf, None]]
        result: Element | None = None
        while stack:
            frame = stack[-1]
            descend: Element | None = None
            for child in frame[0]:
                if type(child) is str:
                    continue
                if child.is_candidate:
                    # lazily add tag-name base points (Q9: only on visit)
                    child.tag_score += TAG_SCORES.get(child.name, 0)
                    score = math.floor(
                        (child.tag_score + child.attribute_score)
                        * (1 - child.info_density)
                    )
                    if frame[1] < score:
                        child.total_score = score
                        frame[1] = score
                        frame[2] = child
                descend = child
                break
            if descend is not None:
                stack.append([iter(descend.children), -math.inf, None])
                continue
            stack.pop()
            result = frame[2]
            if stack and result is not None and stack[-1][1] < result.total_score:
                stack[-1][1] = result.total_score
                stack[-1][2] = result
        return result
