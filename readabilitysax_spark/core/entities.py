"""HTML5 character-reference decoding, matching the `entities` v7 decoder
used by htmlparser2 v10 (the tokenizer the reference engine is driven by;
see /root/reference/package-lock.json and SURVEY.md §3.5).

Two decode modes:

* **Legacy** (text content): named refs decode with or without a trailing
  semicolon (no-semicolon only for the HTML5 legacy set); numeric refs
  decode without requiring a semicolon.
* **Attribute**: identical, except a no-semicolon *named* match is rejected
  when the next character is ``=`` or alphanumeric.

Uses Python's `html.entities.html5` table, which is exactly the WHATWG
table (keys with ``;`` for all names, keys without ``;`` for the legacy
subset) — the same data the `entities` package compiles into its trie.
"""

from __future__ import annotations

from html.entities import html5 as _HTML5

_MAX_NAME_LEN = max(len(k) for k in _HTML5)  # 32 ("CounterClockwiseContourIntegral;")

# Windows-1252 / C1 remapping per WHATWG + entities/src/decode-codepoint.ts
_CODEPOINT_MAP = {
    0: 0xFFFD,
    128: 8364, 130: 8218, 131: 402, 132: 8222, 133: 8230, 134: 8224,
    135: 8225, 136: 710, 137: 8240, 138: 352, 139: 8249, 140: 338,
    142: 381, 145: 8216, 146: 8217, 147: 8220, 148: 8221, 149: 8226,
    150: 8211, 151: 8212, 152: 732, 153: 8482, 154: 353, 155: 8250,
    156: 339, 158: 382, 159: 376,
}

_HEX_DIGITS = set("0123456789abcdefABCDEF")
_DEC_DIGITS = set("0123456789")
_ALNUM_EQ = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789="
)
# Fast-fail guards for NON-references (the overwhelming case in code-
# heavy pages full of bare '&', '&&'): every WHATWG name starts with an
# ASCII letter and no name is shorter than 2 chars, so a non-letter or
# an invalid 2-char prefix can never match — checked before the
# longest-match loop. Pure rejection filters: accepted inputs take the
# identical path as before, so decode semantics are unchanged.
_NAME_FIRST = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_NAME_PREFIX2 = {k[:2] for k in _HTML5}


def _replace_codepoint(cp: int) -> str:
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return "�"
    return chr(_CODEPOINT_MAP.get(cp, cp))


def decode_entity(s: str, pos: int, in_attribute: bool) -> tuple[str, int] | None:
    """Try to decode a character reference at ``s[pos] == '&'``.

    Returns ``(decoded_text, end_pos)`` (end_pos = index just past the
    consumed reference) or ``None`` if no reference decodes here (the
    ``&`` stays literal text). ``pos`` may be at end-of-chunk context:
    a chunk boundary behaves like the terminating invalid character /
    end-of-input, which legacy mode accepts.
    """
    n = len(s)
    i = pos + 1
    if i >= n:
        return None
    c = s[i]
    if c == "#":
        # numeric reference
        i += 1
        is_hex = i < n and s[i] in ("x", "X")
        if is_hex:
            i += 1
        digits = _HEX_DIGITS if is_hex else _DEC_DIGITS
        start = i
        while i < n and s[i] in digits:
            i += 1
        if i == start:
            return None  # "&#" / "&#x" with no digits: literal
        cp = int(s[start:i], 16 if is_hex else 10)
        if i < n and s[i] == ";":
            i += 1
        return _replace_codepoint(cp), i

    # named reference: longest match against the WHATWG table.
    if c not in _NAME_FIRST or s[i:i + 2] not in _NAME_PREFIX2:
        return None  # cannot start any name — bare '&', '&&', '& '
    # Every with-semicolon key ends at its ';', so the first ';' in the
    # window is the only possible with-semicolon match — try it first
    # (one dict hit for the overwhelmingly common case), then fall back
    # to legacy (no-semicolon) prefixes, which must be shorter than it.
    semi = s.find(";", i, i + _MAX_NAME_LEN)
    if semi != -1:
        key = s[i : semi + 1]
        if key in _HTML5:
            return _HTML5[key], semi + 1
        limit = min(semi - i, _MAX_NAME_LEN)
    else:
        limit = min(n - i, _MAX_NAME_LEN)
    chunk = s[i : i + limit]
    for ln in range(len(chunk), 0, -1):
        key = chunk[:ln]
        if key in _HTML5:
            if key.endswith(";"):
                return _HTML5[key], i + ln
            # legacy (no-semicolon) name
            if in_attribute:
                nxt = s[i + ln] if i + ln < n else ""
                if nxt in _ALNUM_EQ:
                    return None  # attribute rule: &name followed by [=a-z0-9]
            return _HTML5[key], i + ln
    return None


def decode_attribute_value(s: str) -> str:
    """Decode all character references in an attribute value (attribute mode)."""
    amp = s.find("&")
    if amp < 0:
        return s
    out: list[str] = []
    start = 0
    n = len(s)
    while 0 <= amp < n:
        result = decode_entity(s, amp, True)
        if result is None:
            amp = s.find("&", amp + 1)
            continue
        decoded, end = result
        out.append(s[start:amp])
        out.append(decoded)
        start = end
        amp = s.find("&", start)
    out.append(s[start:])
    return "".join(out)


def split_text_entities(s: str) -> list[str]:
    """Split a text section into the ontext chunks htmlparser2 emits.

    The tokenizer fires a separate ``ontext`` for the text before each
    decoded entity and one for the decoded entity itself (Parser.
    ontextentity). Failed references stay inside the surrounding chunk.
    The reference engine's per-chunk `trim().length` accounting
    (lib/element.ts:74) makes this chunking part of the byte-identical
    contract.
    """
    amp = s.find("&")
    if amp < 0:
        return [s] if s else []
    out: list[str] = []
    start = 0
    n = len(s)
    while 0 <= amp < n:
        result = decode_entity(s, amp, False)
        if result is None:
            amp = s.find("&", amp + 1)
            continue
        decoded, end = result
        if amp > start:
            out.append(s[start:amp])
        out.append(decoded)
        start = end
        amp = s.find("&", start)
    if start < n:
        out.append(s[start:])
    return out
