"""Entity machinery: character-entity decoding and the XML builtin
entity set.

Semantics: char_entity_value (/root/reference/parser.c:540-567),
isee_character_entity (parser.c:570-593), XML builtins
(parser.c:1245-1252).  HTML named entities are loaded from DTD entity
files (`<!ENTITY name CDATA "&#NNN;" -- cmt -->` declarations) parsed
with the normal DTD declaration parser; a frozen HTML4 table is bundled
in data/html_entities.py for standalone use.
"""

from typing import Optional, Tuple

from .chars import is_name_char


def safe_chr(v: int) -> str:
    """chr() with out-of-range AND surrogate codepoints clamped to
    U+FFFD.  The reference stores raw wide chars unchecked; Python
    str admits lone surrogates (chr(0xD800) works) but they are not
    Unicode scalar values \u2014 any later UTF-8 encode (Arrow batches,
    parquet sinks) throws, so ONE poison document (a CESU-8-style
    ED-xx-xx byte sequence or a &#xD800; char ref) would fail the
    whole Spark task (r5, found by the garbage-input soak)."""
    if 0 <= v <= 0x10FFFF and not (0xD800 <= v <= 0xDFFF):
        return chr(v)
    return "\ufffd"

XML_ENTITY_DECLS = (
    'lt CDATA "&#60;"',
    'gt CDATA "&#62;"',
    'amp CDATA "&#38;"',
    'apos CDATA "&#39;"',
    'quot CDATA "&#34;"',
)


def char_entity_value(decl: str) -> int:
    """'#NNN' / '#xNN' / '#RS' etc -> codepoint, or -1
    (parser.c:540-567)."""
    if not decl.startswith('#'):
        return -1
    s = decl[1:]
    if s[:1] in ('x', 'X'):
        # wcstoul semantics: parse as much hex as possible
        body = s[1:]
        i = 0
        while i < len(body) and body[i] in '0123456789abcdefABCDEF':
            i += 1
        if i and i == len(body):
            return int(body[:i], 16)
        return -1
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    if i and i == len(s):
        return int(s[:i])
    u = s.upper()
    if u == "RS":
        return 0x0A
    if u == "RE":
        return 0x0D
    if u == "TAB":
        return 0x09
    if u == "SPACE":
        return 0x20
    return -1


def isee_character_entity(text: str, pos: int = 0) -> Optional[Tuple[int, int]]:
    """Match '&#...' optionally ';'-terminated at text[pos:]
    (parser.c:570-593).  Returns (codepoint, end_index) or None."""
    if pos >= len(text) or text[pos] != '&':
        return None
    i = pos + 1
    if i >= len(text) or text[i] != '#':
        return None
    o = [text[i]]
    i += 1
    while i < len(text) and len(o) < 31 and is_name_char(text[i]):
        o.append(text[i])
        i += 1
    if i < len(text) and text[i] == ';':
        i += 1
    v = char_entity_value(''.join(o))
    if v >= 0:
        return (v, i)
    return None
