"""Character classification.

Mirrors the semantics of the reference's character-class map
(/root/reference/charmap.c:49-114, /root/reference/dtd.h:40-52) and its
wide-char extension (/root/reference/parser.c:237-268).

Classes are represented as bitmasks over a 256-entry table for chars
<= 0xff; characters above 0xff use Unicode-based predicates mirroring
the reference's xml_unicode tables (approximated with str methods —
exact XML-1.0 ranges only matter for exotic codepoints).
"""

CH_WHITE = 0x01     # space, tab
CH_LETTER = 0x02    # a-z A-Z  (reference: CH_LCLETTER)
CH_DIGIT = 0x04
CH_CNM = 0x08       # name continuation: . - #xB7
CH_CNMSTRT = 0x10   # name-start extras: : _ latin accents
CH_RE = 0x40        # '\r' (record end)
CH_RS = 0x80        # '\n' (record start)

CH_NAME = CH_LETTER | CH_DIGIT | CH_CNM | CH_CNMSTRT
CH_NMSTART = CH_LETTER | CH_CNMSTRT
CH_BLANK = CH_WHITE | CH_RE | CH_RS

_CLASS = [0] * 256


def _rng(a, b, m):
    for i in range(a, b + 1):
        _CLASS[i] |= m


_rng(ord('a'), ord('z'), CH_LETTER)
_rng(ord('A'), ord('Z'), CH_LETTER)
_rng(ord('0'), ord('9'), CH_DIGIT)
_CLASS[ord('.')] |= CH_CNM
_CLASS[ord('-')] |= CH_CNM
_CLASS[183] |= CH_CNM
_CLASS[ord(':')] |= CH_CNMSTRT
_CLASS[ord('_')] |= CH_CNMSTRT
_rng(192, 214, CH_CNMSTRT)
_rng(216, 246, CH_CNMSTRT)
_rng(248, 255, CH_CNMSTRT)
_CLASS[ord('\t')] |= CH_WHITE
_CLASS[ord(' ')] |= CH_WHITE
_CLASS[ord('\r')] |= CH_RE
_CLASS[ord('\n')] |= CH_RS

CLASS = tuple(_CLASS)


def has_class(ch: str, mask: int) -> bool:
    """HasClass analog (reference parser.c:236-268).  Wide chars use
    the exact generated XML-1.0 tables (xml_unicode.c:43-1259 via
    core/xml_ranges.py), matching the reference branch for branch."""
    cp = ord(ch)
    if cp <= 0xFF:
        return bool(CLASS[cp] & mask)
    from . import xml_ranges as X
    if mask == CH_NAME:
        return (X.is_basechar(cp) or X.is_digit(cp) or
                X.is_ideographic(cp) or X.is_combining(cp) or
                X.is_extender(cp))
    if mask == CH_NMSTART:
        return X.is_basechar(cp) or X.is_ideographic(cp)
    if mask == CH_WHITE:
        return False
    if mask == CH_BLANK:
        return ch.isspace()
    if mask == CH_DIGIT:
        return X.is_digit(cp)
    return False


# Fast membership sets for the ASCII/latin-1 range plus a dynamic check.
NAME_CHARS = frozenset(
    chr(i) for i in range(256) if CLASS[i] & CH_NAME
)
NMSTART_CHARS = frozenset(
    chr(i) for i in range(256) if CLASS[i] & CH_NMSTART
)
BLANK_CHARS = frozenset(
    chr(i) for i in range(256) if CLASS[i] & CH_BLANK
)
WHITE_CHARS = frozenset((' ', '\t'))
DIGIT_CHARS = frozenset('0123456789')


def is_name_char(ch: str) -> bool:
    if ch in NAME_CHARS:
        return True
    cp = ord(ch)
    if cp > 0xFF:
        from . import xml_ranges as X
        return (X.is_basechar(cp) or X.is_digit(cp) or
                X.is_ideographic(cp) or X.is_combining(cp) or
                X.is_extender(cp))
    return False


def is_nmstart_char(ch: str) -> bool:
    if ch in NMSTART_CHARS:
        return True
    cp = ord(ch)
    if cp > 0xFF:
        from . import xml_ranges as X
        return X.is_basechar(cp) or X.is_ideographic(cp)
    return False


def is_blank_char(ch: str) -> bool:
    if ch in BLANK_CHARS:
        return True
    if ord(ch) > 0xFF:
        return ch.isspace()
    return False
