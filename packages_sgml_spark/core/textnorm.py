"""Deterministic text normalization for crawl corpora: mojibake
repair (UTF-8 bytes mis-decoded as Latin-1/Windows-1252, the single
most common crawl encoding defect) and Unicode NFC.

The repair is the ftfy-style round-trip reduced to a deterministic
rule: if the text carries mojibake markers, re-encode it through the
8-bit codec it was mis-decoded with and re-decode as UTF-8; accept
the result only when it strictly reduces the marker count.  Up to
``MAX_PASSES`` rounds unwind doubly-encoded text.  No models, no
guessing beyond the marker census — the same input always yields the
same output, so the pass is safe to re-run (idempotent once clean).

Markers (never legitimate in extracted prose at any frequency):
- C1 control chars U+0080-U+009F (the Windows-1252 gap rendered by a
  Latin-1 mis-decode),
- ``Ã``/``Â`` followed by another char (the Latin-1 rendering of a
  UTF-8 lead byte 0xC3/0xC2),
- ``â€`` + char (the Windows-1252 rendering of the UTF-8 lead of the
  General Punctuation block: curly quotes, dashes, ellipsis).
"""

import re
import unicodedata

MAX_PASSES = 3

_MARKERS = re.compile("[\u0080-\u009f]|\u00c3.|\u00c2.|\u00e2\u20ac.",
                      re.DOTALL)


def mojibake_markers(s):
    """Count of mojibake marker occurrences in ``s``."""
    return len(_MARKERS.findall(s))


def _reencode(s):
    """Bytes ``s`` came from if it was a Latin-1/CP1252 mis-decode,
    else None.  Latin-1 first (exact inverse when it applies);
    CP1252 second (handles €/™/curly-quote markers Latin-1 lacks)."""
    try:
        return s.encode("latin-1")
    except UnicodeEncodeError:
        try:
            return s.encode("windows-1252")
        except UnicodeEncodeError:
            return None


def fix_mojibake(s):
    """Repair mis-decoded UTF-8; returns (fixed_text, n_passes)."""
    n = 0
    markers = mojibake_markers(s)
    while markers and n < MAX_PASSES:
        b = _reencode(s)
        if b is None:
            break
        try:
            s2 = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        m2 = mojibake_markers(s2)
        if m2 >= markers:
            break
        s, markers, n = s2, m2, n + 1
    return s, n


def normalize_text(s, nfc=True):
    """Full pass: mojibake repair then NFC.  Returns
    (text_fixed, n_passes, changed)."""
    fixed, n = fix_mojibake(s)
    if nfc:
        fixed = unicodedata.normalize("NFC", fixed)
    return fixed, n, int(fixed != s)
