"""Minimal PDF text/layout extraction (north rule: 'PDF/layout
parse') — pure stdlib, no external PDF libraries.

Handles the common machine-generated-PDF subset:
- object scan (no xref needed), stream extraction
- FlateDecode via zlib (the dominant filter)
- text shown with Tj / TJ / ' operators in literal `(...)` strings
  (escapes + octal) and hex `<...>` strings
- BT/ET text blocks, Td/TD/T* line positioning -> newline heuristics
- page count, /Title metadata

Out of scope (returns what it can + flags): CID/Type0 composite
fonts with binary ToUnicode maps, encrypted PDFs, LZW/JBIG2 images.
This is the honest pure-Python subset; on a cluster with pdfium/
poppler available, swap `extract_pdf` for the library call — the
Spark plumbing (pdfops.py) is unchanged.
"""

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s/])")
_TITLE_RE = re.compile(rb"/Title\s*\((.*?)(?<!\\)\)", re.S)
_FLATE_RE = re.compile(rb"/(?:Filter\s*/FlateDecode|"
                       rb"Filter\s*\[\s*/FlateDecode\s*\])")

# text-showing operators inside content streams
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')"
                    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"
                    rb"|<[0-9A-Fa-f\s]*>\s*Tj"
                    rb"|T\*|TD|Td|ET")
_LIT_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(raw: bytes) -> bytes:
    """PDF literal string body (between parens) -> bytes."""
    out = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(bytes([int(raw[i + 1:j], 8) & 0xFF]))
                i = j
                continue
            i += 2
            continue
        out.append(c)
        i += 1
    return b"".join(out)


def _stream_text(content: bytes) -> str:
    """Extract shown text from one content stream."""
    parts = []
    for m in _TJ_RE.finditer(content):
        tok = m.group(0)
        if tok in (b"T*", b"TD", b"Td", b"ET"):
            if parts and parts[-1] != "\n":
                parts.append("\n")
            continue
        if tok.endswith(b"TJ"):
            for lit in _LIT_RE.finditer(tok):
                parts.append(_decode(_unescape_literal(
                    lit.group(0)[1:-1])))
            continue
        if tok.startswith(b"<"):
            hx = _HEX_RE.match(tok)
            if hx:
                h = re.sub(rb"\s", b"", hx.group(1))
                if len(h) % 2:
                    h += b"0"
                parts.append(_decode(bytes.fromhex(h.decode("ascii"))))
            continue
        lit = _LIT_RE.match(tok)
        if lit:
            parts.append(_decode(_unescape_literal(lit.group(0)[1:-1])))
    text = "".join(parts)
    return re.sub(r"\n{2,}", "\n", text).strip("\n")


def _decode(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        try:
            return b[2:].decode("utf-16-be", "replace")
        except Exception:       # noqa: BLE001
            pass
    return b.decode("latin-1")


def extract_pdf(data: bytes):
    """Returns dict(n_pages, text, title, n_objects, flags:list)."""
    flags = []
    if not data.startswith(b"%PDF-"):
        return {"n_pages": 0, "text": None, "title": None,
                "n_objects": 0, "flags": ["not_pdf"]}
    if b"/Encrypt" in data[:4096] or b"/Encrypt" in data[-4096:]:
        flags.append("encrypted")
    texts = []
    n_objects = 0
    n_pages = len(_PAGE_RE.findall(data))
    for m in _OBJ_RE.finditer(data):
        n_objects += 1
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if sm is None:
            continue
        raw = sm.group(1)
        if _FLATE_RE.search(body):
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                # streams are sometimes padded; try trimming EOL
                try:
                    raw = zlib.decompress(raw.rstrip(b"\r\n"))
                except zlib.error:
                    flags.append("bad_flate")
                    continue
        elif b"/Filter" in body:
            flags.append("unsupported_filter")
            continue
        if b"BT" in raw and b"ET" in raw:
            t = _stream_text(raw)
            if t:
                texts.append(t)
    title = None
    tm = _TITLE_RE.search(data)
    if tm:
        title = _decode(_unescape_literal(tm.group(1)))
    return {"n_pages": n_pages, "text": "\n".join(texts) or None,
            "title": title, "n_objects": n_objects,
            "flags": sorted(set(flags))}


def make_simple_pdf(lines, title="doc", compress=False) -> bytes:
    """Deterministic tiny single-page PDF generator (test fixture —
    also exercises the Flate path)."""
    content = b"BT /F1 12 Tf 72 720 Td " + b" T* ".join(
        b"(" + ln.encode("latin-1")
        .replace(b"\\", b"\\\\").replace(b"(", b"\\(")
        .replace(b")", b"\\)") + b") Tj" for ln in lines) + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        (b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
         b">> endobj"),
        (b"4 0 obj << " + filt + b"/Length " +
         str(len(content)).encode() + b" >>\nstream\n" + content +
         b"\nendstream endobj"),
        (b"5 0 obj << /Title (" + title.encode("latin-1") +
         b") >> endobj"),
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF\n"
