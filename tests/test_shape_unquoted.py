"""Differential tests for r7's C shape-scanner extensions:

1. UNQUOTED attribute values (reference itake_unquoted,
   parser.c:1163-1198): name-token values replay gripe-free;
   non-name-token values (real-crawl <a href=/path>) replay WITH the
   per-occurrence "Attribute value requires quotes" warning emitted
   by the C commit site (emit_rq_gripes).
2. GUARDED shapes: tags carrying implicit attrs on a shared DTD
   (unknown/framework attrs) replay only while the attr exists on
   the element this parse — first occurrence takes the full path
   (cold no_attribute gripe + creation), later occurrences ride C.

With parser._CSPEED nulled the pure Python executor is the oracle;
DOM JSON, node rows incl. spans, error lists and final location must
be byte-identical on every input.
"""

import random

import pytest

import packages_sgml_spark.core.parser as P
from packages_sgml_spark.core.parser import (
    NodeTableParser, ParserOptions, SGMLParser, TextOnlyParser)

from test_tape_mode import _diff_dom, _run_dom  # noqa: F401

P._load_cspeed()

pytestmark = pytest.mark.skipif(
    P._CSPEED is None, reason="compiled executor unavailable")


def _mk_unquoted_doc(i, n_links=40, url_style=True):
    """Unique-per-occurrence unquoted attr values."""
    parts = ["<html><head><title>t%d</title></head><body>" % i]
    for j in range(n_links):
        if url_style:
            # '/' and '?' are not name chars -> requires-quotes
            # warning per occurrence
            parts.append('<p class=para%d_%d>text <a href=/r/%d-%d?x=1>'
                         'l</a></p>' % (i, j, i, j))
        else:
            # pure name-token values: gripe-free
            parts.append('<p class=para%d_%d>text <a href=ref-%d-%d>'
                         'l</a></p>' % (i, j, i, j))
    parts.append("</body></html>")
    return "".join(parts).encode()


def test_unquoted_nametoken_differential():
    docs = [_mk_unquoted_doc(i, url_style=False) for i in range(30)]
    _diff_dom(docs)


def test_unquoted_url_gripes_differential():
    """Every unquoted URL value gripes; C must emit the identical
    warning (message text incl. str_summary truncation, line)."""
    docs = [_mk_unquoted_doc(i, url_style=True) for i in range(30)]
    _diff_dom(docs)


def test_unquoted_long_value_summary():
    """str_summary truncation boundary: 24/25/26/60-char values."""
    vals = ["/" + "a" * k for k in (23, 24, 25, 40, 59)]
    doc = ("<html><body>" +
           "".join('<a href=%s>x</a>' % v for v in vals) +
           "</body></html>").encode()
    # warm the shape with a second doc so C replays (first doc may
    # register via the full path); compare doc 2's output
    _diff_dom([doc, doc])


def test_unquoted_mixed_quoted_same_shape():
    docs = []
    for i in range(10):
        docs.append(('<html><body><a href="/q/%d">q</a>'
                     '<a href=/u/%d>u</a><a href=nametok%d>n</a>'
                     '</body></html>' % (i, i, i)).encode())
    _diff_dom(docs)


def test_unknown_attr_guarded_shape_differential():
    """Framework-style unknown attrs (griped implicit): cold gripe
    once per document, later occurrences guard-checked in C."""
    docs = []
    for i in range(20):
        parts = ["<html><body>"]
        for j in range(30):
            parts.append('<span ng-bind="v%d_%d">s</span>' % (i, j))
            parts.append('<div v-if=c%d_%d>d</div>' % (i, j))
        parts.append("</body></html>")
        docs.append("".join(parts).encode())
    _diff_dom(docs)


def test_unknown_attr_repeat_parse_deterministic():
    """Guarded shapes + DtdCow: repeated parses of the same doc give
    identical rows AND identical error lists (cold gripes re-fire)."""
    doc = _mk_unquoted_doc(7)
    doc = doc.replace(b"<p class=", b"<p data-x=1 ng-y=2 class=")
    outs = []
    for _ in range(3):
        p = NodeTableParser(ParserOptions(dialect="html5",
                                          max_errors=-1))
        p.parse(doc)
        outs.append((p.rows, [(e.severity, e.line, e.message)
                              for e in p.errors]))
    assert outs[0] == outs[1] == outs[2]
    ngripes = sum(1 for sev, _l, m in outs[0][1]
                  if "has no attribute" in m)
    # ng-y gripes once per document (cold creation), not per tag
    assert ngripes == 1


def test_unquoted_quiet_parser_no_errors():
    doc = _mk_unquoted_doc(3)
    p = TextOnlyParser(ParserOptions(dialect="html5", quiet=True,
                                     max_errors=-1))
    p.parse(doc)
    assert p.errors == []


def test_unquoted_xml_dialect_still_gripes():
    """XML: unquoted values gripe at tokenization; the shape scanner
    must bail (C on/off identical error lists)."""
    docs = [("<r><item k=v%d>t</item><item k2=/u/%d>s</item></r>"
             % (i, i)).encode() for i in range(10)]
    _diff_dom(docs, dialect="xml")


def test_unquoted_feed_chunk_invariance():
    doc = _mk_unquoted_doc(11)
    whole = _run_dom([doc])[0]
    for size in (7, 64, 997):
        p = SGMLParser(ParserOptions(dialect="html5", max_errors=-1))
        for k in range(0, len(doc), size):
            p.feed(doc[k:k + size])
        p.close()
        from packages_sgml_spark.core.dom import (
            dom_to_json, extract_text, flatten_nodes)
        got = (extract_text(p.dom), dom_to_json(p.dom),
               flatten_nodes(p.dom, p.elem_spans, p.data_spans),
               [(e.severity, e.line, e.message) for e in p.errors],
               p.line, p.linepos, p.charpos, len(p.environments))
        assert got == whole, size


def test_unquoted_soup_fuzz():
    """Randomized unquoted/quoted/unknown-attr soup differential."""
    rng = random.Random(20260817)
    attrs = ["href", "class", "id", "data-k", "ng-model", "align",
             "src", "role"]
    vals = ["nametok", "x1", "/u/p?q=1", "a-b_c:d", "100%", "..",
            "a=b", "x&y", "/very/long/path/segment/that/keeps/going"]
    docs = []
    for i in range(60):
        parts = ["<html><body>"]
        for j in range(rng.randint(5, 25)):
            tag = rng.choice(["a", "p", "span", "div", "img"])
            n = rng.randint(1, 3)
            alist = []
            for _ in range(n):
                a = rng.choice(attrs)
                v = rng.choice(vals) + str(i * 100 + j)
                if rng.random() < 0.5:
                    alist.append('%s=%s' % (a, v))
                else:
                    alist.append('%s="%s"' % (a, v))
            parts.append("<%s %s>t</%s>" % (tag, " ".join(alist),
                                            "a" if tag == "img" else tag))
        parts.append("</body></html>")
        docs.append("".join(parts).encode())
    _diff_dom(docs)
