"""Randomized bulk-vs-PURE_FSM differential sweep (r7 methodology).

Compares three execution shapes on identical documents:
  1. compiled executor + bulk branches  (production)
  2. PURE char-at-a-time FSM            (the reference's own shape)
  3. chunked feed() (chunk 3 and 7)     (boundary invariance)

The FSM arm is the semantic oracle for the bulk collapses themselves:
C-vs-Python differentials CANNOT see a collapse bug because both arms
share the collapse code (r7 found four reference-divergences this
way; see NOTES-ROUND7 §11).  Run after ANY change to
process_chars_toplevel's bulk branches or their regexes.

Usage: python3 -m tools.fsm_sweep [n_docs_per_cell]   (default 150)
Exit code 1 on any divergence, with a doc dump.  A compact seeded
subset runs in CI (tests/test_fast_pcdata.py); this is the wide one.
"""
import random
import sys

sys.path.insert(0, ".")
import packages_sgml_spark.core.parser as P                 # noqa: E402
from packages_sgml_spark.core.parser import (               # noqa: E402
    ParserOptions, SGMLParser, TextOnlyParser, NodeTableParser)

DECLISH = ["<!DOCTYPE html>", "<!DOCTYPE doc [<!ELEMENT doc - - ANY>]>",
           "<![CDATA[a<b&c]]>", "<![INCLUDE[x]]>", "<![IGNORE[y]]>",
           "<!-- -- -->", "<!-- a -- b -->", "<!>", "<!x>",
           "<?pi a>b?>", "<?xml version='1.0'?>", "<?>",
           "<!ENTITY % p 'v'>", "<![ %p; [z]]>", "<!></p>", "<!e a/b>",
           "<!--\xc3-->", "<!-\xff>"]
MB = ["caf\xe9", "€", "中文", "\xa0", "\xff", "\x80",
      "caf\xc3\xa9", "\xc3", "\xe2\x82", "\xe2\x82\xac", "\xed\xa0\x80"]
WORDS = ["alpha", " ", "\n", "x&y", "a<b", "]]>", "&amp;", "&#65;",
         "&amp", "line\r\nbreak", "line\rcr", '<a href="&amp;x">',
         '<b t="&#66;">', '<a q"s>t">', "<a ='>'>",
         "<style>\r\nz</style>", "</p/", "<p/x/", '<a t="a\r\nb">',
         '<a t="a&#13;b">', '<p xml:space="preserve">', "<p a = >",
         "&#xD800;", "&#999999999;"]
TAGS = ["p", "b", "a", "ul", "li", "title", "script", "style", "pre",
        "nosuchtag"]


def soup(rng, n=40):
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.3:
            parts.append(rng.choice(WORDS))
        elif r < 0.45:
            parts.append(rng.choice(DECLISH))
        elif r < 0.6:
            parts.append(rng.choice(MB))
        elif r < 0.8:
            parts.append("<%s>" % rng.choice(TAGS))
        else:
            parts.append("</%s>" % rng.choice(TAGS))
    return "".join(parts)


def run(cls, d, dialect, enc, chunk=None):
    p = cls(ParserOptions(dialect=dialect, encoding=enc))
    if chunk:
        for k in range(0, len(d), chunk):
            p.feed(d[k:k + chunk])
        p.close()
    else:
        p.parse(d)
    if hasattr(p, "rows"):
        # row POSITIONS are compared only among production modes:
        # implied opens after blank-prefixed cdata are stamped at
        # span start by all production executors (canonical r5
        # convention, shared with the compiled tape) but at the
        # trigger char by per-char execution — a documented
        # metadata-granularity difference.  Text/structure/attrs/
        # errors stay strict in every arm.
        out = [{k: v for k, v in r.items()
                if k not in ("start_pos", "end_pos")}
               for r in p.rows]
    elif hasattr(p, "text"):
        out = p.text()
    else:
        out = repr(p.dom)
    return out, [(e.severity, e.line, e.message) for e in p.errors]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    rng = random.Random(20260817)
    bad = 0
    cells = 0
    for enc in (None, "utf-8"):
        for dialect in ("html5", "html", "sgml", "xml", "xhtml5",
                        "xmlns"):
            docs = [soup(rng) for _ in range(n)]
            for cls in (TextOnlyParser, SGMLParser, NodeTableParser):
                cells += 1
                for i, d in enumerate(docs):
                    P.PURE_FSM = False
                    a = run(cls, d, dialect, enc)
                    c7 = run(cls, d, dialect, enc, chunk=7)
                    P.PURE_FSM = True
                    try:
                        b = run(cls, d, dialect, enc)
                    finally:
                        P.PURE_FSM = False
                    if not (a == b == c7):
                        bad += 1
                        print("DIVERGE enc=%s %s %s #%d" %
                              (enc, dialect, cls.__name__, i))
                        print("  doc:", repr(d))
                        for lbl, v in (("bulk", a), ("FSM", b),
                                       ("chunk7", c7)):
                            print("  %s: %s" % (lbl, str(v)[:300]))
                        if bad > 5:
                            sys.exit(1)
    print("cells=%d docs/cell=%d divergent=%d" % (cells, n, bad))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
