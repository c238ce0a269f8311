"""Single-thread parse-throughput A/B harness (round-7 invariant:
after ANY C-engagement change, A/B the standard corpora).

Corpora (all deterministic, generated in-process):
  html5      — repeating-href tag soup (the headline bench shape)
  uniq       — unique QUOTED hrefs per occurrence (shape-replay path)
  unq        — unique UNQUOTED hrefs (<a href=/ref/i-j>) — r7 new path
  unknown    — unknown-attr soup on the shared html5 DTD (guarded
               shape replay with per-occurrence gripe re-derivation)
  xml        — DTD-less XML (adaptive-disable sanity)
  xhtml5     — xhtml5 dialect
  sitemap    — xmlns sitemap (default-ns node/DOM drain shape)

Usage: python3 -m tools.ab_parse [n_docs]
Prints MB/s per corpus with the C executor on and (optionally, env
AB_PY=1) pure-Python, plus total warning counts (replay must not drop
warnings).
"""
import os
import sys
import time


def make_docs(kind, n):
    docs = []
    scale = int(os.environ.get("AB_SCALE", "12"))  # bench uses 12
    for i in range(n):
        h = (i * 2654435761) % 97
        host = "host%d.example.org" % (i % 1000)
        paras = []
        for j in range(1, ((h % 7) + 1) * scale + 1):
            if kind == "uniq":
                link = '<a href="https://%s/ref/%d-%d">a reference</a>' % (
                    host, i, j)
            elif kind == "unq":
                link = '<a href=/ref/%d-%d>a reference</a>' % (i, j)
            elif kind == "unknown":
                link = ('<a href="https://%s/ref/%d-%d" wibble="w%d" '
                        'framework-attr="f%d">a reference</a>'
                        % (host, i, j, i, j))
            else:
                link = '<a href="https://%s/ref">a reference</a>' % host
            paras.append(
                "<p>Paragraph about topic %d with some &amp; entities, "
                "a <b>bold</b> claim, and a link to %s.%s"
                % (h, link, "" if h % 3 == 0 else "</p>"))
        body = ("".join(paras)
                + "<ul><li>item one<li>item two<li>item %d</ul>" % (h % 13)
                + "<script>var x = 1 < 2 && 3 > 2;</script>"
                + "<!-- trailing comment -->")
        if kind == "xml":
            doc = ("<?xml version='1.0'?><doc><title>Page %d</title>%s"
                   "</doc>" % (i, body
                               .replace("<p>", "<p>").replace("</p>", "</p>")
                               .replace("<ul><li>item one<li>item two"
                                        "<li>item %d</ul>" % (h % 13),
                                        "<ul><li>item one</li><li>item two"
                                        "</li><li>item %d</li></ul>" % (h % 13))
                               .replace("<script>var x = 1 < 2 && 3 > 2;"
                                        "</script>", "")
                               ))
            # close the soup paragraphs for well-formed xml
            doc = doc.replace("claim, and a link to", "claim, and a link to")
            parts = []
            for j in range(1, ((h % 7) + 1) * scale + 1):
                parts.append("<p>Paragraph %d-%d with a <b>bold</b> claim "
                             "and <a href='https://%s/ref/%d-%d'>a link</a>"
                             "</p>" % (i, j, host, i, j))
            doc = ("<?xml version='1.0'?><doc><title>Page %d</title>%s</doc>"
                   % (i, "".join(parts)))
        elif kind == "sitemap":
            urls = "".join(
                "<url><loc>https://%s/p/%d-%d</loc>"
                "<lastmod>2026-01-%02d</lastmod>"
                "<priority>0.%d</priority></url>"
                % (host, i, j, (j % 28) + 1, j % 10)
                for j in range(((h % 7) + 1) * scale))
            doc = ('<?xml version="1.0"?>'
                   '<urlset xmlns="http://www.sitemaps.org/schemas'
                   '/sitemap/0.9">' + urls + "</urlset>")
        else:
            dt = ("<!DOCTYPE html>" if kind != "xhtml5" else
                  "<?xml version='1.0'?><!DOCTYPE html>")
            doc = ("%s<html><head><title>Page %d</title></head>"
                   "<body><h1>Page %d</h1>%s</body></html>"
                   % (dt, i, i, body))
        docs.append(doc.encode("utf-8"))
    return docs


def run(kind, docs):
    from packages_sgml_spark.core import parser as P
    from packages_sgml_spark.core.parser import ParserOptions, TextOnlyParser
    if os.environ.get("AB_PY") == "1":
        P._CSPEED = None
    dialect = {"xml": "xml", "xhtml5": "xhtml5",
               "sitemap": "xmlns"}.get(kind, "html5")
    nbytes = sum(len(d) for d in docs)
    nwarn = 0
    t0 = time.perf_counter()
    for d in docs:
        p = TextOnlyParser(ParserOptions(dialect=dialect,
                                         encoding="utf-8"))
        p.parse(d.decode("utf-8"))
        nwarn += len(p.errors)
    dt = time.perf_counter() - t0
    return nbytes / dt / 1e6, nwarn


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    kinds = ["html5", "uniq", "unq", "unknown", "xml", "xhtml5",
             "sitemap"]
    print("n_docs=%d  AB_PY=%s" % (n, os.environ.get("AB_PY", "0")))
    for kind in kinds:
        docs = make_docs(kind, n)
        mbs, nwarn = run(kind, docs)
        print("%-8s %8.1f MB/s   warnings=%d" % (kind, mbs, nwarn))


if __name__ == "__main__":
    main()
