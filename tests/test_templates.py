"""Site-template mining + strip (spark/templates.py).

Planted-truth corpus: every page of a host shares a verbatim nav
header and footer; the article body is unique per page.  The miner
must find the shared subtrees (share 1.0) and the strip pass must
remove exactly their text while leaving articles byte-intact."""

import pytest

from packages_sgml_spark.core.parser import NodeTableParser, ParserOptions
from packages_sgml_spark.spark.templates import (
    _doc_fingerprints, collect_template_keys, extract_text_without_templates,
    node_fingerprints, template_candidates, with_host)

NAV = ('<div class="nav"><ul><li><a href="/">Home</a>'
       '<li><a href="/about">About</a><li><a href="/faq">FAQ</a>'
       '</ul></div>')
FOOTER = ('<div class="footer"><p>© 2026 Example Corp. '
          '<a href="/tos">Terms</a> <a href="/privacy">Privacy</a>'
          '</p></div>')


def _page(host, i, nav=NAV, footer=FOOTER):
    article = ("<h1>Article %d on %s</h1>"
               "<p>Unique body text %d-alpha with a "
               "<a href=\"https://%s/ref/%d\">reference link</a>.</p>"
               "<p>Second unique paragraph %d-beta.</p>"
               % (i, host, i, host, i, i))
    html = ("<!DOCTYPE html><html><head><title>P%d</title></head>"
            "<body>%s<div class=\"main\">%s</div>%s</body></html>"
            % (i, nav, article, footer))
    return ("https://%s/p/%d" % (host, i), bytearray(html, "utf-8"))


def _corpus(spark, n_pages=8):
    rows = ([_page("alpha.example.org", i) for i in range(n_pages)] +
            [_page("beta.example.org", i,
                   nav=NAV.replace("FAQ", "Help"),
                   footer=FOOTER.replace("Example", "Beta"))
             for i in range(n_pages)])
    return spark.createDataFrame(rows, "url string, html binary")


def _doc_fps(html):
    p = NodeTableParser(ParserOptions(dialect="html5",
                                      encoding="utf-8", max_errors=-1))
    p.parse(html)
    return p.finish_rows(), _doc_fingerprints(p.finish_rows())


def test_fingerprints_deterministic_and_content_sensitive():
    rows, fps = _doc_fps(_page("h", 1)[1].decode())
    rows2, fps2 = _doc_fps(_page("h", 1)[1].decode())
    assert fps == fps2                      # md5-stable, no hash()
    # a text change flips content_fp but not struct_fp of the
    # containing subtree
    other = _page("h", 1)[1].decode().replace("alpha", "gamma")
    _, fps3 = _doc_fps(other)
    diffs_content = sum(1 for k in fps
                        if fps[k][1] != fps3[k][1])
    diffs_struct = sum(1 for k in fps
                       if fps[k][0] != fps3[k][0])
    assert diffs_content > 0
    assert diffs_struct == 0


def test_template_mining_finds_nav_and_footer(spark):
    pages = _corpus(spark)
    cand = template_candidates(pages, sample_pages_per_host=64,
                               min_pages=4, min_share=0.9)
    rows = cand.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert set(by_host) == {"alpha.example.org", "beta.example.org"}
    for host, rs in by_host.items():
        names = {r["name"] for r in rs}
        assert "div" in names, (host, rs)       # nav and footer divs
        assert all(r["share"] == 1.0 for r in rs)
        # nothing unique leaked in: every candidate repeats on all 8
        assert all(r["n_pages"] == 8 for r in rs)


def test_strip_removes_template_text_keeps_article(spark):
    pages = _corpus(spark)
    cand = template_candidates(pages, sample_pages_per_host=64,
                               min_pages=4, min_share=0.9)
    keys = collect_template_keys(cand)
    out = {r["url"]: r for r in
           extract_text_without_templates(pages, keys).collect()}
    assert len(out) == 16
    for url, r in out.items():
        assert "Home" not in r["text"]          # nav gone
        assert "About" not in r["text"]
        assert "Terms" not in r["text"]         # footer gone
        assert "Unique body text" in r["text"]  # article intact
        assert "Second unique paragraph" in r["text"]
        assert "Article" in r["text"]
        assert r["n_dropped"] >= 2              # nav + footer
        assert r["dropped_text_len"] > 0


def test_strip_with_no_keys_matches_plain_extract(spark):
    from packages_sgml_spark.spark.extract import extract
    pages = _corpus(spark, n_pages=3)
    plain = {r["url"]: r["text_extracted"] for r in
             extract(pages, nodes=False)
             .select("url", "text_extracted").collect()}
    clean = {r["url"]: r["text"] for r in
             extract_text_without_templates(pages, set()).collect()}
    assert plain == clean                       # byte-identical


def test_unseen_host_untouched(spark):
    pages = _corpus(spark)
    cand = template_candidates(pages, min_pages=4, min_share=0.9)
    keys = collect_template_keys(cand)
    # a page from a host that was never mined keeps its nav verbatim
    other = spark.createDataFrame([_page("gamma.example.org", 1)],
                                  "url string, html binary")
    out = extract_text_without_templates(other, keys).collect()
    assert len(out) == 1
    assert "Home" in out[0]["text"]
    assert out[0]["n_dropped"] == 0


def test_node_fingerprints_excludes_roots(spark):
    pages = with_host(_corpus(spark, n_pages=2))
    fps = node_fingerprints(pages)
    assert fps.filter("name = 'html'").count() == 0
    assert fps.filter("name = 'div'").count() > 0
