"""Link-graph operators: URL canonicalization (core), outlink
extraction with <base>/nofollow/soup handling, host graph, and
PageRank against a hand-computed power iteration."""

import pytest

from packages_sgml_spark.core.urls import (canonical_url,
                                           remove_dot_segments,
                                           resolve_url, url_host)


def test_canonical_url_rules():
    # case, default port, dot segments, pct-normalization, fragment
    assert canonical_url("HTTP://Ex.COM:80/a/../b/%7euser?x=%41#f") == \
        "http://ex.com/b/~user?x=A"
    assert canonical_url("https://ex.com:443/") == "https://ex.com/"
    assert canonical_url("https://ex.com:8443/") == "https://ex.com:8443/"
    assert canonical_url("https://ex.com") == "https://ex.com/"
    assert canonical_url("https://ex.com./x") == "https://ex.com/x"
    # reserved %2F stays encoded, hex uppercased
    assert canonical_url("https://ex.com/a%2fb%3d") == \
        "https://ex.com/a%2Fb%3D"
    assert canonical_url("https://u:p@ex.com/q") == "https://u:p@ex.com/q"
    # non-hierarchical / relative inputs are non-links
    for bad in ("mailto:a@b", "/rel", "", None, "https://:80/x",
                "javascript:void(0)"):
        assert canonical_url(bad) is None


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    assert remove_dot_segments("/../x") == "/x"
    assert remove_dot_segments("..") == ""


def test_resolve_url():
    b = "https://a.example/dir/page.html"
    assert resolve_url(b, "other.html") == "https://a.example/dir/other.html"
    assert resolve_url(b, "../up.html") == "https://a.example/up.html"
    assert resolve_url(b, "/root.html") == "https://a.example/root.html"
    assert resolve_url(b, "//cdn.example/x") == "https://cdn.example/x"
    assert resolve_url(b, "https://o.example/abs") == "https://o.example/abs"
    assert resolve_url(b, "?q=1") == "https://a.example/dir/page.html?q=1"
    for skip in ("javascript:alert(1)", "mailto:x@y", "tel:+1", "", None,
                 "data:text/plain,x"):
        assert resolve_url(b, skip) is None
    assert url_host("https://A.B.example:8080/x") == "a.b.example"


def _pages(spark, docs):
    return spark.createDataFrame(
        [(u, bytearray(h.encode("utf-8"))) for u, h in docs],
        "url string, html binary")


def test_outlinks_anchors_base_nofollow(spark):
    from packages_sgml_spark.spark.links import outlinks
    docs = [
        ("https://s.example/d/p.html",
         "<html><body>"
         "<a href=\"a.html\">first <b>bold</b> link</a>"
         "<p><a href='/abs.html' rel='ugc nofollow'>second</a>"
         "<a href=https://x.example/soup>unquoted</a>"
         "<a href='javascript:void(0)'>js</a>"
         "<a name='no-href'>not a link</a>"
         "</body></html>"),
        ("https://s.example/based.html",
         "<html><head><base href='https://cdn.example/root/'>"
         "<base href='https://ignored.example/'></head>"
         "<body><a href='rel.html'>based</a></body></html>"),
    ]
    rows = sorted(outlinks(_pages(spark, docs)).collect(),
                  key=lambda r: (r.url, r.link_ord))
    first = [r for r in rows if r.url == docs[0][0]]
    assert [(r.link_ord, r.href, r.target, r.anchor, r.nofollow)
            for r in first] == [
        (0, "a.html", "https://s.example/d/a.html",
         "first bold link", False),
        (1, "/abs.html", "https://s.example/abs.html", "second", True),
        (2, "https://x.example/soup", "https://x.example/soup",
         "unquoted", False),
        (3, "javascript:void(0)", None, "js", False),
    ]
    based = [r for r in rows if r.url == docs[1][0]]
    assert [(r.href, r.target) for r in based] == [
        ("rel.html", "https://cdn.example/root/rel.html")]


def test_host_graph(spark):
    from packages_sgml_spark.spark.links import host_graph, outlinks
    docs = [
        ("https://a.example/1",
         "<p><a href='https://b.example/x'>b</a>"
         "<a href='https://b.example/y'>b2</a>"
         "<a href='https://c.example/'>c</a>"
         "<a href='/self'>self</a>"
         "<a href='https://d.example/' rel=nofollow>nf</a>"),
        ("https://b.example/1",
         "<p><a href='https://c.example/z'>c</a>"),
    ]
    edges = {(r.src_host, r.dst_host): r.n
             for r in host_graph(outlinks(_pages(spark, docs))).collect()}
    assert edges == {("a.example", "b.example"): 2,
                     ("a.example", "c.example"): 1,
                     ("b.example", "c.example"): 1}
    withself = {(r.src_host, r.dst_host): r.n for r in host_graph(
        outlinks(_pages(spark, docs)), keep_nofollow=True,
        keep_self=True).collect()}
    assert withself[("a.example", "a.example")] == 1
    assert withself[("a.example", "d.example")] == 1


def _pagerank_expected(edges, n_iter=10, d=0.85):
    hosts = sorted({h for e in edges for h in e[:2]})
    n = len(hosts)
    w_out = {}
    for s, t, w in edges:
        w_out[s] = w_out.get(s, 0.0) + w
    rank = {h: 1.0 / n for h in hosts}
    for _ in range(n_iter):
        contrib = {h: 0.0 for h in hosts}
        for s, t, w in edges:
            contrib[t] += rank[s] * w / w_out[s]
        dang = sum(rank[h] for h in hosts if h not in w_out)
        rank = {h: (1 - d) / n + d * (contrib[h] + dang / n)
                for h in hosts}
    return rank


def test_pagerank_small_graph(spark):
    from packages_sgml_spark.spark.links import pagerank
    edges = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
             ("c", "a", 1.0), ("d", "c", 3.0)]   # d dangles nothing in
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n double")
    got = {r.host: r.rank for r in pagerank(df, n_iter=10).collect()}
    want = _pagerank_expected(edges)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # dangling host: e dangles (present only as a target)
    edges2 = edges + [("a", "e", 1.0)]
    df2 = spark.createDataFrame(
        edges2, "src_host string, dst_host string, n double")
    got2 = {r.host: r.rank for r in pagerank(df2, n_iter=7).collect()}
    want2 = _pagerank_expected(edges2, n_iter=7)
    for h in want2:
        assert got2[h] == pytest.approx(want2[h], rel=1e-9)
    assert sum(got2.values()) == pytest.approx(1.0, rel=1e-9)
