"""RFC 9309 robots.txt semantics + the Spark politeness gate."""

from packages_sgml_spark.core.robots import (parse_robots,
                                             url_allowed)


def test_longest_match_and_tie():
    rules, _ = parse_robots(
        "User-agent: *\nDisallow: /p\nAllow: /page\n")
    assert rules.allowed("/page/1")          # longer allow wins
    assert not rules.allowed("/private")     # /p matches
    assert rules.allowed("/other")
    # exact tie: allow wins (RFC 2.2.2)
    rules2, _ = parse_robots(
        "User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert rules2.allowed("/dir/x")


def test_wildcards_and_anchor():
    rules, _ = parse_robots(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*/draft\n")
    assert not rules.allowed("/docs/a.pdf")
    assert rules.allowed("/docs/a.pdf?x=1")   # $ anchors the end
    assert rules.allowed("/docs/a.pdfx")
    assert not rules.allowed("/tmp/2026/draft")
    assert rules.allowed("/tmp/draft")


def test_groups_merge_and_specific_agent():
    txt = ("User-agent: alpha-bot\n"
           "Disallow: /alpha\n"
           "User-agent: *\n"
           "Disallow: /all\n"
           "User-agent: alpha-bot\n"     # second group, same agent
           "Disallow: /alpha2\n"
           "Crawl-delay: 2.5\n")
    r_alpha, _ = parse_robots(txt, "Alpha-Bot/1.0".lower())
    assert not r_alpha.allowed("/alpha/x")
    assert not r_alpha.allowed("/alpha2/x")
    assert r_alpha.allowed("/all")           # * group not merged in
    assert r_alpha.crawl_delay == 2.5
    r_other, _ = parse_robots(txt, "other-bot")
    assert not r_other.allowed("/all/x")
    assert r_other.allowed("/alpha")


def test_consecutive_agents_share_rules():
    txt = ("User-agent: a\nUser-agent: b\nDisallow: /shared\n")
    for ua in ("a", "b"):
        r, _ = parse_robots(txt, ua)
        assert not r.allowed("/shared/x")


def test_empty_disallow_missing_file_and_sitemaps():
    rules, maps = parse_robots(
        "User-agent: *\nDisallow:\n"
        "Sitemap: https://x.example/sitemap.xml\n"
        "# comment\nBogus-directive: 1\n")
    assert rules.allowed("/anything")
    assert maps == ["https://x.example/sitemap.xml"]
    empty, maps2 = parse_robots(b"")
    assert empty.allowed("/x") and maps2 == []


def test_percent_encoding_insensitive():
    rules, _ = parse_robots(
        "User-agent: *\nDisallow: /caf%C3%A9\nDisallow: /a%2Fb\n")
    assert not rules.allowed("/café/menu")
    assert not rules.allowed("/caf%C3%A9/menu")
    # %2F stays encoded: literal-slash path segment is distinct
    assert not rules.allowed("/a%2Fb")
    assert rules.allowed("/a/b")


def test_url_allowed_full_url():
    rules, _ = parse_robots(
        "User-agent: *\nDisallow: /search?q=\n")
    assert not url_allowed(rules, "https://h.example/search?q=x")
    assert url_allowed(rules, "https://h.example/search")
    assert url_allowed(rules, "https://h.example")   # path defaults /


def test_robots_filter_spark(spark):
    from packages_sgml_spark.spark.links import robots_filter
    urls = spark.createDataFrame(
        [("https://a.example/ok.html",),
         ("https://a.example/private/secret",),
         ("https://b.example/anything",),      # no robots row
         ("https://c.example/x",)],
        "url string")
    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nDisallow: /private/\nCrawl-delay: 1.5\n"),
         ("c.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    got = {r.url: (r.allowed, r.crawl_delay)
           for r in robots_filter(urls, robots).collect()}
    assert got == {
        "https://a.example/ok.html": (True, 1.5),
        "https://a.example/private/secret": (False, 1.5),
        "https://b.example/anything": (True, None),
        "https://c.example/x": (False, None),
    }
