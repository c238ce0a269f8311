"""Planted-truth tests for the Gopher-rule quality filter
(textops.gopher_quality) and incoming-anchor aggregation
(links.anchor_texts)."""

from pyspark.sql import functions as F


GOOD = ("The quick brown fox jumps over the lazy dog and then "
        "decides to have another go because that first jump was "
        "not quite enough for a restless animal of such energy. "
        "It would be unfair to say the fox was tired; with every "
        "leap it seemed to gather more speed and more confidence "
        "than before, clearing hedges and ditches that would have "
        "stopped a less determined creature in its tracks today.")


def _gq(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    from packages_sgml_spark.spark.textops import gopher_quality
    return {r.doc_id: r for r in gopher_quality(df).collect()}


def test_gopher_pass_and_word_stats(spark):
    out = _gq(spark, [(1, GOOD)])
    r = out[1]
    assert r.gopher_pass == 1
    assert 50 <= r.n_words <= 100000
    assert 3.0 <= r.mean_word_len <= 10.0
    assert r.alpha_word_frac == 1.0
    assert r.n_stop_hits >= 2          # the/and/to/of/that/have/with
    assert r.symbol_ratio == 0.0
    assert r.bullet_frac == 0.0 and r.ellipsis_frac == 0.0


def test_gopher_failure_modes(spark):
    bullets = "\n".join("• item %d with some words here" % i
                        for i in range(10))
    dots = "\n".join("the sentence trails off to %d ..." % i
                     for i in range(10))
    symbols = " ".join("#tag%d" % i for i in range(60))
    numeric = " ".join(str(i) for i in range(80))
    out = _gq(spark, [
        (1, "too few words here"),                     # n_words < 50
        (2, bullets),                                  # bullet_frac 1.0
        (3, dots),                                     # ellipsis 1.0
        (4, symbols),                                  # symbol ratio 1.0
        (5, numeric),                                  # alpha frac 0
        (6, None),                                     # null text
        (7, GOOD + "\n" + "x " * 10),                  # still passes
    ])
    assert out[1].gopher_pass == 0 and out[1].n_words == 4
    assert out[2].gopher_pass == 0 and out[2].bullet_frac == 1.0
    assert out[3].gopher_pass == 0 and out[3].ellipsis_frac == 1.0
    assert out[4].gopher_pass == 0 and out[4].symbol_ratio >= 0.1
    assert out[5].gopher_pass == 0 and out[5].alpha_word_frac == 0.0
    assert out[6].gopher_pass == 0 and out[6].n_words == 0
    assert out[7].gopher_pass == 1
    # mean word length guards both directions
    assert _gq(spark, [(8, "a a " * 60)])[8].gopher_pass == 0
    assert _gq(spark, [(9, ("wordsofverygreatlength " * 60))])[
        9].gopher_pass == 0


def test_anchor_texts_cap_and_counts(spark):
    from packages_sgml_spark.spark.links import anchor_texts
    rows = []
    # hub target: 5 distinct anchors with frequencies 5,4,3,2,1
    for i, n in enumerate((5, 4, 3, 2, 1)):
        rows += [("https://s%d.x/p%d" % (j, i), "hub", "a%d" % i,
                  False) for j in range(n)]
    # quiet target: one anchor, whitespace-padded (trimmed in agg)
    rows.append(("https://s0.x/q", "https://t.x/page", "  hello ",
                 False))
    # dropped: null target, empty/blank anchor
    rows.append(("https://s0.x/r", None, "dead", False))
    rows.append(("https://s0.x/s", "hub", "   ", False))
    links = spark.createDataFrame(
        [(u, "hub" if t == "hub" else t, a, nf)
         for u, t, a, nf in rows],
        "url string, target string, anchor string, nofollow boolean")
    out = {r.url: r for r in
           anchor_texts(links, max_texts=3).collect()}
    assert set(out) == {"hub", "https://t.x/page"}
    hub = out["hub"]
    assert hub.n_anchors == 15                 # 5+4+3+2+1
    assert hub.n_distinct_anchors == 5
    # top-3 by frequency, sorted lexically for determinism
    assert hub.anchor_texts == ["a0", "a1", "a2"]
    quiet = out["https://t.x/page"]
    assert quiet.n_anchors == 1
    assert quiet.anchor_texts == ["hello"]


def test_c4_clean_planted(spark):
    from packages_sgml_spark.spark.datafilters import c4_clean
    keep1 = "This line has enough words and ends properly."
    keep2 = "Another perfectly reasonable sentence lives right here!"
    keep3 = 'He said the quote should also count as "terminal."'
    keep4 = "Does a question mark count as terminal punctuation?"
    drop_short = "Too short."
    drop_nopunct = "this line has many words but no terminal mark"
    drop_js = "Please enable JavaScript to view this page."
    doc_ok = "\n".join([keep1, drop_short, keep2, drop_nopunct,
                        keep3, drop_js, keep4])
    doc_few = "\n".join([keep1, keep2, drop_short])      # < 3 kept
    doc_lorem = "\n".join([keep1, keep2, keep3,
                           "Some Lorem Ipsum filler text remains."])
    doc_brace = "\n".join([keep1, keep2, "if (x) { return; }", keep3])
    df = spark.createDataFrame(
        [(1, doc_ok), (2, doc_few), (3, doc_lorem), (4, doc_brace),
         (5, None)],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    r1 = out[1]
    assert r1.c4_keep == 1 and r1.n_lines == 7 and r1.n_kept == 4
    assert r1.text_clean == "\n".join([keep1, keep2, keep3, keep4])
    assert out[2].c4_keep == 0 and out[2].n_kept == 2
    assert out[3].c4_keep == 0          # lorem ipsum page kill
    assert out[4].c4_keep == 0          # curly-brace page kill
    assert out[4].n_kept == 3           # line filter itself keeps 3
    assert out[5].c4_keep == 0 and out[5].text_clean == ""


def test_textnorm_core():
    from packages_sgml_spark.core.textnorm import (fix_mojibake,
                                                   mojibake_markers,
                                                   normalize_text)
    simple = "café".encode("utf-8").decode("latin-1")
    assert fix_mojibake(simple) == ("café", 1)
    curly = "“quoted” don’t — sure…".encode("utf-8").decode("latin-1")
    assert fix_mojibake(curly) == ("“quoted” don’t — sure…", 1)
    double = simple.encode("utf-8").decode("latin-1")
    assert fix_mojibake(double) == ("café", 2)
    # clean text with legitimate accents: zero markers, untouched
    assert mojibake_markers("naïve café ü straße") == 0
    assert fix_mojibake("naïve café ü straße") == \
        ("naïve café ü straße", 0)
    # idempotent
    fixed, _ = fix_mojibake(double)
    assert fix_mojibake(fixed) == (fixed, 0)
    # NFD composes to NFC and is flagged as changed
    import unicodedata
    nfd = unicodedata.normalize("NFD", "étude")
    assert normalize_text(nfd) == ("étude", 0, 1)
    assert normalize_text("étude") == ("étude", 0, 0)


def test_fix_text_spark(spark):
    from packages_sgml_spark.spark.textops import fix_text
    import unicodedata
    moji = "café crème".encode("utf-8").decode("latin-1")
    nfd = unicodedata.normalize("NFD", "résumé")
    df = spark.createDataFrame(
        [(1, moji), (2, "plain ascii"), (3, nfd), (4, None)],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in fix_text(df).collect()}
    assert out[1].text_fixed == "café crème"
    assert out[1].n_passes == 1 and out[1].changed == 1
    assert out[2].text_fixed == "plain ascii" and out[2].changed == 0
    assert out[3].text_fixed == "résumé"
    assert out[3].n_passes == 0 and out[3].changed == 1
    assert out[4].text_fixed == "" and out[4].n_passes == 0


def test_page_meta_edge_cases(spark):
    from packages_sgml_spark.spark.extract import extract_nodes_rows
    from packages_sgml_spark.spark.nodes import page_meta
    pages = spark.createDataFrame([
        ("u1", b"<html lang=fr><head><title>A &amp; B</title>"
               b"<title>second ignored</title>"
               b'<META NAME="Description" content="d1"></head>'
               b"<body><p>x</p></body></html>"),
        ("u2", b"<html><body><p>no head at all</p></body></html>"),
    ], "url string, html binary")
    out = {r.url: r for r in
           page_meta(extract_nodes_rows(pages)).collect()}
    r1 = out["u1"]
    assert r1.title == "A & B"            # entity decoded, 1st title
    assert r1.meta_description == "d1"    # case-folded names
    assert r1.html_lang == "fr"           # unquoted attr path
    assert r1.og_title is None and r1.canonical is None
    r2 = out["u2"]
    assert r2.title is None and r2.meta_description is None


def test_feed_entries_rss_flavor(spark):
    from packages_sgml_spark.spark.extract import extract_nodes_rows
    from packages_sgml_spark.spark.nodes import feed_entries
    rss = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
           b"<title>Chan</title>"
           b"<item><title>First</title>"
           b"<link>https://r.x/1</link>"
           b"<guid>g1</guid><pubDate>Mon, 01 Jan 2026</pubDate></item>"
           b"<item><title>Second</title>"
           b"<link>https://r.x/2</link></item>"
           b"</channel></rss>")
    pages = spark.createDataFrame([("feed://rss", rss)],
                                  "url string, html binary")
    nodes = extract_nodes_rows(pages, dialect="xml")
    out = {r.entry_ord: r for r in
           feed_entries(nodes, flavor="rss").collect()}
    assert len(out) == 2
    assert out[1].title == "First" and out[1].link == "https://r.x/1"
    assert out[1].guid == "g1"
    assert out[1].published == "Mon, 01 Jan 2026"
    assert out[2].title == "Second" and out[2].guid is None
    # channel-level <title>Chan</title> must not leak into entries
    assert {r.title for r in out.values()} == {"First", "Second"}


def test_url_filter_planted(spark):
    from packages_sgml_spark.spark.datafilters import url_filter
    rows = [("https://bad.example/x",),        # exact host
            ("https://sub.ads.net/p",),        # suffix ads.net
            ("https://notads.net/q",),         # NOT a suffix match
            ("https://ok.example/login/form",),  # path regex
            ("https://ok.example/fine",)]      # kept
    docs = spark.createDataFrame(rows, "url string")
    out = {r.url: r for r in url_filter(
        docs, blocked_hosts=("bad.example",),
        blocked_suffixes=("ads.net",),
        blocked_path_rx="^/login").collect()}
    assert len(out) == 5                       # every row in output
    assert out["https://bad.example/x"].url_block_reason == "host"
    assert out["https://sub.ads.net/p"].url_block_reason == "suffix"
    assert out["https://notads.net/q"].url_keep == 1
    assert out["https://ok.example/login/form"].url_block_reason == \
        "path"
    assert out["https://ok.example/fine"].url_keep == 1
    # empty lists: everything kept
    all_kept = url_filter(docs).agg({"url_keep": "sum"}).collect()
    assert all_kept[0][0] == 5


def test_c4_and_gopher_crlf_lines(spark):
    from packages_sgml_spark.spark.datafilters import c4_clean
    from packages_sgml_spark.spark.textops import gopher_quality
    line = "This line has enough words and ends properly."
    crlf_doc = "\r\n".join([line] * 4)
    df = spark.createDataFrame([(1, crlf_doc)],
                               "doc_id bigint, text string")
    r = c4_clean(df).collect()[0]
    assert r.n_lines == 4 and r.n_kept == 4 and r.c4_keep == 1
    g = gopher_quality(df).collect()[0]
    assert g.ellipsis_frac == 0.0       # \r must not defeat endswith
    dots_crlf = "\r\n".join(["it trails off to nothing ..."] * 4)
    g2 = gopher_quality(spark.createDataFrame(
        [(1, dots_crlf)], "doc_id bigint, text string")).collect()[0]
    assert g2.ellipsis_frac == 1.0


def test_url_filter_large_list_join_path(spark):
    from packages_sgml_spark.spark.datafilters import url_filter
    docs = spark.createDataFrame(
        [("https://a.blocked77.example/x",),
         ("https://ok.example/y",)], "url string")
    suffixes = ["blocked%d.example" % i for i in range(2101)]
    out = {r.url: r for r in url_filter(
        docs, blocked_suffixes=suffixes).collect()}
    assert out["https://a.blocked77.example/x"].url_block_reason == \
        "suffix"
    assert out["https://ok.example/y"].url_keep == 1


def test_page_meta_first_in_document_wins(spark):
    from packages_sgml_spark.spark.extract import extract_nodes_rows
    from packages_sgml_spark.spark.nodes import page_meta
    pages = spark.createDataFrame([
        ("u1", b'<html><head><title>t</title>'
               b'<link rel="canonical" href="https://z.example/real">'
               b'<link rel="canonical" href="https://amp.example/x">'
               b"</head><body><p>x</p></body></html>"),
    ], "url string, html binary")
    out = page_meta(extract_nodes_rows(pages)).collect()[0]
    assert out.canonical == "https://z.example/real"   # doc order


def test_feed_entries_atom_rel_alternate(spark):
    from packages_sgml_spark.spark.extract import extract_nodes_rows
    from packages_sgml_spark.spark.nodes import feed_entries
    atom = ('<?xml version="1.0"?>'
            '<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
            '<title>T</title>'
            '<link rel="self" href="https://api.example/e/1"/>'
            '<link rel="alternate" href="https://www.example/post"/>'
            '<id>urn:1</id></entry></feed>').encode()
    pages = spark.createDataFrame([("f1", atom)],
                                  "url string, html binary")
    out = feed_entries(extract_nodes_rows(pages, dialect="xmlns")
                       ).collect()[0]
    assert out.link == "https://www.example/post"
    # rel-less link defaults to alternate
    atom2 = atom.replace(b' rel="alternate"', b"")
    pages2 = spark.createDataFrame([("f2", atom2)],
                                   "url string, html binary")
    out2 = feed_entries(extract_nodes_rows(pages2, dialect="xmlns")
                        ).collect()[0]
    assert out2.link == "https://www.example/post"


def test_jsonld_parameterized_type(spark):
    from packages_sgml_spark.spark.extract import extract_nodes_rows
    from packages_sgml_spark.spark.nodes import jsonld
    html = (b'<html><body>'
            b'<script type="application/ld+json; charset=utf-8">'
            b'{"@type": "NewsArticle"}</script>'
            b"<p>x</p></body></html>")
    pages = spark.createDataFrame([("u1", html)],
                                  "url string, html binary")
    out = jsonld(extract_nodes_rows(pages)).collect()
    assert len(out) == 1 and out[0].schema_type == "NewsArticle"
