"""Round-8 registry candidates, staged while the registry is frozen.

Invariant (memory: registry keys change only at round START): these
queries/oracles are NOT imported by queries.py / __spark_entry__.py
yet.  They are fully built and pytest-gated against DuckDB now
(tests/test_staged_r8.py runs the exact check_correctness compare);
at round-8 start, registration is two dict updates:

    QUERIES.update(queries_staged.R8_QUERIES)
    ORACLES.update(queries_staged.R8_ORACLES)

Fifteen keys over the session-3/4 crawl-pipeline operators:
outlinks / host_graph / pagerank_hosts / anchor_texts
(spark/links.py), boilerplate_lines / strip_boilerplate / c4_clean
(spark/datafilters.py), robots_allowed (core/robots.py via
robots_filter), gopher_quality + fix_text (spark/textops.py;
fix_text rows-only), page_meta + feed_entries (spark/nodes.py), markdown
(core/markdown.py via extract_markdown), jsonld (spark/nodes.py),
url_filter (spark/datafilters.py).
"""

from pyspark.sql import functions as F

from .queries import _t, ensure_workers

# ------------------------------------------------------------- pages

# Synthesized link pages: page url https://d<doc_id%13>.example/p/<id>
# with, per document (k = doc_id % 5 + 1):
#   k relative links  /r/<i>?x=<id>#f   anchor "ref <b><i></b>"
#   1 absolute cross-host link https://h<doc_id%7>.example/z
#   1 rel=nofollow /nf, 1 javascript: — exercising skip paths.
# Everything is SQL-reconstructable for the DuckDB oracle.


def docs_as_link_pages(docs):
    from .util import spread
    docs = spread(docs, "doc_id")   # r9: parallel synth (see pages.py)
    d = F.col("doc_id")
    k = (d % 5 + 1).cast("int")
    rel_links = F.array_join(F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat(
            F.lit('<a href="/r/'), i.cast("string"),
            F.lit("?x="), d.cast("string"),
            F.lit('#f">ref <b>'), i.cast("string"),
            F.lit("</b></a>"))), "")
    html_str = F.concat(
        F.lit("<html><head><title>t</title></head><body>"),
        rel_links,
        F.lit('<a href="https://h'), (d % 7).cast("string"),
        F.lit('.example/z">x</a>'),
        F.lit('<a href="/nf" rel="nofollow">nf</a>'),
        F.lit('<a href="javascript:void(0)">js</a>'),
        F.lit("</body></html>"))
    url = F.concat(F.lit("https://d"), (d % 13).cast("string"),
                   F.lit(".example/p/"), d.cast("string"))
    return docs.select(url.alias("url"),
                       F.encode(html_str, "utf-8").alias("html"))


def _doc_id():
    return F.regexp_extract("url", r"/p/(\d+)$", 1).cast("bigint")


def q_outlinks(spark, sf_dir):
    """Outlink extraction over synthesized link pages (spark/links.py
    outlinks: single narrow map, in-worker resolution +
    canonicalization, nofollow flags, javascript: dropped to NULL)."""
    ensure_workers(spark)
    from .links import outlinks
    pages = docs_as_link_pages(_t(spark, sf_dir, "documents"))
    return (outlinks(pages)
            .select(_doc_id().alias("doc_id"), "link_ord", "href",
                    "target", "anchor", "nofollow"))


ORACLE_OUTLINKS = """
SELECT doc_id, CAST(i AS INT) AS link_ord,
       '/r/' || i || '?x=' || doc_id || '#f' AS href,
       'https://d' || (doc_id % 13) || '.example/r/' || i ||
         '?x=' || doc_id AS target,
       'ref ' || i AS anchor, FALSE AS nofollow
FROM documents, unnest(range(0, doc_id % 5 + 1)) AS t(i)
UNION ALL
SELECT doc_id, CAST(doc_id % 5 + 1 AS INT),
       'https://h' || (doc_id % 7) || '.example/z',
       'https://h' || (doc_id % 7) || '.example/z', 'x', FALSE
FROM documents
UNION ALL
SELECT doc_id, CAST(doc_id % 5 + 2 AS INT), '/nf',
       'https://d' || (doc_id % 13) || '.example/nf', 'nf', TRUE
FROM documents
UNION ALL
SELECT doc_id, CAST(doc_id % 5 + 3 AS INT), 'javascript:void(0)',
       NULL, 'js', FALSE
FROM documents
"""


def q_host_graph(spark, sf_dir):
    """Host-level edge aggregation: the relative links collapse as
    self-edges (dropped), the nofollow link is filtered, leaving the
    one cross-host link per document -> (src_host, dst_host, n)."""
    ensure_workers(spark)
    from .links import host_graph, outlinks
    pages = docs_as_link_pages(_t(spark, sf_dir, "documents"))
    return host_graph(outlinks(pages))


ORACLE_HOST_GRAPH = """
SELECT 'd' || (doc_id % 13) || '.example' AS src_host,
       'h' || (doc_id % 7) || '.example' AS dst_host,
       COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""


# ---------------------------------------------------------- pagerank

PR_ITER = 5
PR_DAMP = 0.85


def q_pagerank_hosts(spark, sf_dir):
    """PageRank over a deterministic host graph derived from doc_id
    (h<i> -> h<(3i+1)%7>, weight = multiplicity).  Ranks rounded to
    9 decimals: both engines do float64 arithmetic in different
    association orders; at graph diameter ~7 the drift is ~1e-16."""
    ensure_workers(spark)
    from .links import pagerank
    docs = _t(spark, sf_dir, "documents")
    edges = (docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
        .alias("src_host"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 3 + 1) % 7)
                 .cast("string")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("double").alias("n")))
    pr = pagerank(edges, n_iter=PR_ITER, damping=PR_DAMP)
    return pr.select("host", F.round("rank", 9).alias("rank"))


def _pagerank_oracle_sql(n_iter=PR_ITER, d=PR_DAMP):
    """Unrolled power iteration (DuckDB recursive CTEs cannot carry
    the per-step aggregate, so each iteration is its own CTE — the
    SQL is generated, semantics identical to links.pagerank)."""
    parts = ["""
WITH e AS (
  SELECT 'h' || (doc_id % 7) AS src, 'h' || ((doc_id * 3 + 1) % 7)
           AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM documents GROUP BY 1, 2),
outw AS (SELECT src, SUM(w) AS w_out FROM e GROUP BY src),
frac AS (SELECT e.src, e.dst, e.w / outw.w_out AS frac
         FROM e JOIN outw ON e.src = outw.src),
nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM nodes),
r0 AS (SELECT host, 1.0 / nn.c AS rank FROM nodes, nn)"""]
    for i in range(1, n_iter + 1):
        p, r = i - 1, i
        parts.append("""
c%d AS (SELECT frac.dst, SUM(frac.frac * r%d.rank) AS contrib
        FROM frac JOIN r%d ON frac.src = r%d.host GROUP BY frac.dst),
d%d AS (SELECT COALESCE(SUM(r%d.rank), 0.0) AS dang
        FROM r%d LEFT JOIN outw ON r%d.host = outw.src
        WHERE outw.src IS NULL),
r%d AS (SELECT nodes.host,
               (1.0 - %r) / nn.c + %r *
                 (COALESCE(c%d.contrib, 0.0) + d%d.dang / nn.c) AS rank
        FROM nodes LEFT JOIN c%d ON nodes.host = c%d.dst,
             nn, d%d)""" % (r, p, p, p, r, p, p, p, r, d, d,
                            r, r, r, r, r))
    return (",".join(parts) +
            "\nSELECT host, round(rank, 9) AS rank FROM r%d" % n_iter)


# --------------------------------------------------------- line dedup

# Line-ified documents: text is one line; append a footer shared by
# every document and the lang code (shared by ~1/8 of docs) — real
# cross-document boilerplate with planted truth, SQL-reconstructable.
_LINEDOC_SQL_T = ("text || chr(10) || 'Shared footer.' || chr(10) "
                  "|| lang")
_BL_MIN_DOCS = 3


def _line_docs(docs):
    # F.concat, NOT concat_ws: the SQL twin (_LINEDOC_SQL_T) is
    # `text || ... || lang` and || PROPAGATES NULL — concat_ws
    # silently skipped a NULL text and fabricated footer-only
    # content for failed extractions, a cross-engine divergence no
    # NULL-free gate corpus can see (caught by the r8 session-5
    # randomized differential; the NULL-text doc then flows NULL
    # into every downstream op, which all coalesce it as empty).
    return docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\nShared footer.\n"),
                 F.col("lang")).alias("text"))


def q_boilerplate_lines(spark, sf_dir):
    ensure_workers(spark)
    from .datafilters import boilerplate_lines
    docs = _line_docs(_t(spark, sf_dir, "documents"))
    return boilerplate_lines(docs, min_docs=_BL_MIN_DOCS)


ORACLE_BOILERPLATE = """
WITH src AS (SELECT doc_id, %s AS t FROM documents),
ln AS (
  SELECT doc_id, trim(parts[i]) AS line
  FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM src),
       unnest(range(1, len(parts) + 1)) AS u(i)
  WHERE trim(parts[i]) <> '')
SELECT line, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_total
FROM ln GROUP BY line HAVING COUNT(DISTINCT doc_id) >= %d
""" % (_LINEDOC_SQL_T, _BL_MIN_DOCS)


def q_strip_boilerplate(spark, sf_dir):
    ensure_workers(spark)
    from .datafilters import strip_boilerplate_lines
    docs = _line_docs(_t(spark, sf_dir, "documents"))
    return strip_boilerplate_lines(docs, min_docs=_BL_MIN_DOCS)


ORACLE_STRIP = """
WITH src AS (SELECT doc_id, %s AS t FROM documents),
ln AS (
  SELECT doc_id, i, parts[i] AS line, trim(parts[i]) AS key
  FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM src),
       unnest(range(1, len(parts) + 1)) AS u(i)),
bl AS (
  SELECT key FROM ln WHERE key <> ''
  GROUP BY key HAVING COUNT(DISTINCT doc_id) >= %d),
kept AS (
  SELECT ln.* FROM ln LEFT JOIN bl ON ln.key = bl.key
  WHERE bl.key IS NULL),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM ln GROUP BY doc_id)
SELECT src.doc_id,
       COALESCE(rebuilt.text_clean, '') AS text_clean,
       CAST(COALESCE(tot.n_lines, 0) - COALESCE(rebuilt.n_kept, 0)
            AS INT) AS n_lines_removed
FROM src
LEFT JOIN rebuilt ON src.doc_id = rebuilt.doc_id
LEFT JOIN tot ON src.doc_id = tot.doc_id
""" % (_LINEDOC_SQL_T, _BL_MIN_DOCS)


# ------------------------------------------------------------- robots

_N_ROBOT_HOSTS = 4    # hosts r0..r3 have robots; r4 has none


def q_robots_allowed(spark, sf_dir):
    """RFC 9309 politeness gate: synthesized frontier (host
    r<doc_id%5>, private path when doc_id%3==0) against per-host
    robots (Disallow: /private/, Crawl-delay: host+0.5; host r4
    publishes none -> unrestricted per §2.3.1.2)."""
    ensure_workers(spark)
    from .links import robots_filter
    d = F.col("doc_id")
    urls = _t(spark, sf_dir, "documents").select(F.concat(
        F.lit("https://r"), (d % 5).cast("string"), F.lit(".example/"),
        F.when(d % 3 == 0, F.lit("private/x")).otherwise(F.lit("pub/x")),
        F.lit("?id="), d.cast("string")).alias("url"))
    h = F.col("id")
    robots = spark.range(_N_ROBOT_HOSTS).select(
        F.concat(F.lit("r"), h.cast("string"), F.lit(".example"))
        .alias("host"),
        F.concat(F.lit("User-agent: *\nDisallow: /private/\n"
                       "Crawl-delay: "),
                 (h + 0.5).cast("string")).alias("robots_txt"))
    return robots_filter(urls, robots)


ORACLE_ROBOTS = """
SELECT 'https://r' || (doc_id %% 5) || '.example/' ||
         CASE WHEN doc_id %% 3 = 0 THEN 'private/x' ELSE 'pub/x' END ||
         '?id=' || doc_id AS url,
       CASE WHEN doc_id %% 5 >= %d THEN TRUE
            WHEN doc_id %% 3 = 0 THEN FALSE ELSE TRUE END AS allowed,
       CASE WHEN doc_id %% 5 >= %d THEN NULL
            ELSE CAST((doc_id %% 5) + 0.5 AS DOUBLE) END AS crawl_delay
FROM documents
""" % (_N_ROBOT_HOSTS, _N_ROBOT_HOSTS)


# ------------------------------------------------- gopher quality

def q_gopher_quality(spark, sf_dir):
    """Gopher-rule document filter signals (textops.gopher_quality)
    straight over the documents table."""
    from . import textops
    return textops.gopher_quality(_t(spark, sf_dir, "documents"))


_GOPHER_STOP_SQL = " + ".join(
    "CASE WHEN padded LIKE '%% %s %%' THEN 1 ELSE 0 END" % w
    for w in ("the", "be", "to", "of", "and", "that", "have", "with"))

ORACLE_GOPHER = """
WITH b AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
s AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(text), '\\s+'),
                x -> x <> '') AS words,
    regexp_split_to_array(text, '\\r?\\n') AS lines,
    CAST((length(text) - length(replace(text, '#', ''))) +
         (length(text) - length(replace(text, '...', ''))) / 3 +
         (length(text) - length(replace(text, '…', ''))) AS INT)
      AS n_symbols,
    ' ' || regexp_replace(lower(text), '\\s+', ' ', 'g') || ' '
      AS padded
  FROM b),
g AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(greatest(len(words), 1) AS DOUBLE) AS wden,
    CAST(greatest(len(lines), 1) AS DOUBLE) AS lden,
    CAST(COALESCE(list_sum(list_transform(words, x -> length(x))), 0)
         AS DOUBLE) AS wchars,
    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
         AS DOUBLE) AS n_alpha,
    CAST(len(list_filter(lines, x -> list_contains(
      ['•','‣','▪','●','◦','⁃','*','-'],
      substr(ltrim(x), 1, 1)))) AS DOUBLE) AS n_bullet,
    CAST(len(list_filter(lines, x -> rtrim(x) LIKE '%...'
         OR rtrim(x) LIKE '%…')) AS DOUBLE) AS n_ellipsis,
    n_symbols,
    CAST({stop} AS INT) AS n_stop_hits
  FROM s),
r AS (
  SELECT doc_id, n_words,
    round(wchars / wden, 6) AS mean_word_len,
    round(n_symbols / wden, 6) AS symbol_ratio,
    round(n_bullet / lden, 6) AS bullet_frac,
    round(n_ellipsis / lden, 6) AS ellipsis_frac,
    round(n_alpha / wden, 6) AS alpha_word_frac,
    n_stop_hits
  FROM g)
SELECT *,
  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND symbol_ratio <= 0.1
             AND bullet_frac <= 0.9
             AND ellipsis_frac <= 0.3
             AND alpha_word_frac >= 0.8
             AND n_stop_hits >= 2
       THEN 1 ELSE 0 END AS INT) AS gopher_pass
FROM r
""".format(stop=_GOPHER_STOP_SQL)


# ------------------------------------------------- c4 line filter

def q_c4_clean(spark, sf_dir):
    """C4 line/page cleaning (datafilters.c4_clean) over line-ified
    documents (same _line_docs synthesis as the boilerplate pair, so
    multi-line structure is actually exercised)."""
    from .datafilters import c4_clean
    return c4_clean(_line_docs(_t(spark, sf_dir, "documents")))


ORACLE_C4 = """
WITH b AS (SELECT doc_id, coalesce(%s, '') AS text FROM documents),
s AS (SELECT doc_id, text, regexp_split_to_array(text, '\\r?\\n') AS lines
      FROM b),
k AS (SELECT doc_id, text, len(lines) AS n_lines,
  list_filter(lines, l ->
    (rtrim(l) LIKE '%%.' OR rtrim(l) LIKE '%%!' OR
     rtrim(l) LIKE '%%?' OR rtrim(l) LIKE '%%"')
    AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                        x -> x <> '')) >= 5
    AND NOT contains(lower(l), 'javascript')) AS kept
  FROM s)
SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
  CAST(len(kept) AS INT) AS n_kept,
  array_to_string(kept, chr(10)) AS text_clean,
  CAST(CASE WHEN len(kept) >= 3
             AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{') THEN 1 ELSE 0 END AS INT)
    AS c4_keep
FROM k
""" % _LINEDOC_SQL_T


# ------------------------------------------------- page_meta

def docs_as_head_pages(docs):
    """Synthesized head-metadata pages: title + description always;
    canonical only when doc_id%2==0, og:title when doc_id%3==0 —
    NULL-field paths exercised.  SQL-reconstructable."""
    from .util import spread
    docs = spread(docs, "doc_id")   # r9: parallel synth
    d = F.col("doc_id")
    ds = d.cast("string")
    html_str = F.concat(
        F.lit('<html lang="en-US"><head><title>T '), ds,
        F.lit("</title>"),
        F.lit('<meta name="description" content="D '), ds,
        F.lit('">'),
        F.when(d % 2 == 0, F.concat(
            F.lit('<link rel="canonical" href="https://c.example/'),
            ds, F.lit('">'))).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.concat(
            F.lit('<meta property="og:title" content="OG '), ds,
            F.lit('">'))).otherwise(F.lit("")),
        F.lit("</head><body><p>x</p></body></html>"))
    url = F.concat(F.lit("https://m"), (d % 13).cast("string"),
                   F.lit(".example/p/"), ds)
    return docs.select(url.alias("url"),
                       F.encode(html_str, "utf-8").alias("html"))


def q_page_meta(spark, sf_dir):
    """Head-metadata extraction (spark/nodes.py page_meta) over
    synthesized pages."""
    ensure_workers(spark)
    from .extract import extract_nodes_rows
    from .nodes import page_meta
    pages = docs_as_head_pages(_t(spark, sf_dir, "documents"))
    return page_meta(extract_nodes_rows(pages, repartition=0))


ORACLE_PAGE_META = """
SELECT 'https://m' || (doc_id % 13) || '.example/p/' || doc_id AS url,
       'T ' || doc_id AS title,
       'D ' || doc_id AS meta_description,
       CASE WHEN doc_id % 3 = 0 THEN 'OG ' || doc_id END AS og_title,
       CASE WHEN doc_id % 2 = 0
            THEN 'https://c.example/' || doc_id END AS canonical,
       'en-US' AS html_lang
FROM documents
"""


# ------------------------------------------------- feed_entries

def docs_as_atom_pages(docs):
    """Synthesized Atom feeds (default xmlns — the r7 node-tape
    xmlns path): k = doc_id%4+1 entries; a feed-level <title> child
    tests entry scoping (it must NOT leak into any entry row)."""
    from .util import spread
    docs = spread(docs, "doc_id")   # r9: parallel synth
    d = F.col("doc_id")
    ds = d.cast("string")
    k = (d % 4 + 1).cast("int")
    entries = F.array_join(F.transform(
        F.sequence(F.lit(1), k),
        lambda j: F.concat(
            F.lit("<entry><title>E "), ds, F.lit("-"),
            j.cast("string"),
            F.lit('</title><link href="https://b'),
            (d % 7).cast("string"), F.lit(".example/p/"),
            j.cast("string"),
            F.lit('" rel="alternate"/><id>urn:'), ds, F.lit(":"),
            j.cast("string"),
            F.lit("</id><updated>2026-01-0"),
            (j % 9 + 1).cast("string"),
            F.lit("</updated></entry>"))), "")
    xml = F.concat(
        F.lit('<?xml version="1.0"?>'
              '<feed xmlns="http://www.w3.org/2005/Atom">'
              "<title>Feed</title>"),
        entries, F.lit("</feed>"))
    url = F.concat(F.lit("feed://"), ds)
    return docs.select(url.alias("url"),
                       F.encode(xml, "utf-8").alias("html"))


def q_feed_entries(spark, sf_dir):
    """Atom feed-entry extraction (spark/nodes.py feed_entries) under
    the xmlns dialect — entry rows with title text, link@href,
    id, updated."""
    ensure_workers(spark)
    from .extract import extract_nodes_rows
    from .nodes import feed_entries
    pages = docs_as_atom_pages(_t(spark, sf_dir, "documents"))
    return feed_entries(extract_nodes_rows(pages, dialect="xmlns",
                                           repartition=0))


ORACLE_FEED_ENTRIES = """
SELECT 'feed://' || doc_id AS url, CAST(j AS INT) AS entry_ord,
       'E ' || doc_id || '-' || j AS title,
       'https://b' || (doc_id % 7) || '.example/p/' || j AS link,
       'urn:' || doc_id || ':' || j AS guid,
       '2026-01-0' || ((j % 9) + 1) AS published
FROM documents, unnest(range(1, doc_id % 4 + 2)) AS t(j)
"""


# ------------------------------------------------- markdown

def q_markdown(spark, sf_dir):
    """HTML -> Markdown rendering (extract_markdown /
    core/markdown.py) over synthesized structured pages; the
    expected markdown is reconstructed literally in SQL."""
    ensure_workers(spark)
    from .extract import extract_markdown
    d = F.col("doc_id")
    ds = d.cast("string")
    html_str = F.concat(
        F.lit("<html><body><h1>H "), ds, F.lit("</h1><p>P "), ds,
        F.lit(' with <b>bold</b> and <a href="https://x/'), ds,
        F.lit('">L</a>.</p><ul><li>i1</li><li>i2 '), ds,
        F.lit("</li></ul></body></html>"))
    from .util import spread
    pages = spread(_t(spark, sf_dir, "documents"),
                   "doc_id").select(   # r9: parallel synth
        F.concat(F.lit("md://"), ds).alias("url"),
        F.encode(html_str, "utf-8").alias("html"))
    return extract_markdown(pages, repartition=0).select(
        "url", "markdown", "n_errors", "status")


ORACLE_MARKDOWN = """
SELECT 'md://' || doc_id AS url,
       '# H ' || doc_id || chr(10) || chr(10) ||
       'P ' || doc_id || ' with **bold** and [L](https://x/' ||
         doc_id || ').' || chr(10) || chr(10) ||
       '- i1' || chr(10) || '- i2 ' || doc_id AS markdown,
       CAST(0 AS INT) AS n_errors,
       'ok' AS status
FROM documents
"""


# ------------------------------------------------- url_filter

def q_url_filter(spark, sf_dir):
    """URL blocklist gate (datafilters.url_filter): exact host /
    domain-suffix / path-regex reasons over synthesized urls; every
    row stays in the output with a keep flag."""
    from .datafilters import url_filter
    d = F.col("doc_id")
    ds = d.cast("string")
    url = F.concat(
        F.lit("https://h"), (d % 11).cast("string"), F.lit(".site"),
        (d % 3).cast("string"), F.lit(".example"),
        F.when(d % 7 == 0, F.lit("/login/")).otherwise(F.lit("/p/")),
        ds)
    docs = _t(spark, sf_dir, "documents").select(url.alias("url"))
    return url_filter(docs,
                      blocked_hosts=("h0.site0.example",),
                      blocked_suffixes=("site1.example",),
                      blocked_path_rx="^/login")


ORACLE_URL_FILTER = """
WITH u AS (
  SELECT doc_id,
         'https://h' || (doc_id % 11) || '.site' || (doc_id % 3) ||
           '.example' ||
           CASE WHEN doc_id % 7 = 0 THEN '/login/' ELSE '/p/' END ||
           doc_id AS url,
         CASE WHEN doc_id % 11 = 0 AND doc_id % 3 = 0 THEN 'host'
              WHEN doc_id % 3 = 1 THEN 'suffix'
              WHEN doc_id % 7 = 0 THEN 'path' END AS reason
  FROM documents)
SELECT url, reason AS url_block_reason,
       CAST(CASE WHEN reason IS NULL THEN 1 ELSE 0 END AS INT)
         AS url_keep
FROM u
"""


# ------------------------------------------------- jsonld

def q_jsonld(spark, sf_dir):
    """JSON-LD block extraction (nodes.jsonld): every doc carries one
    valid Article block; docs with doc_id%5==0 carry a second,
    MALFORMED block (is_valid=0 path); a plain <script> without the
    ld+json type must be ignored."""
    ensure_workers(spark)
    from .extract import extract_nodes_rows
    from .nodes import jsonld
    d = F.col("doc_id")
    ds = d.cast("string")
    html_str = F.concat(
        F.lit('<html><body><script type="application/ld+json">'
              '{"@type": "Article", "headline": "H '), ds,
        F.lit('"}</script>'),
        F.when(d % 5 == 0,
               F.lit('<script type="application/ld+json">{broken'
                     "</script>")).otherwise(F.lit("")),
        F.lit("<script>var x = 1;</script>"
              "<p>x</p></body></html>"))
    pages = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("ld://"), ds).alias("url"),
        F.encode(html_str, "utf-8").alias("html"))
    return jsonld(extract_nodes_rows(pages, repartition=0))


ORACLE_JSONLD = """
SELECT 'ld://' || doc_id AS url, CAST(1 AS INT) AS block_ord,
       '{"@type": "Article", "headline": "H ' || doc_id || '"}'
         AS jsonld,
       CAST(1 AS INT) AS is_valid,
       'Article' AS schema_type
FROM documents
UNION ALL
SELECT 'ld://' || doc_id, CAST(2 AS INT), '{broken',
       CAST(0 AS INT), NULL
FROM documents WHERE doc_id % 5 = 0
"""


# ------------------------------------------------- fix_text

def q_fix_text(spark, sf_dir):
    """Mojibake repair + NFC over documents whose text is
    deterministically mis-decoded first (utf-8 bytes read as
    latin-1), so the repair has planted truth: text_fixed must equal
    the original text NFC-composed.  No DuckDB oracle (codec
    round-trips aren't SQL) — joins the registry as a rows-only
    `no_oracle` entry like compression_ratio; the byte-exact
    inverse property is pytest-pinned instead."""
    from .textops import fix_text
    docs = _t(spark, sf_dir, "documents")
    import pandas as pd

    # the synthetic corpus is ASCII (mis-decode = identity), so a
    # non-ASCII suffix is planted first to actually exercise repair
    def break_enc(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "text": [(t + " — café № %d…" % i)
                         .encode("utf-8").decode("latin-1")
                         for i, t in zip(pdf["doc_id"],
                                         pdf["text"])]})

    from .util import spread
    broken = spread(docs.select("doc_id", "text"),
                    "doc_id").mapInPandas(
        break_enc, schema="doc_id bigint, text string")
    return fix_text(broken)


# ------------------------------------------------- anchor texts

_ANCHOR_CAP = 3


def q_anchor_texts(spark, sf_dir):
    """Incoming anchor text per target over the synthesized link
    pages (links.anchor_texts on the outlinks output); the array
    column is joined to a string so the value-hash compare sees one
    scalar per row."""
    ensure_workers(spark)
    from .links import anchor_texts, outlinks
    pages = docs_as_link_pages(_t(spark, sf_dir, "documents"))
    at = anchor_texts(outlinks(pages), max_texts=_ANCHOR_CAP)
    return at.select(
        "url", "n_anchors", "n_distinct_anchors",
        F.array_join("anchor_texts", "||").alias("anchors_joined"))


ORACLE_ANCHOR_TEXTS = """
WITH links AS (%s),
l AS (SELECT target, trim(anchor) AS anchor FROM links
      WHERE target IS NOT NULL AND length(trim(anchor)) > 0),
pairs AS (SELECT target, anchor, COUNT(*) AS n FROM l GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY target
                               ORDER BY n DESC, anchor) AS rn
  FROM pairs)
SELECT target AS url, CAST(SUM(n) AS BIGINT) AS n_anchors,
       COUNT(*) AS n_distinct_anchors,
       array_to_string(
         list_sort(array_agg(anchor) FILTER (WHERE rn <= %d)), '||')
         AS anchors_joined
FROM ranked GROUP BY target
""" % (ORACLE_OUTLINKS, _ANCHOR_CAP)


R8_QUERIES = {
    "gopher_quality": q_gopher_quality,
    "c4_clean": q_c4_clean,
    "anchor_texts": q_anchor_texts,
    "fix_text": q_fix_text,          # rows-only: no DuckDB oracle
    "page_meta": q_page_meta,
    "feed_entries": q_feed_entries,
    "markdown": q_markdown,
    "jsonld": q_jsonld,
    "url_filter": q_url_filter,
    "outlinks": q_outlinks,
    "host_graph": q_host_graph,
    "pagerank_hosts": q_pagerank_hosts,
    "boilerplate_lines": q_boilerplate_lines,
    "strip_boilerplate": q_strip_boilerplate,
    "robots_allowed": q_robots_allowed,
}

R8_ORACLES = {
    "gopher_quality": ORACLE_GOPHER,
    "c4_clean": ORACLE_C4,
    "anchor_texts": ORACLE_ANCHOR_TEXTS,
    "page_meta": ORACLE_PAGE_META,
    "feed_entries": ORACLE_FEED_ENTRIES,
    "markdown": ORACLE_MARKDOWN,
    "jsonld": ORACLE_JSONLD,
    "url_filter": ORACLE_URL_FILTER,
    "outlinks": ORACLE_OUTLINKS,
    "host_graph": ORACLE_HOST_GRAPH,
    "pagerank_hosts": _pagerank_oracle_sql(),
    "boilerplate_lines": ORACLE_BOILERPLATE,
    "strip_boilerplate": ORACLE_STRIP,
    "robots_allowed": ORACLE_ROBOTS,
}


# Round-8 registration (round start, per the registry-freeze rule):
# mutate the live registry here rather than in queries.py so the
# update runs after R8_QUERIES exists regardless of which module is
# imported first (queries.py's bottom import only triggers the load).
from .queries import QUERIES as _LIVE_QUERIES  # noqa: E402

_LIVE_QUERIES.update(R8_QUERIES)
