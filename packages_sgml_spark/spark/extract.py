"""The extraction operator: html binary column -> extracted text, DOM
node table, parse errors.

Spark mapping (SURVEY.md §1.3): one Arrow-batched `mapInPandas` UDF
runs the core parser per row — no per-row Python UDF dispatch; the
batch loop is inside one Python call per Arrow batch.  Catalyst sees a
narrow map over (url, html [, dialect]), so column pruning and
predicate pushdown on the other columns still reach the parquet scan.

At 100 TB: the input is repartitioned by xxhash64(url) so work is
uniform regardless of crawl ordering; hot hosts don't matter here
because the unit of work is a document (embarrassingly parallel), and
the only shuffle in the extract path is that explicit repartition
(skippable with repartition=0 when the source layout is already fine).
"""

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, MapType, StringType, StructField,
    StructType)

from ..core.dom import dom_to_json, extract_text, flatten_nodes
from ..core.parser import ParserOptions, SGMLParser, TextOnlyParser

NODE_TYPE = StructType([
    StructField("node_id", IntegerType()),
    StructField("parent_id", IntegerType()),
    StructField("ord", IntegerType()),
    StructField("kind", StringType()),
    StructField("name", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
    StructField("text", StringType()),
    StructField("subtree_end", IntegerType()),
    StructField("start_pos", IntegerType()),
    StructField("end_pos", IntegerType()),
])

ERROR_TYPE = StructType([
    StructField("severity", StringType()),
    StructField("line", IntegerType()),
    StructField("message", StringType()),
])

EXTRACT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("text_extracted", StringType()),
    StructField("dom_json", StringType()),
    StructField("nodes", ArrayType(NODE_TYPE)),
    StructField("parse_errors", ArrayType(ERROR_TYPE)),
    StructField("n_nodes", IntegerType()),
    StructField("n_errors", IntegerType()),
    StructField("html_bytes", LongType()),
    StructField("status", StringType()),
])

MAX_HTML_BYTES = 8 * 1024 * 1024   # per-row guard (max_memory analog,
                                   # sgml2pl.c:603-615)


def _parse_one(html, dialect, want_dom_json, want_nodes,
               text_format="plain"):
    opts = ParserOptions(dialect=dialect, encoding="utf-8",
                         max_errors=-1 if dialect.startswith(("html", "xhtml"))
                         else 50)
    if dialect.startswith(("html", "xhtml")):
        opts.quiet = False
    if not want_dom_json and not want_nodes:
        if text_format == "markdown":
            # markdown event sink (r8): structure kept as cheap
            # syntax — the LLM-corpus text shape — at near text-only
            # cost (core/markdown.py MarkdownParser, rides the
            # compiled executor's tape mode)
            from ..core.markdown import MarkdownParser
            p = MarkdownParser(opts)
            _dom, errors = p.parse(html)
            errs = [{"severity": e.severity, "line": e.line,
                     "message": e.message} for e in errors]
            return p.markdown(), None, None, errs
        # text-only fast path: no DOM construction
        p = TextOnlyParser(opts)
        _dom, errors = p.parse(html)
        errs = [{"severity": e.severity, "line": e.line,
                 "message": e.message} for e in errors]
        return p.text(), None, None, errs
    if want_nodes and not want_dom_json:
        # node-table fast path (r5): flat rows built in the event
        # sinks — no Element DOM, no recursive flatten; identical
        # rows (NodeTableParser docstring + tape-mode parity tests)
        from ..core.parser import NodeTableParser
        p = NodeTableParser(opts)
        _dom, errors = p.parse(html)
        errs = [{"severity": e.severity, "line": e.line,
                 "message": e.message} for e in errors]
        return p.text(), None, p.finish_rows(), errs
    p = SGMLParser(opts)
    dom, errors = p.parse(html)
    text = extract_text(dom)
    dj = dom_to_json(dom) if want_dom_json else None
    nodes = (flatten_nodes(dom, p.elem_spans, p.data_spans)
             if want_nodes else None)
    errs = [{"severity": e.severity, "line": e.line, "message": e.message}
            for e in errors]
    return text, dj, nodes, errs


def extract_batch_iter(batches: Iterator[pd.DataFrame], dialect_default,
                       want_dom_json, want_nodes, text_format="plain"):
    for pdf in batches:
        out = {k: [] for k in ("url", "text_extracted", "dom_json", "nodes",
                               "parse_errors", "n_nodes", "n_errors",
                               "html_bytes", "status")}
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        dialects = (pdf["dialect"].tolist()
                    if "dialect" in pdf.columns else None)
        for i in range(len(urls)):
            url = urls[i]
            html = htmls[i]
            dialect = (dialects[i] if dialects is not None
                       else dialect_default) or dialect_default
            out["url"].append(url)
            nbytes = len(html) if html is not None else 0
            out["html_bytes"].append(nbytes)
            if html is None or nbytes == 0:
                out["text_extracted"].append(None)
                out["dom_json"].append(None)
                out["nodes"].append(None)
                out["parse_errors"].append([])
                out["n_nodes"].append(0)
                out["n_errors"].append(0)
                out["status"].append("empty")
                continue
            if nbytes > MAX_HTML_BYTES:
                out["text_extracted"].append(None)
                out["dom_json"].append(None)
                out["nodes"].append(None)
                out["parse_errors"].append(
                    [{"severity": "error", "line": 0,
                      "message": "Insufficient input buffer resources"}])
                out["n_nodes"].append(0)
                out["n_errors"].append(1)
                out["status"].append("too_large")
                continue
            try:
                text, dj, nodes, errs = _parse_one(
                    bytes(html), dialect, want_dom_json, want_nodes,
                    text_format)
                out["text_extracted"].append(text)
                out["dom_json"].append(dj)
                out["nodes"].append(nodes)
                out["parse_errors"].append(errs)
                out["n_nodes"].append(len(nodes) if nodes else 0)
                out["n_errors"].append(len(errs))
                out["status"].append("ok")
            except Exception as ex:    # noqa: BLE001 - per-row isolation
                out["text_extracted"].append(None)
                out["dom_json"].append(None)
                out["nodes"].append(None)
                out["parse_errors"].append(
                    [{"severity": "error", "line": 0,
                      "message": "parser exception: %s" % ex}])
                out["n_nodes"].append(0)
                out["n_errors"].append(1)
                out["status"].append("exception")
        yield pd.DataFrame(out)


def extract(pages: DataFrame, dialect="html5", dom_json=False, nodes=True,
            repartition="auto", text_format="plain") -> DataFrame:
    """pages(url, html [, dialect]) -> EXTRACT_SCHEMA DataFrame.

    `repartition` > 0 shuffles by xxhash64(url) first (uniform work
    distribution at crawl scale); "auto" (default) repartitions by url
    hash only when the source has fewer partitions than cores (an
    under-partitioned small input would otherwise parse on one core;
    no-op on well-laid-out crawl inputs); 0 keeps source partitioning.

    `text_format="markdown"` renders text_extracted as Markdown (the
    LLM-corpus text shape) instead of plain text — same schema,
    lineage, and resume semantics, only the text column's shape
    changes.  Valid only with dom_json=False, nodes=False (the
    markdown sink is DOM-free).
    """
    if text_format not in ("plain", "markdown"):
        raise ValueError("text_format must be 'plain' or 'markdown'")
    if text_format == "markdown" and (dom_json or nodes):
        raise ValueError("text_format='markdown' requires "
                         "dom_json=False, nodes=False")
    from .util import spread
    cols = ["url", "html"]
    if "dialect" in pages.columns:
        cols.append("dialect")
    src = pages.select(*cols)
    if repartition == "auto":
        src = spread(src, F.xxhash64("url"))
    elif repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    def fn(batches):
        return extract_batch_iter(batches, dialect, dom_json, nodes,
                                  text_format)

    return src.mapInPandas(fn, schema=EXTRACT_SCHEMA)


def extract_text_only(pages: DataFrame, dialect="html5",
                      repartition="auto") -> DataFrame:
    """Text-only extraction sink for callers that keep ONLY the
    extracted text (r9): per-row semantics identical to
    extract(nodes=False, dom_json=False) — same parser, same options,
    empty/oversized/failed rows yield NULL text — but the worker
    ships one string column back instead of the full 9-column
    EXTRACT_SCHEMA, whose parse_errors array<struct> pays Arrow's
    per-struct conversion for every warning row the quiet=False HTML
    parse collects (guide §4.1: control how many columns cross the
    boundary).  extract() keeps its schema for callers that read the
    error/meta columns (bench parse_throughput forces all of them)."""
    def one(html):
        opts = ParserOptions(dialect=dialect, encoding="utf-8",
                             max_errors=-1
                             if dialect.startswith(("html", "xhtml"))
                             else 50)
        if dialect.startswith(("html", "xhtml")):
            opts.quiet = False
        p = TextOnlyParser(opts)
        p.parse(html)
        return p.text(), "ok"

    return _page_sink(pages, "text_extracted", one, repartition)


MARKDOWN_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("markdown", StringType()),
    StructField("n_errors", IntegerType()),
    StructField("status", StringType()),
])


def extract_markdown(pages: DataFrame, dialect="html5",
                     repartition="auto") -> DataFrame:
    """pages(url, html) -> (url, markdown, n_errors, status): HTML
    rendered to Markdown (core/markdown.py) — structure kept as cheap
    syntax, the text shape modern LLM corpora train on.  Same
    worker-batch loop, per-row isolation, and size guards as
    extract(); one narrow map, no shuffle beyond the spread.
    r8: renders from the event stream (MarkdownParser — no Element
    DOM, rides the compiled executor's tape mode), byte-identical to
    the dom_to_markdown walker by the differential tests in
    tests/test_markdown.py."""
    from ..core.parser import ParserOptions
    from ..core.markdown import MarkdownParser
    from .util import spread
    pages = spread(pages, "url", factor=1) if repartition == "auto" \
        else (pages.repartition(int(repartition), "url")
              if repartition else pages)

    def fn(batches):
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"].tolist(),
                                 pdf["html"].tolist()):
                nbytes = len(html) if html is not None else 0
                if nbytes == 0:
                    rows.append((url, None, 0, "empty"))
                    continue
                if nbytes > MAX_HTML_BYTES:
                    rows.append((url, None, 1, "too_large"))
                    continue
                try:
                    # same error policy as extract(): unlimited
                    # collection only for the HTML dialects; strict
                    # ones cap at 50 so one garbage row can't
                    # accumulate millions of ParseError objects
                    html_d = dialect.startswith(("html", "xhtml"))
                    opts = ParserOptions(
                        dialect=dialect, encoding="utf-8",
                        max_errors=-1 if html_d else 50)
                    if html_d:
                        opts.quiet = False
                    p = MarkdownParser(opts)
                    _dom, errors = p.parse(bytes(html))
                    rows.append((url, p.markdown(), len(errors),
                                 "ok"))
                except Exception as ex:  # noqa: BLE001 per-row isolation
                    rows.append((url, None, 1,
                                 "exception: %s" % ex))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MARKDOWN_SCHEMA])

    return (pages.select("url", "html")
            .mapInPandas(fn, schema=MARKDOWN_SCHEMA))


def extract_element_text(pages: DataFrame, element="title",
                         dialect="html5", repartition="auto") -> DataFrame:
    """Selective extraction of the first <element>'s text per page
    (stop-condition fast path: the tokenizer abandons the byte stream
    the moment the element closes — FirstElementTextParser).  Same
    single-narrow-map shape as extract(); at crawl scale this is the
    cheap metadata pass (title, first h1, canonical link text) that
    shouldn't pay for a full parse."""
    def one(html):
        from ..core.parser import FirstElementTextParser, ParserOptions
        p = FirstElementTextParser(
            ParserOptions(dialect=dialect, encoding="utf-8",
                          max_errors=-1, quiet=True), target=element)
        p.parse(html)
        t = p.text()
        return t, ("ok" if t is not None else "not_found")

    return _page_sink(pages, "element_text", one, repartition)


def serialize_pages(pages: DataFrame, dialect="html5",
                    out_dialect="xml", repartition="auto") -> DataFrame:
    """Parse each page and write the DOM back as compact XML
    (sgml_write.pl inverse-of-parser role re-expressed as a Spark
    operator): pages(url, html) -> (url, xml_out).  The writer runs
    with layout=False/net=True so output is deterministic and
    SQL-reconstructable for synthesized corpora."""
    def one(html):
        from ..core.parser import ParserOptions, SGMLParser
        from ..core.serialize import xml_write
        p = SGMLParser(ParserOptions(dialect=dialect, encoding="utf-8",
                                     max_errors=-1, quiet=True))
        dom, _errors = p.parse(html)
        return xml_write(dom, header=False, layout=False, net=True,
                         dialect=out_dialect), "ok"

    return _page_sink(pages, "xml_out", one, repartition)


def extract_tag_counts(pages: DataFrame,
                       dialect="html5", repartition="auto") -> DataFrame:
    """Per-partition element-name histogram: pages(url, html) ->
    (name, n) partial counts, one row per DISTINCT name per task —
    the map-side combine happens inside the Python worker
    (core.parser.TagCountParser), so the shuffle that follows a
    `groupBy(name)` moves a few hundred rows per task instead of one
    struct per DOM node.  Counts match the node-table path exactly
    (explicit + implied begins == element nodes; pytest parity) at
    ~2.4x less cost — the aggregate-don't-materialize shape for
    crawl-scale tag analytics.  Per-row guards mirror extract():
    empty/oversized/exception rows contribute nothing."""
    from .util import spread
    src = pages.select("url", "html")
    if repartition == "auto":
        src = spread(src, F.xxhash64("url"))
    elif repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    def fn(batches):
        from collections import Counter

        from ..core.parser import ParserOptions, TagCountParser
        total = Counter()
        for pdf in batches:
            for html in pdf["html"]:
                if html is None or len(html) == 0 or \
                        len(html) > MAX_HTML_BYTES:
                    continue
                p = TagCountParser(ParserOptions(
                    dialect=dialect, encoding="utf-8", max_errors=-1))
                try:
                    p.parse(bytes(html))
                except Exception:   # noqa: BLE001 - per-row isolation
                    continue
                total.update(p.counts)
        yield pd.DataFrame({"name": list(total),
                            "n": list(total.values())})

    return src.mapInPandas(fn, schema="name string, n long")


NODE_ROWS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("node_id", IntegerType()),
    StructField("parent_id", IntegerType()),
    StructField("ord", IntegerType()),
    StructField("kind", StringType()),
    StructField("name", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
    StructField("text", StringType()),
    StructField("subtree_end", IntegerType()),
    StructField("start_pos", IntegerType()),
    StructField("end_pos", IntegerType()),
])


def extract_nodes_rows(pages: DataFrame, dialect="html5",
                       repartition="auto", columns=None) -> DataFrame:
    """Node-table extraction emitting FLAT per-node rows (the
    explode_nodes(extract(nodes=True)) shape) straight from the
    worker, columnar (r5).

    Why: at scale the array<struct> route pays Arrow's per-struct
    Python-dict conversion — measured ~36 µs/node CPU on the 120k-doc
    soak, an order of magnitude more than the parse itself.  Emitting
    one row per node as plain COLUMNS converts int/string columns
    vectorized; the same 48M-node corpus drops from dominating the
    job to a fraction of it.  Output rows are identical to the
    explode path (same oracle; A/B pytest), failed/empty/oversized
    documents contribute no rows, and the plan loses its Generate
    (explode) node — a narrow map is all that remains.

    r9: `columns` restricts the emitted node columns (guide §4.1 —
    Catalyst cannot prune through the opaque map, so without this
    every caller paid the Python-append + Arrow conversion for all
    ten columns; the attrs map column is the expensive one).  Values
    of the kept columns are identical to the full emission."""
    from .util import spread
    src = pages.select("url", "html")
    if repartition == "auto":
        src = spread(src, F.xxhash64("url"))
    elif repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    COLS = ("node_id", "parent_id", "ord", "kind", "name", "attrs",
            "text", "subtree_end", "start_pos", "end_pos")
    if columns is not None:
        want = set(columns)
        unknown = want - set(COLS)
        if unknown:
            raise ValueError("unknown node columns: %s" % unknown)
        COLS = tuple(c for c in COLS if c in want)
        schema = StructType(
            [NODE_ROWS_SCHEMA["url"]] +
            [NODE_ROWS_SCHEMA[c] for c in COLS])
    else:
        schema = NODE_ROWS_SCHEMA

    def fn(batches):
        from ..core.parser import NodeTableParser, ParserOptions
        for pdf in batches:
            out = {k: [] for k in ("url",) + COLS}
            urls_out = out["url"]
            for url, html in zip(pdf["url"].tolist(),
                                 pdf["html"].tolist()):
                if html is None or len(html) == 0 or \
                        len(html) > MAX_HTML_BYTES:
                    continue
                p = NodeTableParser(ParserOptions(
                    dialect=dialect, encoding="utf-8", max_errors=-1))
                try:
                    p.parse(bytes(html))
                except Exception:   # noqa: BLE001 - per-row isolation
                    continue
                rows = p.finish_rows()
                urls_out.extend([url] * len(rows))
                for k in COLS:
                    col = out[k]
                    for r in rows:
                        col.append(r[k])
            if urls_out:
                # never yield an empty frame: pandas would type the
                # attrs column float64 and Arrow's map converter
                # rejects the dtype (observed on all-failed batches)
                yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=schema)


def extract_name_count(pages: DataFrame, name="a",
                       dialect="html5", repartition="auto") -> DataFrame:
    """Per-document count of one element name: pages(url, html) ->
    (url, n) with n >= 1 — the count_links shape (r5, mirroring the
    r4 element_histogram counting path).  A TagCountParser counts
    begin events in the worker (explicit + implied begins == element
    nodes, pytest parity), so the query never materializes or ships
    node structs: the plan is a narrow map emitting one (url, long)
    row per matching document instead of one struct per DOM node.
    Docs with zero matches are omitted (the node-table path's
    filter-then-groupBy has the same semantics); empty/oversized/
    failed rows contribute nothing, mirroring extract()."""
    from .util import spread
    src = pages.select("url", "html")
    if repartition == "auto":
        src = spread(src, F.xxhash64("url"))
    elif repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    def fn(batches):
        from ..core.parser import ParserOptions, TagCountParser
        for pdf in batches:
            urls, counts = [], []
            for url, html in zip(pdf["url"].tolist(),
                                 pdf["html"].tolist()):
                if html is None or len(html) == 0 or \
                        len(html) > MAX_HTML_BYTES:
                    continue
                p = TagCountParser(ParserOptions(
                    dialect=dialect, encoding="utf-8", max_errors=-1))
                try:
                    p.parse(bytes(html))
                except Exception:   # noqa: BLE001 - per-row isolation
                    continue
                c = p.counts.get(name, 0)
                if c:
                    urls.append(url)
                    counts.append(c)
            yield pd.DataFrame({"url": urls, "n": counts})

    return src.mapInPandas(fn, schema="url string, n long")


def _page_sink(pages: DataFrame, col_name, fn_one,
               repartition="auto") -> DataFrame:
    """Shared shape for per-page text sinks (first-element text,
    serialized XML, ESIS dump, canonical XML): url+html ->
    (url, <col>, status) via one narrow mapInPandas, with the usual
    spread/repartition handling, the per-row size guard, and per-row
    exception isolation.  fn_one(bytes) -> (value, status)."""
    schema = StructType([StructField("url", StringType()),
                         StructField(col_name, StringType()),
                         StructField("status", StringType())])
    src = pages.select("url", "html")
    if repartition == "auto":
        from .util import spread
        src = spread(src, F.xxhash64("url"))
    elif repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in ("url", col_name, "status")}
            for url, html in zip(pdf["url"].tolist(),
                                 pdf["html"].tolist()):
                out["url"].append(url)
                if html is None or len(html) == 0:
                    out[col_name].append(None)
                    out["status"].append("empty")
                    continue
                if len(html) > MAX_HTML_BYTES:
                    out[col_name].append(None)
                    out["status"].append("too_large")
                    continue
                try:
                    val, status = fn_one(bytes(html))
                    out[col_name].append(val)
                    out["status"].append(status)
                except Exception as ex:   # noqa: BLE001
                    out[col_name].append(None)
                    out["status"].append("exception: %s" % ex)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=schema)


def esis_pages(pages: DataFrame, dialect="html5",
               repartition="auto") -> DataFrame:
    """ESIS event-dump sink (the reference CLI's golden format,
    sgml.c:194-281) as a Spark operator: (url, esis, status)."""
    def one(html):
        from ..core.esis import esis_dump
        return esis_dump(html, dialect=dialect, encoding="utf-8",
                         quiet=True, max_errors=-1), "ok"

    return _page_sink(pages, "esis", one, repartition)


def c14n_pages(pages: DataFrame, dialect="xml", method=None,
               keep_prefix=False, repartition="auto") -> DataFrame:
    """Canonical-XML sink (xml_write_canonical) as a Spark operator.

    Default is the exclusive method (byte-exact vs the reference's 17
    -exc outputs).  method=c14n.C14N selects the reference's plain
    non-exclusive canonicalization (c14n2.pl:64-71 method option;
    tests/test_c14n_plain.py) — for ns-bearing inputs pass
    dialect="xmlns" and keep_prefix=True, the xml_write_canonical/3
    input contract (c14n2.pl:58-63)."""
    def one(html):
        from ..core.c14n import EXC_C14N, xml_write_canonical
        from ..core.parser import ParserOptions, SGMLParser
        p = SGMLParser(ParserOptions(dialect=dialect, encoding="utf-8",
                                     keep_prefix=keep_prefix,
                                     quiet=True, max_errors=-1))
        dom, _errors = p.parse(html)
        return xml_write_canonical(
            dom, method=method if method is not None else EXC_C14N), "ok"

    return _page_sink(pages, "c14n", one, repartition)


def extracted_with_meta(pages: DataFrame, extracted: DataFrame) -> DataFrame:
    """Join extraction output back to page metadata (broadcast-free:
    both sides share the url key; Catalyst picks SMJ / shuffle hash)."""
    meta = pages.select("url", "warc_ts", "lang")
    return extracted.join(meta, "url", "left")


MAIN_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("text_main", StringType()),
    StructField("n_blocks_kept", IntegerType()),
    StructField("n_errors", IntegerType()),
    StructField("status", StringType()),
])


def extract_main(pages: DataFrame, dialect="html5", min_words=3,
                 max_link_density=0.4, repartition="auto") -> DataFrame:
    """Main-content extraction (boilerplate strip via DOM heuristics,
    core/boilerplate.py): pages(url, html) -> (url, text_main, ...).
    Same single-narrow-map shape as extract()."""

    src = pages.select("url", "html")
    if repartition == "auto":
        from .util import spread
        src = spread(src, F.xxhash64("url"))
    elif repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    def fn(batches):
        from ..core.parser import SGMLParser, ParserOptions
        from ..core.boilerplate import main_content
        for pdf in batches:
            out = {k: [] for k in ("url", "text_main", "n_blocks_kept",
                                   "n_errors", "status")}
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            for i in range(len(urls)):
                out["url"].append(urls[i])
                html = htmls[i]
                if html is None or len(html) == 0:
                    out["text_main"].append(None)
                    out["n_blocks_kept"].append(0)
                    out["n_errors"].append(0)
                    out["status"].append("empty")
                    continue
                try:
                    p = SGMLParser(ParserOptions(
                        dialect=dialect, encoding="utf-8",
                        max_errors=-1))
                    dom, errors = p.parse(bytes(html))
                    text = main_content(dom, min_words,
                                        max_link_density)
                    out["text_main"].append(text)
                    out["n_blocks_kept"].append(
                        len(text.split("\n")) if text else 0)
                    out["n_errors"].append(len(errors))
                    out["status"].append("ok")
                except Exception as ex:   # noqa: BLE001
                    out["text_main"].append(None)
                    out["n_blocks_kept"].append(0)
                    out["n_errors"].append(1)
                    out["status"].append("exception: %s" % ex)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=MAIN_SCHEMA)
