"""Differential tests for the compiled executor's TAPE MODE (r5):
DOM-building (plain SGMLParser), counting (TagCountParser) and ESIS
(ESISParser) parses ride the C tokenizer, which records begin/end/
data events for _drain_tape.  With parser._CSPEED nulled the pure
Python executor is the semantic oracle; output — DOM JSON, node
table INCLUDING elem/data spans, error list, final location — must
be identical on every input."""

import glob
import random

import pytest

import packages_sgml_spark.core.parser as P
from packages_sgml_spark.core.dom import (
    dom_to_json, extract_text, flatten_nodes)
from packages_sgml_spark.core.parser import (
    ParserOptions, SGMLParser, TagCountParser)

from test_cspeed import WORDS, TAGS, _soup  # noqa: F401 (shared corpus)

P._load_cspeed()

pytestmark = pytest.mark.skipif(
    P._CSPEED is None, reason="compiled executor unavailable")


def _run_dom(docs, dialect="html5", encoding="utf-8"):
    out = []
    for d in docs:
        p = SGMLParser(ParserOptions(dialect=dialect, encoding=encoding,
                                     max_errors=-1))
        dom, errors = p.parse(d)
        out.append((extract_text(dom), dom_to_json(dom),
                    flatten_nodes(dom, p.elem_spans, p.data_spans),
                    [(e.severity, e.line, e.message) for e in errors],
                    p.line, p.linepos, p.charpos,
                    len(p.environments)))
    return out


def _diff_dom(docs, dialect="html5", encoding="utf-8"):
    saved = P._CSPEED
    assert saved is not None
    try:
        with_c = _run_dom(docs, dialect, encoding)
        P._CSPEED = None
        no_c = _run_dom(docs, dialect, encoding)
    finally:
        P._CSPEED = saved
    for i, (a, b) in enumerate(zip(with_c, no_c)):
        assert a == b, (i, repr(docs[i][:200]))


def test_tape_soup_differential():
    rng = random.Random(50607080)
    docs = [_soup(rng) for _ in range(150)]
    _diff_dom(docs)


def test_tape_structured_cases():
    docs = [
        "hello <b>world</b>",
        "   \n\t  <p>blank prefix</p>",
        "&amp; entity before any tag",
        "<p><br>after empty<hr>more",
        "<ul><li>one<li>two</ul>",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        "<p>a\r\nb\rc\nd</p>",
        "<title>T</title><p>body",
        "<div>" * 50 + "deep" + "</div>" * 50,
        "<p>&#65;&amp;x&nbsp;y</p>",
        "<pre>  kept  \n spacing </pre>",
        "<script>1 < 2 && x</script>tail",
        "<p clAss=MiXed id='q'>attrs</p>",
        "<zzz><yyy>undefined soup</zzz>tail",
        "<p>one<p>two<p>three",
        "a<em>b<i>c</em>d",          # mis-nesting recovery
        "<img src=x alt='y'>solo",
        "text only, no tags at all",
        "<body bgcolor=white><p>body attr</body>",
    ]
    _diff_dom(docs)


def test_tape_reference_corpus():
    files = sorted(glob.glob("/root/reference/Test/*.sgml") +
                   glob.glob("/root/reference/Test/*.xml") +
                   glob.glob("/root/reference/Test/*.html"))
    if not files:
        pytest.skip("reference corpus absent")
    docs = []
    for f in files:
        with open(f, "rb") as fh:
            docs.append(fh.read())
    from packages_sgml_spark.core import htmldtd
    saved = dict(htmldtd._CACHE)
    htmldtd._CACHE.clear()
    try:
        _diff_dom(docs)
    finally:
        htmldtd._CACHE.clear()
        htmldtd._CACHE.update(saved)


def test_tape_xml_dialects():
    docs = [
        "<root><a x='1'>t</a><b/>tail</root>",
        "<r xml:space='preserve'>  kept  <i>  in  </i></r>",
        "<r xml:space='default'>  collapsed  </r>",
        "<doc><p>one</p>\n<p>two</p>\n</doc>",
        "<a><b><c>deep</c></b></a>",
    ]
    _diff_dom(docs, dialect="xml")


def test_tape_counting_parser_rides_c():
    """TagCountParser engages tape mode (BEGIN not noop) and its
    counts equal the pure-Python run AND the node table's."""
    import collections
    rng = random.Random(31415)
    docs = [_soup(rng, 80) for _ in range(40)]
    saved = P._CSPEED

    def counts(doc):
        p = TagCountParser(ParserOptions(dialect="html5",
                                         encoding="utf-8",
                                         max_errors=-1))
        p.parse(doc)
        return p.counts

    try:
        with_c = [counts(d) for d in docs]
        P._CSPEED = None
        no_c = [counts(d) for d in docs]
    finally:
        P._CSPEED = saved
    assert with_c == no_c
    # and against the node table (C on)
    for d in docs[:10]:
        ps = SGMLParser(ParserOptions(dialect="html5",
                                      encoding="utf-8", max_errors=-1))
        dom, _ = ps.parse(d)
        nodes = flatten_nodes(dom, ps.elem_spans, ps.data_spans)
        want = collections.Counter(
            nd["name"] for nd in nodes if nd["kind"] == "element")
        assert counts(d) == want


def test_tape_esis_differential():
    from packages_sgml_spark.core.esis import esis_dump
    rng = random.Random(777)
    docs = [_soup(rng, 60) for _ in range(30)]
    saved = P._CSPEED
    try:
        with_c = [esis_dump(d, dialect="html5", encoding="utf-8",
                            quiet=True, max_errors=-1) for d in docs]
        P._CSPEED = None
        no_c = [esis_dump(d, dialect="html5", encoding="utf-8",
                          quiet=True, max_errors=-1) for d in docs]
    finally:
        P._CSPEED = saved
    assert with_c == no_c


def test_tape_chunked_feed():
    """Tape drains per process_chars_toplevel call; chunk boundaries
    at every offset must not change the DOM or spans."""
    doc = ("<html><head><title>T</title></head><body><p>one &amp; "
           "two\r\n<ul><li>a<li>b</ul><p>x<br>y</body></html>")

    def run_chunked(step):
        p = SGMLParser(ParserOptions(dialect="html5",
                                     encoding="utf-8"))
        for k in range(0, len(doc), step):
            p.feed(doc[k:k + step])
        dom, errors = p.close()
        return (dom_to_json(dom),
                flatten_nodes(dom, p.elem_spans, p.data_spans),
                [(e.severity, e.line, e.message) for e in errors])

    want = run_chunked(len(doc))
    for step in range(1, 40):
        assert run_chunked(step) == want, step


def test_tape_stop_at_excluded():
    """stop_at parses must NOT engage tape mode (C would consume
    past the stop point): parse(element) output and the re-entrant
    content parse stay correct with C loaded."""
    p = SGMLParser(ParserOptions(dialect="html5", encoding="utf-8",
                                 max_errors=-1, stop_at="element"))
    dom, _ = p.parse("<p>first</p><p>second</p>")
    assert extract_text(dom) == "first"


def _rows_via_dom(doc, dialect="html5"):
    p = SGMLParser(ParserOptions(dialect=dialect, encoding="utf-8",
                                 max_errors=-1))
    dom, errors = p.parse(doc)
    return (extract_text(dom),
            flatten_nodes(dom, p.elem_spans, p.data_spans),
            [(e.severity, e.line, e.message) for e in errors])


def _rows_via_table(doc, dialect="html5"):
    from packages_sgml_spark.core.parser import NodeTableParser
    p = NodeTableParser(ParserOptions(dialect=dialect, encoding="utf-8",
                                      max_errors=-1))
    p.parse(doc)
    return (p.text(), p.finish_rows(),
            [(e.severity, e.line, e.message) for e in p.errors])


def test_node_table_parser_matches_flatten():
    """NodeTableParser's direct rows == SGMLParser + flatten_nodes
    on soup, reference-ish structure, PIs, CDATA elements and EOF
    soup — with the C executor live AND disabled."""
    rng = random.Random(909090)
    docs = [_soup(rng, 80) for _ in range(60)] + [
        "<html><head><title>T</title></head><body><p>x<p>y</body>",
        "<?pi at top?><p>a<?pi inner?>b</p>",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        "<p>unclosed <b>soup",
        "<script>1 < 2 && x</script>after",
        "text only",
        "",
    ]
    saved = P._CSPEED
    for c_on in (True, False):
        if not c_on:
            P._CSPEED = None
        try:
            for d in docs:
                assert _rows_via_table(d) == _rows_via_dom(d), \
                    (c_on, repr(d[:120]))
        finally:
            P._CSPEED = saved


def test_node_table_parser_reference_corpus():
    files = sorted(glob.glob("/root/reference/Test/*.sgml") +
                   glob.glob("/root/reference/Test/*.xml"))
    if not files:
        pytest.skip("reference corpus absent")
    from packages_sgml_spark.core import htmldtd
    saved = dict(htmldtd._CACHE)
    htmldtd._CACHE.clear()
    try:
        for f in files:
            with open(f, "rb") as fh:
                d = fh.read()
            # no warm-up pass: per-parse DTD copy-on-write (dtd.DtdCow)
            # makes every parse see the pristine shared DTD
            assert _rows_via_table(d) == _rows_via_dom(d), f
    finally:
        htmldtd._CACHE.clear()
        htmldtd._CACHE.update(saved)


def test_tape_xml_soup():
    """XML-dialect tag soup through the tape-mode DOM path (mirrors
    test_cspeed_xml_soup at the node-table level)."""
    rng = random.Random(13579)
    docs = []
    for _ in range(60):
        parts = []
        for _ in range(40):
            r = rng.random()
            if r < 0.4:
                parts.append(rng.choice(
                    ["text", " ", "\n", "&amp;", "&#65;", "x&y",
                     "caf\xe9", "]]>", "a<b", "\r\n"]))
            elif r < 0.65:
                t = rng.choice(["a", "b", "item", "Mixed", "UPPER"])
                parts.append(rng.choice(
                    ["<%s>" % t, "<%s/>" % t,
                     '<%s k="v" xml:space="preserve">' % t,
                     '<%s xml:space="default">' % t]))
            elif r < 0.9:
                parts.append("</%s>" % rng.choice(
                    ["a", "b", "item", "Mixed", "UPPER"]))
            else:
                parts.append(rng.choice(
                    ["<!-- c -->", "<![CDATA[x]]>", "<?pi?>"]))
        docs.append("".join(parts))
    _diff_dom(docs, dialect="xml")


def test_tape_multi_dialect_sweep():
    """Per-dialect differential soup sweep for the DOM path (html5 /
    html / sgml / xml / xhtml5)."""
    for dialect, seed in (("html5", 1), ("html", 2), ("sgml", 3),
                          ("xml", 4), ("xhtml5", 5)):
        rng = random.Random(867000 + seed)
        docs = [_soup(rng, 50) for _ in range(40)]
        _diff_dom(docs, dialect=dialect)


try:
    from hypothesis import given, settings, strategies as st
    _HAVE_HYP = True
except ImportError:                                 # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    _token = st.one_of(
        st.sampled_from(WORDS),
        st.sampled_from(TAGS).map(lambda t: "<%s>" % t),
        st.sampled_from(TAGS).map(lambda t: "</%s>" % t),
        st.sampled_from(["<!-- c -->", "<![CDATA[x<y]]>", "<?pi?>",
                         "&#x41;", "&amp;", "&nope;", "\r\n", "\r",
                         "]]>", "]", "<", "&", "< ", "<1bad>",
                         "<pre>", "</pre>", "<br>", "\r<p>\r"]),
        st.text(alphabet="ab <>&;/\r\n\t\xe9", min_size=0,
                max_size=12),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_token, min_size=0, max_size=40))
    def test_tape_differential_hypothesis(tokens):
        doc = "".join(tokens)
        _diff_dom([doc])


def test_unquoted_attr_gripe_not_memoized():
    """r5 regression: the S_DECL unquoted-attribute-in-XML warning
    fires before process_begin_element's err0 capture; the tag must
    NOT be memoized (replay used to silently drop the warning from
    the second parse on), and C/PY must agree on every parse."""
    doc = "<a href=x><tr>text</tr></a>"

    def errs(c_on):
        p = SGMLParser(ParserOptions(dialect="xhtml5",
                                     encoding="utf-8", max_errors=-1))
        if not c_on:
            p._cspeed_noprog = 999
        p.parse(doc)
        return [e.message for e in p.errors]

    for _ in range(3):
        a, b = errs(True), errs(False)
        assert a == b
        assert any("Unquoted attribute" in m for m in a)


def test_tape_chunked_feed_random_multidialect():
    """Randomized chunk boundaries over soup docs, html5 and xml:
    feed()-driven tape parses must equal the whole-doc parse AND the
    C-off run (DOM + spans + errors)."""
    rng = random.Random(4242)

    def run_doc(doc, dialect, chunks, c_on):
        p = SGMLParser(ParserOptions(dialect=dialect,
                                     encoding="utf-8", max_errors=-1))
        if not c_on:
            p._cspeed_noprog = 999
        if chunks is None:
            dom, errors = p.parse(doc)
        else:
            for ch in chunks:
                p.feed(ch)
            dom, errors = p.close()
        return (dom_to_json(dom),
                flatten_nodes(dom, p.elem_spans, p.data_spans),
                [(e.severity, e.line, e.message) for e in errors])

    for dialect in ("html5", "xml"):
        for _ in range(12):
            doc = _soup(rng, 40).encode("utf-8")
            cuts = sorted(rng.sample(range(len(doc) + 1),
                                     min(6, len(doc))))
            chunks = [doc[a:b] for a, b in
                      zip([0] + cuts, cuts + [len(doc)])]
            whole = run_doc(doc, dialect, None, True)
            assert run_doc(doc, dialect, chunks, True) == whole, \
                (dialect, repr(doc[:120]), cuts)
            assert run_doc(doc, dialect, chunks, False) == whole, \
                (dialect, repr(doc[:120]), cuts)


def test_golden_corpus_chunked_feed():
    """The reference Test corpus fed in random chunks (C on and off)
    must equal the whole-document parse — DOM JSON, extracted text
    and error lists.  One random chunking per file per mode keeps the
    runtime small; the seed is fixed so failures reproduce."""
    files = sorted(glob.glob("/root/reference/Test/*.sgml") +
                   glob.glob("/root/reference/Test/*.xml"))
    if not files:
        pytest.skip("reference corpus absent")
    rng = random.Random(2026)
    for f in files:
        with open(f, "rb") as fh:
            data = fh.read()
        dialect = "sgml" if f.endswith(".sgml") else "xml"
        for c_on in (True, False):
            p0 = SGMLParser(ParserOptions(dialect=dialect,
                                          encoding="utf-8"))
            if not c_on:
                p0._cspeed_noprog = 999
            dom0, err0 = p0.parse(data)
            want = (dom_to_json(dom0), extract_text(dom0),
                    [(e.severity, e.line, e.message) for e in err0])
            cuts = sorted(rng.sample(range(len(data) + 1),
                                     min(8, len(data))))
            chunks = [data[a:b] for a, b in
                      zip([0] + cuts, cuts + [len(data)])]
            p = SGMLParser(ParserOptions(dialect=dialect,
                                         encoding="utf-8"))
            if not c_on:
                p._cspeed_noprog = 999
            for ch in chunks:
                p.feed(ch)
            dom, err = p.close()
            got = (dom_to_json(dom), extract_text(dom),
                   [(e.severity, e.line, e.message) for e in err])
            assert got == want, (f, c_on, cuts)


def _xmlns_soup(rng, n_tokens=50):
    parts = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(
                ["text", " ", "\n", "&amp;", "&#65;", "x&y",
                 "caf\xe9", "\r\n"]))
        elif r < 0.62:
            t = rng.choice(["e", "item", "a:e", "q:z", "div", "span"])
            parts.append(rng.choice(
                ["<%s>" % t, "<%s/>" % t, '<%s k="v">' % t,
                 '<%s xmlns="http://default/%d">' % (t,
                                                     rng.randrange(3)),
                 '<%s xmlns:a="http://a/%d">' % (t, rng.randrange(3)),
                 '<%s a:attr="v">' % t,
                 '<%s xml:space="preserve">' % t]))
        elif r < 0.88:
            parts.append("</%s>" % rng.choice(
                ["e", "item", "a:e", "q:z", "div", "span"]))
        else:
            parts.append(rng.choice(
                ["<!-- c -->", "<![CDATA[x]]>", "<?pi?>"]))
    return "".join(parts)


def test_tape_xmlns_structured():
    """xmlns through the tape-mode DOM/node-table path: resolved
    names and attr URIs must be identical C-on vs C-off, including
    regions where C pops a binding-carrying ancestor before the
    drain runs (the _ns_drain snapshot case)."""
    docs = [
        # default-ns scope closes mid-region, sibling outside it
        '<r><c xmlns="u1"><d>x</d><d>y</d></c><d>z</d></r>',
        # nested default-ns override + pop back
        '<r xmlns="outer"><c xmlns="inner"><d>x</d></c><d>y</d></r>',
        # prefixed names (C-bailed) interleaved with neutral tags
        ('<root xmlns="http://d" xmlns:a="http://a">'
         '<a:item k="1">x</a:item><plain>t</plain>'
         '<a:item k="1">y</a:item><plain>t</plain></root>'),
        # undefined prefix gripes, twice (per-occurrence)
        '<r><b:unb>q</b:unb><b:unb>q</b:unb></r>',
        # prefixed ATTRS on neutral names (bail via attr colon)
        '<r xmlns:p="u"><e p:at="v">1</e><e p:at="v">2</e></r>',
        # xml:space inside ns scopes
        ('<r xmlns="u"><i xml:space="preserve">  s  </i>'
         '<i xml:space="preserve">  s  </i></r>'),
        # deep repeated neutral tags (the C replay hot path)
        '<r xmlns="u">' + '<d k="v">t</d>' * 30 + '</r>',
        # r7 name-memo invalidation: the SAME element name must
        # resolve differently across sibling regions separated by
        # drain pops (_ns_drain_names clears on stack.pop())
        '<r><a xmlns="p"><x>1</x></a><a xmlns="q"><x>2</x></a><x>3</x></r>',
        # unbind (xmlns="") between regions sharing names
        '<r xmlns="u0"><a xmlns=""><b>x</b></a><b>y</b></r>',
        # default changes per subtree with trailing sibling after pop
        ('<r xmlns="u0"><a xmlns="u1"><b>t1</b><c>t2</c></a><d>t3</d>'
         '<a xmlns="u2"><b>t4</b></a><e>t5</e></r>'),
    ]
    _diff_dom(docs, dialect="xmlns")


def test_tape_xmlns_soup():
    rng = random.Random(24681357)
    docs = [_xmlns_soup(rng) for _ in range(80)]
    _diff_dom(docs, dialect="xmlns")


def test_tape_stale_allow_cache_across_rollbacks():
    """r6 regression (found by the soup differential): the compiled
    executor's (parent, child) allow_for-membership cache must not
    carry positives across a DtdCow flip rollback — the next parse
    re-flips the element with a FRESH empty model, and a stale
    positive would skip allow_for, leaving the model without #PCDATA
    so a later blank flush under that element drops text that pure
    Python emits (model.ALLOW_GEN flush).  Three-parse shape: teach,
    re-teach, then the EOF-blank probe document."""
    docs = [
        "<weird-tag><p>x</p>y</weird-tag>",          # teach: allow p + #PCDATA
        "<weird-tag>z<p>q</p></weird-tag>",          # re-teach after rollback
        # the probe: trailing blank under a fresh weird-tag whose
        # engine visibility depends on allow_for having run this doc
        '<td><weird-tag>a</weird-tag></td><weird-tag> ',
    ]
    _diff_dom(docs)
    # and the original 150-doc corpus shape, twice in sequence
    rng = random.Random(50607080)
    corpus = [_soup(rng) for _ in range(150)]
    _diff_dom(corpus[140:] + corpus[140:])


def test_tape_shape_replay_unique_values():
    """Shape fast path (r6): begin tags whose attr VALUES are unique
    per occurrence replay by (name, attr-names) shape with C parsing
    the values — DOM, node rows, errors identical to pure Python, and
    per-occurrence values must not leak between occurrences."""
    rng = random.Random(97531)
    docs = []
    for d in range(30):
        parts = ["<html><body>"]
        for j in range(40):
            parts.append('<p class="c%d-%d">t%d</p>' % (d, j, j))
            parts.append('<a href="https://h/%d/%d" title=\'T%d\'>x</a>'
                         % (d, j, j))
            if j % 7 == 0:
                parts.append('<li class="k%d">item' % j)   # omitted close
            if j % 11 == 0:
                # value shapes C must NOT take: entities, unquoted,
                # tabs in values, shorthand
                parts.append('<p class="a&amp;b">e</p>')
                parts.append('<p class=bare>u</p>')
                parts.append('<p class="ta\tb">t</p>')
        parts.append("</body></html>")
        docs.append("".join(parts))
    _diff_dom(docs, dialect="html5")
    # node-table parity on the same corpus
    for d in docs[:5]:
        assert _rows_via_table(d) == _rows_via_dom(d)


def test_tape_shape_replay_xml_dialect():
    """Shapes apply to the xml dialect too (defined-or-undefined
    elements; unique URL values like sitemap entries)."""
    docs = []
    for d in range(20):
        items = "".join('<url loc="https://ex.com/%d/%d" pri="0.%d"/>'
                        '<url loc="https://ex.com/%d/x">t</url>'
                        % (d, j, j % 10, j) for j in range(30))
        docs.append("<urlset>%s</urlset>" % items)
    _diff_dom(docs, dialect="xml")


def test_tape_shape_replay_data_attrs_shared_dtd():
    """data-*/aria-* implicit attrs join the shape path on the shared
    html5 DTD (r6): unique per-occurrence values across documents,
    with DtdCow rolling the implicit Attr back between parses — the
    replay must stay value-identical to pure Python."""
    docs = []
    for d in range(20):
        parts = ["<html><body>"]
        for j in range(30):
            parts.append('<div data-testid="t-%d-%d" '
                         'aria-label="L%d">x</div>' % (d, j, j))
            parts.append('<span data-k="%d">y</span>' % (d * 100 + j))
        parts.append("</body></html>")
        docs.append("".join(parts))
    _diff_dom(docs, dialect="html5")
    for d in docs[:4]:
        assert _rows_via_table(d) == _rows_via_dom(d)


def test_tape_xmlns_reference_xml_corpus():
    """The reference Test/*.xml files re-parsed under the xmlns
    dialect (namespace resolution live): C-on == C-off."""
    files = sorted(glob.glob("/root/reference/Test/*.xml"))
    if not files:
        pytest.skip("reference corpus absent")
    docs = []
    for f in files:
        with open(f, "rb") as fh:
            docs.append(fh.read())
    _diff_dom(docs, dialect="xmlns")
