"""Differential tests for the COMPILED steady-state executor
(core/_cspeed.c): with parser._CSPEED nulled, the pure-Python
_pcdata_fast executor is the semantic oracle (itself differentially
verified against the token-at-a-time loop in test_fast_pcdata.py).
Output (text, error list incl. line numbers, final parser location)
must be byte-identical on every input.
"""

import glob
import random

import pytest

import packages_sgml_spark.core.parser as P
from packages_sgml_spark.core.parser import (
    ParserOptions, SGMLParser, TextOnlyParser)

# force the lazy load so P._CSPEED reflects availability
P._load_cspeed()

pytestmark = pytest.mark.skipif(
    P._CSPEED is None, reason="compiled executor unavailable")


def _run(docs, dialect="html5", encoding="utf-8", cls=TextOnlyParser):
    out = []
    for d in docs:
        p = cls(ParserOptions(dialect=dialect, encoding=encoding,
                              max_errors=-1))
        p.parse(d)
        out.append((p.text() if hasattr(p, "text") else None,
                    [(e.severity, e.line, e.message) for e in p.errors],
                    p.line, p.linepos, p.charpos,
                    len(p.environments)))
    return out


def _diff_c(docs, dialect="html5", encoding="utf-8", cls=TextOnlyParser):
    """C-on vs C-off parity.  No warm-up pass: per-parse copy-on-write
    (dtd.DtdCow) keeps the shared HTML DTD pristine between parses."""
    saved = P._CSPEED
    assert saved is not None
    try:
        with_c = _run(docs, dialect, encoding, cls)
        P._CSPEED = None
        no_c = _run(docs, dialect, encoding, cls)
    finally:
        P._CSPEED = saved
    for i, (a, b) in enumerate(zip(with_c, no_c)):
        assert a == b, (i, repr(docs[i][:200]), a, b)


WORDS = ["alpha", "beta", " ", "\n", "\t\n ", "x&y", "a<b", "]]>", "]",
         "&amp;", "&lt;", "&#65;", "&#x42;", "&undefined;", "&amp",
         "caf\xe9", " pad", "line\r\nbreak", "line\rcr", "tail\n",
         "\r", "\r\n\r\n", "&#10;", "&#13;", "&nbsp;"]
TAGS = ["p", "b", "i", "ul", "li", "a", "div", "span", "h1", "table",
        "tr", "td", "em", "title", "head", "body", "html", "script",
        "style", "br", "hr", "img", "nosuchtag", "weird-tag", "pre"]


def _soup(rng, n_tokens=60):
    parts = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(WORDS))
        elif r < 0.6:
            t = rng.choice(TAGS)
            rr = rng.random()
            if rr < 0.25:
                parts.append('<%s class="c%d" id=\'i\'>' %
                             (t, rng.randrange(9)))
            elif rr < 0.45:
                # unique attr values: the shape-replay path (r6)
                parts.append('<%s href="https://u/%d" title=\'t%d\'>' %
                             (t, rng.randrange(10 ** 9),
                              rng.randrange(10 ** 6)))
            else:
                parts.append("<%s>" % t)
        elif r < 0.8:
            parts.append("</%s>" % rng.choice(TAGS))
        elif r < 0.85:
            parts.append("<!-- comment -->")
        elif r < 0.9:
            parts.append("<![CDATA[ raw < & ]]>")
        else:
            parts.append(rng.choice(
                ["<?pi data?>", "<>", "< notatag", "&#0;", "&;",
                 "<b", "</>", "<a href=x>", "\x00", "<p", "&#xD;"]))
    return "".join(parts)


def test_cspeed_soup_differential():
    rng = random.Random(20260817)
    docs = [_soup(rng) for _ in range(150)]
    _diff_c(docs)


def test_cspeed_soup_html_dialect():
    """html (HTML4 DTD) HAS inclusion/exclusion exceptions, so the
    gate must route to the Python executor — parity is trivial but
    the gate itself is what's under test."""
    rng = random.Random(99887766)
    docs = [_soup(rng, 40) for _ in range(40)]
    _diff_c(docs, dialect="html")


def test_cspeed_structured_cases():
    docs = [
        "hello <b>world</b>",
        "   \n\t  <p>blank prefix</p>",
        "&amp; entity before any tag",
        "&#65;&#66; numeric at start",
        "<p><br>after empty<hr>more",
        "<ul><li>one<li>two<li>three</ul>",
        "<p>first<p>second<p>third",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        "<p>x</p><script>if (a < b && c > d) {}</script><p>y</p>",
        "<style>a > b { color: red }</style>tail",
        "<p>&amp;</p>",
        "<p> &amp;leading blank</p>",
        "<p>&#10;newline entity</p>",
        "<p>&nbsp;&copy;&eacute;</p>",
        "<p>line1\r\nline2</p>\r\n<p>line3\rline4</p>",
        "<p>trail\r</p>",
        "<pre>  keep   runs  </pre>",
        "<pre>\npreformatted\n</pre>",
        "a<![INCLUDE[inside]]>b",
        "a<![IGNORE[gone]]>b",
        "<div>" * 40 + "deep" + "</div>" * 40,
        # deeper than the C session cap (192): must fall back cleanly
        "<div>" * 250 + "very deep" + "</div>" * 250,
        "<a href=\"x>y\" title='q>r'>link</a>",
        "", "&amp;", "<p></p>",
        "<zzz><yyy>text</yyy></zzz>",
        "<p>" + " " * 300 + "x</p>",
        "<p>" + "\n" * 50 + "</p><p>next</p>",
        # CR directly before tags/entities (inline CR handling)
        "<p>a\r<b>x</b>\r&amp;\r</p>",
        "\r\r\r<p>\r</p>",
        # mismatched end tags (close_element walk bail)
        "<div><p>text</div>",
        "<b><i>cross</b></i>",
        # utf-8 multibyte mid-span (executor must hand off to FSM)
        "<p>caf\xc3\xa9 utf8</p>",
        "<p>\xe2\x82\xac euro</p>",
        # entities that stay uncached (undefined -> gripe each time)
        "<p>&nosuch;&nosuch;</p>",
        # blank-only content in strict-ish containers
        "<table>   <tr><td>x</table>",
        # title (RCDATA switch) mid-document
        "<html><head><title>a &amp; b</title></head><body>t</body>",
        # r8 implied close of a C_EMPTY top (<br>/<img>/<hr> stay
        # open until the next token): text / tag / end-tag / entity
        # directly after, br-dense runs, img shape replay after br
        "<p>a<br>b<br>c</p>",
        "<p>a<br><b>bold</b><br><img src='u'>t</p>",
        "<p>a<br></p><p>next</p>",
        "<p>a<br>&amp;b</p>",
        "<body><p>t<br><li>li-needs-two-closes</li>",
        "<p>t<br><nosuchtag>x",                # non-fitting element
        "<zzz><br>text-under-undefined",       # undefined mid-walk:
                                               # no allow_for leak
        "<p><br>" + "x<br>" * 60 + "</p>",
        "<p>a<br>\n  \t<b>blank-then-tag</b></p>",
        "<p>a<br>  \n  text-after-blanks</p>",
        "<p><img src='https://u/1' alt='a'>x"
        "<img src='https://u/2' alt='b'>y</p>",
        # undefined parent's cdata_memo is the allow_for NO-OP memo —
        # top-only like the allow branch; a mid-walk probe through it
        # silently opened "x" where Python gripes (extended sweep)
        '<nosuchtag><div href="https://u/1" title=\'t\'>]&#x42;&lt;'
        "<nosuchtag href=\"https://u/2\" title='t2'>tail\nline\rcr"
        "<img>&#0;x",
    ]
    _diff_c(docs)


def test_cspeed_reference_corpus():
    """Every reference Test/ file, fed as raw bytes under the html5
    text-only profile: C-on == C-off byte-for-byte (text + full error
    list + final location).

    Isolated on a fresh DTD cache: these files carry DOCTYPE subsets
    whose declarations would otherwise teach the process-shared html5
    DTD (pre-existing learning semantics, mode-independent) and leak
    into later tests."""
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
        _diff_c(docs)
    finally:
        htmldtd._CACHE.clear()
        htmldtd._CACHE.update(saved)


def test_cspeed_synthetic_corpus(spark):
    """The bench corpus itself: full differential on 200 docs."""
    from packages_sgml_spark.spark.pages import synthetic_pages
    docs = [bytes(r.html)
            for r in synthetic_pages(spark, 200, scale=12).collect()]
    _diff_c(docs)


def test_cspeed_chunked_feed():
    """C engages per process_chars_toplevel call; chunk boundaries at
    every offset must not change output."""
    doc = ("<html><head><title>T</title></head><body><p>one &amp; "
           "two\r\n<ul><li>a<li>b</ul><p>x<br>y</body></html>")
    saved = P._CSPEED

    def run_chunked(step):
        p = TextOnlyParser(ParserOptions(dialect="html5",
                                         encoding="utf-8"))
        for k in range(0, len(doc), step):
            p.feed(doc[k:k + step])
        p.close()
        return (p.text(), [(e.line, e.message) for e in p.errors])

    try:
        with_c = [run_chunked(s) for s in (1, 3, 7, 16, len(doc))]
        P._CSPEED = None
        no_c = [run_chunked(s) for s in (1, 3, 7, 16, len(doc))]
    finally:
        P._CSPEED = saved
    assert with_c == no_c
    assert len({t for t, _ in with_c}) == 1     # all splits agree


def test_cspeed_gate_exclusions():
    """Profiles the C executor must NOT claim: DOM parser (events
    matter), max_memory set, XML dialects.  Parity must hold because
    the gate routes them to Python — and for max_memory the guard
    must actually fire."""
    # DOM parser: _FAST flags are False -> python path; just parity
    docs = ["<p>a<p>b</p>", "<ul><li>x<li>y</ul>"]
    _diff_c(docs, cls=SGMLParser)
    # max_memory: guard fires identically with C loaded
    opts = ParserOptions(dialect="html5", encoding="utf-8")
    opts.max_memory = 256
    p = TextOnlyParser(opts)
    p.parse("<p>" + "x" * 100000 + "</p>")
    assert any("resource" in e.message.lower() for e in p.errors)


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

    @settings(max_examples=80, deadline=None)
    @given(st.lists(_token, min_size=0, max_size=40))
    def test_cspeed_differential_hypothesis(tokens):
        doc = "".join(tokens)
        _diff_c([doc])


def test_cspeed_xml_dialects():
    """r4 extension: XML dialects (not xmlns) ride the compiled
    executor too, with update_space_mode precomputed per memo entry.
    Differential over xml:space switching, self-closed elements,
    CDATA sections, predefined entities, malformed input."""
    docs = [
        '<?xml version="1.0"?><doc><a>text</a><b/></doc>',
        '<doc><pre xml:space="preserve">  kept  </pre>'
        '<p xml:space="default">  collapsed  </p></doc>',
        '<doc><p xml:space="bogus"> gripes </p></doc>',
        '<doc>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;</doc>',
        '<doc><![CDATA[raw < & > stuff]]></doc>',
        '<doc><a href="x">link</a><empty/><s attr="v"/></doc>',
        '<doc>\n  <indented>\n    text\n  </indented>\n</doc>',
        '<doc><bad</doc>', '<doc>unclosed', '<doc>a]]>b</doc>',
        '<doc>&undefined;</doc>', '<doc att="&amp;ent">t</doc>',
        '<a><b><c><d>deep</d></c></b></a>',
        '<doc>line1\r\nline2\rline3</doc>',
        '<doc><x xml:space="preserve"><y>nested  inherits</y></x></doc>',
    ]
    for dialect in ("xml", "xhtml", "xhtml5"):
        _diff_c(docs, dialect=dialect)


def test_cspeed_xml_soup():
    rng = random.Random(24680)
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
    _diff_c(docs, dialect="xml")


def test_cspeed_default_on():
    """The compiled path must be live in this environment (gcc is
    available); if this fails the build broke."""
    import packages_sgml_spark.core.cspeed as cs
    assert cs.MOD is not None, cs._BUILD_ERR


def test_ctx_cache_bounded():
    """Per-document DTDs (fresh xml parses) must not leak one C
    registry each in a long-lived worker: the per-DTD ctx cache
    evicts LRU beyond its cap."""
    import packages_sgml_spark.core.cspeed as cs
    assert cs.MOD is not None
    doc = "<r>" + "<x>t</x>" * 40 + "</r>"
    for _ in range(3 * cs._CTX_CAP):
        p = TextOnlyParser(ParserOptions(dialect="xml"))
        p.parse(doc)
    assert len(cs._CTX) <= cs._CTX_CAP


def test_cspeed_xmlns_textonly():
    """xmlns through the C sink mode (TextOnly profile): text, error
    lists (undefined-prefix gripes included) and final location must
    match the pure-Python path."""
    rng = random.Random(86420)
    docs = [
        '<r><c xmlns="u1"><d>x</d></c><d>y</d></r>',
        '<r><b:unb>q</b:unb><b:unb>q</b:unb></r>',
        '<r xmlns:p="u"><p:e>1</p:e><p:e>2</p:e></r>',
        '<r xmlns="u">' + '<d k="v">text</d>' * 40 + '</r>',
    ]
    for _ in range(40):
        parts = ["<root>"]
        for _ in range(40):
            x = rng.random()
            if x < .35:
                parts.append(rng.choice(["txt", " ", "&amp;", "&#65;"]))
            elif x < .6:
                t = rng.choice(["e", "a:e", "item"])
                parts.append(rng.choice(
                    ["<%s>" % t, '<%s xmlns:a="ua">' % t,
                     '<%s k="v">' % t, "<%s/>" % t]))
            elif x < .85:
                parts.append("</%s>" % rng.choice(["e", "a:e", "item"]))
            else:
                parts.append(rng.choice(["<!-- c -->", "<![CDATA[r]]>"]))
        docs.append("".join(parts))
    _diff_c(docs, dialect="xmlns")


if _HAVE_HYP:
    # attribute-soup fuzz for the shape-replay path (r6): names,
    # quote styles, specials inside values, layout/comments between
    # attrs, duplicates, shorthand, '=' and '>' in quoted values
    _attr = st.one_of(
        st.tuples(st.sampled_from(["href", "class", "id", "title",
                                   "data-x", "aria-y", "xml:space",
                                   "HREF", "q:n", "nosuchattr"]),
                  st.sampled_from(['"v%d"', "'w%d'", '"a=b>%d"',
                                   '"x &amp; %d"', '"ta\tb%d"',
                                   '"caf\xe9%d"', '""', "bare%d",
                                   '"pre served  %d"'])),
    )

    @settings(max_examples=80, deadline=None)
    @given(st.lists(st.tuples(st.sampled_from(["a", "p", "div", "A",
                                               "weird-tag"]),
                              st.lists(_attr, min_size=0, max_size=4),
                              st.integers(0, 999)),
                    min_size=1, max_size=25))
    def test_cspeed_shape_attr_soup_hypothesis(tags):
        parts = []
        for name, attrs, salt in tags:
            a = " ".join("%s=%s" % (k, tpl % salt if "%d" in tpl
                                    else tpl)
                         for k, tpl in attrs)
            parts.append("<%s%s>t</%s>" % (name,
                                           " " + a if a else "", name))
        doc = "".join(parts)
        _diff_c([doc])
        _diff_c([doc], dialect="xml")


def test_cspeed_shape_chunked_feed():
    """Unique-value tags split across feed() chunk boundaries: the
    whole-tag matcher only fires when the tag is complete in the
    current window, so partial tags fall to the FSM and output must
    be chunk-invariant."""
    doc = ('<html><body><a href="https://u/123456" data-k="z9">x</a>'
           '<div data-testid="t-77" aria-label="L">y</div>'
           '<p class="unique-c-42">z</p></body></html>')

    def run_chunked(step):
        p = TextOnlyParser(ParserOptions(dialect="html5",
                                         encoding="utf-8"))
        for k in range(0, len(doc), step):
            p.feed(doc[k:k + step])
        p.close()
        return (p.text(), [(e.line, e.message) for e in p.errors])

    want = run_chunked(len(doc))
    for step in list(range(1, 30)) + [41, 67]:
        assert run_chunked(step) == want, step


def test_cspeed_registry_growth_bounded():
    """Flip-created states (one-ish per soup document) are registered
    with strong refs but flip-only rollbacks deliberately skip the
    OMIT_GEN flush — the session-entry cap must keep a long-lived
    worker's registries (and therefore RSS) bounded (r6: ~380 B/doc
    leak before the cap)."""
    import packages_sgml_spark.core.cspeed as cs
    assert cs.MOD is not None
    from packages_sgml_spark.core import htmldtd
    dtd = htmldtd.get_html_dtd("html5")
    for i in range(6000):
        p = TextOnlyParser(ParserOptions(dialect="html5",
                                         max_errors=-1))
        p.parse('<div data-k="%d"><weird-%d>s</weird-%d>t</div>'
                % (i, i % 5, i % 5))
    stats = cs.MOD.ctx_stats(cs.ctx_for(dtd))
    assert stats["n_states"] <= 4200, stats
    assert stats["n_elems"] <= 4200, stats


def test_private_dtd_flips_do_not_flush_shared_registries():
    """Per-DTD cache generations (r7): a DTD-less XML document's
    undefined-element flips bump only its OWN private DTD's
    ``_omit_gen`` — the shared html5 DTD's compiled registries stay
    warm across interleaved XML parses.  When the generation was
    process-global, every xml doc's ~5 flips cold-started the html5
    ctx: a measured ~30% html5-throughput loss on mixed html+xml
    corpora (the real-crawl shape: pages + sitemaps/feeds in one
    worker)."""
    import packages_sgml_spark.core.cspeed as cs
    assert cs.MOD is not None
    from packages_sgml_spark.core import htmldtd

    def parse(doc, dialect):
        p = TextOnlyParser(ParserOptions(dialect=dialect,
                                         encoding="utf-8"))
        p.parse(doc)
        return p

    # warm the shared html5 registries
    html_doc = ('<!DOCTYPE html><html><head><title>t</title></head>'
                '<body><p>a<b>c</b><a href="https://x/y">l</a></body>'
                '</html>')
    for _ in range(3):
        parse(html_doc, "html5")
    shared = htmldtd.get_html_dtd("html5")
    gen0 = shared._omit_gen[0]
    warm = cs.MOD.ctx_stats(cs.ctx_for(shared))
    assert warm["n_tag_objs"] > 0

    # DTD-less XML parses flip undefined elements on their private
    # per-document DTDs
    xml_doc = ("<?xml version='1.0'?><doc><title>t</title>"
               "<p>x<b>y</b><a href='https://x/z'>l</a></p></doc>")
    for _ in range(4):
        px = parse(xml_doc, "xml")
    # the flips DID invalidate the private DTD's own generation...
    assert px.dtd._omit_gen[0] > 0
    # ...and did NOT touch the shared html5 DTD's generation
    assert shared._omit_gen[0] == gen0

    # the html5 ctx keeps its warm registries through the next parse
    # (a generation mismatch would flush them in sess_build)
    parse(html_doc, "html5")
    after = cs.MOD.ctx_stats(cs.ctx_for(shared))
    assert after["n_tag_objs"] >= warm["n_tag_objs"], (warm, after)
    assert after["n_elems"] >= warm["n_elems"], (warm, after)


def test_cspeed_blank_flush_undefined_live_read():
    """Blank cdata under an UNDEFINED top in a PRESERVE-space dialect
    is EMITTED (emit_cdata's undefined branch) — and the executor
    must read the undefined-ness LIVE: the CElem flag caches the
    registration-time value, which is stale-defined when the element
    was first seen via a bare end tag (fresh Elements default
    undefined=False; the per-parse def_element flip never flushes the
    registry).  r8 warm-sweep bug: C dropped the blanks Python keeps
    once the implied close let such end tags commit."""
    docs = [
        # 1: register nosuchtag's CElem while undefined=False (bare
        #    end tag; also memoizes the ('e', nosuchtag) entry)
        "x</nosuchtag>y",
        # 2: blanks pending at the memoized end tag, top = nosuchtag
        #    (undefined THIS parse via the journaled flip)
        "<nosuchtag><b>t</b>\r\n\r\n</nosuchtag>tail",
        # 3: same shape again (now every tag is warm for the C arm)
        "<nosuchtag><b>t</b>\r\n\r\n</nosuchtag>tail",
    ]
    _diff_c(docs, dialect="xhtml5")
    # and the blanks really are kept (xhtml5 preserves them)
    p = TextOnlyParser(ParserOptions(dialect="xhtml5",
                                     encoding="utf-8", max_errors=-1))
    p.parse(docs[1])
    assert "\n\n" in p.text(), repr(p.text())
