"""Differential tests for the steady-state PCDATA executor
(core/parser.py _pcdata_fast): with FAST_PCDATA toggled off, the
general token-at-a-time loop is the semantic oracle.  Output (text,
DOM repr, error list incl. line numbers) must be identical on every
input, including adversarial tag soup.
"""

import random

import pytest

import packages_sgml_spark.core.parser as P
from packages_sgml_spark.core.parser import (
    ParserOptions, SGMLParser, TextOnlyParser, FirstElementTextParser)


def _parse_all(cls, docs, dialect="html5", **kw):
    out = []
    for d in docs:
        p = cls(ParserOptions(dialect=dialect), **kw)
        dom, errors = p.parse(d)
        text = p.text() if hasattr(p, "text") else None
        out.append((text, repr(dom), [(e.severity, e.line, e.message)
                                      for e in errors]))
    return out


def _differential(docs, cls=TextOnlyParser, dialect="html5", **kw):
    """Three-way parity on identical DTD state: compiled-executor
    fast path == bulk-branch loop == PURE char-at-a-time FSM.

    The third arm matters: FAST_PCDATA=False still runs the
    whole-tag/entity/span collapses, so a bug in a collapse itself is
    invisible to a two-way diff (the r7 stray-quote tag-boundary bug
    hid exactly there).  PURE_FSM feeds every char through putchar —
    the reference's own execution shape — and is the semantic oracle.

    No warm-up pass: per-parse copy-on-write (dtd.DtdCow) rolls every
    shared-DTD mutation back at parse end, so each parse — in any
    mode — sees the pristine dialect DTD."""
    try:
        P.FAST_PCDATA = True
        fast = _parse_all(cls, docs, dialect, **kw)
        P.FAST_PCDATA = False
        slow = _parse_all(cls, docs, dialect, **kw)
        P.PURE_FSM = True
        pure = _parse_all(cls, docs, dialect, **kw)
    finally:
        P.FAST_PCDATA = True
        P.PURE_FSM = False
    for i, (f, s) in enumerate(zip(fast, slow)):
        assert f == s, (i, docs[i][:200], f, s)
    for i, (s, q) in enumerate(zip(slow, pure)):
        assert s == q, ("bulk-vs-FSM", i, docs[i][:200], s, q)


WORDS = ["alpha", "beta", " ", "\n", "\t\n ", "x&y", "a<b", "]]>", "]",
         "&amp;", "&lt;", "&#65;", "&#x42;", "&undefined;", "&amp",
         "caf\xe9", " pad", "line\r\nbreak", "line\rcr", "tail\n"]
TAGS = ["p", "b", "i", "ul", "li", "a", "div", "span", "h1", "table",
        "tr", "td", "em", "title", "head", "body", "html", "script",
        "style", "br", "hr", "img", "nosuchtag", "weird-tag"]


def _soup(rng, n_tokens=60):
    parts = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(WORDS))
        elif r < 0.6:
            t = rng.choice(TAGS)
            if rng.random() < 0.3:
                parts.append('<%s class="c%d" id=\'i\'>' %
                             (t, rng.randrange(9)))
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
                 "<b", "</>", "<a href=x>", "\x00"]))
    return "".join(parts)


def test_fast_pcdata_differential_soup_textonly():
    rng = random.Random(20260816)
    docs = [_soup(rng) for _ in range(120)]
    _differential(docs, TextOnlyParser)


def test_fast_pcdata_differential_soup_dom():
    rng = random.Random(42424242)
    docs = [_soup(rng) for _ in range(80)]
    _differential(docs, SGMLParser)


def test_fast_pcdata_differential_first_element():
    rng = random.Random(777)
    docs = ["<html><head><title>T%d</title></head><body>%s</body></html>"
            % (i, _soup(rng, 30)) for i in range(40)]
    _differential(docs, FirstElementTextParser, target="title")


def test_fast_pcdata_differential_structured():
    docs = [
        # leading text before any element (enforce/auto-open paths)
        "hello <b>world</b>",
        "   \n\t  <p>blank prefix</p>",
        "&amp; entity before any tag",
        "&#65;&#66; numeric at start",
        # C_EMPTY top element then text
        "<p><br>after empty<hr>more",
        # omitted closes (the pop-one-level replay)
        "<ul><li>one<li>two<li>three</ul>",
        "<p>first<p>second<p>third",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        # script/style CDATA switching mid-stream
        "<p>x</p><script>if (a < b && c > d) {}</script><p>y</p>",
        "<style>a > b { color: red }</style>tail",
        # entities adjacent to tags and blanks
        "<p>&amp;</p>",
        "<p> &amp;leading blank</p>",
        "<p>&#10;newline entity</p>",
        "<p>&nbsp;&copy;&eacute;</p>",
        # CR/LF dances crossing emit boundaries
        "<p>line1\r\nline2</p>\r\n<p>line3\rline4</p>",
        "<p>trail\r</p>",
        "<pre>\npreformatted\n</pre>",
        # CRLF at the START of declared-CDATA content: the CR is
        # buffered per-char (blank_cdata still set) and the LF span
        # must fold it — the bulk blank-prefix branch used to skip
        # the fold and keep \r\n (r7 PURE_FSM finding; xhtml5 shows
        # it because its space mode preserves the leading newline)
        "<style>\r\nx</style>",
        "<style>\r\n  \t\r\nz</style>",
        "<textarea>\r\na</textarea>",
        "<script>\r\nvar a;\r\n</script>tail",
        # marked sections interleaved (fast loop must bail cleanly)
        "a<![INCLUDE[inside]]>b",
        "a<![IGNORE[gone]]>b",
        # max-depth-ish nesting
        "<div>" * 40 + "deep" + "</div>" * 40,
        # attribute quoting edge
        "<a href=\"x>y\" title='q>r'>link</a>",
        # empty document / only entities / only tags
        "", "&amp;", "<p></p>",
        # undefined elements everywhere (allow_for / tag soup)
        "<zzz><yyy>text</yyy></zzz>",
        # long whitespace runs (blank_cdata revalidation)
        "<p>" + " " * 300 + "x</p>",
        "<p>" + "\n" * 50 + "</p><p>next</p>",
    ]
    _differential(docs, TextOnlyParser)
    _differential(docs, SGMLParser)


def test_fast_pcdata_differential_sgml_dialect():
    """Plain sgml dialect (doctype-driven) also routes through the
    executor; error lists must stay identical (more gripes here)."""
    docs = [
        "<!DOCTYPE html><html><head><title>t</title></head>"
        "<body><p>one<p>two</body></html>",
        "<p>no doctype tag soup<ul><li>a<li>b</ul>",
    ]
    _differential(docs, SGMLParser, dialect="html")


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
                         # stray quotes inside tags (r7 collapse bug
                         # class: quote NOT in value position)
                         '<a q"s>t">', "<b x'y>", '<i "j>',
                         '<a x="ok" y"z>']),
        st.text(alphabet="ab <>&;/\r\n\t\xe9", min_size=0,
                max_size=12),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_token, min_size=0, max_size=40))
    def test_fast_pcdata_differential_hypothesis(tokens):
        """Property: for ANY token soup, executor output ==
        general-loop output (text, DOM, errors).  Hypothesis shrinks
        failures to minimal counterexamples."""
        doc = "".join(tokens)
        _differential([doc], TextOnlyParser)
        _differential([doc], SGMLParser)


def test_fast_pcdata_kill_switch_stays_on():
    """The shipped default must be the fast path."""
    assert P.FAST_PCDATA is True


@pytest.mark.parametrize("encoding", [None, "utf-8"])
def test_fast_pcdata_utf8_modes(encoding):
    docs = ["<p>caf\xc3\xa9 utf8 bytes</p>",     # latin-1-fed utf-8
            "<p>plain ascii</p>",
            "<p>t\xe9l\xe9</p>"]
    out = []
    for flag in (True, False):
        P.FAST_PCDATA = flag
        res = []
        for d in docs:
            p = TextOnlyParser(ParserOptions(dialect="html5",
                                             encoding=encoding))
            p.parse(d)
            res.append((p.text(),
                        [(e.line, e.message) for e in p.errors]))
        out.append(res)
    P.FAST_PCDATA = True
    assert out[0] == out[1]


def test_entity_width_bomb_hits_memory_guard():
    """Entity replays grow cdata without flushing; the executor must
    still enforce max_memory like the general loop does per token."""
    body = "&e;" * 5000
    doc = ("<!DOCTYPE doc [<!ELEMENT doc (#PCDATA)>"
           "<!ENTITY e '0123456789abcdef'>]>"
           "<doc>" + body + "</doc>")
    for flag in (True, False):
        P.FAST_PCDATA = flag
        opts = ParserOptions(dialect="sgml")
        opts.max_memory = 4096
        p = SGMLParser(opts)
        p.parse(doc)
        P.FAST_PCDATA = True
        assert any("resources" in e.message for e in p.errors), \
            [e.message for e in p.errors]
        assert len(p.cdata) < 4096 + (1 << 16) + 65


def test_entity_cache_invalidation_on_redeclaration():
    """A mid-instance <!ENTITY> redefinition must not replay the stale
    cached expansion (dtd._ent_fast invalidation)."""
    doc = ("<!DOCTYPE doc [<!ELEMENT doc (#PCDATA)>"
           "<!ENTITY e 'one'>]>"
           "<doc>&e;<!ENTITY e 'two'>&e;</doc>")
    for flag in (True, False):
        P.FAST_PCDATA = flag
        p = SGMLParser(ParserOptions(dialect="sgml"))
        dom, _ = p.parse(doc)
        texts = [c for c in dom[0].content if isinstance(c, str)]
        P.FAST_PCDATA = True
        # reference semantics: first declaration wins, adjacent cdata
        # merges -> 'oneone'; a stale-cache bug would yield 'onetwo'
        assert texts == ["oneone"], texts
    # parity between modes is the real assertion
    outs = []
    for flag in (True, False):
        P.FAST_PCDATA = flag
        p = SGMLParser(ParserOptions(dialect="sgml"))
        dom, errs = p.parse(doc)
        outs.append((repr(dom), [(e.line, e.message) for e in errs]))
    P.FAST_PCDATA = True
    assert outs[0] == outs[1]


def test_omit_path_cache_invalidated_on_redeclaration():
    """find_omitted_path memos are generation-stamped: a mid-instance
    <!ELEMENT> redeclaration that changes omit_open must not replay a
    stale omitted-path decision (round-3 review finding)."""
    from packages_sgml_spark.core import model as M

    def run():
        p = SGMLParser(ParserOptions(dialect="sgml"))
        doc = ("<!DOCTYPE a [<!ELEMENT a - - (b)>"
               "<!ELEMENT b O O (#PCDATA)>]>"
               "<a>text</a>")
        dom, errs = p.parse(doc)
        return repr(dom), [(e.line, e.message) for e in errs], p

    # first parse: b is omit-open, so bare text inside <a> auto-opens
    # b; the omitted path [b] gets memoized on a's initial state
    d1, e1, p1 = run()
    assert "b" in d1
    # redeclare via the decl handler (bumps the DTD's _omit_gen); a
    # fresh parse with a DTD where b is NOT omissible must not reuse
    # the path
    gen0 = p1.dtd._omit_gen[0]
    p1._invalidate_replay_caches()
    assert p1.dtd._omit_gen[0] == gen0 + 1
    p = SGMLParser(ParserOptions(dialect="sgml"))
    doc2 = ("<!DOCTYPE a [<!ELEMENT a - - (b)>"
            "<!ELEMENT b - - (#PCDATA)>]>"
            "<a>text</a>")
    dom2, errs2 = p.parse(doc2)
    # non-omissible b: the reference gripes instead of silently
    # opening; either way the stale [b] path must not replay
    assert any("b" in m or "PCDATA" in m for _l, m in
               [(e.line, e.message) for e in errs2]) or "b" not in repr(dom2)


def test_minhash_null_and_empty_text_rowset(spark):
    """Round-3 review finding: the per-row signature shape must keep
    the round-2 row set — NULL text and empty text both yield one
    empty shingle and the signature h_i = md5('i:')."""
    import hashlib
    from packages_sgml_spark.spark.dedup import minhash_signatures
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, ""),
         (4, "one two")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in minhash_signatures(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    empty_sig = hashlib.md5(b"0:").hexdigest()
    assert rows[2].h0 == empty_sig
    assert rows[3].h0 == empty_sig
    assert rows[2].h1 == hashlib.md5(b"1:").hexdigest()
    assert rows[1].h0 != empty_sig


def test_fast_pcdata_differential_xml_dialects():
    """Round-3 extension: XML dialects ride the executor (with the
    per-begin update_space_mode call).  Differential over XML soup
    including xml:space switching, empty elements, CDATA sections,
    and predefined entities."""
    docs = [
        '<?xml version="1.0"?><doc><a>text</a><b/></doc>',
        '<doc><pre xml:space="preserve">  kept  </pre>'
        '<p xml:space="default">  collapsed  </p></doc>',
        '<doc>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;</doc>',
        '<doc><![CDATA[raw < & > stuff]]></doc>',
        '<doc><a href="x">link</a><empty/><selfclose attr="v"/></doc>',
        '<doc>\n  <indented>\n    text\n  </indented>\n</doc>',
        '<doc><bad</doc>',
        '<doc>unclosed',
        '<doc>a]]>b</doc>',
        '<doc>&undefined;</doc>',
        '<doc att="&amp;ent">t</doc>',
        '<a><b><c><d>deep</d></c></b></a>',
    ]
    for dialect in ("xml", "xhtml", "xhtml5"):
        _differential(docs, SGMLParser, dialect=dialect)


def test_fast_pcdata_xml_soup_differential():
    rng = random.Random(13579)
    docs = []
    for _ in range(60):
        parts = []
        for _ in range(40):
            r = rng.random()
            if r < 0.4:
                parts.append(rng.choice(
                    ["text", " ", "\n", "&amp;", "&#65;", "x&y",
                     "caf\xe9", "]]>", "a<b"]))
            elif r < 0.65:
                t = rng.choice(["a", "b", "item", "Mixed", "UPPER"])
                parts.append(rng.choice(
                    ["<%s>" % t, "<%s/>" % t,
                     '<%s k="v" xml:space="preserve">' % t]))
            elif r < 0.9:
                parts.append("</%s>" % rng.choice(
                    ["a", "b", "item", "Mixed", "UPPER"]))
            else:
                parts.append(rng.choice(
                    ["<!-- c -->", "<![CDATA[x]]>", "<?pi?>"]))
        docs.append("".join(parts))
    _differential(docs, SGMLParser, dialect="xml")


def test_fulltag_collapse_stray_quote_tag_boundary():
    """The whole-tag collapse must mirror S_DECL's quote semantics
    (parser.c:5201-5232): quotes enter the string state ONLY from the
    value position (after '='); a stray quote elsewhere gripes "Quote
    inside value" and the tag still ends at the FIRST '>'.  The
    unconditional quoted-span alternation used to swallow that '>'
    (<a foo"bar>baz">), changing the tag boundary, the extracted
    text, and dropping the gripe (r7 finding)."""
    from packages_sgml_spark.core import parser as P

    docs = [
        '<html><body><p><a foo"bar>baz">text</body></html>',
        "<html><body><p><a foo'bar>baz'>text</body></html>",
        '<html><body><p><a x="ok">fine</a> <b q"s>t">u</body></html>',
        '<html><body><p><a x="ok" y"bad>z">w</body></html>',
        # sanity: genuinely quoted values still hide '>'
        '<html><body><p><a href="x>y" alt=\'a>b\'>q</a></body></html>',
    ]

    def run(d):
        p = TextOnlyParser(ParserOptions(dialect="html5",
                                         encoding="utf-8"))
        p.parse(d)
        return p.text(), [e.message for e in p.errors]

    import re
    never = re.compile(r"(?!x)x")
    real = P._RE_FULLTAG
    for d in docs:
        a = run(d)
        P._RE_FULLTAG = never      # force the per-char reference path
        try:
            b = run(d)
        finally:
            P._RE_FULLTAG = real
        assert a == b, (d, a, b)

    # pinned reference behavior for the canonical shape
    text, msgs = run(docs[0])
    assert text == 'baz">text'
    assert any("Quote inside value" in m for m in msgs)


def test_bulk_verbatim_crlf_boundary_all_dialects():
    """CR buffered before a bulk LF span inside declared-CDATA
    content must fold exactly like per-char add_verbatim_cdata —
    including while blank_cdata is still set (r7: <style>\\r\\nx
    kept the CR in xhtml5, whose space mode preserves the leading
    newline)."""
    docs = ["<style>\r\nx</style>", "<style>\r\n\r\nx</style>",
            "<style>\r\n  \t\r\nz</style>", "<pre>\r\n</pre>",
            "<textarea>\r\na</textarea>",
            "<script>\r\nvar a;\r\n</script>tail"]
    for dialect in ("html5", "html", "sgml", "xml", "xhtml5"):
        _differential(docs, TextOnlyParser, dialect=dialect)
        _differential(docs, SGMLParser, dialect=dialect)


def test_bang_decl_shorttag_slash_boundary():
    """shorttag '/' closes ANY declaration with a non-empty buffer —
    including <!...> ones (parser.c:5158-5169 checks CF_ETAGO2 before
    the bang cases).  The bang bulk scan used to run past '/', so
    <!></p>x took the WRONG declaration boundary (text 'x' instead of
    'p>x', different gripe).  r7 PURE_FSM finding."""
    docs = ["<!></p>x", "<!></p> x", "<p><!></p>x", "<!e a/b>x",
            "</p/after", "<p/x/y"]
    for dialect in ("sgml", "html"):      # shorttag dialects
        _differential(docs, TextOnlyParser, dialect=dialect)
        _differential(docs, SGMLParser, dialect=dialect)
    # pinned reference behavior: '/' ends the empty-bang declaration,
    # the remainder is PCDATA
    p = TextOnlyParser(ParserOptions(dialect="sgml"))
    p.parse("<!></p>x")
    assert p.text() == "p>x"
    assert any('Invalid declaration' in e.message for e in p.errors)


def test_comment_bulk_utf8_validation():
    """The input stream is UTF-8-validated in EVERY state (the
    reference decodes before the FSM): invalid sequences inside
    comments must gripe 'Bad UTF-8 sequence'.  The S_CMT/S_DECLCMT
    bulk scans used to swallow high bytes unvalidated.  r7 PURE_FSM
    finding (<!--\\xc3 at EOF dropped the gripe)."""
    docs = ["<!--\xc3", "<!--\xc3-->x", "<!-- a \xff b -->y",
            "<!doctype x -- c\xe2\x82 -->z",
            "<p><!-- \xed\xa0\x80 -->tail"]
    for dialect in ("html5", "xml", "sgml"):
        _differential(docs, TextOnlyParser, dialect=dialect)
    p = TextOnlyParser(ParserOptions(dialect="html5"))
    p.parse("<!--\xc3-->x")
    assert any("Bad UTF-8" in e.message for e in p.errors)


def test_node_rows_bulk_vs_fsm_sweep():
    """NodeTableParser (the production extract path) against the
    PURE_FSM oracle: flat node rows and error lists must be
    identical across compiled-executor, bulk-branch, and pure
    char-at-a-time execution (seeded subset of the r7 sweep).

    Row positions (start_pos/end_pos) are masked in the FSM arm
    only: implied opens triggered by blank-prefixed character data
    are stamped at SPAN START by all three production modes (the
    canonical r5 convention, shared with the compiled tape) but at
    the trigger char by per-char execution — a documented
    metadata-granularity difference; text bytes, structure, attrs,
    and errors stay strict."""
    import random
    from packages_sgml_spark.core.parser import NodeTableParser
    WORDS = ["x", " ", "\r\n", '<a t="a\r\nb">', "<p/net text/",
             "<![IGNORE[<p>gone</p>]]>", "<!></p>", "<!--\xc3-->",
             '<a q"s>t">', "<style>\r\nz</style>", 'caf\xc3\xa9',
             '<a href="u">l</a>', "&#x41;", "a<b", "]]>"]
    TAGS = ["p", "b", "a", "li", "script", "nosuchtag"]
    rng = random.Random(999)

    def soup(n=25):
        parts = []
        for _ in range(n):
            r = rng.random()
            if r < 0.45:
                parts.append(rng.choice(WORDS))
            elif r < 0.75:
                parts.append("<%s>" % rng.choice(TAGS))
            else:
                parts.append("</%s>" % rng.choice(TAGS))
        return "".join(parts)

    def run(d, dialect, enc):
        p = NodeTableParser(ParserOptions(dialect=dialect, encoding=enc))
        p.parse(d)
        return p.rows, [(e.severity, e.line, e.message)
                        for e in p.errors]

    def mask(res):
        rows, errs = res
        return ([{k: v for k, v in r.items()
                  if k not in ("start_pos", "end_pos")}
                 for r in rows], errs)

    for dialect in ("html5", "xml", "xmlns"):
        docs = [soup() for _ in range(20)]
        for d in docs:
            P.PURE_FSM = False
            a = run(d, dialect, "utf-8")
            P.PURE_FSM = True
            try:
                b = run(d, dialect, "utf-8")
            finally:
                P.PURE_FSM = False
            assert mask(a) == mask(b), (dialect, d[:150])
