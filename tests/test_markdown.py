"""HTML -> Markdown rendering (core/markdown.py + extract_markdown)."""

from packages_sgml_spark.core.markdown import dom_to_markdown
from packages_sgml_spark.core.parser import SGMLParser, ParserOptions


def _md(html, dialect="html5"):
    p = SGMLParser(ParserOptions(dialect=dialect, encoding="utf-8"))
    dom, _errors = p.parse(html)
    roots = dom if isinstance(dom, list) else [dom]
    return "\n\n".join(m for m in (dom_to_markdown(d) for d in roots)
                       if m)


def test_markdown_blocks_and_inline():
    html = (b"<html><head><title>skipped</title>"
            b"<style>p{}</style></head><body>"
            b"<h1>Top</h1><h3>Sub</h3>"
            b"<p>Plain <b>bold</b> and <em>it</em> and "
            b"<a href='https://x.y/z'>a link</a>.</p>"
            b"<p>Code <code>f(x)</code> inline.</p>"
            b"<hr>"
            b"<pre><code>line1\n  line2</code></pre>"
            b"</body></html>")
    assert _md(html) == (
        "# Top\n\n"
        "### Sub\n\n"
        "Plain **bold** and *it* and [a link](https://x.y/z).\n\n"
        "Code `f(x)` inline.\n\n"
        "---\n\n"
        "```\nline1\n  line2\n```")


def test_markdown_lists_nested_and_ordered():
    html = (b"<ul><li>one</li><li>two"
            b"<ol><li>a</li><li>b</li></ol></li></ul>")
    assert _md(html) == ("- one\n"
                         "- two\n"
                         "  1. a\n"
                         "  2. b")


def test_markdown_blockquote_image_br():
    html = (b"<blockquote><p>quoted line</p>"
            b"<p>second</p></blockquote>"
            b"<p>before<br>after</p>"
            b"<p><img src='i.png' alt='pic'></p>")
    assert _md(html) == ("> quoted line\n"
                         ">\n"
                         "> second\n\n"
                         "before\nafter\n\n"
                         "![pic](i.png)")


def test_markdown_table_degrades_to_rows():
    html = (b"<table><tr><th>h1</th><th>h2</th></tr>"
            b"<tr><td>a</td><td>b</td></tr></table>")
    assert _md(html) == "h1 | h2\n\na | b"


def test_markdown_soup_and_entities():
    # tag soup: implied closes, entities, whitespace collapse
    html = (b"<h2>A &amp; B</h2><p>one\n   two"
            b"<p>next para starts implicitly")
    assert _md(html) == ("## A & B\n\none two\n\n"
                         "next para starts implicitly")


def test_markdown_deep_dom_no_recursion_error():
    html = b"<div>" * 6000 + b"<p>deep</p>" + b"</div>" * 6000
    assert _md(html) == "deep"


def test_extract_markdown_spark(spark):
    from packages_sgml_spark.spark.extract import extract_markdown
    pages = spark.createDataFrame([
        ("u1", b"<h1>T</h1><p>Hello <b>world</b>.</p>"),
        ("u2", b""),
        ("u3", None),
    ], "url string, html binary")
    out = {r.url: r for r in extract_markdown(pages).collect()}
    assert out["u1"].markdown == "# T\n\nHello **world**."
    assert out["u1"].status == "ok"
    assert out["u2"].status == "empty" and out["u2"].markdown is None
    assert out["u3"].status == "empty"


def test_markdown_soup_fuzz_deterministic():
    """Random soup never raises, renders deterministically, and
    never emits the \\x00 br placeholder."""
    import random
    rng = random.Random(7)
    bits = ["<p>", "</p>", "<b>", "</i>", "<ul>", "<li>", "</ul>",
            "<pre>", "</pre>", "<a href='x'>", "</a>", "<h2>", "<br>",
            "text ", "&amp;", "&#66;", "<code>", "more\nwords ",
            '<img src="i">', "<blockquote>", "<table><tr><td>c",
            "\xe9 caf\xe9 ", "<", ">", '"', "</html>"]
    for _ in range(200):
        doc = "".join(rng.choice(bits)
                      for _ in range(rng.randint(1, 60)))
        html = doc.encode("utf-8")
        a, b = _md(html), _md(html)
        assert a == b
        assert "\x00" not in a


def test_markdown_pre_line_structure():
    # br and div-per-line inside <pre> keep line breaks (code viewers)
    assert _md(b"<pre>x = 1<br>y = 2</pre>") == "```\nx = 1\ny = 2\n```"
    assert _md(b"<pre><div>line1</div><div>line2</div></pre>") == \
        "```\nline1\nline2\n```"


# ------------------------------------------------------------------
# r8: event-sink renderer (MarkdownParser) vs the DOM walker
# ------------------------------------------------------------------

def _md_events(html, dialect="html5"):
    from packages_sgml_spark.core.markdown import MarkdownParser
    p = MarkdownParser(ParserOptions(dialect=dialect,
                                     encoding="utf-8"))
    p.parse(html)
    return p.markdown()


def test_markdown_event_sink_differential_goldens():
    """MarkdownParser output is byte-identical to dom_to_markdown
    over every reference Test/ golden input, in the golden harness's
    own dialect for each file."""
    import glob
    import os
    from packages_sgml_spark.core import golden
    n = 0
    for base in golden.all_bases():
        path = glob.glob(os.path.join(golden.TEST_DIR,
                                      base + ".*"))[0]
        ext = path.rsplit(".", 1)[-1]
        dialect = {"sgml": "sgml", "xml": "xml", "html": "html"}[ext]
        html = open(path, "rb").read()
        try:
            a = _md(html, dialect)
        except Exception:
            continue            # strict-dialect error caps etc.
        assert _md_events(html, dialect) == a, path
        n += 1
    assert n >= 40, n


def test_markdown_event_sink_differential_fuzz():
    import random
    rng = random.Random(1234)
    bits = ["<p>", "</p>", "<b>", "</i>", "<ul>", "<li>", "</ul>",
            "<pre>", "</pre>", "<a href='x'>", "</a>", "<h2>", "<br>",
            "text ", "&amp;", "&#66;", "<code>", "more\nwords ",
            '<img src="i">', "<blockquote>", "<table><tr><td>c",
            "<script>var x=1;</script>", "<style>p{}</style>",
            "<ol><li>one<li>two</ol>", "<td>", "</td>", "<hr>",
            "\xe9 caf\xe9 ", "<", ">", '"', "</html>", "<div>",
            "</div>", "<h6>", "<pre><div>l</div></pre>",
            "<noscript>no</noscript>"]
    for _ in range(300):
        doc = "".join(rng.choice(bits)
                      for _ in range(rng.randint(1, 80)))
        html = doc.encode("utf-8")
        assert _md_events(html) == _md(html), doc


def test_markdown_event_sink_differential_dialects():
    docs = [
        b"<root xmlns='urn:x'><a href='u'>t</a><pre>c</pre></root>",
        b"<p>one<p>two<ul><li>a<li>b</ul>",
        b"<script>top level script text.</script>",
        b"top text <b>bold</b> tail",
        b"<pre>x = 1<br>y = 2</pre>",
    ]
    for dialect in ("html5", "html", "xml", "xmlns", "xhtml5"):
        for doc in docs:
            try:
                a = _md(doc, dialect)
            except Exception:
                continue
            assert _md_events(doc, dialect) == a, (dialect, doc)


def test_markdown_event_sink_deep_dom():
    html = b"<div>" * 6000 + b"deep text" + b"</div>" * 6000
    assert _md_events(html) == _md(html) == "deep text"


# ------------------------------------------------------------------
# r8 session 2: compiled fold drain (md_drain in _cspeed.c)
# ------------------------------------------------------------------

def _md_events_arm(html, use_c, dialect="html5"):
    from packages_sgml_spark.core import markdown as M
    from packages_sgml_spark.core.markdown import MarkdownParser
    old = M.C_MD_DRAIN
    M.C_MD_DRAIN = use_c
    try:
        p = MarkdownParser(ParserOptions(dialect=dialect,
                                         encoding="utf-8"))
        p.parse(html)
        return p.markdown()
    finally:
        M.C_MD_DRAIN = old


def test_markdown_c_drain_differential_fuzz():
    """C md_drain vs the pure-Python drain loop, same fuzz grammar as
    the walker differential (both arms share _fold only on the Python
    side — the C side is an independent reimplementation)."""
    from packages_sgml_spark.core import markdown as M
    if M._c_md_drain() is None:
        import pytest
        pytest.skip("compiled md_drain unavailable")
    import random
    rng = random.Random(987)
    bits = ["<p>", "</p>", "<b>", "</i>", "<ul>", "<li>", "</ul>",
            "<pre>", "</pre>", "<a href='x'>", "</a>", "<h2>", "<br>",
            "text ", "&amp;", "&#66;", "<code>", "more\nwords ",
            '<img src="i">', "<blockquote>", "<table><tr><td>c",
            "<script>var x=1;</script>", "<style>p{}</style>",
            "<ol><li>one<li>two</ol>", "<td>", "</td>", "<hr>",
            "\xe9 caf\xe9 ", "<", ">", '"', "</html>", "<div>",
            "</div>", "<h6>", "<pre><div>l</div></pre>",
            "<noscript>no</noscript>", "<em>e</em>", "<strong>s",
            "<table><tr><td>a<td>b</tr></table>"]
    for dialect in ("html5", "xml", "xhtml5"):
        for _ in range(120):
            doc = "".join(rng.choice(bits)
                          for _ in range(rng.randint(1, 80)))
            html = doc.encode("utf-8")
            assert (_md_events_arm(html, True, dialect) ==
                    _md_events_arm(html, False, dialect)), \
                (dialect, doc)


def test_markdown_c_drain_br_sentinel():
    """The _BR sentinel is NUL+'br'+NUL: pins the two C literal traps
    (leading NUL truncating PyUnicode_FromString; '\\x00b' lexing as
    the single hex escape 0x0b) that each shipped a broken sentinel
    once.  br inside td exercises sentinel replacement through the
    cell merge."""
    html = b"<table><tr><td>c<br>d<td>x</table>"
    want = "c\nd | x"
    assert _md_events_arm(html, False) == want
    from packages_sgml_spark.core import markdown as M
    if M._c_md_drain() is not None:
        assert _md_events_arm(html, True) == want


def test_markdown_c_convert_atts_fast_path():
    """md_drain's in-C convert_attributes fast path: scalar-CDATA
    attr defs (type 0, islist falsy) map to (name, value-or-'')
    without calling the Python callable; ANY non-CDATA def in the
    list routes the WHOLE list through Python so ordering and typing
    stay identical.  Memo is id-keyed with a keep-alive pin (safe
    because ATTLIST always builds a fresh Attr; see _cspeed.c)."""
    import pytest
    from packages_sgml_spark.core import cspeed
    if cspeed.MOD is None or not hasattr(cspeed.MOD, "md_drain"):
        pytest.skip("compiled md_drain unavailable")

    class FakeAttr:
        def __init__(self, name, type_=0, islist=False):
            self.name = name
            self.type = type_
            self.islist = islist

    href = FakeAttr("href")
    title = FakeAttr("title")
    tab = FakeAttr("tabindex", type_=12)        # AT_NUMBER
    calls = []

    def convert(atts):
        calls.append(list(atts))
        return [(a.name, "PY:%s" % (v,)) for a, v in atts]

    def run(atts, use_memo=True):
        tape = [("b", ("b", FakeAttr("a"), atts, False, None)),
                ("d", "L"), ("e", "a")]
        frames, mds, box = [], [], [0]
        if use_memo:
            att_fold, att_keep = {}, []
            cspeed.MOD.md_drain(tape, frames, mds, 0, convert,
                                {}, [], box, att_fold, att_keep)
            return mds, att_fold, att_keep
        cspeed.MOD.md_drain(tape, frames, mds, 0, convert,
                            {}, [], box)
        return mds, None, None

    # 1: all-CDATA -> no Python call; None folds to "" (the fold
    #    then drops the empty title segment, same as the Python arm)
    calls.clear()
    mds, fold, keep = run([(href, "https://u/1"), (title, None)])
    assert calls == []
    assert mds == ["[L](https://u/1)"]
    assert set(fold.values()) == {"href", "title"}
    assert keep == [href, title]
    # img reads BOTH src and alt: values flow through the fast path
    src, alt = FakeAttr("src"), FakeAttr("alt")
    for altv, want in ((None, "![](https://u/i)"),
                       ("pic", "![pic](https://u/i)")):
        calls.clear()
        tape = [("b", ("b", FakeAttr("img"),
                       [(src, "https://u/i"), (alt, altv)],
                       False, None)), ("e", "img")]
        frames, mdsi, box = [], [], [0]
        cspeed.MOD.md_drain(tape, frames, mdsi, 0, convert, {}, [],
                            box, {}, [])
        assert calls == [] and mdsi == [want], (altv, mdsi)
    # 2: memoed defs reused (dict primed) and still no Python call
    calls.clear()
    tape = [("b", ("b", FakeAttr("a"), [(href, "https://u/2")],
             False, None)), ("d", "M"), ("e", "a")]
    frames, mds2, box = [], [], [0]
    cspeed.MOD.md_drain(tape, frames, mds2, 0, convert, {}, [],
                        box, fold, keep)
    assert calls == [] and mds2 == ["[M](https://u/2)"]
    # 3: a NUMBER def anywhere -> whole list through Python convert
    calls.clear()
    mds, fold, keep = run([(href, "https://u/3"), (tab, "3")])
    assert calls == [[(href, "https://u/3"), (tab, "3")]]
    assert mds == ["[L](PY:https://u/3)"]
    # 4: without the memo args the Python callable is always used
    calls.clear()
    mds, _, _ = run([(href, "https://u/4")], use_memo=False)
    assert calls and mds == ["[L](PY:https://u/4)"]


def test_markdown_c_convert_atts_inline_dtd_differential():
    """Full-parser differential for the fallback: an inline DOCTYPE
    declaring NUMBER/NUMBERS attrs on <a> (the built-in dialects are
    all-CDATA, so only a custom DTD reaches the complex branch)."""
    from packages_sgml_spark.core import markdown as M
    if M._c_md_drain() is None:
        import pytest
        pytest.skip("compiled md_drain unavailable")
    doc = ('<!DOCTYPE doc [\n'
           '<!ELEMENT doc - - (p)*>\n'
           '<!ELEMENT p - - (#PCDATA|a)*>\n'
           '<!ELEMENT a - - (#PCDATA)>\n'
           '<!ATTLIST a href CDATA #IMPLIED\n'
           '           tabindex NUMBER #IMPLIED\n'
           '           coords NUMBERS #IMPLIED>\n'
           ']>\n'
           '<doc><p>x <a href="https://u/1" tabindex="3" '
           'coords="1 2 3">L</a> y</p></doc>').encode()
    assert (_md_events_arm(doc, True, "sgml") ==
            _md_events_arm(doc, False, "sgml") ==
            "x [L](https://u/1) y")


def test_markdown_c_drain_skip_box_on_error():
    """An exception mid-tape (convert callback) must leave _skip
    consistent with the frames md_drain already mutated — the C arm
    publishes skip through the optional box at every change, matching
    the Python loop's finally writeback (r8 review)."""
    from packages_sgml_spark.core import cspeed
    if cspeed.MOD is None or not hasattr(cspeed.MOD, "md_drain"):
        import pytest
        pytest.skip("compiled md_drain unavailable")

    class FakeDef:
        def __init__(self, name):
            self.name = name

    style, a = FakeDef("style"), FakeDef("a")

    def boom(atts):
        raise RuntimeError("convert failed")

    # enter a <style> subtree (skip=1), nest one more begin (skip=2),
    # then an <a href> under a frame triggers the failing convert
    tape = [
        ("b", ("b", FakeDef("p"), [], False, None)),
        ("b", ("b", style, [], False, None)),
        ("b", ("b", FakeDef("div"), [], False, None)),
        ("e", "div"),
        ("e", "style"),
        ("b", ("b", a, [("href", "u")], False, None)),
    ]
    frames, mds = [], []
    box = [0]
    import pytest
    with pytest.raises(RuntimeError):
        cspeed.MOD.md_drain(tape, frames, mds, 0, boom, {}, [], box)
    # skip went 1 -> 2 -> 1 -> 0 before the failing begin
    assert box[0] == 0
    # and the partial mutation is consistent: only <p> is open
    assert len(frames) == 1 and frames[0][0] == "p"
