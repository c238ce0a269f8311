"""parse_content() from incremental feed() (round-2 VERDICT item 5):
CallbackParser retains fed text, so the synchronous re-entrant API
works from push parsing whenever the element's content is already
buffered; when it is not, IncompleteContentError is raised; the
asynchronous capture_content() remains chunk-boundary-proof.
"""

import pytest

from packages_sgml_spark.core.parser import ParserOptions, SGMLParser
from packages_sgml_spark.core.sax import (
    CallbackParser, IncompleteContentError)

import os as _os

_UTF8_PATH = "/root/reference/Test/utf8.xml"
UTF8_XML = (open(_UTF8_PATH, "rb").read()
            if _os.path.exists(_UTF8_PATH) else None)
needs_corpus = pytest.mark.skipif(
    UTF8_XML is None, reason="reference corpus absent")


def _mk(on_begin, dialect="xml", **kw):
    return CallbackParser(
        ParserOptions(dialect=dialect, encoding="utf-8"),
        on_begin=on_begin, **kw)


def _feed_chunks(p, data, chunks):
    for c in chunks:
        p.feed(c)
    return p.close()


@needs_corpus
def test_parse_content_from_feed_chunked_mirror():
    """The reference-mirror scenario (test_sgml.pl:225-254) with the
    document arriving in chunks.  Both <name> elements' contents are
    fully buffered by the time their begin callbacks fire (the split
    points are before each <name>), so parse_content succeeds and
    returns exactly what the whole-buffer parse returns."""
    contents, begins = [], []

    def on_begin(name, attrs, p):
        begins.append(name)
        if name == "name":
            contents.append(p.parse_content())

    # split before the first <name>; everything after arrives in one
    # later chunk, already fed when the begin fires
    cut = UTF8_XML.index(b"<name>")
    p = _mk(on_begin)
    _feed_chunks(p, UTF8_XML, [UTF8_XML[:cut], UTF8_XML[cut:]])
    assert contents == [["Dürst"], []]
    assert begins == ["utf8", "name", "name"]


@needs_corpus
def test_parse_content_from_feed_many_cut_points():
    """Any split point that leaves each <name>'s content fully fed by
    the time its begin tag completes must behave identically."""
    first = UTF8_XML.index(b"<name>")
    for cut in [1, 10, first - 1, first]:
        contents = []

        def on_begin(name, attrs, p):
            if name == "name":
                contents.append(p.parse_content())

        p = _mk(on_begin)
        _feed_chunks(p, UTF8_XML, [UTF8_XML[:cut], UTF8_XML[cut:]])
        assert contents == [["Dürst"], []], cut


@needs_corpus
def test_parse_content_from_feed_incomplete_raises():
    """Per-byte feeding: when <name>'s begin fires, its content is
    not buffered yet — the sub-parse must refuse loudly instead of
    returning a truncated content list."""
    seen = []

    def on_begin(name, attrs, p):
        if name == "name":
            seen.append(p.parse_content())

    p = _mk(on_begin)
    with pytest.raises(IncompleteContentError):
        for i in range(len(UTF8_XML)):
            p.feed(UTF8_XML[i:i + 1])
    assert seen == []


@needs_corpus
def test_capture_content_across_chunks():
    """The asynchronous capture API stays correct under per-byte
    feeding (content spans many chunks)."""
    got = []

    def on_begin(name, attrs, p):
        if name == "name":
            p.capture_content(got.append)

    p = _mk(on_begin)
    for i in range(len(UTF8_XML)):
        p.feed(UTF8_XML[i:i + 1])
    p.close()
    assert got == [["Dürst"], []]


def test_plain_parser_feed_does_not_retain():
    """SGMLParser.feed keeps O(1) buffering — no retention, and the
    whole-buffer-only refusal semantics are unchanged."""
    p = SGMLParser(ParserOptions(dialect="xml"))
    p.feed("<a>")
    assert p._doc_text is None
    p.feed("text</a>")
    dom, errors = p.close()
    assert dom and dom[0].name == "a"


def test_retained_feed_respects_max_memory():
    opts = ParserOptions(dialect="xml")
    opts.max_memory = 64
    p = CallbackParser(opts)
    p.feed("<a>")
    p.feed("x" * 200)
    assert p.stopped
    assert any("resources" in e.message or "resource" in e.message.lower()
               for e in p.errors)
    # round-3 review fix: once stopped, further feeds are DROPPED —
    # the retained buffer must not keep growing and the resource
    # gripe must not duplicate per call
    size0 = len(p._doc_text)
    n_err0 = len(p.errors)
    for _ in range(5):
        p.feed("y" * 1000)
    assert len(p._doc_text) == size0
    assert len(p.errors) == n_err0


def test_retained_feed_is_o_of_unconsumed_tail():
    """r4 advice fix: CallbackParser.feed drops the consumed prefix
    of the retained buffer at every feed() entry, so a long-running
    push parse holds O(largest chunk), not O(total stream) — with
    max_memory unset (the default)."""
    contents = []

    def on_begin(name, attrs, p):
        if name == "b":
            contents.append(p.parse_content())

    p = _mk(on_begin)
    p.feed("<a>")
    chunk = "<b>xy</b>" + "c" * 91      # 100 chars per feed
    for _ in range(500):                # 50k chars total
        p.feed(chunk)
        # retention never exceeds one chunk (+ held-back tail char)
        assert len(p._doc_text) <= len(chunk) + 4
    p.feed("</a>")
    p.close()
    assert contents == [["xy"]] * 500   # parse_content still works
    # and the output equals a whole-buffer parse of the same stream
    q = _mk(None)
    q.parse("<a>" + chunk * 500 + "</a>")
    assert not p.errors and not q.errors


def test_parse_content_inside_entity_expansion():
    """Round-2 VERDICT item 6: a sub-parse fired from a begin
    callback inside an EC_SGML entity expansion returns the same
    content list a whole-buffer parse of the expanded document
    would."""
    doc = (b'<!DOCTYPE a [<!ELEMENT a - - ANY>'
           b'<!ELEMENT b - - (#PCDATA)>'
           b'<!ELEMENT c - - ANY>'
           b'<!ENTITY frag "<b>inside</b><c>tail</c>">]>'
           b'<a>x&frag;y</a>')
    got = []
    begins = []
    data = []

    def on_begin(name, attrs, p):
        begins.append(name)
        if name == "b":
            got.append(("b", p.parse_content()))

    CallbackParser(ParserOptions(dialect="sgml"), on_begin=on_begin,
                   on_data=lambda k, t, p: data.append(t)).parse(doc)
    assert got == [("b", ["inside"])]
    # outer parse continued inside the expansion (c begins) and after
    # it (y flows as outer data); b's own content events stayed
    # invisible to the outer callbacks (closure-swap semantics)
    assert begins == ["a", "b", "c"]
    joined = "".join(data)
    assert "x" in joined and "y" in joined and "tail" in joined
    assert "inside" not in joined


def test_parse_content_inside_entity_nested():
    """Nested sub-parses within the same expansion frame: the inner
    one advances the outer sub-parse via the pending-skip path."""
    doc = (b'<!DOCTYPE a [<!ELEMENT a - - ANY>'
           b'<!ELEMENT o - - ANY>'
           b'<!ELEMENT i - - (#PCDATA)>'
           b'<!ENTITY frag "<o>pre<i>deep</i>post</o>">]>'
           b'<a>&frag;</a>')
    got = {}

    def on_begin(name, attrs, p):
        if name == "o":
            got["o"] = p.parse_content()
        elif name == "i":
            got["i"] = p.parse_content()

    CallbackParser(ParserOptions(dialect="sgml"),
                   on_begin=on_begin).parse(doc)
    # the outer sub-parse suspends callbacks, so 'i' is captured as
    # part of o's content without its own callback firing
    assert "i" not in got
    o = got["o"]
    assert o[0] == "pre" and o[-1] == "post"
    assert o[1].name == "i" and o[1].content == ["deep"]


def test_parse_content_entity_unclosed_raises():
    """Content that does not close inside the replacement text cannot
    be returned synchronously — IncompleteContentError."""
    doc = (b'<!DOCTYPE a [<!ELEMENT a - - ANY>'
           b'<!ELEMENT b - - ANY>'
           b'<!ENTITY frag "<b>never closed">]>'
           b'<a>&frag;</a>')
    caught = []

    def on_begin(name, attrs, p):
        if name == "b":
            try:
                p.parse_content()
            except IncompleteContentError:
                caught.append(name)

    CallbackParser(ParserOptions(dialect="sgml"),
                   on_begin=on_begin).parse(doc)
    assert caught == ["b"]


def test_reference_corpus_chunked_feed_parity():
    """Every reference Test/ document, push-parsed in 13-byte chunks
    through CallbackParser, produces the same event stream + errors
    as the whole-buffer parse — retention and chunk-boundary handling
    hold on the real corpus, not just synthetic soup."""
    import os
    tdir = "/root/reference/Test"
    if not os.path.isdir(tdir):
        pytest.skip("reference corpus absent")
    files = sorted(f for f in os.listdir(tdir)
                   if f.endswith((".sgml", ".xml")))
    assert files
    for fn in files:
        with open(os.path.join(tdir, fn), "rb") as f:
            data = f.read()
        dialect = "sgml" if fn.endswith(".sgml") else "xml"

        def run_events(chunked):
            ev = []
            p = CallbackParser(
                ParserOptions(dialect=dialect),
                on_begin=lambda n, a, p_: ev.append(("b", n, a)),
                on_end=lambda n, p_: ev.append(("e", n)),
                on_data=lambda k, t, p_: ev.append(("d", k, t)),
                on_pi=lambda t, p_: ev.append(("pi", t)))
            if chunked:
                for i in range(0, len(data), 13):
                    p.feed(data[i:i + 13])
                    if p.stopped:
                        break
                _dom, errors = p.close()
            else:
                _dom, errors = p.parse(data)
            return ev, [(e.line, e.message) for e in errors]

        whole = run_events(False)
        chunked = run_events(True)
        assert whole == chunked, fn


def test_feed_mode_equals_whole_buffer_output():
    """Chunked feed through CallbackParser produces the same DOM and
    errors as whole-buffer parse (retention must not perturb the
    tokenizer)."""
    doc = ("<!DOCTYPE html><html><head><title>t</title></head>"
           "<body><p>one<p>two &amp; three<ul><li>a<li>b</ul>"
           "</body></html>").encode()
    p1 = CallbackParser(ParserOptions(dialect="html"))
    dom1, err1 = p1.parse(doc)
    p2 = CallbackParser(ParserOptions(dialect="html"))
    for i in range(0, len(doc), 7):
        p2.feed(doc[i:i + 7])
    dom2, err2 = p2.close()
    assert repr(dom1) == repr(dom2)
    assert [(e.line, e.message) for e in err1] == \
           [(e.line, e.message) for e in err2]
