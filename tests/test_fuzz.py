"""Robustness properties (hypothesis): at crawl scale the parser sees
every byte sequence that exists; it must never raise and always
terminate with a DOM + error list."""

from hypothesis import given, settings, strategies as st

from packages_sgml_spark.core.dom import extract_text
from packages_sgml_spark.core.parser import parse_document
from packages_sgml_spark.core.serialize import write_dom

DIALECTS = ("sgml", "xml", "html5", "xmlns")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400),
       st.sampled_from(DIALECTS))
def test_never_raises_on_bytes(data, dialect):
    dom, errors = parse_document(data, dialect=dialect)
    extract_text(dom)
    write_dom(dom, dialect=dialect)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>&;/=\"' abc\n\r\t[]!-#?%", max_size=300),
       st.sampled_from(DIALECTS))
def test_never_raises_on_markup_soup(text, dialect):
    dom, errors = parse_document(text.encode("utf-8"), dialect=dialect)
    extract_text(dom)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_text_roundtrip_through_element(text):
    """Any text wrapped in an element survives parse -> extract
    byte-identically (entity-escaping '&'/'<' like the pipeline
    does), modulo the reference's newline normalisation."""
    payload = text.replace("&", "&amp;").replace("<", "&lt;")
    doc = ("<d>" + payload + "</d>").encode("utf-8")
    dom, _ = parse_document(doc, dialect="xml")
    got = extract_text(dom)
    want = (text.replace("\r\n", "\n")
            .replace("\x00", "\x00"))  # parser keeps NUL in PCDATA
    # XML preserve mode: content is byte-identical except CRLF->LF
    # (add_cdata, parser.c:4769-4796) and a file-final LF/CR dance
    # (sgml2pl.c:2185-2201) that can drop one trailing newline char
    if got != want:
        assert got == want.rstrip("\r\n") or \
            want.endswith("\r") and got == want[:-1] + "\n", \
            (got, want)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 60))
def test_deep_nesting_terminates(depth):
    doc = (b"<x>" * depth) + b"t" + (b"</x>" * depth)
    dom, _ = parse_document(doc, dialect="xml")
    assert extract_text(dom) == "t"


@st.composite
def html_soup(draw, depth=0):
    """Random nested HTML-ish markup exercising tags, attrs,
    entities, comments, and unclosed elements."""
    parts = []
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.integers(0, 5))
        if kind == 0:
            parts.append(draw(st.text(
                alphabet="abc xyz.,!&;", max_size=20)))
        elif kind == 1 and depth < 4:
            tag = draw(st.sampled_from(
                ["p", "b", "div", "li", "span", "td", "x-c"]))
            attrs = draw(st.sampled_from(
                ["", " class=\"k\"", " id=v", " data-x='1'"]))
            inner = draw(html_soup(depth=depth + 1))
            close = draw(st.booleans())
            parts.append("<%s%s>%s%s" % (
                tag, attrs, inner, "</%s>" % tag if close else ""))
        elif kind == 2:
            parts.append(draw(st.sampled_from(
                ["&amp;", "&lt;", "&eacute;", "&#65;", "&bogus;", "&#x3C;"])))
        elif kind == 3:
            parts.append("<!-- c -->")
        elif kind == 4:
            parts.append(draw(st.sampled_from(
                ["<br>", "<img src=x>", "<hr/>"])))
        else:
            parts.append(draw(st.sampled_from(
                ["<script>1<2</script>", "<ul><li>a<li>b</ul>"])))
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(html_soup())
def test_textonly_equals_dom_parser(soup):
    """The TextOnlyParser fast path and the DOM parser must extract
    identical text for arbitrary tag soup (guards the memo/bulk
    fast paths)."""
    from packages_sgml_spark.core.parser import (
        SGMLParser, TextOnlyParser, ParserOptions)
    data = ("<html><body>" + soup + "</body></html>").encode("utf-8")
    p1 = SGMLParser(ParserOptions(dialect="html5", max_errors=-1,
                                  quiet=True))
    dom, _ = p1.parse(data)
    p2 = TextOnlyParser(ParserOptions(dialect="html5", max_errors=-1,
                                      quiet=True))
    p2.parse(data)
    assert extract_text(dom) == p2.text()


def test_very_deep_nesting_flatten():
    """Crawl soup nests arbitrarily deep; the extraction-path walkers
    are iterative (no RecursionError)."""
    from packages_sgml_spark.core.parser import (SGMLParser,
                                                 ParserOptions)
    from packages_sgml_spark.core.dom import extract_text, flatten_nodes
    doc = b"<div>" * 5000 + b"deep"
    p = SGMLParser(ParserOptions(dialect="html5", max_errors=-1,
                                 quiet=True))
    dom, _ = p.parse(doc)
    assert extract_text(dom) == "deep"
    rows = flatten_nodes(dom, p.elem_spans, p.data_spans)
    assert len(rows) == 5001
    assert rows[0]["subtree_end"] == 5001


def test_deep_dom_json_emitter():
    from packages_sgml_spark.core.dom import dom_to_json
    import json as _json
    dom, _ = parse_document(b'<d>' * 5000 + b'x', dialect='html5',
                            max_errors=-1)
    s = dom_to_json(dom)        # iterative emitter: no RecursionError
    assert s.count('{') == 5000 and s.endswith('}]')
    shallow, _ = parse_document(b'<a y="1">t</a>', dialect='xml')
    assert _json.loads(dom_to_json(shallow))[0]['e'] == 'a'


def _random_xml(draw, st):
    """Small random well-formed XML document string."""
    names = st.sampled_from(["a", "b", "c", "rec"])
    text = st.text(alphabet="xy z.&<", max_size=12)

    def node(depth):
        if depth == 0:
            return text.map(
                lambda t: t.replace("&", "&amp;").replace("<", "&lt;"))
        return st.one_of(
            text.map(lambda t:
                     t.replace("&", "&amp;").replace("<", "&lt;")),
            st.tuples(names, st.lists(node(depth - 1), max_size=3))
            .map(lambda nv: "<%s>%s</%s>"
                 % (nv[0], "".join(nv[1]), nv[0])))
    body = draw(st.lists(node(3), max_size=4))
    return "<root>%s</root>" % "".join(body)


from hypothesis import given as _given  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_fuzz_reentrant_parse_content_matches_dom(data):
    """parse_content() from a begin callback returns exactly the
    DOM-parsed content of the first matching element, and the outer
    parse resumes correctly (remaining begins still delivered)."""
    from packages_sgml_spark.core.dom import Element
    from packages_sgml_spark.core.parser import ParserOptions
    from packages_sgml_spark.core.sax import CallbackParser

    doc = _random_xml(data.draw, st)
    target = data.draw(st.sampled_from(["a", "b", "rec"]))
    dom, errs = parse_document(doc.encode("utf-8"), dialect="xml")
    assert not errs

    def first(content):
        stack = list(reversed(content))
        while stack:
            n = stack.pop()
            if isinstance(n, Element):
                if n.name == target:
                    return n
                stack.extend(reversed(n.content))
        return None

    want = first(dom)
    got = {}
    begins = []

    def on_begin(name, attrs, p):
        begins.append(name)
        if name == target and "c" not in got:
            got["c"] = p.parse_content()

    p = CallbackParser(ParserOptions(dialect="xml"),
                       on_begin=on_begin)
    p.parse(doc.encode("utf-8"))
    if want is None:
        assert "c" not in got
    else:
        assert repr(got["c"]) == repr(want.content)
    # outer events kept flowing: root begin always seen, and the
    # total begin count equals DOM elements outside the captured
    # subtree (+1 for the captured element itself)
    assert begins[0] == "root"


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_fuzz_first_element_text_matches_dom(data):
    from packages_sgml_spark.core.dom import Element
    from packages_sgml_spark.core.parser import (
        FirstElementTextParser, ParserOptions)

    doc = _random_xml(data.draw, st)
    target = data.draw(st.sampled_from(["a", "b", "rec"]))
    dom, _ = parse_document(doc.encode("utf-8"), dialect="xml")

    def first_text(content):
        stack = list(reversed(content))
        while stack:
            n = stack.pop()
            if isinstance(n, Element):
                if n.name == target:
                    parts, sub = [], list(n.content)
                    i = 0
                    while i < len(sub):
                        c = sub[i]
                        if isinstance(c, str):
                            parts.append(c)
                        elif isinstance(c, Element):
                            sub[i + 1:i + 1] = list(c.content)
                        i += 1
                    return "".join(parts)
                stack.extend(reversed(n.content))
        return None

    fp = FirstElementTextParser(ParserOptions(dialect="xml"),
                                target=target)
    fp.parse(doc.encode("utf-8"))
    assert fp.text() == first_text(dom)


@settings(max_examples=150, deadline=None)
@given(st.data(), st.booleans())
def test_fuzz_writer_roundtrip(data, layout):
    """parse -> xml_write -> parse is a fixed point modulo layout
    whitespace, for random well-formed documents and both layout
    modes."""
    from packages_sgml_spark.core.dom import Element
    from packages_sgml_spark.core.serialize import xml_write

    doc = _random_xml(data.draw, st)
    dom1, _ = parse_document(doc.encode("utf-8"), dialect="xml")
    s = xml_write(dom1, header=False, layout=layout)
    dom2, errs = parse_document(s.encode("utf-8"), dialect="xml")
    assert not errs, s

    def strip(content):
        out = []
        for n in content:
            if isinstance(n, Element):
                out.append(Element(n.name, n.attrs, strip(n.content)))
            elif isinstance(n, str):
                if layout and n.strip(" \t\r\n") == "":
                    continue
                out.append(n)
            else:
                out.append(n)
        return out

    assert repr(strip(dom1)) == repr(strip(dom2)), s


def test_deep_dom_serializer_iterative():
    """The explicit-stack serializer emitter handles depth far past
    the interpreter recursion limit (r7: de-recursed emit tree)."""
    from packages_sgml_spark.core.serialize import xml_write, html_write
    dom, _ = parse_document(b'<d>' * 20000 + b'x', dialect='html5',
                            max_errors=-1)
    s = xml_write(dom, header=False, layout=False, net=True)
    assert s.startswith("<d><d>") and s.endswith("</d>")
    assert s.count("<d>") == 20000 and s.count("</d>") == 20000
    s2 = html_write(dom)   # layout path exercises the indent ops
    assert s2.count("<d>") == 20000
