"""Unit tests for parser-core pieces (SURVEY.md §5 layer 1)."""

from packages_sgml_spark.core.chars import (
    is_blank_char, is_name_char, is_nmstart_char)
from packages_sgml_spark.core.entities import (
    char_entity_value, isee_character_entity)
from packages_sgml_spark.core.parser import (
    SGMLParser, ParserOptions, parse_document, collapse_blanks)
from packages_sgml_spark.core.dom import Element, extract_text, flatten_nodes


def test_charclass():
    assert is_name_char('a') and is_name_char('2') and is_name_char('-')
    assert is_name_char('.') and is_name_char(':') and is_name_char('_')
    assert not is_name_char(' ') and not is_name_char('/')
    assert is_nmstart_char('x') and is_nmstart_char(':')
    assert not is_nmstart_char('1') and not is_nmstart_char('-')
    assert is_blank_char('\t') and is_blank_char('\n') and is_blank_char('\r')
    assert is_name_char('ü')          # latin accent
    assert is_name_char('р')          # cyrillic wide char


def test_char_entity_value():
    assert char_entity_value('#65') == 65
    assert char_entity_value('#x41') == 0x41
    assert char_entity_value('#RS') == 0x0A
    assert char_entity_value('#RE') == 0x0D
    assert char_entity_value('#TAB') == 9
    assert char_entity_value('#SPACE') == 32
    assert char_entity_value('#4x') == -1
    assert char_entity_value('x') == -1


def test_isee_character_entity():
    assert isee_character_entity('&#65;') == (65, 5)
    assert isee_character_entity('&#65 rest') == (65, 4)
    assert isee_character_entity('&amp;') is None


def test_collapse_blanks():
    assert collapse_blanks('a  b\t\nc') == 'a b c'
    assert collapse_blanks('  a  b  ', trim=True) == 'a b'


def test_parse_xml_basic():
    dom, errs = parse_document(b'<a x="1"><b>t</b></a>', dialect='xml')
    assert errs == []
    assert dom == [Element('a', [('x', '1')],
                           [Element('b', [], ['t'])])]


def test_parse_xml_empty_tag():
    dom, errs = parse_document(b'<a><b/>tail</a>', dialect='xml')
    assert dom == [Element('a', [], [Element('b', [], []), 'tail'])]


def test_parse_entities():
    dom, _ = parse_document(b'<a>&lt;&amp;&#65;</a>', dialect='xml')
    assert dom == [Element('a', [], ['<&A'])]


def test_utf8_content():
    dom, _ = parse_document('<a>éр</a>'.encode('utf-8'),
                            dialect='xml')
    assert dom == [Element('a', [], ['éр'])]


def test_sgml_implied_tags():
    doc = (b'<!DOCTYPE t [\n<!ELEMENT t O O (p+)>\n'
           b'<!ELEMENT p O O (#PCDATA)>\n]>\nhello')
    dom, errs = parse_document(doc, dialect='sgml')
    assert dom == [Element('t', [], [Element('p', [], ['hello'])])]


def test_tag_soup_recovery():
    # unknown elements, stray close tags -> no crash, best-effort DOM
    dom, errs = parse_document(
        b'<html><p>one<p>two</notopen></html>', dialect='sgml')
    assert dom[0].name == 'html'


def test_extract_and_flatten():
    dom, _ = parse_document(b'<a>x<b>y</b>z</a>', dialect='xml')
    assert extract_text(dom) == 'xyz'
    rows = flatten_nodes(dom)
    kinds = [r['kind'] for r in rows]
    assert kinds == ['element', 'text', 'element', 'text', 'text']
    assert rows[0]['name'] == 'a'
    assert rows[2]['parent_id'] == 0


def test_max_errors_stop():
    p = SGMLParser(ParserOptions(dialect='xml', max_errors=0))
    dom, errs = p.parse(b'<a>&undefined;&undefined2;</a>')
    assert len(errs) >= 1


def test_names_module():
    from packages_sgml_spark.core.names import xml_name, iri_xml_namespace
    assert xml_name("foo") and xml_name("f-o.o") and xml_name("_x")
    assert not xml_name("1x") and not xml_name("") and not xml_name("a b")
    assert iri_xml_namespace("http://ex.org/ns#local") == \
        ("http://ex.org/ns#", "local")
    assert iri_xml_namespace("http://ex.org/ns/name") == \
        ("http://ex.org/ns/", "name")


def test_content_length():
    dom, _ = parse_document(b'<a>hello</a><b>junk', dialect='xml',
                            content_length=12)
    assert dom == [Element('a', [], ['hello'])]


def test_catalog_autoload():
    cat = {'doc': '<!ELEMENT doc - - (item+)> <!ELEMENT item - O (#PCDATA)>'}
    dom, errs = parse_document(b'<doc><item>a<item>b</doc>',
                               dialect='sgml', catalog=cat)
    assert dom[0].name == 'doc' and len(dom[0].content) == 2


def test_esis_dump():
    from packages_sgml_spark.core.esis import esis_dump
    out = esis_dump(b'<a x="1">t<b/>u</a>', dialect='xml')
    lines = out.splitlines()
    assert lines[0] == 'Ax CDATA 1'
    assert lines[1] == '(a'
    assert '-t' in lines and ')a' in lines and lines[-1] == 'C'


def test_iso639():
    from packages_sgml_spark.core.iso639 import language_name
    assert language_name('en') == 'english'
    assert language_name('DEU') == 'german'
    assert language_name('xx') is None


def test_stop_at_element():
    dom, _ = parse_document(b'<a>one</a><b>two</b>', dialect='xml',
                            stop_at='element')
    assert dom == [Element('a', [], ['one'])]


def test_textonly_matches_dom_parser_on_corpus():
    import os
    from packages_sgml_spark.core.parser import (
        TextOnlyParser, SGMLParser, ParserOptions)
    from packages_sgml_spark.core.dom import extract_text
    td = '/root/reference/Test'
    if not os.path.isdir(td):
        return
    for fn in sorted(os.listdir(td)):
        if not fn.endswith(('.sgml', '.xml')):
            continue
        dialect = 'sgml' if fn.endswith('.sgml') else 'xml'
        data = open(os.path.join(td, fn), 'rb').read()
        p1 = SGMLParser(ParserOptions(dialect=dialect, encoding='utf-8',
                                      quiet=True))
        dom, _ = p1.parse(data)
        p2 = TextOnlyParser(ParserOptions(dialect=dialect,
                                          encoding='utf-8', quiet=True))
        p2.parse(data)
        assert p2.text() == extract_text(dom), fn


def test_boilerplate_strip():
    from packages_sgml_spark.core.boilerplate import main_content
    html = (b'<!DOCTYPE html><html><head><title>T</title>'
            b'<style>.x{}</style></head><body>'
            b'<nav><a href=/>Home</a> | <a href=/a>About</a></nav>'
            b'<h1>The Headline</h1>'
            b'<p>This is the first real paragraph with many words.</p>'
            b'<div class=side><a href=1>l</a> <a href=2>l</a></div>'
            b'<script>track();</script>'
            b'<footer>Copyright <a href=/l>Legal</a></footer>'
            b'</body></html>')
    dom, _ = parse_document(html, dialect='html5')
    text = main_content(dom)
    assert "first real paragraph" in text
    assert "The Headline" in text          # heading rescue
    assert "Home" not in text              # nav pruned
    assert "track" not in text             # script pruned
    assert "Copyright" not in text         # footer pruned
    assert "l l" not in text               # link-dense block dropped


def test_incremental_feed_matches_oneshot():
    from packages_sgml_spark.core.parser import SGMLParser, ParserOptions
    data = (b'<!DOCTYPE t [\n<!ELEMENT t O O (p+)>\n'
            b'<!ELEMENT p O O (#PCDATA)>\n]>\nhello\n\nworld\n')
    whole, errs1 = SGMLParser(ParserOptions(dialect='sgml')).parse(data)
    for cut in (1, 3, 7, 15, 29, len(data) - 1):
        p = SGMLParser(ParserOptions(dialect='sgml'))
        p.feed(data[:cut]).feed(data[cut:])
        dom, errs2 = p.close()
        assert dom == whole, cut
        assert [(e.line, e.message) for e in errs2] == \
            [(e.line, e.message) for e in errs1], cut
    # byte-at-a-time
    p = SGMLParser(ParserOptions(dialect='sgml'))
    for i in range(len(data)):
        p.feed(data[i:i+1])
    dom, _ = p.close()
    assert dom == whole


def test_bom_stripped():
    dom, errs = parse_document(b'\xef\xbb\xbf<a>x</a>', dialect='xml')
    assert dom == [Element('a', [], ['x'])] and errs == []


def test_max_memory_guard():
    dom, errs = parse_document(b'<a>' + b'x' * 300000 + b'</a>',
                               dialect='xml', max_memory=100000)
    assert any('resources' in e.message for e in errs)


def test_sax_callbacks_and_capture():
    """Reference callback test analog (test_sgml.pl:225-254): SAX
    parse of utf8.xml; the begin callback for <name> captures that
    element's content."""
    import os
    from packages_sgml_spark.core.sax import CallbackParser
    from packages_sgml_spark.core.parser import ParserOptions
    path = "/root/reference/Test/utf8.xml"
    if not os.path.isfile(path):
        return
    captured = []
    events = []

    def on_begin(name, attrs, parser):
        events.append(("b", name))
        if name == "name":
            parser.capture_content(lambda c: captured.append(c))

    p = CallbackParser(ParserOptions(dialect="xml", encoding="utf-8"),
                       on_begin=on_begin,
                       on_end=lambda n, _p: events.append(("e", n)))
    with open(path, "rb") as f:
        p.parse(f.read())
    assert captured == [['Dürst'], []]
    assert ("b", "utf8") in events and ("e", "utf8") in events


def test_sax_nested_captures():
    from packages_sgml_spark.core.sax import CallbackParser
    from packages_sgml_spark.core.parser import ParserOptions
    caps = []

    def on_begin(name, attrs, p):
        if name in ('b', 'c'):
            p.capture_content(lambda c, n=name: caps.append((n, c)))

    p = CallbackParser(ParserOptions(dialect='xml'), on_begin=on_begin)
    p.parse(b'<a><b>x<c>y</c>z</b></a>')
    assert caps[0] == ('c', ['y'])
    assert caps[1][0] == 'b'
    assert caps[1][1] == ['x', Element('c', [], ['y']), 'z']


def test_utf16_bom_transcode():
    for enc in ('utf-16-le', 'utf-16-be'):
        doc = '﻿<a>héllo р</a>'.encode(enc)
        dom, errs = parse_document(doc, dialect='xml')
        assert dom == [Element('a', [], ['héllo р'])], enc


def test_html4_dialect_profile():
    doc = (b'<body><form><p>one<form><p>two</form></form>'
           b'<a href=x>l1 <a href=y>l2</a></a></body>')
    dom, errs = parse_document(doc, dialect='html', max_errors=-1)
    assert extract_text(dom) == 'onetwol1 l2'
    msgs = [e.message for e in errs]
    assert 'Element "form" not allowed here' in msgs  # -(form) exclusion


def test_reentrant_parse_content_reference_mirror():
    """Mirror of test_sgml.pl:225-254 test_callback via the TRUE
    re-entrant API: on_begin('name', ...) calls parser.parse_content()
    SYNCHRONOUSLY and gets that element's content; outer callbacks do
    not see the sub-document's events; the outer parse resumes after
    the element.  Expected on Test/utf8.xml: two contents, the first
    ['Dürst'], the second [] (empty element)."""
    from packages_sgml_spark.core.parser import ParserOptions
    from packages_sgml_spark.core.sax import CallbackParser

    with open("/root/reference/Test/utf8.xml", "rb") as f:
        data = f.read()

    contents = []
    outer_begins = []
    outer_ends = []

    def on_begin(name, attrs, p):
        outer_begins.append(name)
        if name == "name":
            contents.append(p.parse_content())

    def on_end(name, p):
        outer_ends.append(name)

    p = CallbackParser(ParserOptions(dialect="xml", encoding="utf-8"),
                       on_begin=on_begin, on_end=on_end)
    p.parse(data)
    # length(Xs, 2), maplist(cdata, Xs): each [] or [Atom]
    assert len(contents) == 2
    assert contents[0] == ["Dürst"]
    assert contents[1] == []
    # closure-swap semantics: the sub-document's events are invisible
    # to the outer callbacks; 'name' begins are seen, their ends are
    # consumed by the sub-parse
    assert outer_begins == ["utf8", "name", "name"]
    assert "utf8" in outer_ends


def test_reentrant_parse_content_nested_and_mixed():
    """Nesting + mixed content + omitted end tags through the
    re-entrant path; outer parse continues correctly after each
    sub-parse."""
    from packages_sgml_spark.core.dom import Element
    from packages_sgml_spark.core.parser import ParserOptions
    from packages_sgml_spark.core.sax import CallbackParser

    got = {}
    order = []

    def on_begin(name, attrs, p):
        order.append(name)
        if name == "inner":
            got["inner"] = p.parse_content()
        elif name == "outer":
            got["outer"] = p.parse_content()

    xml = (b"<doc><pre>x</pre>"
           b"<outer>a<inner>b<deep>c</deep></inner>d</outer>"
           b"<post>y</post></doc>")
    p = CallbackParser(ParserOptions(dialect="xml"), on_begin=on_begin)
    p.parse(xml)
    out = got["outer"]
    assert out[0] == "a"
    assert isinstance(out[1], Element) and out[1].name == "inner"
    assert out[1].content[0] == "b"
    assert out[1].content[1].name == "deep"
    assert out[1].content[1].content == ["c"]
    assert out[2] == "d"
    # the outer capture consumed <inner> wholesale, so on_begin never
    # fired for it or for <deep>; <post> still parsed afterwards
    assert order == ["doc", "pre", "outer", "post"]
    assert "inner" not in got

    # nested sub-parse: trigger on inner only
    got.clear()
    order.clear()

    def on_begin2(name, attrs, p):
        order.append(name)
        if name == "inner":
            got["inner"] = p.parse_content()

    p2 = CallbackParser(ParserOptions(dialect="xml"),
                        on_begin=on_begin2)
    p2.parse(xml)
    assert got["inner"][0] == "b"
    assert got["inner"][1].name == "deep"
    assert order == ["doc", "pre", "outer", "inner", "post"]


def test_xml_unicode_ranges_match_reference_tables():
    """Exact-table gate: independently re-extract every range from
    the reference's generated xml_unicode.c and check our generated
    module byte-for-byte, then probe every range edge +-1 through the
    public classification API (is_name_char / is_nmstart_char)."""
    import re
    from packages_sgml_spark.core import xml_ranges as X
    from packages_sgml_spark.core.chars import (
        is_name_char, is_nmstart_char)

    with open("/root/reference/xml_unicode.c") as f:
        text = f.read()
    funcs = {}
    names = ["xml_basechar", "xml_ideographic", "xml_combining_char",
             "xml_digit", "xml_extender"]
    positions = sorted((re.search(r"^%s\(int c\)" % n, text,
                                  re.M).start(), n) for n in names)
    for k, (pos, n) in enumerate(positions):
        end = positions[k + 1][0] if k + 1 < len(positions) else len(text)
        body = text[pos:end]
        rs = [(int(a, 16), int(b, 16)) for a, b in re.findall(
            r"return \(c >= 0x([0-9a-f]+) && c <= 0x([0-9a-f]+)\);",
            body)]
        rs += [(int(a, 16),) * 2 for a in re.findall(
            r"return \(c == 0x([0-9a-f]+)\);", body)]
        funcs[n] = tuple(sorted(rs))
    assert funcs["xml_basechar"] == X.BASECHAR
    assert funcs["xml_ideographic"] == X.IDEOGRAPHIC
    assert funcs["xml_combining_char"] == X.COMBINING_CHAR
    assert funcs["xml_digit"] == X.DIGIT
    assert funcs["xml_extender"] == X.EXTENDER

    def ref_name(cp):
        return any(lo <= cp <= hi for n in names
                   for lo, hi in funcs[n])

    def ref_nmstart(cp):
        return any(lo <= cp <= hi
                   for n in ("xml_basechar", "xml_ideographic")
                   for lo, hi in funcs[n])

    probes = set()
    for n in names:
        for lo, hi in funcs[n]:
            probes.update((lo - 1, lo, hi, hi + 1))
    n_checked = 0
    for cp in probes:
        if cp <= 0xFF or cp > 0x10FFFF:
            continue   # latin-1 range uses the CLASS table by design
        ch = chr(cp)
        assert is_name_char(ch) == ref_name(cp), hex(cp)
        assert is_nmstart_char(ch) == ref_nmstart(cp), hex(cp)
        n_checked += 1
    assert n_checked > 900


def test_xml_unicode_names_parse():
    """Exotic (non-latin) tag/attr names through the full XML parser:
    ideographic start, combining/extender continuation; digits can't
    start a name."""
    from packages_sgml_spark.core.parser import ParserOptions, SGMLParser
    from packages_sgml_spark.core.dom import Element

    doc = ("<一̀ 你·=\"v\">x</一̀>"
           ).encode("utf-8")
    p = SGMLParser(ParserOptions(dialect="xml", encoding="utf-8"))
    dom, errors = p.parse(doc)
    assert not errors, errors
    el = dom[0]
    assert isinstance(el, Element) and el.name == "一̀"
    assert el.attrs[0][0] == "你·"
    assert el.content == ["x"]

    # U+0660 ARABIC-INDIC DIGIT ZERO is a name char, not a start char
    bad = "<٠a>x</٠a>".encode("utf-8")
    p2 = SGMLParser(ParserOptions(dialect="xml", encoding="utf-8"))
    _dom2, errors2 = p2.parse(bad)
    assert errors2


def test_utf16_encoding_option_without_bom():
    """Explicit encoding('utf-16le'/'utf-16be') decodes BOM-less
    input identically to the reference's stream-layer recoding; the
    bare 'utf-16' name is BOM-driven with a big-endian default."""
    from packages_sgml_spark.core.parser import ParserOptions, SGMLParser

    xml = '<doc a="ü">Dürst — ✓</doc>'
    want_dom, want_err = SGMLParser(
        ParserOptions(dialect="xml", encoding="utf-8")).parse(
            xml.encode("utf-8"))
    assert not want_err

    cases = [
        (xml.encode("utf-16-le"), "utf-16le"),       # no BOM, LE
        (xml.encode("utf-16-be"), "utf-16be"),       # no BOM, BE
        (xml.encode("utf-16-be"), "utf-16"),         # no BOM -> BE default
        ("﻿".encode("utf-16-le") + xml.encode("utf-16-le"),
         "utf-16"),                                   # BOM-driven LE
        ("﻿".encode("utf-16-be") + xml.encode("utf-16-be"),
         "utf-16"),                                   # BOM-driven BE
    ]
    for data, enc in cases:
        p = SGMLParser(ParserOptions(dialect="xml", encoding=enc))
        dom, errors = p.parse(data)
        assert not errors, (enc, errors)
        assert repr(dom) == repr(want_dom), enc


def test_iso639_full_tables():
    """Full reference table parity: every l2/l3 fact resolvable via
    iso_639(); duplicate codes resolve to the Prolog first solution."""
    import re
    from packages_sgml_spark.core.iso639 import (
        ISO_639_2, ISO_639_3, iso_639)
    pat = re.compile(
        r"^l([23])\(([a-z]+),\s*'((?:[^'\\]|\\.)*)'\)\.", re.M)

    def unescape(name):
        name = re.sub(r"\\u([0-9a-fA-F]{4})",
                      lambda m: chr(int(m.group(1), 16)), name)
        return name.replace("\\'", "'")

    facts = [(w, c, unescape(n)) for w, c, n in
             pat.findall(open("/root/reference/iso_639.pl").read())]
    assert len(facts) == 136 + 427
    seen = set()
    for which, code, name in facts:
        table = ISO_639_2 if which == "2" else ISO_639_3
        if (which, code) in seen:
            continue          # duplicate: first solution wins
        seen.add((which, code))
        assert table[code] == name, (code, table.get(code), name)
    assert iso_639("fr") == "French"
    assert iso_639("ace") == "Achinese"
    assert iso_639("ine") == "Indo-European (Other)"
    assert iso_639("nosuch") is None


def test_soc_catalog_parse_reference_file():
    """Parse the reference's own DTD/HTML4.soc: entry kinds, pubid
    squish, base-relative resolution, unknown-keyword (SGMLDECL)
    skipping."""
    from packages_sgml_spark.core.catalog import (
        CAT_DOCTYPE, CAT_PUBLIC, OVR_DOCTYPE, OVR_PUBLIC, SGMLCatalog)
    cat = SGMLCatalog().load_file("/root/reference/DTD/HTML4.soc")
    kinds = [k for k, _t, _r in cat.items]
    # OVERRIDE YES is active: doctype/public entries get OVR_ kinds
    assert kinds == [OVR_DOCTYPE, OVR_PUBLIC, OVR_PUBLIC, OVR_PUBLIC]
    assert cat.items[0][1] == "HTML"
    assert cat.items[0][2].endswith("/DTD/HTML4.dtd")
    assert cat.items[1][1] == "-//W3C//ENTITIES Latin1//EN//HTML"
    assert cat.items[1][2].endswith("/DTD/HTMLlat1.ent")
    # lookups (find_in_catalogue semantics)
    assert cat.find(CAT_DOCTYPE, name="html",
                    ci=True).endswith("HTML4.dtd")
    assert cat.find(CAT_DOCTYPE, name="html", ci=False) is None
    assert cat.find(CAT_PUBLIC,
                    pubid="-//W3C//ENTITIES Latin1//EN//HTML",
                    name="x").endswith("HTMLlat1.ent")


def test_soc_catalog_semantics():
    from packages_sgml_spark.core.catalog import (
        CAT_DOCTYPE, CAT_ENTITY, CAT_PENTITY, CAT_SYSTEM, SGMLCatalog)
    text = """
-- a comment: PUBLIC "x" ignored --
OVERRIDE NO
DOCTYPE note  notes/note.dtd
SYSTEM "http://ex.org/a.dtd" local/a.dtd
ENTITY chapter chap.ent
PUBLIC "-//Ex//Spaced   Id//EN" spaced.ent
BASE /abs/dir
DOCTYPE other other.dtd
"""
    cat = SGMLCatalog().load_text(text, base="/cats")
    assert cat.find(CAT_DOCTYPE, name="NOTE") == "/cats/notes/note.dtd"
    # BASE redirect applies to later entries
    assert cat.find(CAT_DOCTYPE, name="other") == "/abs/dir/other.dtd"
    # sysid match returns immediately; unmatched sysid passes through
    assert cat.find(CAT_SYSTEM, sysid="http://ex.org/a.dtd",
                    name="x") == "/cats/local/a.dtd"
    assert cat.find(CAT_ENTITY, name="x",
                    sysid="http://ex.org/b.dtd") == "http://ex.org/b.dtd"
    # pubid squish: runs of blanks collapse
    from packages_sgml_spark.core.catalog import CAT_PUBLIC
    assert cat.find(CAT_PUBLIC, name="x",
                    pubid="-//Ex//Spaced Id//EN") == "/cats/spaced.ent"
    # name-based defaults when unmapped
    assert cat.find(CAT_ENTITY, name="chapter") == "/cats/chap.ent"
    assert cat.find(CAT_ENTITY, name="nope") == "nope.ent"
    assert cat.find(CAT_PENTITY, name="nope") == "nope.pen"
    assert cat.find(CAT_ENTITY, name="%nope") == "nope.pen"
    # DOCTYPE unmapped -> None (caller falls back to name.dtd rule)
    assert cat.find(CAT_DOCTYPE, name="nope") is None


def test_soc_catalog_parser_integration(tmp_path):
    """ParserOptions(catalog=SGMLCatalog): DOCTYPE-less document
    autoloads its DTD through a real .soc file."""
    from packages_sgml_spark.core.catalog import SGMLCatalog
    from packages_sgml_spark.core.parser import ParserOptions, SGMLParser

    (tmp_path / "doc.dtd").write_text(
        "<!ELEMENT doc - - (item+)> <!ELEMENT item - O (#PCDATA)>")
    (tmp_path / "cat.soc").write_text(
        "-- test catalog --\nDOCTYPE doc doc.dtd\n")
    cat = SGMLCatalog().load_file(str(tmp_path / "cat.soc"))
    p = SGMLParser(ParserOptions(dialect="sgml", catalog=cat))
    dom, errors = p.parse(b"<doc><item>a<item>b</doc>")
    assert dom[0].name == "doc" and len(dom[0].content) == 2


def test_urlns_canonicalization_hook():
    """on_urlns hook (sgml2pl.c:938-982 put_url analog): namespace
    urls map through the hook before entering DOM names, with MRU
    caching; failures pass the url through."""
    from packages_sgml_spark.core.parser import ParserOptions, SGMLParser

    calls = []

    def urlns(url):
        calls.append(url)
        if url == "http://long.example.org/ns/v1":
            return "ex1"
        raise KeyError(url)   # hook failure -> passthrough

    doc = (b'<a xmlns="http://long.example.org/ns/v1" '
           b'xmlns:o="http://other.org/ns">'
           b'<b/><o:c/><b/></a>')
    p = SGMLParser(ParserOptions(dialect="xmlns", on_urlns=urlns))
    dom, errors = p.parse(doc)
    assert not errors
    a = dom[0]
    assert a.name == "ex1:a"
    kids = [n.name for n in a.content]
    assert kids == ["ex1:b", "http://other.org/ns:c", "ex1:b"]
    # MRU cache: each distinct url resolved once despite repeats
    assert calls == ["http://long.example.org/ns/v1",
                     "http://other.org/ns"]

    # without the hook, raw urls (unchanged default behavior)
    p2 = SGMLParser(ParserOptions(dialect="xmlns"))
    dom2, _ = p2.parse(doc)
    assert dom2[0].name == "http://long.example.org/ns/v1:a"


def test_review_fixes_round2():
    """Regression pack for the round-2 code-review findings."""
    import pytest as _pytest
    from packages_sgml_spark.core.parser import ParserOptions, SGMLParser
    from packages_sgml_spark.core.sax import CallbackParser
    from packages_sgml_spark.core.serialize import sgml_write, xml_write
    from packages_sgml_spark.core.dom import Element

    # 1. parse_content inside entity expansion WORKS since round 3
    #    (input-stack frames): the sub-parse returns the element's
    #    content from within the replacement text
    doc = (b'<!DOCTYPE a [<!ELEMENT a - - ANY>'
           b'<!ELEMENT b - - (#PCDATA)>'
           b'<!ENTITY frag "<b>inside</b>">]>'
           b'<a>x&frag;y</a>')
    hits = []

    def on_begin(name, attrs, p):
        if name == "b":
            hits.append(p.parse_content())

    CallbackParser(ParserOptions(dialect="sgml"),
                   on_begin=on_begin).parse(doc)
    assert hits == [["inside"]]

    # 2. iso_latin_1 (underscore form) caps the writable range;
    #    unknown encodings raise instead of emitting a lying header
    from packages_sgml_spark.core.parser import parse_document
    dom, _ = parse_document("<p>café €</p>".encode("utf-8"),
                            dialect="xml")
    s = xml_write(dom, header=False, layout=False,
                  encoding="iso_latin_1")
    assert s == "<p>café &#x20AC;</p>"
    with _pytest.raises(ValueError):
        xml_write(dom, encoding="klingon")
    assert xml_write(dom, encoding="utf-16").startswith(
        '<?xml version="1.0" encoding="UTF-16"?>')

    # 3. feed() honors the utf-16 stream encoding incl. 1-byte chunks
    xml = '<doc a="ü">Dürst</doc>'
    data = xml.encode("utf-16-le")
    want, _ = SGMLParser(ParserOptions(dialect="xml",
                                       encoding="utf-8")).parse(
        xml.encode("utf-8"))
    for cuts in ((1,), (3, 7), (2, 4, 11)):
        p = SGMLParser(ParserOptions(dialect="xml",
                                     encoding="utf-16le"))
        prev = 0
        for c in cuts:
            p.feed(data[prev:c])
            prev = c
        p.feed(data[prev:])
        dom2, errs = p.close()
        assert not errs and repr(dom2) == repr(want), cuts

    # 4. sgml_write with indent>0 indents the root, not the DOCTYPE
    el = Element("book", [], [Element("t", [], ["x"])])
    out = sgml_write(el, doctype="book", system="book.dtd", indent=4)
    assert out.startswith('<!DOCTYPE book SYSTEM "book.dtd">\n\n')
    assert "\n    <book>" in "\n" + out.split("\n\n", 1)[1][:60] or \
        out.split("\n\n", 1)[1].startswith("    <book>")


def test_xpath_analog():
    """xpath/3 analog (xpath.pl:269-560): axes, star, same-name
    sibling indexing, last/last-N, attribute projection and
    conditions, contains, text/normalize_space/number functions."""
    from packages_sgml_spark.core.parser import parse_document
    from packages_sgml_spark.core.xpath import xpath, xpath_chk

    html = (b'<html><body>'
            b'<table align="CENTER"><tr><td>a</td><td>b</td></tr>'
            b'<tr><td>c</td><td href="x">d</td></tr></table>'
            b'<p>one</p><p> two  words </p><p>3.5</p>'
            b'<a href="http://ex.org/1">L1</a>'
            b'<a href="http://ex.org/2">L2</a>'
            b'</body></html>')
    dom, _ = parse_document(html, dialect="xml")

    # descendant axis + text()
    assert [t for t in xpath(dom, "//td/text()")] == \
        ["a", "b", "c", "d"]
    # same-name sibling index (nth), last, last-N
    assert xpath_chk(dom, "//tr(2)/td(1)/text()") == "c"
    assert [t for t in xpath(dom, "//td(last)/text()")] == ["b", "d"]
    assert xpath_chk(dom, "//p(last-1)/text()") == " two  words "
    # attribute projection (modifier and trailing function forms)
    assert [v for v in xpath(dom, "//a(@href)")] == \
        ["http://ex.org/1", "http://ex.org/2"]
    assert xpath_chk(dom, "//td(2)/@href") == "x"
    # conditions: equality and contains
    assert xpath_chk(dom, '//table(@align=CENTER)') is not None
    assert xpath_chk(dom, '//table(@align=left)') is None
    assert xpath_chk(dom, '//a(contains(@href,"2"))/text()') == "L2"
    assert xpath_chk(dom, '//p(contains(text,words))/text()') == \
        " two  words "
    # functions
    assert xpath_chk(dom, "//p(2)/normalize_space()") == "two words"
    assert xpath_chk(dom, "//p(3)/number()") == 3.5
    # star and chained child steps from the root
    assert xpath_chk(dom, "/html/body/table/tr/td/text()") == "a"
    assert len(list(xpath(dom, "//tr/*"))) == 4
    # content / self functions
    el = xpath_chk(dom, "//p(1)")
    assert el.name == "p"
    assert xpath_chk(dom, "//p(1)/content") == ["one"]


def test_load_api(tmp_path):
    """load_html/load_xml/load_sgml loader API (sgml.pl:605-640):
    path, file object, bytes, and str sources."""
    from packages_sgml_spark.core.parser import (
        load_html, load_sgml, load_xml)
    from packages_sgml_spark.core.xpath import xpath_chk

    f = tmp_path / "page.html"
    f.write_text("<html><body><p>Hi <b>there")
    dom = load_html(str(f))
    assert xpath_chk(dom, "//b/text()") == "there"
    with open(str(f), "rb") as fh:
        dom2 = load_html(fh)
    assert repr(dom2) == repr(dom)
    dom3 = load_xml(b"<a><b>x</b></a>")
    assert dom3[0].name == "a"
    dom4 = load_sgml(b"<!DOCTYPE t [<!ELEMENT t O O (#PCDATA)>]>hey")
    assert dom4[0].content == ["hey"]


def test_xpath_review_fixes():
    """Round-2 review regressions for the xpath analog."""
    import pathlib
    import pytest as _pytest
    from packages_sgml_spark.core.parser import (
        load_html, load_sgml, parse_document)
    from packages_sgml_spark.core.xpath import xpath, xpath_chk

    # deep-soup safety: // axis must be iterative
    deep = b"<r>" + b"<d>" * 3000 + b"x" + b"</d>" * 3000 + b"</r>"
    dom, _ = parse_document(deep, dialect="xml")
    assert len(list(xpath(dom, "//d"))) == 3000
    assert xpath_chk(dom, "//d/text()") == "x"

    # star indexing counts ALL element siblings (reference unbound-
    # name semantics), not per-name
    dom2, _ = parse_document(b"<r><h1>one</h1><p>two</p></r>",
                             dialect="xml")
    assert xpath_chk(dom2, "//r/*(2)/text()") == "two"
    assert [text for text in xpath(dom2, "//r/*(last)/text()")] == \
        ["two"]

    # chained // is descendant-or-self
    dom3, _ = parse_document(b"<a><b>x</b></a>", dialect="xml")
    assert xpath_chk(dom3, "//b//b/text()") == "x"
    assert xpath_chk(dom3, "//a//b/text()") == "x"

    # text() includes SDATA nodes (delegates to extract_text)
    sd = (b'<!DOCTYPE t [<!ELEMENT t - - (#PCDATA)>'
          b'<!ENTITY e SDATA "[euro]">]><t>cost &e; ok</t>')
    dom4, _ = parse_document(sd, dialect="sgml")
    assert xpath_chk(dom4, "//t/text()") == "cost [euro] ok"

    # loaders: PathLike accepted; missing path raises; markup-free
    # string is always a path (never silently parsed as data)
    p = pathlib.Path("/tmp/xp_load_test.html")
    p.write_text("<p>ok</p>")
    assert xpath_chk(load_html(p), "//p/text()") == "ok"
    with _pytest.raises(OSError):
        load_sgml("no-such-file-here")
