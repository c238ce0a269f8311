"""Serializer fixed-point (test_sgml_write.pl analog) + XSD units
(test_xsd.pl:42-90 cases)."""

import math
import os

import pytest

from packages_sgml_spark.core.parser import parse_document
from packages_sgml_spark.core.serialize import (
    write_dom, quote_attribute, quote_cdata)
from packages_sgml_spark.core.xsd import (
    xsd_number, xsd_number_canonical, xsd_time)


def roundtrip(xml_bytes, dialect="xml"):
    dom1, _ = parse_document(xml_bytes, dialect=dialect)
    s1 = write_dom(dom1, dialect=dialect)
    dom2, _ = parse_document(s1.encode("utf-8"), dialect=dialect,
                             encoding="utf-8")
    s2 = write_dom(dom2, dialect=dialect)
    return s1, s2


def test_fixed_point_simple():
    s1, s2 = roundtrip(b'<a x="1"><b>t &amp; u</b><c/></a>')
    assert s1 == s2
    assert s1 == '<a x="1"><b>t &amp; u</b><c/></a>'


def test_fixed_point_quoting():
    s1, s2 = roundtrip(b'<a x="a&lt;&gt;&quot;b">x&lt;y</a>')
    assert s1 == s2


def test_fixed_point_unicode():
    s1, s2 = roundtrip('<a>é‘t’</a>'.encode("utf-8"))
    assert s1 == s2
    assert 'é' in s1


@pytest.mark.parametrize("base", ["simple", "utf8", "layout", "pi",
                                  "comment", "att", "utf8-cent"])
def test_fixed_point_corpus(base):
    path = "/root/reference/Test/%s.xml" % base
    if not os.path.isfile(path):
        pytest.skip("corpus absent")
    with open(path, "rb") as f:
        data = f.read()
    dom1, _ = parse_document(data, dialect="xml", encoding="utf-8")
    s1 = write_dom(dom1, dialect="xml")
    dom2, _ = parse_document(s1.encode("utf-8"), dialect="xml",
                             encoding="utf-8")
    s2 = write_dom(dom2, dialect="xml")
    assert s1 == s2


def test_quote_rules():
    # quote.c:345-383 mappings
    assert quote_attribute('a<b>"c&') == 'a&lt;b&gt;&quot;c&amp;'
    assert quote_cdata('a<b>"c&') == 'a&lt;b&gt;"c&amp;'
    assert quote_cdata('é', max_char=255) == 'é'
    # hex char ref (write_entity, sgml_write.pl:853-857)
    assert quote_cdata('€', max_char=255) == '&#x20AC;'


def test_xsd_numbers():
    # test_xsd.pl:64-85 cases
    assert xsd_number("0.0E0") == 0.0
    assert math.copysign(1, xsd_number("-0.0E0")) == -1.0
    assert math.isnan(xsd_number("NaN"))
    assert xsd_number("INF") == float("inf")
    assert xsd_number("-INF") == float("-inf")
    assert xsd_number("1.1e2") == 110.0
    assert xsd_number(".5") == 0.5
    assert xsd_number("5.") == 5.0
    assert xsd_number("42") == 42 and isinstance(xsd_number("42"), int)
    assert xsd_number("99999999999999999999") == 10**20 - 1
    assert xsd_number("1x") is None
    assert xsd_number("") is None


def test_xsd_number_canonical():
    assert xsd_number_canonical(42) == "42"
    assert xsd_number_canonical(float("nan")) == "NaN"
    assert xsd_number_canonical(float("inf")) == "INF"
    assert xsd_number_canonical(110.0) == "1.1E2"
    assert xsd_number_canonical(0.5) == "5.0E-1"


def test_xsd_times():
    t = xsd_time("2002-09-23T14:30:15Z")
    assert t["kind"] == "dateTime" and t["tz_minutes"] == 0
    assert t["year"] == 2002 and t["second"] == 15
    assert xsd_time("2002-02-30") is None          # invalid day
    assert xsd_time("2004-02-29")["day"] == 29     # leap
    assert xsd_time("2100-02-29") is None          # not leap
    assert xsd_time("-0044-03-15")["year"] == -44  # BCE
    assert xsd_time("14:30:15.5")["fraction"] == 0.5
    assert xsd_time("--12-25")["kind"] == "gMonthDay"
    assert xsd_time("---31")["kind"] == "gDay"
    assert xsd_time("1999")["kind"] == "gYear"
    assert xsd_time("1999-05")["kind"] == "gYearMonth"
    assert xsd_time("2002-09-23T25:00:00") is None
    assert xsd_time("2002-09-23T14:30:15+14:00")["tz_minutes"] == 840


def test_xml_write_options():
    """sgml_write.pl:60-230 option surface: header, doctype/public/
    system, layout off, indent, net."""
    from packages_sgml_spark.core.serialize import xml_write
    dom, _ = parse_document(b"<a><b>t</b><c/></a>", dialect="xml")
    # header + layout default
    s = xml_write(dom)
    assert s.startswith('<?xml version="1.0" encoding="UTF-8"?>\n\n')
    assert "\n  <b>t</b>" in s and "\n  <c/>" in s   # element content
    assert s.rstrip().endswith("</a>")
    # header(false), layout(false): compact
    s2 = xml_write(dom, header=False, layout=False)
    assert s2 == "<a><b>t</b><c/></a>"
    # net(false): <c></c>
    s3 = xml_write(dom, header=False, layout=False, net=False)
    assert s3 == "<a><b>t</b><c></c></a>"
    # doctype emission variants (write_doctype :326-336)
    assert xml_write(dom, header=False, layout=False,
                     doctype="a").startswith("<!DOCTYPE a []>\n\n")
    assert xml_write(dom, header=False, layout=False,
                     public="-//X//EN").startswith(
        '<!DOCTYPE a PUBLIC "-//X//EN">\n\n')
    assert xml_write(dom, header=False, layout=False,
                     system="a.dtd").startswith(
        '<!DOCTYPE a SYSTEM "a.dtd">\n\n')
    assert xml_write(dom, header=False, layout=False, public="-//X//EN",
                     system="a.dtd").startswith(
        '<!DOCTYPE a PUBLIC "-//X//EN" "a.dtd">\n\n')
    # indent(N) initial indentation for embedding
    s4 = xml_write(dom, header=False, indent=4)
    assert s4.startswith("    <a>")


def test_xml_write_layout_rules():
    from packages_sgml_spark.core.serialize import xml_write
    # mixed content is never reflowed
    dom, _ = parse_document(b"<p>one <b>two</b> three</p>", dialect="xml")
    s = xml_write(dom, header=False)
    assert s == "<p>one <b>two</b> three</p>"
    # xml:space=preserve blocks layout even for element content
    dom2, _ = parse_document(
        b'<a xml:space="preserve"><b>t</b><c/></a>', dialect="xml")
    s2 = xml_write(dom2, header=False)
    assert "\n" not in s2
    # blank text between elements is layout, dropped on reflow
    dom3, _ = parse_document(b"<a>\n  <b>t</b>\n  <c/>\n</a>",
                             dialect="xml")
    s3 = xml_write(dom3, header=False)
    assert s3 == "<a>\n  <b>t</b>\n  <c/>\n</a>"
    # long attribute lists wrap one-per-line at +4 (att_length > 60)
    dom4, _ = parse_document(
        b'<a attr_one="aaaaaaaaaaaaaaaaaaaa" '
        b'attr_two="bbbbbbbbbbbbbbbbbbbb" '
        b'attr_three="cccccccccccccccccc">x</a>', dialect="xml")
    s4 = xml_write(dom4, header=False)
    assert '<a\n    attr_one="aaaaaaaaaaaaaaaaaaaa"\n' in s4


def test_xml_write_cleanns():
    from packages_sgml_spark.core.serialize import xml_write
    from packages_sgml_spark.core.dom import Element
    # duplicate xmlns re-declaration in scope is dropped by default
    inner = Element("b", [("xmlns:x", "http://ex.org/1")], ["t"])
    outer = Element("a", [("xmlns:x", "http://ex.org/1")], [inner])
    s = xml_write([outer], header=False, layout=False)
    assert s == '<a xmlns:x="http://ex.org/1"><b>t</b></a>'
    s2 = xml_write([outer], header=False, layout=False, cleanns=False)
    assert s2.count("xmlns:x") == 2
    # re-declaration to a DIFFERENT uri is kept
    inner2 = Element("b", [("xmlns:x", "http://ex.org/2")], ["t"])
    outer2 = Element("a", [("xmlns:x", "http://ex.org/1")], [inner2])
    s3 = xml_write([outer2], header=False, layout=False)
    assert s3.count("xmlns:x") == 2
    # nsmap: ns assumed bound from the environment
    s4 = xml_write([outer], header=False, layout=False,
                   nsmap=[("x", "http://ex.org/1")])
    assert "xmlns" not in s4


def test_sgml_write_net_and_empty():
    from packages_sgml_spark.core.serialize import html_write, sgml_write
    from packages_sgml_spark.core.dom import Element
    # SGML net(true): short /-free char content -> <b/xxx/
    b = Element("b", [], ["xxx"])
    assert sgml_write([b], layout=False, net=True) == "<b/xxx/"
    assert sgml_write([b], layout=False) == "<b>xxx</b>"
    # empty elements: declared EMPTY -> <foo>, net -> <foo//
    e = Element("foo", [], [])
    assert sgml_write([e], layout=False,
                      empty_elements={"foo"}) == "<foo>"
    assert sgml_write([e], layout=False) == "<foo></foo>"
    assert sgml_write([e], layout=False, net=True) == "<foo//"
    # html_write: void elements from the HTML set; script verbatim
    br = Element("br", [], [])
    assert html_write([br], layout=False) == "<br>"
    sc = Element("script", [], ["if (a<b) f();"])
    assert html_write([sc], layout=False) == \
        "<script>if (a<b) f();</script>"


def test_xml_write_fixed_point_corpus():
    """Parse -> xml_write(layout) -> parse: DOM equal modulo layout
    whitespace (the test_sgml_write.pl fp loop, layout-normalised)."""
    import os
    from packages_sgml_spark.core.serialize import xml_write

    def strip_layout(content):
        out = []
        for n in content:
            if isinstance(n, str):
                if n.strip(" \t\r\n"):
                    out.append(n)
            elif hasattr(n, "content"):
                n.content = strip_layout(n.content)
                out.append(n)
            else:
                out.append(n)
        return out

    n_files = 0
    for fn in sorted(os.listdir("/root/reference/Test")):
        if not fn.endswith(".xml"):
            continue
        data = open("/root/reference/Test/" + fn, "rb").read()
        dom1, err1 = parse_document(data, dialect="xml",
                                    encoding="utf-8", quiet=True)
        s = xml_write(dom1, header=False)
        dom2, err2 = parse_document(s.encode("utf-8"), dialect="xml",
                                    encoding="utf-8", quiet=True)
        assert repr(strip_layout(dom1)) == repr(strip_layout(dom2)), fn
        n_files += 1
    assert n_files >= 15


def test_writer_encoding_and_dtd_entities():
    """dtd(DTD)/encoding writer options (sgml_write.pl:110-118,
    :826-857): a latin-1/ascii target writes wide chars as DTD
    character-data entities when available, else hex char refs; the
    DTD also supplies the EMPTY element set for SGML output."""
    from packages_sgml_spark.core.parser import ParserOptions, SGMLParser
    from packages_sgml_spark.core.serialize import (
        dtd_character_entities, sgml_write, xml_write)
    from packages_sgml_spark.core.htmldtd import get_html_dtd

    dtd = get_html_dtd("html")
    emap = dtd_character_entities(dtd)
    assert emap.get(0xF6) == "ouml"        # ö from the HTML entity set
    assert emap.get(0x20AC) == "euro"

    doc = "<p>Köln € Ж</p>".encode("utf-8")
    p = SGMLParser(ParserOptions(dialect="xml", encoding="utf-8"))
    dom, _ = p.parse(doc)
    # utf-8 output: verbatim
    assert xml_write(dom, header=False, layout=False) == \
        "<p>Köln € Ж</p>"
    # latin-1 output without a DTD: hex char refs above 0xFF
    assert xml_write(dom, header=False, layout=False,
                     encoding="iso-8859-1") == \
        "<p>Köln &#x20AC; &#x416;</p>"
    # ascii output with the HTML DTD: named entities where the DTD
    # has them, hex refs otherwise (U+0416 has no HTML entity)
    assert xml_write(dom, header=False, layout=False,
                     encoding="us-ascii", dtd=dtd) == \
        "<p>K&ouml;ln &euro; &#x416;</p>"
    # header declares the actual encoding
    assert xml_write(dom, encoding="iso-8859-1").startswith(
        '<?xml version="1.0" encoding="ISO-8859-1"?>')
    # dtd(DTD) supplies the EMPTY element set for SGML writing
    from packages_sgml_spark.core.dom import Element
    br = Element("br", [], [])
    assert sgml_write([br], layout=False, dtd=dtd) == "<br>"
