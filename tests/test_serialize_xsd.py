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
    assert quote_cdata('€', max_char=255) == '&#8364;'


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
