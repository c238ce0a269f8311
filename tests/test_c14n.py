"""Exclusive-C14N byte-exact tests against the reference's
testdata/*-exc.output corpus (/root/reference/test_c14n.pl:61-228).

Each case: parse input with dialect(xmlns) + space(preserve) +
keep_prefix(true), select subdocuments by element local name (the
harness' xpath //(_:Name) shorthand, with ';' alternatives and
(A, \\+B) subtree deletion), canonicalize with xml-exc-c14n#,
concatenate, compare bytes."""

import os

import pytest

from packages_sgml_spark.core.c14n import EXC_C14N, xml_write_canonical
from packages_sgml_spark.core.dom import Element, QName
from packages_sgml_spark.core.parser import ParserOptions, SGMLParser

TD = "/root/reference/testdata"

pytestmark = pytest.mark.skipif(not os.path.isdir(TD),
                                reason="c14n testdata absent")

# (input, spec, expected) — spec: str | ("or", a, b) | ("minus", a, spec)
CASES = [
    ("xmllang-input.xml", "e1", "xmllang-1-exc.output"),
    ("xmllang-input.xml", "e2", "xmllang-2-exc.output"),
    ("xmllang-input.xml", "e11", "xmllang-3-exc.output"),
    ("xmllang-input.xml", ("or", "e11", "e12"), "xmllang-4-exc.output"),
    ("xmlspace-input.xml", "e1", "xmlspace-1-exc.output"),
    ("xmlspace-input.xml", "e2", "xmlspace-2-exc.output"),
    ("xmlspace-input.xml", "e11", "xmlspace-3-exc.output"),
    ("xmlspace-input.xml", ("or", "e11", "e12"), "xmlspace-4-exc.output"),
    ("xmlid-input.xml", "e1", "xmlid-1-exc.output"),
    ("xmlid-input.xml", ("or", "e11", "e12"), "xmlid-2-exc.output"),
    ("xmlbase-prop-input.xml", ("minus", "c14n11XmlBaseDoc1", "e2"),
     "xmlbase-prop-1-exc.output"),
    ("xmlbase-prop-input.xml", "e1", "xmlbase-prop-2-exc.output"),
    ("xmlbase-prop-input.xml", "e11", "xmlbase-prop-3-exc.output"),
    ("xmlbase-prop-input.xml", "e111", "xmlbase-prop-4-exc.output"),
    ("xmlbase-prop-input.xml", "e21", "xmlbase-prop-5-exc.output"),
    ("xmlbase-prop-input.xml", "e3", "xmlbase-prop-6-exc.output"),
    ("xmlbase-prop-input.xml",
     ("minus", "c14n11XmlBaseDoc1", ("or", "e1", "e2")),
     "xmlbase-prop-7-exc.output"),
]


def _local(name):
    return name.local if isinstance(name, QName) else name


def find_named(dom, local):
    """//(_:local) in document order."""
    found = []

    def walk(n):
        if isinstance(n, Element):
            if _local(n.name) == local:
                found.append(n)
            for c in n.content:
                walk(c)

    for n in dom:
        walk(n)
    return found


def delete_named(el, spec):
    """(A, \\+B) deletion (test_c14n.pl delete_subdocument)."""
    if isinstance(spec, tuple) and spec[0] == "or":
        return delete_named(delete_named(el, spec[1]), spec[2])
    content = []
    for c in el.content:
        if isinstance(c, Element):
            if _local(c.name) == spec:
                continue
            content.append(delete_named(c, spec))
        else:
            content.append(c)
    return Element(el.name, el.attrs, content)


def subdocuments(dom, spec):
    if isinstance(spec, tuple):
        if spec[0] == "or":
            return subdocuments(dom, spec[1]) + subdocuments(dom, spec[2])
        if spec[0] == "minus":
            return [delete_named(e, spec[2])
                    for e in subdocuments(dom, spec[1])]
    return find_named(dom, spec)


def run_case(input_file, spec, expected_file):
    with open(os.path.join(TD, input_file), "rb") as f:
        data = f.read()
    p = SGMLParser(ParserOptions(dialect="xmlns", encoding="utf-8",
                                 space="preserve", keep_prefix=True,
                                 quiet=True))
    dom, _errors = p.parse(data)
    subs = subdocuments(dom, spec)
    generated = "".join(xml_write_canonical(s, method=EXC_C14N)
                        for s in subs)
    with open(os.path.join(TD, expected_file), encoding="utf-8",
              newline=None) as f:
        target = f.read()
    return generated, target


@pytest.mark.parametrize("input_file,spec,expected", CASES)
def test_c14n_exc(input_file, spec, expected):
    generated, target = run_case(input_file, spec, expected)
    assert generated == target
