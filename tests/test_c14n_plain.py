"""Plain (non-exclusive) canonical XML — the reference's second
canonicalization method (c14n2.pl:64-71: the method option defaults
to 'http://www.w3.org/TR/2001/REC-xml-c14n-20010315').

The reference's own suite (test_c14n.pl:94-96) asserts only the
exclusive method, so there is no byte-oracle corpus for plain mode;
these tests pin the method differences hand-traced from c14n2.pl:

  - include_ns/5 third clause (c14n2.pl:140): plain mode admits EVERY
    xmlns declaration into the in-scope map, where exclusive keeps
    only the element's own prefix binding (clause 1) — visible
    whenever the prefix map feeds a name resolution.
  - root handling (c14n2.pl:100-110): with no default namespace,
    plain mode re-emits the root's ORIGINAL prefixed declarations
    (superfluous ones included), sorted and deduplicated by
    attribute name; exclusive emits only bindings actually minted.
  - the default namespace, when minted, comes first and the
    remaining root declarations sort by URL (c14n2.pl:102-105) —
    shared by both methods.

W3C C14N 1.1 subset semantics (namespace-axis inheritance, xml:base
fixup — testdata/*.output without -exc) are NOT implemented by
c14n2.pl, whose take_ns only reads element-local declaration attrs;
we mirror that (reference parity, not W3C 1.1 parity).
"""

import os

import pytest

from packages_sgml_spark.core.c14n import C14N, EXC_C14N, \
    xml_write_canonical
from packages_sgml_spark.core.parser import ParserOptions, SGMLParser

TD = "/root/reference/testdata"


def parse(data):
    if isinstance(data, str):
        data = data.encode()
    p = SGMLParser(ParserOptions(dialect="xmlns", encoding="utf-8",
                                 space="preserve", keep_prefix=True,
                                 quiet=True))
    dom, _errors = p.parse(data)
    return dom


def canon(doc, method):
    return "".join(xml_write_canonical(e, method=method)
                   for e in parse(doc))


# (doc, plain_expected, exc_expected) — expectations traced through
# c14n2.pl clause by clause (see module docstring); identical pairs
# pin that the method switch has no effect on that shape.
CASES = [
    # superfluous root declaration: plain re-emits both originals
    # (c14n2.pl:108-109 findall over Attrs), exc drops both and x
    # re-mints its own binding (include_ns clause 1)
    ('<r xmlns:a="u1" xmlns:b="u2"><a:x/></r>',
     '<r xmlns:a="u1" xmlns:b="u2"><a:x xmlns:a="u1"></a:x></r>',
     '<r><a:x xmlns:a="u1"></a:x></r>'),
    # mid-tree superfluous declarations never re-emit in EITHER
    # method (out_ns gains bindings only via put_ns name use;
    # is_root is false below the root)
    ('<r><x xmlns:a="u1" xmlns:b="u2"><b:y/></x></r>',
     '<r><x><b:y xmlns:b="u2"></b:y></x></r>',
     '<r><x><b:y xmlns:b="u2"></b:y></x></r>'),
    # default namespace minted at root (put_elemns -> put_ns ns('',
    # ud)) — select(xmlns=Default) succeeds, default first; same in
    # both methods
    ('<r xmlns="ud"><p:x xmlns:p="up"/></r>',
     '<r xmlns="ud"><p:x xmlns:p="up"></p:x></r>',
     '<r xmlns="ud"><p:x xmlns:p="up"></p:x></r>'),
    # prefixed root name: the root's own binding is minted via
    # put_ns and THREADED to children through out_ns (no re-mint on
    # a:x, unlike case 1 where the unprefixed root minted nothing);
    # plain appends the original decls too (a=u1 twice, deduped by
    # sort(1,@<)); xmlns="ud" does not unify with xmlns:NS=URI and
    # is dropped by BOTH methods at a prefixed root
    ('<a:r xmlns="ud" xmlns:b="zz" xmlns:a="u1"><a:x/></a:r>',
     '<a:r xmlns:a="u1" xmlns:b="zz"><a:x></a:x></a:r>',
     '<a:r xmlns:a="u1"><a:x></a:x></a:r>'),
    # xml: prefix is predeclared (put_ns ns('', xml) clause,
    # c14n2.pl:157-158): never declared, never counted as a binding
    ('<r xmlns:a="u1"><a:x xml:lang="en"/></r>',
     '<r xmlns:a="u1"><a:x xmlns:a="u1" xml:lang="en"></a:x></r>',
     '<r><a:x xmlns:a="u1" xml:lang="en"></a:x></r>'),
    # ns-free document: methods identical (the registered `c14n`
    # query corpus shape)
    ('<r at="2" b="1"><x>t &amp; u</x></r>',
     '<r at="2" b="1"><x>t &amp; u</x></r>',
     '<r at="2" b="1"><x>t &amp; u</x></r>'),
]


@pytest.mark.parametrize("doc,plain,exc", CASES)
def test_plain_vs_exc(doc, plain, exc):
    assert canon(doc, C14N) == plain
    assert canon(doc, EXC_C14N) == exc


def test_default_method_is_plain():
    """xml_write_canonical/3's method option defaults to the plain
    2001 method (c14n2.pl:66)."""
    doc = '<r xmlns:a="u1" xmlns:b="u2"><a:x/></r>'
    dom = parse(doc)
    assert ("".join(xml_write_canonical(e) for e in dom)
            == canon(doc, C14N))


TESTDATA_INPUTS = [
    "xmllang-input.xml", "xmlspace-input.xml", "xmlid-input.xml",
    "xmlbase-prop-input.xml",
]


@pytest.mark.skipif(not os.path.isdir(TD), reason="testdata absent")
@pytest.mark.parametrize("input_file", TESTDATA_INPUTS)
@pytest.mark.parametrize("method", [C14N, EXC_C14N])
def test_fixed_point(input_file, method):
    """Canonical output re-parsed and re-canonicalized is byte-stable
    (canonicalization is a projection) on the reference corpus."""
    with open(os.path.join(TD, input_file), "rb") as f:
        first = "".join(xml_write_canonical(e, method=method)
                        for e in parse(f.read()))
    again = canon(first, method)
    assert again == first
