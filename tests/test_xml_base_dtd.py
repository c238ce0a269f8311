"""The r8 shared ACCRETIVE base DTD for DTD-less XML: undefined
elements (reference parser.c:687-705 auto-declare) and their silent
allow_for/implicit-attr growth persist across parses; everything else
journals through DtdCow.  The invariant under test is the r5-judge
class: parse output must NOT depend on process history — a document
parsed on a stone-cold private DTD and on an arbitrarily warm shared
base must produce identical rows and errors."""

import pytest

from packages_sgml_spark.core import dtd as D
from packages_sgml_spark.core.parser import (NodeTableParser,
                                             ParserOptions,
                                             SGMLParser,
                                             _XML_BASE_DTDS,
                                             _get_xml_base_dtd,
                                             _xml_base_eligible)

DOCS = [
    b"<?xml version='1.0'?><doc><title>T</title>"
    b"<p a='1'>x &amp; y</p><p>z</p></doc>",
    b"<doc><other at='v'>text</other><doc2/></doc>",
    b"<?xml version='1.0' encoding='ISO-8859-1'?><doc>\xe9</doc>",
    b"<!DOCTYPE doc [<!ENTITY e 'E'>]><doc>&e;</doc>",
    b"<!DOCTYPE doc [<!ELEMENT doc (p)*><!ELEMENT p (#PCDATA)>]>"
    b"<doc><p>declared</p><p>model</p></doc>",
    b"<doc><p>missing close</doc>",
    b"<doc>&undefined;</doc>",
    b"<doc xml:space='preserve'>  kept  <i> ws </i></doc>",
    b"<doc><![CDATA[<raw> & stuff]]></doc>",
    b"<a><b><c><a><b><c>deep repeats</c></b></a></c></b></a>",
    b"<doc><p href='u1'>l</p><p href='u2'>l</p></doc>",
    b"<doc\x00bad>",
    b"not markup at all",
    b"<doc><empty/><empty></empty><empty/></doc>",
]

XMLNS_DOCS = [
    b"<r xmlns='urn:a'><c at='v'>t</c></r>",
    b"<r xmlns:p='urn:b'><p:c>t</p:c><c/></r>",
    b"<r><c>no bindings at all</c></r>",
]


def _parse(doc, dialect, dtd=None):
    opts = ParserOptions(dialect=dialect, encoding="utf-8",
                         max_errors=50)
    p = NodeTableParser(opts) if dtd is None \
        else NodeTableParser(opts, dtd=dtd)
    if dtd is not None:
        p.set_dialect(dialect)
    try:
        p.parse(doc)
        return p.finish_rows(), [(e.line, e.message)
                                 for e in p.errors]
    except Exception as ex:  # noqa: BLE001 — compare failures too
        return "EXC", type(ex).__name__


def _cold(doc, dialect):
    return _parse(doc, dialect, dtd=D.DTD())


@pytest.mark.parametrize("dialect,docs", [("xml", DOCS),
                                          ("xmlns", XMLNS_DOCS)])
def test_warm_equals_cold(dialect, docs):
    cold = [_cold(d, dialect) for d in docs]
    # three warm passes in different orders: output must never
    # depend on what the base saw before
    for order in (docs, list(reversed(docs)), docs):
        warm = {id(d): _parse(d, dialect) for d in order}
        for d, c in zip(docs, cold):
            assert warm[id(d)] == c, (dialect, d)


def test_same_doc_twice_deterministic():
    doc = DOCS[0]
    assert _parse(doc, "xml") == _parse(doc, "xml")


def test_subset_declarations_roll_back():
    _parse(b"<!DOCTYPE doc [<!ENTITY e 'E'>"
           b"<!ELEMENT doc (p)*><!ELEMENT p (#PCDATA)>]>"
           b"<doc><p>&e;</p></doc>", "xml")
    base = _XML_BASE_DTDS["xml"]
    assert sorted(base.entities) == ["amp", "apos", "gt", "lt",
                                     "quot"]
    e = base.elements.get("doc")
    # back to never-declared (a later doc re-flips silently)
    assert e is None or e.structure is None or e.undefined


def test_accreted_state_persists():
    _parse(b"<warmroot><warmchild a='v'>t</warmchild></warmroot>",
           "xml")
    base = _XML_BASE_DTDS["xml"]
    e = base.elements["warmroot"]
    assert e.undefined and e.structure is not None
    child = base.elements["warmchild"]
    assert any(a.name == "a" and a.implicit
               for a in child.attributes)


def test_element_cap_replaces_base():
    base = _get_xml_base_dtd("xml")
    for i in range(5000):
        base.find_element("el%d" % i)
    fresh = _get_xml_base_dtd("xml")
    assert fresh is not base
    assert len(fresh.elements) == 0


def test_options_that_write_dtd_fields_get_private_dtds():
    ineligible = [
        ParserOptions(dialect="xml", encoding="iso-8859-1"),
        ParserOptions(dialect="xml", space="preserve"),
        ParserOptions(dialect="xml", number="integer"),
        ParserOptions(dialect="xml", shorttag=True),
        ParserOptions(dialect="xmlns", keep_prefix=True),
        ParserOptions(dialect="xml", system_entities=True),
    ]
    for opts in ineligible:
        assert not _xml_base_eligible(opts), vars(opts)
        assert not SGMLParser(opts).dtd.accretive
    ok = ParserOptions(dialect="xml", encoding="utf-8")
    assert _xml_base_eligible(ok)
    assert SGMLParser(ok).dtd.accretive


def test_mid_feed_contention_gets_pristine_private_copy():
    """A parser that begins while another is mid-feed() on the base
    must get a pristine private DTD — not the feeder's journaled
    subset state, and not a rolled-back feeder."""
    a = SGMLParser(ParserOptions(dialect="xml", encoding="utf-8",
                                 max_errors=50))
    a.feed(b"<!DOCTYPE doc [<!ENTITY e 'E'>]><doc>&e;")
    assert a.dtd.accretive and a.dtd._cow is not None
    b = SGMLParser(ParserOptions(dialect="xml", encoding="utf-8",
                                 max_errors=50))
    b.feed(b"<doc>started")
    assert b.dtd is not a.dtd
    assert not b.dtd.shared and not b.dtd.accretive
    assert "e" not in b.dtd.entities          # feeder state not seen
    assert sorted(b.dtd.entities) == ["amp", "apos", "gt", "lt",
                                      "quot"]
    # the feeder survives: its journal was not stolen
    dom_a, errs_a = a.close()
    assert a.errors == errs_a and a.dtd._cow is None


def test_dialect_switch_flushes_compiled_registries():
    """html5 and xhtml5 share one cached DTD object (get_html_dtd),
    dialect-switched at parser init.  A shape/tag entry registered
    under html5 must never replay in an xhtml5 parse: the xml-only
    'Unquoted attribute in XML is not allowed' warning would be
    dropped (r8 regression, found by the tape multi-dialect sweep)."""
    doc = b'<p><a href=unquoted>l</a></p>'

    def errs(dialect):
        p = SGMLParser(ParserOptions(dialect=dialect,
                                     encoding="utf-8", max_errors=-1))
        p.quiet = False
        _dom, errors = p.parse(doc)
        return [e.message for e in errors]

    # warm the html5 side hard enough to register shape/tag entries
    for _ in range(8):
        assert not [m for m in errs("html5") if "Unquoted" in m]
    for _ in range(3):
        assert any("Unquoted attribute in XML" in m
                   for m in errs("xhtml5")), "xml-only gripe dropped"
        assert not [m for m in errs("html5") if "Unquoted" in m]


def test_construction_during_foreign_feed_does_not_latch_encoding():
    """A parser constructed while ANOTHER parser's journaled encoding
    switch is live on the shared base must not latch that encoding:
    by the time it parses, the owner has rolled back (review r8 —
    UTF-8 documents decoded as Latin-1 depending on process
    timing)."""
    a = SGMLParser(ParserOptions(dialect="xml", max_errors=50))
    a.feed("<?xml version='1.0' encoding='ISO-8859-1'?>"
           "<doc>\xe9".encode("iso-8859-1"))
    assert a.dtd.encoding == "iso-8859-1"
    c = SGMLParser(ParserOptions(dialect="xml", max_errors=50))
    assert c.dtd is a.dtd
    a.close()
    assert a.dtd.encoding == "utf-8"        # journal rolled back
    dom, errs = c.parse("<doc>é</doc>".encode("utf-8"))
    from packages_sgml_spark.core.dom import extract_text
    assert extract_text(dom) == "é", errs


def test_declaration_resets_foreign_accreted_attrs():
    """r8 review finding: an implicit attr accreted by a PREVIOUS
    document must not suppress this document's cold no-attribute
    gripe once the element is declared, and a declared attr must not
    lose find_attribute's first-wins race to a foreign accreted
    one."""
    def errs(doc, dtd=None):
        opts = ParserOptions(dialect="xml", encoding="utf-8",
                             max_errors=50)
        p = SGMLParser(opts) if dtd is None else SGMLParser(opts,
                                                            dtd=dtd)
        if dtd is not None:
            p.set_dialect("xml")
        _dom, errors = p.parse(doc)
        return [e.message for e in errors]

    warmer = b"<doc><p a='1'>x</p></doc>"
    probe = (b"<!DOCTYPE doc [<!ELEMENT p (#PCDATA)>]>"
             b"<doc><p a='1'>y</p></doc>")
    attl = (b"<!DOCTYPE doc [<!ATTLIST p a CDATA 'dflt'>]>"
            b"<doc><p a='1'>y</p><p>z</p></doc>")
    cold_probe = errs(probe, dtd=D.DTD())
    cold_attl = errs(attl, dtd=D.DTD())
    errs(warmer)                        # accrete implicit 'a' on p
    assert errs(probe) == cold_probe
    assert errs(attl) == cold_attl
    # and the node-table shape agrees too (defaults injected etc.)
    assert _parse(attl, "xml") == _cold(attl, "xml")
    # base restored: the accreted attr survives for future documents
    pel = _XML_BASE_DTDS["xml"].elements["p"]
    assert pel.undefined and [a.name for a in pel.attributes] == ["a"]
