"""XML name validation and IRI namespace splitting.

- xml_name: validate an XML name (quote.c:393-470 — NMSTART then
  NMCHAR over the XML character classes).
- iri_xml_namespace: split an IRI into namespace + local XML name by
  scanning backwards for the longest valid name suffix
  (quote.c:484-543).
"""

from .chars import is_name_char, is_nmstart_char


def xml_name(s: str) -> bool:
    """xml_name/2 analog: True iff s is a valid XML name."""
    if not s:
        return False
    if not is_nmstart_char(s[0]):
        return False
    return all(is_name_char(c) for c in s[1:])


def iri_xml_namespace(iri: str):
    """Split an IRI into (namespace, localname) where localname is
    the longest valid XML-name suffix; localname may be '' when the
    IRI ends in a non-name char (quote.c:484-543 scan-back rule)."""
    if not iri:
        return "", ""
    i = len(iri)
    # scan back over name chars
    while i > 0 and is_name_char(iri[i - 1]):
        i -= 1
    # extend start to a valid NMSTART (drop leading name-but-not-start
    # chars like digits)
    while i < len(iri) and not is_nmstart_char(iri[i]):
        i += 1
    return iri[:i], iri[i:]
