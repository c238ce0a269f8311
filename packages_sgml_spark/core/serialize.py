"""DOM serialization: xml_write / html_write analog
(/root/reference/sgml_write.pl:176-227) with XML quoting semantics
from the reference's quote machinery (quote.c:216-390):

- attribute values: < > & " -> entities (xml_quote_attribute,
  quote.c:331-355)
- character data:   < > &   -> entities (xml_quote_cdata,
  quote.c:358-383)
- chars above the target encoding's range -> &#NN; numeric refs

The writer is deterministic (attribute order preserved as parsed;
canonical mode sorts attributes, c14n2.pl:73-203 analog) so
parse -> write -> parse -> write is a fixed point
(test_sgml_write.pl:73-140 semantics).
"""

from .dom import Element, SData, NData, PI, Entity

_ATTR_QUOTE = {"<": "&lt;", ">": "&gt;", "&": "&amp;", '"': "&quot;"}
_CDATA_QUOTE = {"<": "&lt;", ">": "&gt;", "&": "&amp;"}

# HTML5 void elements close with no end tag
_VOID = frozenset("area base br col embed hr img input link meta source "
                  "track wbr param".split())


def quote_attribute(s, max_char=0x10FFFF):
    out = []
    for c in s:
        r = _ATTR_QUOTE.get(c)
        if r is not None:
            out.append(r)
        elif ord(c) > max_char:
            out.append("&#%d;" % ord(c))
        else:
            out.append(c)
    return "".join(out)


def quote_cdata(s, max_char=0x10FFFF):
    out = []
    for c in s:
        r = _CDATA_QUOTE.get(c)
        if r is not None:
            out.append(r)
        elif ord(c) > max_char:
            out.append("&#%d;" % ord(c))
        else:
            out.append(c)
    return "".join(out)


def _attr_value_str(v):
    if isinstance(v, list):
        return " ".join(str(x) for x in v)
    return str(v)


def write_dom(content, dialect="xml", max_char=0x10FFFF,
              canonical=False):
    """Serialize a DOM content list to a string."""
    out = []

    def walk(n):
        if isinstance(n, Element):
            attrs = n.attrs
            if canonical:
                attrs = sorted(attrs, key=lambda kv: kv[0])
            out.append("<")
            out.append(n.name)
            for k, v in attrs:
                out.append(' %s="%s"'
                           % (k, quote_attribute(_attr_value_str(v),
                                                 max_char)))
            if not n.content:
                if dialect in ("xml", "xmlns", "xhtml", "xhtml5"):
                    out.append("/>")
                    return
                if dialect in ("html", "html5") and n.name in _VOID:
                    out.append(">")
                    return
            out.append(">")
            for c in n.content:
                walk(c)
            out.append("</%s>" % n.name)
        elif isinstance(n, str):
            out.append(quote_cdata(n, max_char))
        elif isinstance(n, (SData, NData)):
            out.append(quote_cdata(n.text, max_char))
        elif isinstance(n, PI):
            out.append("<?%s?>" % n.text)
        elif isinstance(n, Entity):
            out.append("&%s;" % n.name)

    for n in content:
        walk(n)
    return "".join(out)
