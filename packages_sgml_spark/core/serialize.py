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

import re as _re

from .dom import Element, SData, NData, PI, Entity
from .model import C_EMPTY as _C_EMPTY

_ATTR_QUOTE = {"<": "&lt;", ">": "&gt;", "&": "&amp;", '"': "&quot;"}
_CDATA_QUOTE = {"<": "&lt;", ">": "&gt;", "&": "&amp;"}

# bulk paths: one C-speed scan decides whether any replacement is
# needed at all; str.translate does the per-char mapping natively.
# The char-loop only survives for capped encodings on non-ASCII
# strings (entity fallback per out-of-range char).
_RE_CDATA_SPECIAL = _re.compile(r'[<>&]')
_RE_ATTR_SPECIAL = _re.compile(r'[<>&"]')
_TT_CDATA = str.maketrans(_CDATA_QUOTE)
_TT_ATTR = str.maketrans(_ATTR_QUOTE)

# HTML5 void elements close with no end tag
_VOID = frozenset("area base br col embed hr img input link meta source "
                  "track wbr param".split())


def quote_attribute(s, max_char=0x10FFFF, entity_map=None):
    if max_char >= 0x10FFFF or s.isascii():
        if _RE_ATTR_SPECIAL.search(s) is None:
            return s
        return s.translate(_TT_ATTR)
    out = []
    for c in s:
        r = _ATTR_QUOTE.get(c)
        if r is not None:
            out.append(r)
        elif ord(c) > max_char:
            out.append(_write_entity(ord(c), entity_map))
        else:
            out.append(c)
    return "".join(out)


def quote_cdata(s, max_char=0x10FFFF, entity_map=None):
    if max_char >= 0x10FFFF or s.isascii():
        if _RE_CDATA_SPECIAL.search(s) is None:
            return s
        return s.translate(_TT_CDATA)
    out = []
    for c in s:
        r = _CDATA_QUOTE.get(c)
        if r is not None:
            out.append(r)
        elif ord(c) > max_char:
            out.append(_write_entity(ord(c), entity_map))
        else:
            out.append(c)
    return "".join(out)


def _write_entity(code, entity_map):
    """write_entity (sgml_write.pl:853-857): DTD character-data
    entity name when the DTD provides one, else a hex char ref."""
    if entity_map is not None:
        name = entity_map.get(code)
        if name is not None:
            return "&%s;" % name
    return "&#x%X;" % code


# output encodings whose writers pass wide chars through verbatim
# (unicode_encoding/1, sgml_write.pl:848-851); anything else caps the
# directly-writable range and falls back to entities
_ENCODING_MAX = {
    # keys are post-normalization ('_' -> '-', lowercased)
    "utf-8": 0x10FFFF, "utf8": 0x10FFFF, "wchar-t": 0x10FFFF,
    "utf-16": 0x10FFFF, "utf-16le": 0x10FFFF, "utf-16be": 0x10FFFF,
    "unicode-le": 0x10FFFF, "unicode-be": 0x10FFFF,
    "iso-8859-1": 0xFF, "iso-latin-1": 0xFF, "latin-1": 0xFF,
    "us-ascii": 0x7F, "ascii": 0x7F,
}


def dtd_character_entities(dtd):
    """dtd_character_entities/2 (sgml_write.pl:923-945): codepoint ->
    entity name for every DTD entity whose replacement is '&#N;' or a
    single character."""
    out = {}
    for name, ent in dtd.entities.items():
        v = ent.value
        if not isinstance(v, str):
            continue
        if v.startswith("&#") and v.endswith(";") and v[2:-1].isdigit():
            out.setdefault(int(v[2:-1]), name)
        elif len(v) == 1:
            out.setdefault(ord(v), name)
    return out


def _attr_value_str(v):
    if isinstance(v, list):
        return " ".join(str(x) for x in v)
    return str(v)


_BLANK = " \t\r\n"


class _Writer:
    """xml_write/sgml_write option surface (sgml_write.pl:60-230 and
    its emit machinery :339-660): layout/indent, net, cleanns, nsmap,
    header, doctype/public/system.  Writes to an output list; names
    are the parser's resolved strings (prefix:local), so nsmap/cleanns
    operate on xmlns attributes rather than compound name terms."""

    def __init__(self, dialect="xml", layout=True, indent=0,
                 net=None, cleanns=True, nsmap=None, max_char=0x10FFFF,
                 empty_elements=None, entity_map=None):
        self.dialect = dialect
        self.xml = dialect in ("xml", "xmlns", "xhtml", "xhtml5")
        self.layout = layout
        self.indent = indent
        self.net = net if net is not None else self.xml
        self.cleanns = cleanns
        self.nsmap = list(nsmap or [])
        self.max_char = max_char
        if empty_elements is None and dialect in ("html", "html5"):
            empty_elements = _VOID
        self.empty = frozenset(empty_elements or ())
        self.entity_map = entity_map
        self.out = []

    def write(self, s):
        if s:
            self.out.append(s)

    def write_indent(self):
        """'~N' + pad semantics: break the line unless already at one
        (the out tail IS the line state — no side bookkeeping)."""
        if not self.layout:
            return
        out = self.out
        if out and not out[-1].endswith("\n"):
            out.append("\n")
        pad = "\t" * (self.indent // 8) + " " * (self.indent % 8)
        if pad:
            out.append(pad)

    # -- namespace map (update_nsmap, sgml_write.pl:483-521) ----------

    def _clean_attrs(self, attrs):
        """Drop xmlns attributes already bound identically in scope;
        update the scope map.  Returns (attrs_to_write, saved_map);
        saved_map is None when the map was not touched (no xmlns
        attrs, or cleanns off) — the caller then skips the restore."""
        if not (self.xml and self.cleanns) or not any(
                k == "xmlns" or k.startswith("xmlns:")
                for k, _v in attrs):
            return attrs, None
        saved = list(self.nsmap)
        keep = []
        for k, v in attrs:
            if k == "xmlns" or k.startswith("xmlns:"):
                ns = k[6:] if k.startswith("xmlns:") else ""
                cur = dict(self.nsmap)
                if cur.get(ns) == v:
                    continue          # redundant re-declaration
                self.nsmap = [(n, u) for n, u in self.nsmap
                              if n != ns] + [(ns, v)]
            keep.append((k, v))
        return keep, saved

    # -- elements ------------------------------------------------------

    def emit(self, n):
        self.emit_content_list([n])

    def emit_element(self, el):
        self.emit_content_list([el])

    def emit_content_list(self, content):
        """Explicit-stack emitter (sgml_write.pl:176-227 emit tree,
        de-recursed): one dispatch loop, writes appended straight to
        the out list.  Ops on the work stack: ("n", node) emit;
        ("w", s) literal; ("i", None) line break + pad; ("+", d)
        indent adjust; ("m", map) nsmap restore.  Depth-unbounded —
        a 100k-deep soup DOM serializes without RecursionError."""
        out = self.out
        append = out.append
        mc, em = self.max_char, self.entity_map
        full = mc >= 0x10FFFF          # no encoding cap: quoting is
        cd_search = _RE_CDATA_SPECIAL.search   # a scan + translate
        at_search = _RE_ATTR_SPECIAL.search
        tt_cdata = _TT_CDATA
        tt_attr = _TT_ATTR
        xml = self.xml
        xmlclean = xml and self.cleanns
        layout = self.layout
        net = self.net
        html = self.dialect in ("html", "html5")
        empty = self.empty
        end_tags = {}            # name -> "</name>" (names repeat)
        pads = {}                # indent -> line pad
        stack = [("n", c) for c in reversed(content)]
        push = stack.append
        while stack:
            op, n = stack.pop()
            if op == "n":
                if n.__class__ is str:   # text nodes dominate
                    if n:
                        if full or n.isascii():
                            append(n if cd_search(n) is None
                                   else n.translate(tt_cdata))
                        else:
                            append(quote_cdata(n, mc, em))
                    continue
                if not isinstance(n, Element):
                    if isinstance(n, (SData, NData)):
                        if n.text:
                            append(quote_cdata(n.text, mc, em))
                    elif isinstance(n, PI):
                        append("<?%s?>" % n.text)
                    elif isinstance(n, Entity):
                        append("&%s;" % n.name)
                    elif isinstance(n, str):   # str subclass
                        if n:
                            append(quote_cdata(n, mc, em))
                    continue
                name = n.name
                end = end_tags.get(name)
                if end is None:
                    end = end_tags[name] = "</%s>" % name
                attrs = n.attrs
                saved_map = None
                if attrs:
                    if xmlclean:
                        attrs, saved_map = self._clean_attrs(attrs)
                    # one pass: value strings + the layout length
                    # (unquoted lengths, ' k="v"' accounting)
                    alen = 0
                    parts = []
                    for k, v in attrs:
                        s = v if v.__class__ is str else \
                            _attr_value_str(v)
                        alen += len(k) + 3 + len(s)
                        if full or s.isascii():
                            if at_search(s) is not None:
                                s = s.translate(tt_attr)
                        else:
                            s = quote_attribute(s, mc, em)
                        parts.append(f' {k}="{s}"')
                    if layout and alen > 60:
                        append("<" + name)
                        self.indent += 4
                        for p in parts:
                            self.write_indent()
                            append(p[1:])
                        self.indent -= 4
                    else:
                        append("<" + name + "".join(parts))
                else:
                    append("<" + name)
                cont = n.content
                if not cont:
                    # empty: XML />, SGML EMPTY <e>, SGML NET <e//
                    if net:
                        if xml:
                            append("/>")
                        elif name in empty:
                            append(">")
                        else:
                            append("//")
                    else:
                        append(">")
                        if not (not xml and name in empty):
                            append(end)
                    if saved_map is not None:
                        self.nsmap = saved_map
                    continue
                if len(cont) == 1 and cont[0].__class__ is str:
                    text = cont[0]
                    if (not xml and net and "/" not in text and
                            len(text) < 20):
                        append("/")
                        if text:
                            append(quote_cdata(text, mc, em))
                        append("/")
                    elif html and name in ("script", "style"):
                        # verbatim element
                        append(">" + text + end)
                    elif full or text.isascii():
                        append(">" + (text if cd_search(text) is None
                                      else text.translate(tt_cdata))
                               + end)
                    else:
                        append(">" + quote_cdata(text, mc, em) + end)
                    if saved_map is not None:
                        self.nsmap = saved_map
                    continue
                if layout:
                    preserve = False
                    for k, v in attrs:
                        if k == "xml:space" and str(v) == "preserve":
                            preserve = True
                            break
                    elems = None if preserve \
                        else self._element_content(cont)
                else:
                    elems = None
                append(">")
                if saved_map is not None:
                    push(("m", saved_map))
                if elems is not None:
                    push(("w", end))
                    push(("i", None))
                    push(("+", -2))
                    for c in reversed(elems):
                        push(("n", c))
                        push(("i", None))
                    push(("+", 2))
                else:
                    push(("w", end))
                    for c in reversed(cont):
                        push(("n", c))
            elif op == "i":
                if layout:
                    if out and not out[-1].endswith("\n"):
                        append("\n")
                    ind = self.indent
                    if ind:
                        pad = pads.get(ind)
                        if pad is None:
                            pad = pads[ind] = ("\t" * (ind // 8) +
                                               " " * (ind % 8))
                        append(pad)
            elif op == "w":
                append(n)
            elif op == "+":
                self.indent += n
            else:        # "m": leave the element's ns scope
                self.nsmap = n

    @staticmethod
    def _element_content(content):
        """element_content/2: all children elements (blank text
        dropped), else None -> mixed content."""
        elems = []
        for c in content:
            if isinstance(c, Element):
                elems.append(c)
            elif isinstance(c, str) and c.strip(_BLANK) == "":
                continue
            else:
                return None
        return elems


def _emit_doctype(w, content, doctype, public, system):
    """emit_doctype/write_doctype (sgml_write.pl:293-336): written
    iff doctype/public/system given; root name fills in."""
    if doctype is None and public is None and system is None:
        return
    name = doctype
    if name is None:
        for n in content:
            if isinstance(n, Element):
                name = n.name
                break
    if name is None:
        return
    if public is None and system is None:
        w.write("<!DOCTYPE %s []>\n\n" % name)
    elif public is None:
        w.write('<!DOCTYPE %s SYSTEM "%s">\n\n' % (name, system))
    elif system is None:
        w.write('<!DOCTYPE %s PUBLIC "%s">\n\n' % (name, public))
    else:
        w.write('<!DOCTYPE %s PUBLIC "%s" "%s">\n\n'
                % (name, public, system))


def _enc_opts(encoding, max_char, dtd):
    """Resolve the dtd(DTD)/encoding writer options: a non-unicode
    target encoding caps the directly-writable codepoint range, and a
    DTD supplies named character-data entities for the rest
    (sgml_write.pl:110-118, :826-857).  Unknown encoding names are an
    error — silently keeping the full range would emit documents that
    cannot be encoded in the declared charset."""
    if encoding is not None:
        key = encoding.lower().replace("_", "-")
        if key not in _ENCODING_MAX:
            raise ValueError("unknown writer encoding: %r" % encoding)
        max_char = _ENCODING_MAX[key]
    entity_map = dtd_character_entities(dtd) if dtd is not None else None
    return max_char, entity_map


def xml_write(content, layout=True, indent=0, net=True, cleanns=True,
              nsmap=None, header=True, doctype=None, public=None,
              system=None, max_char=0x10FFFF, dialect="xml",
              encoding=None, dtd=None):
    """xml_write/3 analog returning a string.  `encoding` caps the
    directly-writable range ('iso-8859-1' -> 0xFF, 'us-ascii' ->
    0x7F); chars beyond it write as DTD character entities (when
    `dtd` provides them) or hex char refs."""
    if isinstance(content, Element):
        content = [content]
    max_char, entity_map = _enc_opts(encoding, max_char, dtd)
    w = _Writer(dialect=dialect, layout=layout, indent=indent, net=net,
                cleanns=cleanns, nsmap=nsmap, max_char=max_char,
                entity_map=entity_map)
    if header:
        enc_name = {"iso-8859-1": "ISO-8859-1",
                    "iso-latin-1": "ISO-8859-1",
                    "latin-1": "ISO-8859-1",
                    "us-ascii": "US-ASCII", "ascii": "US-ASCII",
                    "utf-16": "UTF-16", "utf-16le": "UTF-16",
                    "utf-16be": "UTF-16", "unicode-le": "UTF-16",
                    "unicode-be": "UTF-16"}.get(
                        (encoding or "").lower().replace("_", "-"),
                        "UTF-8")
        w.write('<?xml version="1.0" encoding="%s"?>\n\n' % enc_name)
    _emit_doctype(w, content, doctype, public, system)
    w.write_indent()
    w.emit_content_list(content)
    return "".join(w.out)


def sgml_write(content, layout=True, indent=0, net=False,
               cleanns=True, doctype=None, public=None, system=None,
               max_char=0x10FFFF, dialect="sgml", empty_elements=None,
               encoding=None, dtd=None):
    """sgml_write/3 analog returning a string; `encoding`/`dtd` as in
    xml_write."""
    if isinstance(content, Element):
        content = [content]
    max_char, entity_map = _enc_opts(encoding, max_char, dtd)
    if dtd is not None and empty_elements is None:
        # the dtd(DTD) option also supplies the EMPTY element set
        empty_elements = {
            e.name for e in dtd.elements.values()
            if e.structure is not None and not e.undefined and
            e.structure.type == _C_EMPTY}
    w = _Writer(dialect=dialect, layout=layout, indent=indent, net=net,
                cleanns=cleanns, max_char=max_char,
                empty_elements=empty_elements, entity_map=entity_map)
    _emit_doctype(w, content, doctype, public, system)
    w.write_indent()
    w.emit_content_list(content)
    return "".join(w.out)


def html_write(content, **opts):
    """html_write/3 analog: sgml_write with the HTML empty-element
    set (sgml_write.pl:215-222 dtd(html))."""
    opts.setdefault("dialect", "html")
    return sgml_write(content, **opts)


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
