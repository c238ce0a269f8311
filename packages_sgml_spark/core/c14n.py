"""Canonical XML (C14n / exclusive C14n) writer.

Faithful reimplementation of the reference's xml_write_canonical
(/root/reference/c14n2.pl:64-203): normalise the keep_prefix DOM
(namespace-declaration pruning/minting, attribute ordering), then
write with header(false), layout(false), net(false) conventions.

Input DOM must come from dialect='xmlns' with keep_prefix=True
(names are dom.QName).
"""

from .dom import Element, PI, QName
from .serialize import quote_attribute, quote_cdata

C14N = "http://www.w3.org/TR/2001/REC-xml-c14n-20010315"
EXC_C14N = "http://www.w3.org/2001/10/xml-exc-c14n#"


def _xml_ns(name, value):
    """xmlns declaration attr -> (prefix, url) or None
    (c14n2.pl xml_ns/3)."""
    if isinstance(name, QName):
        if name.uri == "xmlns":
            return (name.local, value)
        return None
    if name == "xmlns":
        return ("", value)
    if isinstance(name, str) and name.startswith("xmlns:"):
        return (name[6:], value)
    return None


def _include_ns(elem_name, method, prefix, url):
    """c14n2.pl include_ns/5: exc keeps only the element's own
    binding (the attr-namespace clause compares a URI against ns/2
    terms and can never match — mirrored as-is)."""
    if method == EXC_C14N:
        return (isinstance(elem_name, QName) and
                elem_name.prefix == prefix and elem_name.uri == url)
    return True


def _make_cname(prefix, local):
    return local if prefix == "" else "%s:%s" % (prefix, local)


def _put_ns(name, in_ns, out_ns):
    """c14n2.pl put_ns/5.  Returns (cname, out_ns') — out_ns maps
    url -> prefix."""
    if isinstance(name, QName):
        if name.uri == "xml" and name.prefix == "":
            return "xml:" + name.local, out_ns
        if out_ns.get(name.uri) == name.prefix:
            return _make_cname(name.prefix, name.local), out_ns
        out2 = dict(out_ns)
        out2[name.uri] = name.prefix
        return _make_cname(name.prefix, name.local), out2
    return name, out_ns


def _ns_attrs(out_ns0, out_ns):
    """New bindings -> xmlns attrs, sorted (c14n2.pl ns_attrs/3)."""
    if out_ns == out_ns0:
        return []
    new = sorted(set(out_ns.items()) - set(out_ns0.items()))
    attrs = []
    for url, px in new:
        attrs.append(("xmlns" if px == "" else "xmlns:" + px, url))
    return sorted(attrs)


def _attr_sort_key(name):
    if isinstance(name, QName):
        return name.sort_key()
    return (name,)


def _canonical_element(el, in_ns, out_ns, is_root, method):
    name = el.name
    # namespaces declared on this element
    attrs1 = []
    in2 = dict(in_ns)
    decls = []          # original decl attrs, in source order
    for k, v in el.attrs:
        ns = _xml_ns(k, v)
        if ns is not None:
            decls.append(ns)
            if _include_ns(name, method, ns[0], str(v)):
                in2[ns[0]] = str(v)
        else:
            attrs1.append((k, v))
    with_ns = sorted([a for a in attrs1 if isinstance(a[0], QName)],
                     key=lambda a: _attr_sort_key(a[0]))
    sans = sorted([a for a in attrs1 if not isinstance(a[0], QName)],
                  key=lambda a: _attr_sort_key(a[0]))

    # element name + possible xmlns="" kill (put_elemns)
    kill = []
    out1 = out_ns
    if not isinstance(name, QName) and "" in out_ns.values():
        kill = [("xmlns", "")]
        out1 = {u: p for u, p in out_ns.items() if p != ""}
        cname = name
    else:
        cname, out1 = _put_ns(name, in2, out_ns)

    # attribute names
    cwith = []
    out2 = out1
    for k, v in with_ns:
        ck, out2 = _put_ns(k, in2, out2)
        cwith.append((ck, v))
    nsattrs = _ns_attrs(out_ns, out2)

    if is_root:
        default = None
        rest = []
        for k, v in nsattrs:
            if k == "xmlns":
                default = v
            else:
                rest.append((k, v))
        if default is not None:
            # all original prefixed decls + remaining new ones,
            # sorted by URL, default first (c14n2.pl:100-105)
            root_ns = [("xmlns:" + px, url) for px, url in decls
                       if px != ""] + rest
            root_ns.sort(key=lambda kv: kv[1])
            nsattrs = [("xmlns", default)] + root_ns
        elif method != EXC_C14N:
            root_ns = [("xmlns:" + px, url) for px, url in decls
                       if px != ""] + nsattrs
            nsattrs = sorted(set(root_ns))

    cattrs = kill + nsattrs + sans + cwith
    ccontent = _canonical_list(el.content, in2, out2, False, method)
    return Element(cname, cattrs, ccontent)


def _canonical_list(content, in_ns, out_ns, is_root, method):
    out = []
    for n in content:
        if isinstance(n, Element):
            out.append(_canonical_element(n, in_ns, out_ns, is_root,
                                          method))
        else:
            out.append(n)
    return out


def _write(content, out):
    """xml_write with header(false), layout(false), net(false):
    every element is <n attrs>...</n>."""
    for n in content:
        if isinstance(n, Element):
            out.append("<%s" % n.name)
            for k, v in n.attrs:
                out.append(' %s="%s"' % (k, quote_attribute(str(v))))
            out.append(">")
            _write(n.content, out)
            out.append("</%s>" % n.name)
        elif isinstance(n, str):
            out.append(quote_cdata(n))
        elif isinstance(n, PI):
            out.append("<?%s?>" % n.text)
        elif hasattr(n, "text"):
            out.append(quote_cdata(n.text))
    return out


def xml_write_canonical(dom, method=C14N) -> str:
    """Serialize a DOM (list or single element) canonically."""
    if not isinstance(dom, list):
        dom = [dom]
    cdom = _canonical_list(dom, {}, {}, True, method)
    return "".join(_write(cdom, []))
