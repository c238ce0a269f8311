"""Shared HTML DTDs for the html/html5 dialects.

The reference resolves dtd(html5) through its catalog to DTD/HTML5.dtd
and *caches the DTD across documents* (sgml.pl:244-271 dtd/2 with
dtd_cache), so entity tables and element definitions are shared — we
do the same with a per-process cache (the Spark-executor analog of a
broadcast DTD, SURVEY.md §1.3).

The element declarations below are authored from the public HTML5
element list (void elements, optional end tags, raw-text elements);
entity tables come from Python's stdlib `html.entities` (the W3C
entity sets).  Nothing here is copied from the reference DTD files.
"""

import html.entities

from . import dtd as D

# Void elements -> EMPTY; optional-end-tag elements -> 'O' close;
# script/style -> CDATA declared content; title/textarea -> #PCDATA.
_INLINE = ("#PCDATA|a|abbr|b|bdi|bdo|br|button|cite|code|data|dfn|em|i|img|"
           "input|kbd|label|mark|meter|noscript|output|progress|q|ruby|s|"
           "samp|select|small|span|strong|sub|sup|textarea|time|u|var|wbr")

# Flow content for cells/list items: everything EXCEPT li/dt/dd/td/th/
# tr/option themselves, so a following sibling forces the implied
# close (open_element walk, parser.c:2962-2996).
_FLOW = (_INLINE + "|div|p|ul|ol|dl|table|h1|h2|h3|h4|h5|h6|pre|"
         "blockquote|form|section|article|aside|nav|header|footer|main|"
         "figure|figcaption|details|summary|fieldset|address|hr|script|"
         "style|template|object|video|audio|canvas|iframe|ins|del|map|"
         "picture|dialog|menu|search|img|br")

HTML5_DTD_TEXT = """
<!ELEMENT html O O (head|body|{flow})*>
<!ELEMENT head O O (title|meta|link|base|style|script|noscript|template)*>
<!ELEMENT body O O ({flow})*>
<!ELEMENT (div|section|article|aside|nav|header|footer|main|figure|
  figcaption|blockquote|details|summary|dialog|fieldset|form|template|
  address|menu|hgroup|search) - - ({flow})*>
<!ELEMENT (h1|h2|h3|h4|h5|h6|pre|legend) - - ({inline})*>
<!ELEMENT p O O ({inline})*>
<!ELEMENT (a|abbr|b|bdi|bdo|button|cite|code|data|dfn|em|i|ins|del|kbd|
  label|mark|meter|noscript|object|output|progress|q|ruby|s|samp|small|
  span|strong|sub|sup|time|u|var|video|audio|canvas|map|picture|iframe)
  - - ({flow})*>
<!ELEMENT (ul|ol|dir) - - (li)*>
<!ELEMENT li O O ({flow})*>
<!ELEMENT dl - - (dt|dd)*>
<!ELEMENT (dt|dd) O O ({flow})*>
<!ELEMENT table - - (caption?,colgroup*,thead?,(tbody|tr)*,tfoot?)>
<!ELEMENT caption O O ({flow})*>
<!ELEMENT colgroup O O (col)*>
<!ELEMENT (thead|tbody|tfoot) O O (tr)*>
<!ELEMENT tr O O (td|th)*>
<!ELEMENT (td|th) O O ({flow})*>
<!ELEMENT select - - (option|optgroup)*>
<!ELEMENT optgroup O O (option)*>
<!ELEMENT option O O (#PCDATA)>
<!ELEMENT (area|base|br|col|embed|hr|img|input|link|meta|source|track|
  wbr|param|basefont|frame|isindex) - O EMPTY>
<!ELEMENT (script|style) - - CDATA>
<!ELEMENT title - - (#PCDATA)>
<!ELEMENT textarea - - (#PCDATA)>
<!ATTLIST a href CDATA #IMPLIED target CDATA #IMPLIED rel CDATA #IMPLIED
  name CDATA #IMPLIED class CDATA #IMPLIED id CDATA #IMPLIED
  title CDATA #IMPLIED style CDATA #IMPLIED>
<!ATTLIST img src CDATA #IMPLIED alt CDATA #IMPLIED width CDATA #IMPLIED
  height CDATA #IMPLIED class CDATA #IMPLIED id CDATA #IMPLIED
  loading CDATA #IMPLIED style CDATA #IMPLIED>
<!ATTLIST meta name CDATA #IMPLIED content CDATA #IMPLIED
  charset CDATA #IMPLIED property CDATA #IMPLIED http-equiv CDATA #IMPLIED>
<!ATTLIST link rel CDATA #IMPLIED href CDATA #IMPLIED type CDATA #IMPLIED
  media CDATA #IMPLIED sizes CDATA #IMPLIED crossorigin CDATA #IMPLIED>
<!ATTLIST script src CDATA #IMPLIED type CDATA #IMPLIED async CDATA #IMPLIED
  defer CDATA #IMPLIED crossorigin CDATA #IMPLIED>
<!ATTLIST input type CDATA #IMPLIED name CDATA #IMPLIED value CDATA #IMPLIED
  placeholder CDATA #IMPLIED class CDATA #IMPLIED id CDATA #IMPLIED>
<!ATTLIST form action CDATA #IMPLIED method CDATA #IMPLIED
  class CDATA #IMPLIED id CDATA #IMPLIED>
""".replace("{inline}", _INLINE).replace("{flow}", _FLOW)

# HTML4-transitional flavour: legacy elements and the SGML
# inclusion/exclusion exceptions HTML5 dropped (no nested forms/
# anchors/labels; pre bans images and font tweaks).  Authored from
# the public HTML 4.01 spec structure.
HTML4_EXTRA_DTD_TEXT = """
<!ELEMENT (font|center|strike|big|tt|u|s|acronym) - - ({flow})*>
<!ELEMENT (dir|menu) - - (li)* -(p|div|table)>
<!ELEMENT a - - ({flow})* -(a)>
<!ELEMENT form - - ({flow})* -(form)>
<!ELEMENT label - - ({flow})* -(label)>
<!ELEMENT button - - ({flow})* -(a|form|input|select|textarea|label|button)>
<!ELEMENT pre - - ({inline})* -(img|object|big|small|sub|sup|font)>
<!ELEMENT applet - - ({flow}|param)*>
""".replace("{inline}", _INLINE).replace("{flow}", _FLOW)

# HTML5 global attributes (spec §3.2.6; reference DTD/HTML5.dtd:25
# %global declares the same families) + the most common event
# handlers; declared on every element of the html5/xhtml5 builds by
# build_html_dtd.  aria-*/data-* are wildcard families handled by
# prefix exemption in parser.process_attributes instead.  NOT applied
# to the HTML4 build (ADVICE r6): HTML4 declares only %coreattrs/
# %i18n/%events, per element — see the HTML4_* tables below.
GLOBAL_ATTRS = (
    "class", "id", "style", "title", "lang", "dir", "role", "hidden",
    "tabindex", "accesskey", "draggable", "spellcheck", "translate",
    "contenteditable", "autocapitalize", "autofocus", "enterkeyhint",
    "inputmode", "is", "itemid", "itemprop", "itemref", "itemscope",
    "itemtype", "nonce", "part", "slot",
    "onclick", "ondblclick", "onmousedown", "onmouseup", "onmouseover",
    "onmousemove", "onmouseout", "onkeypress", "onkeydown", "onkeyup",
    "onload", "onerror", "onsubmit", "onchange", "onfocus", "onblur",
    "oninput",
)

# HTML 4.01 generic attribute entities (reference DTD/HTML4.dtd:
# 185-210 %coreattrs/%i18n/%events, :224 %attrs) and the per-element
# exceptions the spec DTD makes — elements that take only a subset of
# %attrs, element-specific intrinsic events, and the transitional
# %align attribute (DTD/HTML4.dtd:226).
HTML4_CORE = ("id", "class", "style", "title")
HTML4_I18N = ("lang", "dir")
HTML4_EVENTS = (
    "onclick", "ondblclick", "onmousedown", "onmouseup", "onmouseover",
    "onmousemove", "onmouseout", "onkeypress", "onkeydown", "onkeyup")
HTML4_ATTRS = HTML4_CORE + HTML4_I18N + HTML4_EVENTS
HTML4_RESTRICTED = {
    "html": HTML4_I18N, "head": HTML4_I18N, "title": HTML4_I18N,
    "meta": HTML4_I18N, "style": HTML4_I18N,
    "base": (), "script": (), "param": (), "basefont": (),
    "br": HTML4_CORE, "applet": HTML4_CORE,
    "frame": HTML4_CORE, "frameset": HTML4_CORE, "iframe": HTML4_CORE,
    "font": HTML4_CORE + HTML4_I18N, "bdo": HTML4_CORE + HTML4_I18N,
    "isindex": HTML4_CORE + HTML4_I18N,
}
HTML4_EXTRA_EVENTS = {
    "body": ("onload", "onunload"),
    "frameset": ("onload", "onunload"),
    "form": ("onsubmit", "onreset"),
    "label": ("onfocus", "onblur"), "a": ("onfocus", "onblur"),
    "area": ("onfocus", "onblur"), "button": ("onfocus", "onblur"),
    "input": ("onfocus", "onblur", "onselect", "onchange"),
    "select": ("onfocus", "onblur", "onchange"),
    "textarea": ("onfocus", "onblur", "onselect", "onchange"),
}
HTML4_ALIGN_ELEMENTS = frozenset((
    "div", "p", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "img",
    "object", "input", "legend", "caption", "table", "col",
    "colgroup", "thead", "tbody", "tfoot", "tr", "td", "th",
    "iframe", "applet"))

_CACHE = {}


def get_html_dtd(dialect_name):
    """Cached, shared, mutable DTD for an HTML dialect (mirrors the
    reference's dtd_cache sharing semantics)."""
    key = "html5" if dialect_name in ("html5", "xhtml5") else "html"
    dtd = _CACHE.get(key)
    if dtd is None:
        dtd = build_html_dtd(key)
        # parser-side copy-on-write: every document parse against this
        # cached DTD journals its mutations (allow_for, undefined
        # flips, implicit attrs, internal-subset decls) and rolls them
        # back at parse end, so output never depends on worker history
        # (dtd.DtdCow; the reference's dtd_cache shares mutable state
        # instead, parser.c:2851-2890)
        dtd.shared = True
        dtd._cache_key = key
        _CACHE[key] = dtd
    return dtd


def private_dtd_copy(shared):
    """Fresh unshared copy of a cached dialect DTD, for a parser that
    begins while another live parser is mid-feed() on the shared one
    (parser._begin_dtd_cow must not roll the live journal back).
    Returns None when the shared DTD has no rebuild recipe."""
    key = getattr(shared, "_cache_key", None)
    if key is None:
        return None
    from .dtd import DtdCow
    dtd = build_html_dtd(key)
    # carry over option-level scalars the owning parser may have set
    # on the shared DTD at construction (space mode, shorttag, case
    # flags, encoding, ...)
    for name in DtdCow._SCALARS:
        setattr(dtd, name, getattr(shared, name))
    dtd.shared = False
    return dtd


def build_html_dtd(key):
    # late import to avoid a cycle (parser imports htmldtd)
    from .parser import SGMLParser, ParserOptions

    p = SGMLParser(ParserOptions(dialect="sgml", quiet=True))
    dtd = p.dtd
    p.load_dtd_text(HTML5_DTD_TEXT)
    if key == "html":
        # HTML4 profile: legacy elements + exception declarations
        # (redefinitions of a/form/label/pre etc. override the HTML5
        # rows loaded above; redefinition gripes are style-level)
        p.load_dtd_text(HTML4_EXTRA_DTD_TEXT)
    # entity tables: HTML4 set for 'html', full HTML5 set for 'html5'
    if key == "html5":
        for name, expansion in html.entities.html5.items():
            if not name.endswith(";"):
                continue
            nm = name[:-1]
            if nm not in dtd.entities:
                e = D.EntityDef(nm)
                e.type = D.ET_LITERAL
                e.content = D.EC_CDATA
                e.value = expansion
                dtd.entities[nm] = e
    else:
        for nm, cp in html.entities.name2codepoint.items():
            if nm not in dtd.entities:
                e = D.EntityDef(nm)
                e.type = D.ET_LITERAL
                e.content = D.EC_CDATA
                e.value = chr(cp)
                dtd.entities[nm] = e
    # Generic attributes, per dialect (ADVICE r6 split).  html5: the
    # spec makes the global set valid on EVERY element (reference
    # DTD/HTML5.dtd:25 %global), so declare it everywhere instead of
    # letting each first use take the implicit-creation path with a
    # no_attribute gripe — this also keeps real-crawl pages (class/
    # id/style on most tags) on the unguarded tag-memo fast path now
    # that DtdCow rolls implicit attrs back per document.  html
    # (HTML4): only %coreattrs/%i18n/%events, with the spec DTD's
    # per-element restrictions, element-specific intrinsic events and
    # the transitional %align — anything beyond that gripes, like the
    # reference (parser.c:3310-3326).
    for name in dtd.elements:
        e = dtd.elements[name]
        have = {a.name for a in e.attributes}
        if key == "html5":
            wanted = GLOBAL_ATTRS
        else:
            wanted = (HTML4_RESTRICTED.get(name, HTML4_ATTRS) +
                      HTML4_EXTRA_EVENTS.get(name, ()))
            if name in HTML4_ALIGN_ELEMENTS:
                wanted = wanted + ("align",)
        for nm in wanted:
            if nm not in have:
                a = D.Attr(nm)
                a.type = D.AT_CDATA
                a.def_ = D.AT_IMPLIED
                e.attributes.append(a)
    dtd.doctype = "html"     # suppress external-DTD lookups
    return dtd
