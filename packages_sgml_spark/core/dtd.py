"""DTD data structures.

Mirrors the reference's dtd struct family (/root/reference/dtd.h:300-469):
symbol-interned elements, typed attributes, entities, notations,
shortref maps.  Declaration *parsing* lives in parser.py (the reference
parses declarations inside the parser FSM, parser.c:3941-3988).
"""

import weakref

from typing import Dict, List, Optional

from . import model as M

# dialects
DL_SGML, DL_HTML, DL_HTML5, DL_XML, DL_XMLNS, DL_XHTML, DL_XHTML5 = range(7)
# groupings per dtd.h:180-183
XML_DIALECTS = (DL_XML, DL_XMLNS, DL_XHTML, DL_XHTML5)
SGML_DIALECTS = (DL_SGML, DL_HTML, DL_HTML5)
HTML_DIALECTS = (DL_HTML, DL_HTML5, DL_XHTML, DL_XHTML5)
HTML5_DIALECTS = (DL_HTML5, DL_XHTML5)

DIALECT_NAMES = {
    "sgml": DL_SGML, "html": DL_HTML, "html4": DL_HTML, "html5": DL_HTML5,
    "xml": DL_XML, "xmlns": DL_XMLNS, "xhtml": DL_XHTML, "xhtml5": DL_XHTML5,
}

# space modes (dtd.h:194-201)
SP_SGML, SP_PRESERVE, SP_DEFAULT, SP_REMOVE, SP_STRICT, SP_INHERIT = range(6)
SPACE_MODE_NAMES = {
    "sgml": SP_SGML, "preserve": SP_PRESERVE, "default": SP_DEFAULT,
    "remove": SP_REMOVE, "strict": SP_STRICT,
}

# attribute types (dtd.h:123-140)
(AT_CDATA, AT_ENTITY, AT_ENTITIES, AT_ID, AT_IDREF, AT_IDREFS, AT_NAME,
 AT_NAMES, AT_NAMEOF, AT_NMTOKEN, AT_NMTOKENS, AT_NOTATION, AT_NUMBER,
 AT_NUMBERS, AT_NUTOKEN, AT_NUTOKENS) = range(16)

LIST_TYPES = (AT_ENTITIES, AT_IDREFS, AT_NAMES, AT_NMTOKENS, AT_NUMBERS,
              AT_NUTOKENS)

# attribute defaults (dtd.h:142-149)
(AT_REQUIRED, AT_CURRENT, AT_CONREF, AT_IMPLIED, AT_FIXED, AT_DEFAULT) = range(6)

# entity types / content (dtd.h:153-175)
ET_SYSTEM, ET_PUBLIC, ET_LITERAL = range(3)
(EC_SGML, EC_CDATA, EC_SDATA, EC_NDATA, EC_PI, EC_STARTTAG, EC_ENDTAG) = range(7)


class ElementDef:
    """dtd_edef (dtd.h:398-413)."""
    __slots__ = ("omit_open", "omit_close", "type", "content",
                 "included", "excluded", "initial_state", "final_state")

    def __init__(self):
        self.omit_open = False
        self.omit_close = False
        self.type = M.C_PCDATA
        self.content: Optional[M.Model] = None
        self.included: List["Element"] = []
        self.excluded: List["Element"] = []
        self.initial_state = None
        self.final_state = None


class Attr:
    """dtd_attr (dtd.h:371-388)."""
    __slots__ = ("name", "type", "def_", "islist", "nameof", "default",
                 "implicit")

    def __init__(self, name):
        self.name = name
        self.type = AT_CDATA
        self.def_ = AT_IMPLIED
        self.islist = False
        self.nameof: List[str] = []     # for AT_NAMEOF / AT_NOTATION
        self.default = None             # str | int | None
        self.implicit = False           # created on first use in a
                                        # document (not declared);
                                        # DtdCow rolls these back, so
                                        # shape entries must not
                                        # reference them


class Element:
    """dtd_element (dtd.h:416-432)."""
    __slots__ = ("name", "structure", "undefined", "attributes",
                 "space_mode", "map", "_attr_idx", "_def_attrs")

    def __init__(self, name):
        self.name = name
        self.structure: Optional[ElementDef] = None
        self.undefined = False
        self.attributes: List[Attr] = []   # ordered, first wins
        self.space_mode = SP_INHERIT
        self.map = None                    # ShortRef
        self._attr_idx = None    # {name: Attr} lazily rebuilt when
                                 # len(attributes) changes (appends
                                 # and DtdCow truncations only; dupes
                                 # are refused, so length is exact)
        self._def_attrs = None   # (len, [attrs with defaults]) cache

    def find_attribute(self, name) -> Optional[Attr]:
        idx = self._attr_idx
        attrs = self.attributes
        if idx is None or len(idx) != len(attrs):
            idx = {}
            for a in attrs:
                if a.name not in idx:      # first wins
                    idx[a.name] = a
            self._attr_idx = idx
        return idx.get(name)

    def default_attributes(self):
        """Attrs with AT_DEFAULT/AT_FIXED defaults (cached; the
        declared-global-attrs list made the per-tag linear scan ~45
        long, and the common answer is 'none')."""
        cached = self._def_attrs
        attrs = self.attributes
        if cached is not None and cached[0] == len(attrs):
            return cached[1]
        defs = [a for a in attrs if a.def_ in (AT_FIXED, AT_DEFAULT)]
        self._def_attrs = (len(attrs), defs)
        return defs

    def __repr__(self):
        return "<element %s>" % self.name


class EntityDef:
    """dtd_entity (dtd.h:344-356)."""
    __slots__ = ("name", "type", "content", "value", "extid", "exturl",
                 "baseurl", "catalog_location")

    def __init__(self, name):
        self.name = name
        self.type = ET_LITERAL
        self.content = EC_SGML
        self.value: Optional[str] = None
        self.extid = None
        self.exturl = None
        self.baseurl = None
        self.catalog_location = None


class Notation:
    __slots__ = ("name", "system", "public")

    def __init__(self, name, system=None, public=None):
        self.name = name
        self.system = system
        self.public = public


CHR_BLANK = ""   # shortref 'B' pattern char (dtd.h CHR_BLANK)
CHR_DBLANK = ""  # shortref 'BB' pattern char


class ShortRef:
    """dtd_shortref (dtd.h:335-341): maps + last-char bitmap."""
    __slots__ = ("name", "maps", "ends", "defined")

    def __init__(self, name):
        self.name = name
        self.maps: List[tuple] = []       # (from_pattern, to_entity_name)
        self.ends = set()                 # chars that can end any map
        self.defined = False

    def compile(self, dtd):
        """compile_map (parser.c:1734-1756)."""
        self.ends = set()
        for frm, _to in self.maps:
            last = frm[-1]
            if last in (CHR_BLANK, CHR_DBLANK):
                for i in range(256):
                    c = chr(i)
                    from .chars import is_blank_char
                    if is_blank_char(c):
                        self.ends.add(c)
                self.ends.add(last)
            else:
                self.ends.add(last)


_COW_MISSING = object()


class DtdCow:
    """Per-parse copy-on-write journal for a *shared* DTD.

    The reference shares one mutable DTD per dialect within a session
    (dtd_cache; parser.c:2851-2890 allow_for mutates it in place), so
    parse output depends on what the process parsed before — wrong for
    a distributed engine where reused workers, retries and speculative
    tasks must be reproducible.  When ``dtd.shared`` is set, the parser
    activates this journal for the duration of one document parse and
    rolls every DTD mutation back at parse end, so each document sees
    the pristine dialect DTD.

    Elements auto-interned by find_element are deliberately *kept* in
    ``dtd.elements`` (only their state is reset): the model-layer memos
    (State.memo / State.same_memo) key by ``id(element)``, so keeping
    the objects alive keeps those ids stable and the memoized ``None``
    transitions exact, with no per-document memo growth.
    """

    _SCALARS = (
        "doctype", "implicit", "dialect", "case_sensitive",
        "att_case_sensitive", "att_case_preserving",
        "ent_case_sensitive", "space_mode", "shorttag",
        "system_entities", "number_mode_integer", "keep_prefix",
        "has_inex", "_inex_members", "encoding", "default_entity",
        "_setup_done",
    )

    __slots__ = ("journal", "elems", "edefs", "flipped", "attr_objs",
                 "dict_level", "scalars", "owner")

    def __init__(self, dtd, owner=None):
        # weakref to the parser this journal belongs to: a second
        # parser beginning on the same shared DTD must not steal a
        # journal whose owner is still mid-feed() (it would revert the
        # owner's journaled adaptations under it); it only rolls back
        # journals whose owner is dead or stopped
        self.owner = weakref.ref(owner) if owner is not None else None
        self.journal = []
        self.elems = set()       # ids of structurally-touched Elements
                                 # whose tag-memo entries must be
                                 # purged (redeclared / map-attached)
        self.edefs = set()       # ids of allow_for-snapshotted edefs
        self.flipped = set()     # ids of elements undefined-flipped
                                 # THIS parse (benign: begin tags of
                                 # undefined elements never memoize,
                                 # so no stale replay can exist and no
                                 # cache flush is needed for them)
        self.attr_objs = set()   # ids of implicit Attrs whose creation
                                 # griped THIS parse: tags carrying
                                 # them must not memoize (a replay
                                 # would suppress the next document's
                                 # cold-state gripe)
        self.dict_level = False  # DTD-level declaration seen
        self.scalars = tuple(getattr(dtd, n) for n in self._SCALARS)

    # -- journal writers (no-ops unless installed as dtd._cow) -------

    def structure(self, e):
        """Element.structure/.undefined about to change (undefined
        flip, <!ELEMENT> declaration)."""
        if e.structure is None:
            # flip of a never-declared element: rollback restores it
            # wholesale and nothing memoizable references it
            self.flipped.add(id(e))
        else:
            self.elems.add(id(e))
        self.journal.append(("stru", e, e.structure, e.undefined))

    def edef(self, e, edef):
        """allow_for about to mutate edef.type/.content/.group."""
        if id(e) in self.flipped:
            # this-parse flip-created edef: the "stru" rollback
            # discards it wholesale, nothing to snapshot
            return
        if id(edef) in self.edefs:
            return
        self.edefs.add(id(edef))
        self.elems.add(id(e))
        group = list(edef.content.group) if edef.content is not None \
            else None
        self.journal.append(("edef", edef, edef.type, edef.content,
                             group))

    def attrs_swap(self, e):
        """A declaration is touching an element whose attribute list
        was accreted by PREVIOUS documents on the accretive base: the
        parse must see the cold shape (no attrs — a fresh element has
        none until declared), so the caller empties the list and this
        record restores it wholesale at rollback (r8 review: the
        persisted implicit attr suppressed the cold no-attribute
        gripe once the element was declared this parse)."""
        self.journal.append(("attrs_swap", e, e.attributes))

    def attrs(self, e, griping_attr=None):
        """e.attributes about to grow (implicit or declared attr).

        Appends are value-equivalent on replay (implicit attrs are
        AT_IMPLIED CDATA: no defaults, no shorthand, no space-mode
        effect), so rollback only truncates the list — no cache flush.
        The one observable difference is the no_attribute gripe:
        a memoized later tag carrying the same attr would suppress
        the next document's cold-state gripe on replay, so when the
        append gripes, `griping_attr` records the Attr and the tag
        memo refuses entries carrying it (parser.process_begin_element
        guard)."""
        if griping_attr is not None:
            self.attr_objs.add(id(griping_attr))
        self.journal.append(("attrs", e, len(e.attributes),
                             e.space_mode))

    def elem_map(self, e):
        self.elems.add(id(e))
        self.journal.append(("map", e, e.map))

    def dict_write(self, d, key):
        self.dict_level = True
        self.journal.append(("dict", d, key, d.get(key, _COW_MISSING)))

    def rollback(self, dtd):
        for rec in reversed(self.journal):
            kind = rec[0]
            if kind == "stru":
                _k, e, stru, undef = rec
                e.structure = stru
                e.undefined = undef
            elif kind == "edef":
                _k, edef, typ, content, group = rec
                edef.type = typ
                edef.content = content
                if content is not None and group is not None:
                    content.group[:] = group
            elif kind == "attrs_swap":
                _k, e, old = rec
                e.attributes = old
                e._attr_idx = None
                e._def_attrs = None
            elif kind == "attrs":
                _k, e, n, space = rec
                del e.attributes[n:]
                e.space_mode = space
                # the lazy lookup caches key on len(attributes): a
                # later re-grow to the same length with NEW Attr
                # objects would revive stale entries — drop them now
                e._attr_idx = None
                e._def_attrs = None
            elif kind == "map":
                rec[1].map = rec[2]
            else:  # dict
                _k, d, key, old = rec
                if old is _COW_MISSING:
                    d.pop(key, None)
                else:
                    d[key] = old
        scalars_changed = False
        for name, old in zip(self._SCALARS, self.scalars):
            if getattr(dtd, name) is not old:
                setattr(dtd, name, old)
                scalars_changed = True
        memo = dtd._tag_memo
        if self.dict_level or scalars_changed:
            # declarations / dialect switches can be baked into any
            # cached replay — drop the caches wholesale (rare docs)
            if memo is None or not isinstance(memo, dict):
                dtd._tag_memo = {}
            else:
                memo.clear()
            dtd._ent_fast.clear()
            dtd._shape_memo.clear()
        elif self.elems:
            # surgical purge: replaying a memoized tag whose element
            # was rolled back would skip the undefined flip/gripes
            # (_replay_tag falls back to open_element, never to
            # process_begin_element)
            elems = self.elems
            if memo:
                stale = [k for k, entry in memo.items()
                         if id(entry[1]) in elems]
                for k in stale:
                    del memo[k]
            shapes = dtd._shape_memo
            if shapes:
                stale = [k for k, v in shapes.items()
                         if id(v[0]) in elems]
                for k in stale:
                    del shapes[k]
        if self.elems or self.dict_level or scalars_changed:
            # flush gen-stamped omit memos + the compiled executor's
            # registries (they hold rolled-back structure refs).
            # attrs-only journals skip this: their replays are
            # value-equivalent (see attrs()), so the warm registries
            # stay valid across documents.
            dtd._omit_gen[0] += 1
        elif self.flipped:
            # flip-only rollback: the full registries stay warm, but
            # the executor's allow_for-membership cache must not
            # carry positives into the next parse's fresh flip
            # (model.py _allow_gen rationale)
            dtd._allow_gen[0] += 1


class DTD:
    """dtd (dtd.h:444-469)."""

    def __init__(self, doctype=None):
        self.shared = False      # cached per-dialect DTD (htmldtd)
        self.accretive = False   # shared DTD-less base (parser.py
                                 # _get_xml_base_dtd): undefined-
                                 # element auto-declarations and the
                                 # silent implicit attrs they grow
                                 # PERSIST across parses (warm tag
                                 # memos / compiled registries)
                                 # instead of being DtdCow-journaled;
                                 # every other mutation still journals
        self._cow = None         # active DtdCow during a shared parse
        self.doctype = doctype
        self.implicit = True
        self.dialect = DL_SGML
        self.case_sensitive = False
        self.att_case_sensitive = False
        self.att_case_preserving = False
        self.ent_case_sensitive = True
        self.space_mode = SP_SGML
        self.shorttag = True
        self.system_entities = False
        self.number_mode_integer = False     # NU_TOKEN default
        self.keep_prefix = False
        self.has_inex = False    # any +(..)/-(..)
        self._inex_members = None  # lazy id-set of inex-listed elements
        self._tag_memo = {}      # decl-string -> parsed tag (parser.py)
        self._ent_fast = {}      # entity name -> (text, kind) replay
                                 # cache (parser.process_entity)
        self._shape_memo = {}    # "name\0attr\0attr" -> (e, attrs,
                                 # defaults, sflag, guard_names):
                                 # value-independent
                                 # begin-tag replay for tags whose
                                 # attr VALUES are unique per
                                 # occurrence (every real <a href>) —
                                 # the compiled executor parses the
                                 # values itself (parser.py
                                 # process_begin_element registers)
        self._setup_done = False  # set_dialect ran at least once
        # Per-DTD cache generations (one-slot lists; model.py design
        # note).  Process-global generations made every private-DTD
        # flip flush the shared dialect DTDs' compiled registries —
        # per-DTD scoping keeps a worker's html5 caches warm across
        # interleaved DTD-less XML documents.
        self._omit_gen = [0]
        self._allow_gen = [0]

        self.encoding = "iso-8859-1"

        self.elements: Dict[str, Element] = {}
        self.entities: Dict[str, EntityDef] = {}
        self.pentities: Dict[str, EntityDef] = {}
        self.default_entity: Optional[EntityDef] = None
        self.notations: Dict[str, Notation] = {}
        self.shortrefs: Dict[str, ShortRef] = {}

    def find_element(self, name) -> Element:
        """find_element (parser.c:687-705): auto-intern."""
        e = self.elements.get(name)
        if e is None:
            e = Element(name)
            self.elements[name] = e
        return e

    def def_element(self, name) -> Element:
        e = self.find_element(name)
        if e.structure is None:
            if self._cow is not None:
                # journaled flip: rollback restores the element and
                # begin tags of undefined elements never memoize, so
                # no cached state can go stale — skip the flush (it
                # would otherwise cold-start the compiled executor's
                # registries on every soup document)
                self._cow.structure(e)
            else:
                # unjournaled flip (private DTD): invalidate THIS
                # DTD's compiled-executor registries; happens once
                # per element lifetime (core/cspeed.py gen-guard)
                self._omit_gen[0] += 1
            e.structure = ElementDef()
            # C_EMPTY like the reference (parser.c:717-725
            # def_element): ElementDef's C_PCDATA default carries
            # content=None, which crashes allow_for for an
            # ATTLIST-only element that then gets content (r8 review
            # fallout — pre-existing, exposed by the accreted-attr
            # reset test)
            e.structure.type = M.C_EMPTY
            e.undefined = True
        return e


def dtd_dump(dtd) -> str:
    """Debug dump of a compiled DTD (dtd2pl CLI analog,
    /root/reference/dtd2pl.c:53-104): one line per element/attribute/
    entity declaration in a Prolog-term-ish format."""
    from . import model as M
    out = []

    def model_str(m):
        if m is None:
            return "EMPTY"
        card = {M.MC_ONE: "", M.MC_OPT: "?", M.MC_REP: "*",
                M.MC_PLUS: "+"}[m.cardinality]
        if m.type == M.MT_PCDATA:
            return "#PCDATA"
        if m.type == M.MT_ELEMENT:
            return m.element.name + card
        sep = {M.MT_SEQ: ",", M.MT_AND: "&", M.MT_OR: "|"}.get(
            m.type, "|")
        return "(%s)%s" % (sep.join(model_str(s) for s in m.group), card)

    for name in sorted(dtd.elements):
        e = dtd.elements[name]
        d = e.structure
        if d is None:
            continue
        kind = {M.C_EMPTY: "EMPTY", M.C_CDATA: "CDATA",
                M.C_RCDATA: "RCDATA", M.C_ANY: "ANY"}.get(d.type)
        content = kind or model_str(d.content)
        out.append("element(%s, omit(%s, %s), %s)." % (
            name, "true" if d.omit_open else "false",
            "true" if d.omit_close else "false", content))
        for a in e.attributes:
            out.append("attribute(%s, %s, %s, %r)." % (
                name, a.name, a.type, a.default))
    for name in sorted(dtd.entities):
        ent = dtd.entities[name]
        out.append("entity(%s, %r)." % (name, (ent.value or
                                               ent.exturl or "")[:60]))
    return "\n".join(out) + "\n"
