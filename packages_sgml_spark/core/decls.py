"""Declaration parsing mixin + string-scanning helpers.

Semantics mirror the reference's declaration processors
(/root/reference/parser.c:1384-2690, 3644-3757) and lexical takers
(parser.c:848-1198).  All functions scan Python strings with an index
instead of C pointers; return conventions follow the reference
(None = no match).
"""

from . import dtd as D
from . import model as M
from .states import S_PCDATA
from .chars import (is_blank_char, is_name_char, is_nmstart_char,
                    DIGIT_CHARS)
from .entities import isee_character_entity, safe_chr
from .errors import Gripes

import re as _re

MAXNMLEN = 256

# ASCII fast-path tokenizers (slow path preserves full semantics)
_RE_NAME_FOLD = _re.compile(
    r'[ \t\r\n]*([A-Za-z_:][A-Za-z0-9._:\-]*)')
_RE_LAYOUT = _re.compile(r'[ \t\r\n]+')


class DeclMixin:

    def _invalidate_replay_caches(self):
        """ELEMENT/ATTLIST/ENTITY declarations can change what a
        memoized tag or entity replay would produce (content models,
        attribute defaults, entity values) — drop both caches, and
        bump this DTD's omitted-path cache generation
        (find_omitted_path reads other elements' omit_open flags, so
        its per-state memos go stale on redeclaration too;
        dtd._omit_gen, model.py design note)."""
        dtd = self.dtd
        memo = dtd._tag_memo
        if memo:
            memo.clear()
        fast = dtd._ent_fast
        if fast:
            fast.clear()
        if dtd._shape_memo:
            dtd._shape_memo.clear()
        if dtd._cow is not None:
            # DTD-level declaration inside a shared-DTD parse: caches
            # rebuilt after this point may embed the doc-local
            # declarations, so the rollback clears them again
            dtd._cow.dict_level = True
        dtd._omit_gen[0] += 1

    def _warm_accreted(self, e):
        """True when `e` carries state accreted by a PREVIOUS document
        on the shared accretive base — invisible history a declaration
        must treat as "never declared" (r8)."""
        return (self.dtd.accretive and e.undefined and
                getattr(self, "_accreted", None) is not None and
                id(e) not in self._accreted)

    def _reset_accreted_attrs(self, e):
        """A declaration is about to touch `e`: attrs accreted by
        previous documents are foreign — cold behavior is an empty
        attribute list.  Swap it out for this parse (the DtdCow
        record restores it at parse end; replay caches were already
        cleared by _invalidate_replay_caches at the declaration)."""
        if not self._warm_accreted(e) or not e.attributes:
            return
        if self.dtd._cow is not None:
            self.dtd._cow.attrs_swap(e)
        e.attributes = []
        e._attr_idx = None
        e._def_attrs = None

    # ------------------------------------------------------------------
    # lexical helpers (parser.c:848-1198)
    # ------------------------------------------------------------------

    def iskip_layout(self, s, i):
        """Skip blanks and --comments-- (parser.c:848-878)."""
        n = len(s)
        # fast path: ASCII blanks then a non-comment, non-wide char
        m = _RE_LAYOUT.match(s, i)
        if m is not None:
            j = m.end()
            if j >= n or (s[j] != '-' and s[j] <= '\x7f'):
                return j
        elif i < n and s[i] != '-' and ' ' < s[i] <= '\x7f':
            return i
        while i < n:
            c = s[i]
            if is_blank_char(c):
                i += 1
                continue
            if c == '-' and i + 1 < n and s[i + 1] == '-':
                i += 2
                while i < n and not (s[i] == '-' and i + 1 < n and s[i + 1] == '-'):
                    i += 1
                i += 2
                continue
            return i
        return min(i, n)

    def isee_identifier(self, s, i, ident):
        """Case-insensitive reserved word match (parser.c:880-892)."""
        i = self.iskip_layout(s, i)
        j = 0
        n = len(s)
        while j < len(ident) and i < n and ident[j] == s[i].lower():
            j += 1
            i += 1
        if j == len(ident) and (i >= n or not is_name_char(s[i])):
            return self.iskip_layout(s, i)
        return None

    def itake_name(self, s, i):
        """(parser.c:894-925): skip layout, NMSTART then NAME chars,
        case-fold unless case_sensitive.  Returns (name, next_i) or None."""
        # ASCII fast path: no comments in layout, ASCII name, ASCII
        # or name-terminating follower
        m = _RE_NAME_FOLD.match(s, i)
        if m is not None:
            j = m.end()
            n = len(s)
            if j >= n or s[j] <= '\x7f' or not is_name_char(s[j]):
                name = m.group(1)
                if not self.dtd.case_sensitive:
                    name = name.lower()
                return name, self.iskip_layout(s, j)
        i = self.iskip_layout(s, i)
        n = len(s)
        if i >= n or not is_nmstart_char(s[i]):
            return None
        j = i
        while j < n and is_name_char(s[j]):
            j += 1
        name = s[i:j]
        if not self.dtd.case_sensitive:
            name = name.lower()
        return name, self.iskip_layout(s, j)

    def itake_entity_name(self, s, i):
        """(parser.c:926-955): like itake_name but ent_case_sensitive
        and does NOT skip trailing layout."""
        i = self.iskip_layout(s, i)
        n = len(s)
        if i >= n or not is_nmstart_char(s[i]):
            return None
        j = i
        while j < n and is_name_char(s[j]):
            j += 1
        name = s[i:j]
        if not self.dtd.ent_case_sensitive:
            name = name.lower()
        return name, j

    def itake_nmtoken(self, s, i):
        """(parser.c:957-985)."""
        i = self.iskip_layout(s, i)
        n = len(s)
        if i >= n or not is_name_char(s[i]):
            return None
        j = i
        while j < n and is_name_char(s[j]):
            j += 1
        name = s[i:j]
        if not self.dtd.case_sensitive:
            name = name.lower()
        return name, self.iskip_layout(s, j)

    def itake_nutoken(self, s, i):
        """(parser.c:987-1018): digit first."""
        i = self.iskip_layout(s, i)
        n = len(s)
        if i >= n or s[i] not in DIGIT_CHARS:
            return None
        j = i
        while j < n and is_name_char(s[j]):
            j += 1
        name = s[i:j]
        if not self.dtd.case_sensitive:
            name = name.lower()
        return name, self.iskip_layout(s, j)

    def itake_number(self, s, i):
        """(parser.c:1021-1050).  Returns (value, next_i) or None;
        value is str (token mode) or int (integer mode)."""
        i = self.iskip_layout(s, i)
        n = len(s)
        if not self.dtd.number_mode_integer:
            j = i
            while j < n and s[j] in DIGIT_CHARS:
                j += 1
            if j == i:
                return None
            return s[i:j], self.iskip_layout(s, j)
        j = i
        if j < n and s[j] in '+-':
            j += 1
        k = j
        while k < n and s[k] in DIGIT_CHARS:
            k += 1
        if k == j:
            return None
        return int(s[i:k]), self.iskip_layout(s, k)

    def itake_string(self, s, i):
        """Quoted string (parser.c:1060-1080).  Returns
        (value, next_i) or None.  Skips layout both sides."""
        i = self.iskip_layout(s, i)
        n = len(s)
        if i >= n or s[i] not in ('"', "'"):
            return None
        q = s[i]
        j = s.find(q, i + 1)
        if j < 0:
            return None
        return s[i + 1:j], self.iskip_layout(s, j + 1)

    def itake_unquoted(self, s, i):
        """Unquoted attribute value (parser.c:1163-1198)."""
        n = len(s)
        while i < n and is_blank_char(s[i]):
            i += 1
        out = []
        while i < n:
            c = s[i]
            if is_blank_char(c):
                break
            if c == '/' and (self.dtd.shorttag or
                             (i + 1 == n and
                              self.dtd.dialect in D.XML_DIALECTS)):
                break
            out.append(c)
            i += 1
        return ''.join(out), self.iskip_layout(s, i)

    # ------------------------------------------------------------------
    # parameter entities (parser.c:469-537)
    # ------------------------------------------------------------------

    def expand_pentities(self, s):
        out = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == '%':
                r = self.itake_entity_name(s, i + 1)
                if r is not None:
                    name, j = r
                    if j < n and s[j] == ';':
                        j += 1
                    e = self.dtd.pentities.get(name)
                    i = j
                    if e is None:
                        self.gripe(*Gripes.existence("parameter entity", name))
                        return None
                    eval_ = self.entity_value(e)
                    if eval_ is None:
                        return None
                    sub = self.expand_pentities(eval_)
                    if sub is None:
                        return None
                    out.append(sub)
                    continue
            if c == '&' and i + 1 < n and s[i + 1] == '#':
                r = isee_character_entity(s, i)
                if r is not None:
                    chr_, j = r
                    if chr_ == 0:
                        self.gripe(*Gripes.syntax_error(
                            "Illegal character entity", s[i:]))
                    else:
                        out.append(safe_chr(chr_))
                        i = j
                        continue
            out.append(c)
            i += 1
        return ''.join(out)

    # ------------------------------------------------------------------
    # <!ELEMENT ...> (parser.c:2040-2386)
    # ------------------------------------------------------------------

    def make_model(self, s, i):
        """(parser.c:2040-2147).  Returns (Model, next_i) or None."""
        m = M.Model()
        i = self.iskip_layout(s, i)
        r = self.isee_identifier(s, i, "#pcdata")
        if r is not None:
            m.type = M.MT_PCDATA
            m.cardinality = M.MC_ONE
            return m, r
        nm = self.itake_name(s, i)
        if nm is not None:
            m.type = M.MT_ELEMENT
            m.element = self.dtd.find_element(nm[0])
            i = nm[1]
        else:
            if i >= len(s) or s[i] != '(':
                self.gripe(*Gripes.syntax_error("Name group expected", s[i:]))
                return None
            i += 1
            while True:
                sub = self.make_model(s, i)
                if sub is None:
                    return None
                submodel, i = sub
                m.group.append(submodel)
                if i < len(s) and s[i] == '|':
                    mt = M.MT_OR
                    i += 1
                elif i < len(s) and s[i] == ',':
                    mt = M.MT_SEQ
                    i += 1
                elif i < len(s) and s[i] == '&':
                    mt = M.MT_AND
                    i += 1
                elif i < len(s) and s[i] == ')':
                    i += 1
                    break
                else:
                    self.gripe(*Gripes.syntax_error(
                        "Connector ('|', ',' or '&') expected", s[i:]))
                    return None
                i = self.iskip_layout(s, i)
                if m.type != mt:
                    if m.type == M.MT_UNDEF:
                        m.type = mt
                    else:
                        self.gripe(*Gripes.syntax_error(
                            "Different connector types in model", s[i:]))
                        return None
        # cardinality
        if i < len(s) and s[i] == '?':
            i += 1
            m.cardinality = M.MC_OPT
        elif i < len(s) and s[i] == '*':
            i += 1
            m.cardinality = M.MC_REP
        elif i < len(s) and s[i] == '+':
            # (x) +(y) exception: + followed by ( is not cardinality
            j = self.iskip_layout(s, i + 1)
            if not (j < len(s) and s[j] == '('):
                i += 1
                m.cardinality = M.MC_PLUS
            else:
                m.cardinality = M.MC_ONE
        else:
            m.cardinality = M.MC_ONE

        if m.type == M.MT_UNDEF:       # simplify (e+), etc.
            sub = m.group[0]
            if sub.cardinality == M.MC_ONE:
                card = m.cardinality
            elif m.cardinality == M.MC_ONE:
                card = sub.cardinality
            else:
                m.type = M.MT_OR
                return m, self.iskip_layout(s, i)
            sub.cardinality = card
            m = sub
        return m, self.iskip_layout(s, i)

    def process_model(self, edef, s, i):
        """(parser.c:2149-2182)."""
        i = self.iskip_layout(s, i)
        for kw, typ in (("empty", M.C_EMPTY), ("cdata", M.C_CDATA),
                        ("rcdata", M.C_RCDATA), ("any", M.C_ANY)):
            r = self.isee_identifier(s, i, kw)
            if r is not None:
                edef.type = typ
                return r
        edef.type = M.C_PCDATA
        made = self.make_model(s, i)
        if made is None:
            return None
        edef.content, i = made
        return i

    def isee_ngsep(self, s, i, sep):
        """(parser.c:2186-2206).  sep is a 1-element list holding the
        decided separator char or None."""
        if sep[0] is not None:
            if i < len(s) and s[i] == sep[0]:
                return self.iskip_layout(s, i + 1)
            return None
        for c in (',', '|', '&'):
            if i < len(s) and s[i] == c:
                sep[0] = c
                return self.iskip_layout(s, i + 1)
        return None

    def itake_namegroup(self, s, i):
        """(parser.c:2210-2240).  Returns (names, next_i) or None."""
        if i >= len(s) or s[i] != '(':
            return None
        i += 1
        names = []
        sep = [None]
        while True:
            r = self.itake_name(s, i)
            if r is None:
                self.gripe(*Gripes.syntax_error("Name expected", s[i:]))
                return None
            names.append(r[0])
            i = r[1]
            r2 = self.isee_ngsep(s, i, sep)
            if r2 is not None:
                i = self.iskip_layout(s, r2)
                continue
            if i < len(s) and s[i] == ')':
                return names, self.iskip_layout(s, i + 1)
            self.gripe(*Gripes.syntax_error("Bad name-group", s[i:]))
            return None

    def itake_el_or_model_element_list(self, s, i):
        """(parser.c:2262-2291).  Returns (names, next_i) or None."""
        if i < len(s) and s[i] == '(':
            made = self.make_model(s, i)
            if made is None:
                return None
            m, i = made
            names = []

            def walk(mm):
                if mm.type == M.MT_ELEMENT:
                    names.append(mm.element.name)
                else:
                    for sub in mm.group:
                        walk(sub)

            walk(m)
            return names, i
        r = self.itake_name(s, i)
        if r is None:
            self.gripe(*Gripes.syntax_error("Name expected", s[i:]))
            return None
        return [r[0]], r[1]

    def process_element_declaration(self, s):
        """(parser.c:2297-2386)."""
        self._invalidate_replay_caches()
        s = self.expand_pentities(s)
        if s is None:
            return
        i = 0
        r = self.itake_el_or_model_element_list(s, i)
        if r is None:
            self.gripe(*Gripes.syntax_error("Name or name-group expected", s))
            return
        names, i = r
        if not names:
            return
        edef = D.ElementDef()
        for nm in names:
            e = self.dtd.find_element(nm)
            if e.structure is not None:
                # accretive-base warm state (r8): a structure grown by
                # a PREVIOUS document's auto-declaration is invisible
                # history — cold behavior is "never declared", so no
                # redefinition gripe (auto-declared THIS parse still
                # gripes exactly like the reference, parser.c:2326)
                # and no leftover accreted implicit attrs either.
                self._reset_accreted_attrs(e)
                if e.structure.type != M.C_EMPTY and \
                        not self._warm_accreted(e):
                    self.gripe(*Gripes.syntax_warning("Redefined element",
                                                      s[i:]))
            if self.dtd._cow is not None:
                self.dtd._cow.structure(e)
            e.structure = edef
            e.undefined = False
        # omitted-tag flags
        r = self.isee_identifier(s, i, "-")
        seen = False
        if r is not None:
            edef.omit_open = False
            i = r
            seen = True
        else:
            r = self.isee_identifier(s, i, "o")
            if r is not None:
                edef.omit_open = True
                i = r
                seen = True
        if seen:
            r = self.isee_identifier(s, i, "-")
            if r is not None:
                edef.omit_close = False
                i = r
            else:
                r = self.isee_identifier(s, i, "o")
                if r is not None:
                    edef.omit_close = True
                    i = r
                else:
                    self.gripe(*Gripes.syntax_error(
                        "Bad omit-tag declaration", s[i:]))
                    return
        # content model
        i = self.process_model(edef, s, i)
        if i is None:
            return
        # inclusions/exclusions
        while i < len(s) and s[i] in '-+':
            target = edef.excluded if s[i] == '-' else edef.included
            r = self.itake_namegroup(s, i + 1)
            if r is None:
                self.gripe(*Gripes.syntax_error("Name group expected", s[i:]))
                return
            names2, i = r
            for nm in names2:
                target.append(self.dtd.find_element(nm))
            self.dtd.has_inex = True
            self.dtd._inex_members = None   # new members: rebuild set
        if i < len(s):
            self.gripe(*Gripes.syntax_error(
                "Unexpected end of declaration", s[i:]))

    # ------------------------------------------------------------------
    # <!ATTLIST ...> (parser.c:2454-2609)
    # ------------------------------------------------------------------

    _ATTR_TYPES = (
        ("cdata", D.AT_CDATA, False), ("entity", D.AT_ENTITY, False),
        ("entities", D.AT_ENTITIES, True), ("idrefs", D.AT_IDREFS, True),
        ("idref", D.AT_IDREF, False), ("id", D.AT_ID, False),
        ("names", D.AT_NAMES, True), ("name", D.AT_NAME, False),
        ("nmtokens", D.AT_NMTOKENS, True), ("nmtoken", D.AT_NMTOKEN, False),
        ("numbers", D.AT_NUMBERS, True), ("number", D.AT_NUMBER, False),
        ("nutokens", D.AT_NUTOKENS, True), ("nutoken", D.AT_NUTOKEN, False),
    )

    def process_attlist_declaration(self, s):
        self._invalidate_replay_caches()
        s = self.expand_pentities(s)
        if s is None:
            return
        i = self.iskip_layout(s, 0)
        r = self.itake_el_or_model_element_list(s, i)
        if r is None:
            return
        names, i = r
        while i < len(s):
            at = D.Attr(None)
            r = self.itake_name(s, i)
            if r is None:
                self.gripe(*Gripes.syntax_error("Name expected", s[i:]))
                return
            at.name, i = r
            # type
            if i < len(s) and s[i] == '(':
                at.type = D.AT_NAMEOF
                i += 1
                sep = [None]
                while True:
                    r = self.itake_nmtoken(s, i)
                    if r is None:
                        self.gripe(*Gripes.syntax_error("Name expected", s[i:]))
                        return
                    at.nameof.append(r[0])
                    i = r[1]
                    r2 = self.isee_ngsep(s, i, sep)
                    if r2 is not None:
                        i = r2
                        continue
                    if i < len(s) and s[i] == ')':
                        i = self.iskip_layout(s, i + 1)
                        break
                    self.gripe(*Gripes.syntax_error("Illegal name-group",
                                                    s[i:]))
                    return
            else:
                matched = False
                for kw, typ, islist in self._ATTR_TYPES:
                    r = self.isee_identifier(s, i, kw)
                    if r is not None:
                        at.type = typ
                        at.islist = islist
                        i = r
                        matched = True
                        break
                if not matched:
                    r = self.isee_identifier(s, i, "notation")
                    if r is not None:
                        at.type = D.AT_NOTATION
                        i = r
                        r2 = self.itake_namegroup(s, i)
                        if r2 is None:
                            self.gripe(*Gripes.syntax_error(
                                "name-group expected", s[i:]))
                            return
                        at.nameof, i = r2
                        matched = True
                if not matched:
                    self.gripe(*Gripes.syntax_error(
                        "Attribute-type expected", s[i:]))
                    return
            # default
            for kw, d in (("#fixed", D.AT_FIXED), ("#required", D.AT_REQUIRED),
                          ("#current", D.AT_CURRENT), ("#conref", D.AT_CONREF),
                          ("#implied", D.AT_IMPLIED)):
                r = self.isee_identifier(s, i, kw)
                if r is not None:
                    at.def_ = d
                    i = r
                    break
            else:
                at.def_ = D.AT_DEFAULT
            if at.def_ in (D.AT_DEFAULT, D.AT_FIXED):
                i = self._attlist_default(at, s, i)
                if i is None:
                    return
            for nm in names:
                e = self.dtd.find_element(nm)
                # accreted attrs are foreign history here too: cold, a
                # declared attr named like a previously-accreted
                # implicit one would win find_attribute's first-wins
                # index; warm it would lose (r8 review)
                self._reset_accreted_attrs(e)
                e = self.dtd.def_element(nm)
                if self.dtd._cow is not None:
                    # ATTLIST in a doc-local subset: dict_level (set
                    # by _invalidate_replay_caches) already forces a
                    # full cache clear at rollback
                    self.dtd._cow.attrs(e)
                self._add_attribute(e, at)

    def _attlist_default(self, at, s, i):
        """(parser.c:2590-2667): parse a default value."""
        r = self.itake_string(s, i)
        if r is None:
            # nmtoken chars
            j = self.iskip_layout(s, i)
            if j >= len(s) or not is_name_char(s[j]):
                self.gripe(*Gripes.syntax_error("Bad attribute default",
                                                s[i:]))
                return None
            k = j
            while k < len(s) and is_name_char(s[k]):
                k += 1
            val = s[j:k]
            if not self.dtd.case_sensitive:
                val = val.lower()
            end = self.iskip_layout(s, k)
        else:
            val, end = r
        if at.type == D.AT_CDATA:
            at.default = val
        elif at.type in (D.AT_ENTITY, D.AT_NOTATION, D.AT_NAME):
            r2 = self.itake_name(val, 0)
            if r2 is None or r2[1] < len(val):
                self.gripe(*Gripes.syntax_error(
                    'Expected type name, found "%s"' % val, ""))
                return None
            at.default = r2[0]
        elif at.type in (D.AT_NMTOKEN, D.AT_NAMEOF):
            r2 = self.itake_nmtoken(val, 0)
            if r2 is None or r2[1] < len(val):
                self.gripe(*Gripes.syntax_error(
                    'Expected type nmtoken, found "%s"' % val, ""))
                return None
            at.default = r2[0]
        elif at.type == D.AT_NUTOKEN:
            r2 = self.itake_nutoken(val, 0)
            if r2 is None or r2[1] < len(val):
                self.gripe(*Gripes.syntax_error(
                    'Expected type nutoken, found "%s"' % val, ""))
                return None
            at.default = r2[0]
        elif at.type == D.AT_NUMBER:
            r2 = self.itake_number(val, 0)
            if r2 is None or r2[1] < len(val):
                self.gripe(*Gripes.syntax_error(
                    'Expected type number, found "%s"' % val, ""))
                return None
            at.default = r2[0]
        else:  # list types: keep raw text
            at.default = val
        return end

    def _add_attribute(self, e, a):
        """(parser.c:2430-2451): first definition wins."""
        if e.find_attribute(a.name) is not None:
            self.gripe(*Gripes.redefined("attribute", a.name))
            return
        e.attributes.append(a)
        # xml:space element property (parser.c:2402-2426)
        if a.name == "xml:space" and a.def_ in (D.AT_FIXED, D.AT_DEFAULT) \
                and a.default is not None:
            e.space_mode = D.SPACE_MODE_NAMES.get(str(a.default),
                                                  D.SP_INHERIT)

    # ------------------------------------------------------------------
    # <!ENTITY ...> (parser.c:1394-1540)
    # ------------------------------------------------------------------

    def process_entity_declaration(self, s):
        self._invalidate_replay_caches()
        i = 0
        isparam = False
        n = len(s)
        i = self.iskip_layout(s, i)
        if i < n and s[i] == '%':
            isparam = True
            i += 1
        r = self.itake_entity_name(s, i)
        isdef = False
        if r is None:
            r2 = self.isee_identifier(s, i, "#default")
            if r2 is None:
                self.gripe(*Gripes.syntax_error("Name expected", s[i:]))
                return
            name = "#DEFAULT"
            i = r2
            isdef = True
        else:
            name, i = r
        if isparam and name in self.dtd.pentities:
            self.gripe(*Gripes.redefined("parameter entity", name))
            return
        if not isparam and name in self.dtd.entities:
            self.gripe(*Gripes.redefined("entity", name))
            return
        i = self.iskip_layout(s, i)
        e = D.EntityDef(name)
        e.catalog_location = "PENTITY" if isparam else "ENTITY"

        r = self.isee_identifier(s, i, "system")
        if r is not None:
            e.type = D.ET_SYSTEM
            e.content = D.EC_SGML
            i = r
        else:
            r = self.isee_identifier(s, i, "public")
            if r is not None:
                e.type = D.ET_PUBLIC
                e.content = D.EC_SGML
                i = r
            else:
                e.type = D.ET_LITERAL
                if not isparam:
                    for kw, ec in (("cdata", D.EC_CDATA), ("sdata", D.EC_SDATA),
                                   ("pi", D.EC_PI), ("starttag", D.EC_STARTTAG),
                                   ("endtag", D.EC_ENDTAG)):
                        r = self.isee_identifier(s, i, kw)
                        if r is not None:
                            i = r
                            e.content = ec
                            break
                    else:
                        e.content = D.EC_SGML

        i = self.process_entity_value_declaration(s, i, e)
        if i is not None:
            if e.type == D.ET_LITERAL:
                if e.content == D.EC_STARTTAG:
                    e.value = "<" + e.value + ">"
                    e.content = D.EC_SGML
                elif e.content == D.EC_ENDTAG:
                    e.value = "</" + e.value + ">"
                    e.content = D.EC_SGML
            else:
                if i < len(s):
                    matched = False
                    for kw, ec in (("cdata", D.EC_CDATA),
                                   ("sdata", D.EC_SDATA),
                                   ("ndata", D.EC_NDATA)):
                        r = self.isee_identifier(s, i, kw)
                        if r is not None:
                            i = r
                            e.content = ec
                            matched = True
                            break
                    if not matched:
                        self.gripe(*Gripes.syntax_error(
                            "Bad datatype declaration", s[i:]))
                        return
                    r = self.itake_name(s, i)
                    if r is not None:
                        i = r[1]
                    else:
                        self.gripe(*Gripes.syntax_error(
                            "Bad notation declaration", s[i:]))
                        return
            if i < len(s):
                self.gripe(*Gripes.syntax_error(
                    "Unexpected end of declaraction", s[i:]))

        cow = self.dtd._cow
        if isparam:
            if cow is not None:
                cow.dict_write(self.dtd.pentities, name)
            self.dtd.pentities[name] = e
        else:
            if cow is not None:
                cow.dict_write(self.dtd.entities, name)
            self.dtd.entities[name] = e
        if isdef:
            self.dtd.default_entity = e

    def process_entity_value_declaration(self, s, i, e):
        """(parser.c:1337-1384)."""
        if e.type == D.ET_SYSTEM:
            r = self.itake_string(s, i)
            if r is None:
                self.gripe(*Gripes.syntax_error("String expected", s[i:]))
                return None
            e.exturl, i = r
            e.baseurl = self.base_file
            return i
        r = self.itake_string(s, i)
        if r is None:
            self.gripe(*Gripes.syntax_error("String expected", s[i:]))
            return None
        raw, i = r
        val = self.expand_pentities(raw)
        if val is None:
            return None
        if e.type == D.ET_PUBLIC:
            e.extid = val
            j = self.iskip_layout(s, i)
            if j < len(s) and s[j] in ('"', "'"):
                r = self.itake_string(s, i)
                if r is not None:
                    e.exturl, i = r
                    e.baseurl = self.base_file
            return i
        e.value = val
        return i

    # ------------------------------------------------------------------
    # <!NOTATION ...> (parser.c:1570-1620)
    # ------------------------------------------------------------------

    def process_notation_declaration(self, s):
        r = self.itake_name(s, 0)
        if r is None:
            self.gripe(*Gripes.syntax_error("Notation name expected", s))
            return
        name, i = r
        if name in self.dtd.notations:
            self.gripe(*Gripes.redefined("notation", name))
            return
        system = public = None
        r = self.isee_identifier(s, i, "system")
        if r is not None:
            pass  # note: reference does NOT advance decl here (parser.c:1590)
        else:
            r = self.isee_identifier(s, i, "public")
            if r is not None:
                i = r
                r2 = self.itake_string(s, i)
                if r2 is None:
                    self.gripe(*Gripes.syntax_error(
                        "Public identifier expected", s[i:]))
                    return
                public, r = r2
            else:
                self.gripe(*Gripes.syntax_error(
                    "SYSTEM or PUBLIC expected", s[i:]))
                return
        i = r
        r2 = self.itake_string(s, i)
        if r2 is not None:
            system, i = r2
        if i < len(s):
            self.gripe(*Gripes.syntax_error(
                "Unexpected end of declaraction", s[i:]))
            return
        if self.dtd._cow is not None:
            self.dtd._cow.dict_write(self.dtd.notations, name)
        self.dtd.notations[name] = D.Notation(name, system, public)

    # ------------------------------------------------------------------
    # <!SHORTREF ...> / <!USEMAP ...> (parser.c:1640-1888)
    # ------------------------------------------------------------------

    def process_shortref_declaration(self, s):
        s = self.expand_pentities(s)
        if s is None:
            return
        r = self.itake_name(s, 0)
        if r is None:
            self.gripe(*Gripes.syntax_error("Name expected", s))
            return
        name, i = r
        sr = self.dtd.shortrefs.get(name)
        if sr is None:
            sr = D.ShortRef(name)
            if self.dtd._cow is not None:
                # rollback pops the created map; a pre-existing
                # build-time map filled in place is not restored
                # (no shortrefs in the shared HTML DTDs)
                self.dtd._cow.dict_write(self.dtd.shortrefs, name)
            self.dtd.shortrefs[name] = sr
        if sr.defined:
            self.gripe(*Gripes.redefined("shortref", name))
            return
        sr.defined = True
        while True:
            i = self.iskip_layout(s, i)
            if i >= len(s):
                break
            r = self._shortref_add_map(s, i, sr)
            if r is None:
                break
            i = r
        sr.compile(self.dtd)
        if i < len(s):
            self.gripe(*Gripes.syntax_error("Map expected", s[i:]))

    def _shortref_add_map(self, s, i, sr):
        """(parser.c:1652-1700): pattern with B/BB blank wildcards."""
        r = self.itake_string(s, i)
        if r is None:
            self.gripe(*Gripes.syntax_error("map-string expected", s[i:]))
            return None
        raw, i = r
        r = self.itake_entity_name(s, i)
        if r is None:
            self.gripe(*Gripes.syntax_error("map-to name expected", s[i:]))
            return None
        to, end = r
        frm = []
        j = 0
        while j < len(raw):
            if raw[j] == 'B':
                if j + 1 < len(raw) and raw[j + 1] == 'B':
                    frm.append(D.CHR_DBLANK)
                    j += 2
                    continue
                frm.append(D.CHR_BLANK)
                j += 1
            else:
                frm.append(raw[j])
                j += 1
        sr.maps.append((''.join(frm), to))
        return end

    def process_usemap_declaration(self, s):
        # USEMAP attaches shortref maps to Element objects
        # (element.map), which the compiled executor caches per
        # element — bump this DTD's cache generation so its registry
        # refreshes (the pure-Python paths read .map live and don't
        # need this; flushing is merely a cheap over-invalidation)
        self.dtd._omit_gen[0] += 1
        s = self.expand_pentities(s)
        if s is None:
            return
        i = 0
        name = None
        r = self.itake_name(s, i)
        if r is not None:
            name, i = r
        else:
            r = self.isee_identifier(s, i, "#empty")
            if r is not None:
                name = None
                i = r
            else:
                self.gripe(*Gripes.syntax_error("map-name expected", s))
                return
        map_ = self._find_map(name)
        if map_ is None:
            map_ = self.dtd.shortrefs.get(name)
            if map_ is None:
                map_ = D.ShortRef(name)
                if self.dtd._cow is not None:
                    self.dtd._cow.dict_write(self.dtd.shortrefs, name)
                self.dtd.shortrefs[name] = map_
        if i < len(s) and s[i] == '(':
            made = self.make_model(s, i)
            if made is None:
                return
            m, i = made

            def walk(mm):
                if mm.type == M.MT_ELEMENT:
                    if self.dtd._cow is not None:
                        self.dtd._cow.elem_map(mm.element)
                    mm.element.map = map_
                else:
                    for sub in mm.group:
                        walk(sub)

            walk(m)
        else:
            r = self.itake_name(s, i)
            if r is not None:
                ename, i = r
                e = self.dtd.find_element(ename)
                if self.dtd._cow is not None:
                    self.dtd._cow.elem_map(e)
                e.map = map_
            elif self.environments:
                if not map_.defined:
                    self.gripe(*Gripes.existence("map", name))
                self.environments[-1].map = map_
                self.map = map_
            else:
                self.gripe(*Gripes.syntax_error("element-name expected",
                                                s[i:]))
                return
        if i < len(s):
            self.gripe(*Gripes.syntax_error("Unparsed", s[i:]))

    _EMPTY_MAP = None

    def _find_map(self, name):
        """(parser.c:1798-1826): #EMPTY map for name None."""
        if name is None:
            if DeclMixin._EMPTY_MAP is None:
                m = D.ShortRef("#EMPTY")
                m.defined = True
                DeclMixin._EMPTY_MAP = m
            return DeclMixin._EMPTY_MAP
        sr = self.dtd.shortrefs.get(name)
        if sr is not None and sr.defined:
            return sr
        return None

    # ------------------------------------------------------------------
    # <!DOCTYPE ...> (parser.c:3644-3757)
    # ------------------------------------------------------------------

    def process_doctype(self, s, i):
        """`s` is the full declaration buffer ('!DOCTYPE ...'); `i`
        points just after the DOCTYPE keyword."""
        r = self.itake_name(s, i)
        if r is None:
            self.gripe(*Gripes.syntax_error("Name expected", s))
            return
        name, i = r
        et = None
        r2 = self.isee_identifier(s, i, "system")
        if r2 is not None:
            et = D.EntityDef(name)
            et.type = D.ET_SYSTEM
            i = r2
        else:
            r2 = self.isee_identifier(s, i, "public")
            if r2 is not None:
                et = D.EntityDef(name)
                et.type = D.ET_PUBLIC
                i = r2
        if et is not None:
            et.catalog_location = "DOCTYPE"
            i2 = self.process_entity_value_declaration(s, i, et)
            if i2 is None:
                return
            i = i2
        if self.dtd.doctype is None:
            self.dtd.doctype = name
            # external DTD fetch: only via the resolver hook (no
            # filesystem catalog in the Spark engine; reference
            # parser.c:3675-3695 loads from catalog here)
            if et is not None and self.resolver is not None:
                content = self.resolver(et)
                if content is not None:
                    self.load_dtd_text(content)
        # internal subset
        j = i
        if j < len(s) and s[j] == '[':
            self._process_internal_subset(s, j + 1)
        self.enforce_outer_element = name

    def _process_internal_subset(self, s, i):
        """DM_DTD sub-parse of [...] (parser.c:3700-3750)."""
        old_dmode = self.dmode
        old_state = self.state
        old_decode = self.utf8_decode
        old_buffer = self.buffer
        self.push_location_for_subset(s, i)
        self.dmode = "DTD"
        self.state = S_PCDATA
        self.buffer = []
        self.utf8_decode = False
        n = len(s)
        grouplevel = 1
        while i < n:
            c = s[i]
            if c in ('"', "'"):
                q = c
                self.putchar(c)
                i += 1
                while i < n and s[i] != q:
                    self.putchar(s[i])
                    i += 1
                if i < n:
                    self.putchar(s[i])
                    i += 1
                continue
            if c == '[':
                grouplevel += 1
            elif c == ']':
                grouplevel -= 1
                if grouplevel == 0:
                    break
            self.putchar(c)
            i += 1
        self.dtd.implicit = False
        self.state = old_state
        self.dmode = old_dmode
        self.utf8_decode = old_decode
        self.buffer = old_buffer
        self.pop_location()
