"""SGML-Open catalog (.soc) parsing and lookup.

Reference: catalog.c:340-720 — the scanner (whitespace-delimited
tokens, '--comments--', quoted strings), load_one_catalogue (BASE /
OVERRIDE / PUBLIC / SYSTEM / ENTITY / DOCTYPE entries, pubid
squishing, relative-path resolution against the catalog's directory)
and find_in_catalogue (override-aware first-match search with
sysid-suppression, sysid passthrough and ${name}.dtd/.pen/.ent
fallbacks).

Unknown keywords (SGMLDECL, NOTATION, ...) are skipped like the
reference does.  The catalog result plugs into ParserOptions(catalog=)
via SGMLCatalog.get(), which maps a DOCTYPE name to the DTD text.
"""

import os

# item kinds (catalog.h:45-56)
CAT_OTHER = 0
CAT_SYSTEM = 1
CAT_PUBLIC = 2
CAT_DOCTYPE = 3
CAT_ENTITY = 4
CAT_PENTITY = 5
CAT_OVERRIDE = 5
CAT_BASE = 6
OVR_PUBLIC = CAT_OVERRIDE + CAT_PUBLIC
OVR_DOCTYPE = CAT_OVERRIDE + CAT_DOCTYPE
OVR_ENTITY = CAT_OVERRIDE + CAT_ENTITY

_KEYWORDS = {
    "public": CAT_PUBLIC, "system": CAT_SYSTEM, "entity": CAT_ENTITY,
    "doctype": CAT_DOCTYPE, "override": CAT_OVERRIDE, "base": CAT_BASE,
}


def _squish(pubid):
    """Public-identifier whitespace normalisation (catalog.c:449-470:
    runs of chars <= ' ' collapse to one space, trimmed)."""
    out = []
    w = True
    for c in pubid:
        if c <= " ":
            if not w:
                out.append(" ")
                w = True
        else:
            out.append(c)
            w = False
    if w and out:
        out.pop()
    return "".join(out)


def _scan(text, pos, kw_expected):
    """One token (catalog.c:366-443).  Returns (kind_or_OTHER,
    token, next_pos); (None, None, pos) at EOF."""
    n = len(text)
    while True:
        if pos >= n:
            return None, None, pos
        c = text[pos]
        if c <= " ":
            pos += 1
            continue
        if c == "-":
            if pos + 1 < n and text[pos + 1] == "-":
                # comment: skip to the next '--'
                end = text.find("--", pos + 2)
                if end < 0:
                    return None, None, n
                pos = end + 2
                continue
            # lone '-' starts an unquoted token
            break
        if c in "\"'":
            q = c
            end = text.find(q, pos + 1)
            if end < 0:
                return None, None, n
            return CAT_OTHER, text[pos + 1:end], end + 1
        break
    start = pos
    while pos < n and text[pos] > " " and text[pos] not in "\"'":
        pos += 1
    tok = text[start:pos]
    if kw_expected:
        kind = _KEYWORDS.get(tok.lower())
        if kind is not None:
            return kind, tok, pos
    return CAT_OTHER, tok, pos


def parse_catalog_text(text, base=""):
    """load_one_catalogue analog over in-memory text.  Returns the
    item list [(kind, target, replacement)] with OVR_* kinds applied
    while OVERRIDE YES is active."""
    items = []
    pos = 0
    override = 0
    if base and not base.endswith(os.sep) and not base.endswith("/"):
        base += "/"
    while True:
        kind, _tok, pos = _scan(text, pos, True)
        if kind is None:
            break
        if kind == CAT_BASE:
            k2, tok, pos = _scan(text, pos, False)
            if k2 is None:
                break
            base = tok if tok.endswith("/") else tok + "/"
            continue
        if kind == CAT_OVERRIDE:
            k2, tok, pos = _scan(text, pos, False)
            if k2 is None:
                break
            override = CAT_OVERRIDE if tok[:1].lower() == "y" else 0
            continue
        if kind in (CAT_PUBLIC, CAT_SYSTEM, CAT_ENTITY, CAT_DOCTYPE):
            k2, target, pos = _scan(text, pos, False)
            if k2 is None:
                break
            if kind == CAT_PUBLIC:
                target = _squish(target)
            k3, repl, pos = _scan(text, pos, False)
            if k3 is None:
                break
            if not os.path.isabs(repl) and base:
                repl = base + repl
            items.append((kind if kind == CAT_SYSTEM
                          else kind + override, target, repl))
            continue
        # CAT_OTHER (unknown keyword like SGMLDECL, or its argument):
        # skip, like the reference's default: continue
    return items


class SGMLCatalog:
    """A loaded catalog chain with find_in_catalogue semantics
    (catalog.c:560-720)."""

    def __init__(self):
        self.items = []

    def load_file(self, path):
        with open(path, "r", encoding="latin-1") as f:
            text = f.read()
        self.items.extend(parse_catalog_text(
            text, base=os.path.dirname(os.path.abspath(path))))
        return self

    def load_text(self, text, base=""):
        self.items.extend(parse_catalog_text(text, base))
        return self

    def find(self, kind, name=None, pubid=None, sysid=None, ci=True):
        """find_in_catalogue: returns the mapped file, the sysid
        passthrough, a ${name}.dtd/.pen/.ent default, or None."""
        if name is None:
            kind = CAT_OTHER
        elif kind == CAT_PENTITY:
            if not name.startswith("%"):
                name = "%" + name
        elif kind == CAT_ENTITY and name.startswith("%"):
            kind = CAT_PENTITY

        def eq(a, b):
            return a.lower() == b.lower() if ci else a == b

        result = None
        for ikind, target, repl in self.items:
            if ikind == CAT_PUBLIC and sysid is not None:
                continue
            if ikind in (CAT_PUBLIC, OVR_PUBLIC):
                if pubid is not None and result is None and \
                        pubid == target:
                    result = repl
            elif ikind == CAT_SYSTEM:
                if sysid is not None and sysid == target:
                    return repl
            elif ikind in (CAT_DOCTYPE, OVR_DOCTYPE):
                if ikind == CAT_DOCTYPE and sysid is not None:
                    continue
                if (name is not None and kind == CAT_DOCTYPE and
                        result is None and eq(name, target)):
                    result = repl
            elif ikind in (CAT_ENTITY, OVR_ENTITY):
                if ikind == CAT_ENTITY and sysid is not None:
                    continue
                if (name is not None and kind >= CAT_ENTITY and
                        result is None and eq(name, target)):
                    result = repl
        if result is not None:
            return result
        if sysid is not None:
            return sysid
        if kind in (CAT_OTHER, CAT_DOCTYPE):
            return None
        # ${name}.pen / ${name}.ent defaults (catalog.c:694-712)
        if kind == CAT_PENTITY:
            return name[1:] + ".pen"
        return name + ".ent"

    # ------------------------------------------------------------------
    # ParserOptions(catalog=...) adapter: DOCTYPE name -> DTD text
    # ------------------------------------------------------------------

    def get(self, doctype_name):
        """Resolve a DOCTYPE to its DTD file via the catalog and
        return the file's text (None when unmapped/unreadable) — the
        dict-adapter used by the parser's no-doctype autoload."""
        path = self.find(CAT_DOCTYPE, name=doctype_name, ci=True)
        if path is None or not os.path.isfile(path):
            return None
        try:
            with open(path, "r", encoding="latin-1") as f:
                return f.read()
        except OSError:
            return None
