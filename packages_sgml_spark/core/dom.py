"""DOM term structures.

Shape mirrors the Prolog DOM produced by the reference binding
(/root/reference/sgml2pl.c:1192-1446, documented by xml_is_dom/1 in
/root/reference/sgml.pl:699-741):

    element(Name, [Name=Value ...], Content)
    CDATA text (atoms) | sdata(Text) | ndata(Text) | pi(Text) | entity(N)

Attribute values may be str, int, or list[str|int] (list-typed
attributes split on blanks, sgml2pl.c:1098-1121).
"""

from dataclasses import dataclass, field
from typing import Any, List, Tuple, Union
import json


@dataclass(slots=True)
class Element:
    name: str
    attrs: List[Tuple[str, Any]] = field(default_factory=list)
    content: List[Any] = field(default_factory=list)

    def __repr__(self):
        return "element(%s, %r, %r)" % (self.name, self.attrs, self.content)


@dataclass(slots=True)
class SData:
    text: str


@dataclass(slots=True)
class NData:
    text: str


@dataclass(slots=True)
class PI:
    text: str


@dataclass(slots=True)
class Entity:
    name: Union[str, int]


Node = Union[Element, SData, NData, PI, Entity, str]


def to_canonical(node) -> Any:
    """Canonical JSON-able structure for order-insensitive-attr compare
    (attribute sort rule: /root/reference/test_sgml.pl:210-213)."""
    if isinstance(node, Element):
        return {
            "e": node.name,
            "a": sorted(
                [[k, to_canonical_value(v)] for k, v in node.attrs],
                key=lambda kv: (kv[0], json.dumps(kv[1], sort_keys=True)),
            ),
            "c": [to_canonical(c) for c in node.content],
        }
    if isinstance(node, SData):
        return {"sdata": node.text}
    if isinstance(node, NData):
        return {"ndata": node.text}
    if isinstance(node, PI):
        return {"pi": node.text}
    if isinstance(node, Entity):
        return {"entity": node.name}
    return node


def to_canonical_value(v):
    if isinstance(v, list):
        return [to_canonical_value(x) for x in v]
    return v


def dom_to_json(content: List[Node]) -> str:
    """Canonical JSON of the DOM (attrs sorted; deterministic).
    Iterative structure build (deep soup safe) + ONE json.dumps —
    the r6 rewrite of a per-node-dumps emitter that spent ~70% of
    the dom_json path in json encoder setup.  Byte-identical output:
    sort_keys orders {"a","c","e"} exactly as the old literal did,
    and the default separators match."""
    root: list = []
    work = [(content, root)]
    while work:
        src, dst = work.pop()
        for n in src:
            if isinstance(n, str):
                dst.append(n)
            elif isinstance(n, Element):
                attrs = sorted(
                    [[_k_str(k), to_canonical_value(v)]
                     for k, v in n.attrs],
                    key=lambda kv: (kv[0], json.dumps(kv[1],
                                                      sort_keys=True)))
                kids: list = []
                dst.append({"a": attrs, "c": kids,
                            "e": _k_str(n.name)})
                work.append((n.content, kids))
            elif isinstance(n, SData):
                dst.append({"sdata": n.text})
            elif isinstance(n, NData):
                dst.append({"ndata": n.text})
            elif isinstance(n, PI):
                dst.append({"pi": n.text})
            elif isinstance(n, Entity):
                dst.append({"entity": n.name})
            else:
                dst.append(n)
    try:
        return json.dumps(root, ensure_ascii=False, sort_keys=True)
    except RecursionError:
        # freak-depth soup (json's C encoder recurses): the proven
        # fully-iterative emitter, byte-identical by construction
        return _dom_to_json_deep(content)


def _dom_to_json_deep(content: List[Node]) -> str:
    """Depth-proof emitter (pre-r6 implementation), kept as the
    fallback for DOMs deeper than json.dumps can encode."""
    out = []
    stack = [("node_list", content)]
    while stack:
        kind, val = stack.pop()
        if kind == "text":
            out.append(val)
            continue
        if kind == "node_list":
            out.append("[")
            stack.append(("text", "]"))
            items = []
            for i, c in enumerate(val):
                if i:
                    items.append(("text", ", "))
                items.append(("node", c))
            stack.extend(reversed(items))
            continue
        n = val
        if isinstance(n, Element):
            attrs = sorted(
                [[_k_str(k), to_canonical_value(v)] for k, v in n.attrs],
                key=lambda kv: (kv[0], json.dumps(kv[1], sort_keys=True)))
            out.append('{"a": %s, "c": '
                       % json.dumps(attrs, ensure_ascii=False,
                                    sort_keys=True))
            stack.append(("text", ', "e": %s}' % json.dumps(
                _k_str(n.name), ensure_ascii=False)))
            stack.append(("node_list", n.content))
        elif isinstance(n, SData):
            out.append(json.dumps({"sdata": n.text}, ensure_ascii=False,
                                  sort_keys=True))
        elif isinstance(n, NData):
            out.append(json.dumps({"ndata": n.text}, ensure_ascii=False,
                                  sort_keys=True))
        elif isinstance(n, PI):
            out.append(json.dumps({"pi": n.text}, ensure_ascii=False,
                                  sort_keys=True))
        elif isinstance(n, Entity):
            out.append(json.dumps({"entity": n.name},
                                  ensure_ascii=False, sort_keys=True))
        else:
            out.append(json.dumps(n, ensure_ascii=False))
    return "".join(out)


def _k_str(k):
    return k if isinstance(k, str) else str(k)


def extract_text(content: List[Node]) -> str:
    """Concatenate all CDATA text in document order (xpath.pl:584-620
    text-of-subtree analog over the whole document).  Iterative —
    crawl tag soup nests arbitrarily deep."""
    out = []
    stack = list(reversed(content))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        elif isinstance(n, Element):
            stack.extend(reversed(n.content))
        elif isinstance(n, (SData, NData)):
            out.append(n.text)
    return "".join(out)


def flatten_nodes(content: List[Node], elem_spans=None,
                  data_spans=None):
    """Flatten DOM into node rows for the Spark node table
    (design in SURVEY.md §1.3): (node_id, parent_id, ord, kind, name,
    attrs, text, subtree_end).  node_id is pre-order, so the subtree
    of an element is exactly node_id..subtree_end-1 — the descendant
    axis becomes a range predicate (no recursive joins).

    elem_spans/data_spans: parser-recorded (start,end) byte offsets in
    event order; zipped back by pre-order position (event order ==
    document order for both elements and data nodes)."""
    rows = []
    counters = {"e": 0, "d": 0}

    def _espan():
        i = counters["e"]
        counters["e"] += 1
        if elem_spans is not None and i < len(elem_spans):
            return elem_spans[i]
        return (None, None)

    def _dspan():
        i = counters["d"]
        counters["d"] += 1
        if data_spans is not None and i < len(data_spans):
            return data_spans[i]
        return (None, None)

    _POST = object()

    stack = [(n, -1, i) for i, n in reversed(list(enumerate(content)))]
    while stack:
        item = stack.pop()
        if item[0] is _POST:
            item[1]["subtree_end"] = len(rows)
            continue
        n, parent_id, ord_ = item
        nid = len(rows)
        if isinstance(n, Element):
            sp = _espan()
            row = {
                "node_id": nid, "parent_id": parent_id, "ord": ord_,
                "kind": "element", "name": _name_str(n.name),
                "attrs": {_name_str(k): _attr_str(v)
                          for k, v in n.attrs},
                "text": None, "subtree_end": None,
                "start_pos": sp[0], "end_pos": sp[1],
            }
            rows.append(row)
            stack.append((_POST, row, None))
            for i, c in reversed(list(enumerate(n.content))):
                stack.append((c, nid, i))
        elif isinstance(n, str):
            sp = _dspan()
            rows.append({"node_id": nid, "parent_id": parent_id,
                         "ord": ord_, "kind": "text", "name": None,
                         "attrs": None, "subtree_end": None,
                         "start_pos": sp[0], "end_pos": sp[1],
                         "text": n})
        elif isinstance(n, SData):
            sp = _dspan()
            rows.append({"node_id": nid, "parent_id": parent_id,
                         "ord": ord_, "kind": "sdata", "name": None,
                         "attrs": None, "subtree_end": None,
                         "start_pos": sp[0], "end_pos": sp[1],
                         "text": n.text})
        elif isinstance(n, NData):
            sp = _dspan()
            rows.append({"node_id": nid, "parent_id": parent_id,
                         "ord": ord_, "kind": "ndata", "name": None,
                         "attrs": None, "subtree_end": None,
                         "start_pos": sp[0], "end_pos": sp[1],
                         "text": n.text})
        elif isinstance(n, PI):
            rows.append({"node_id": nid, "parent_id": parent_id,
                         "ord": ord_, "kind": "pi", "name": None,
                         "attrs": None, "subtree_end": None,
                         "start_pos": None, "end_pos": None,
                         "text": n.text})
        elif isinstance(n, Entity):
            rows.append({"node_id": nid, "parent_id": parent_id,
                         "ord": ord_, "kind": "entity",
                         "name": str(n.name), "attrs": None,
                         "subtree_end": None,
                         "start_pos": None, "end_pos": None,
                         "text": None})
    return rows


def _attr_str(v):
    if isinstance(v, list):
        return " ".join(str(x) for x in v)
    return str(v)


def _name_str(n):
    return n if isinstance(n, str) else str(n)


class QName:
    """Namespace-qualified name under keep_prefix(true):
    the reference's ns(Prefix,URI):Local term (sgml2pl.c:1024-1036).
    prefix '' encodes 'no prefix' (default ns or xml*/xmlns names
    whose URI slot holds the literal 'xml'/'xmlns')."""
    __slots__ = ("prefix", "uri", "local")

    def __init__(self, prefix, uri, local):
        self.prefix = prefix or ""
        self.uri = uri
        self.local = local

    def __repr__(self):
        return "ns(%s,%s):%s" % (self.prefix, self.uri, self.local)

    def __eq__(self, other):
        return (isinstance(other, QName) and self.prefix == other.prefix
                and self.uri == other.uri and self.local == other.local)

    def __hash__(self):
        return hash((self.prefix, self.uri, self.local))

    def sort_key(self):
        """Prolog standard order of ns(P,U):L (prefix, uri, local)."""
        return (self.prefix, self.uri, self.local)
