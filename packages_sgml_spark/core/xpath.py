"""XPath-like DOM selection — the xpath/3 analog
(/root/reference/xpath.pl:269-560) with a compact string spec grammar
standing in for the reference's Prolog term syntax:

    //name            descendant-or-self search (sub_dom)
    /name             child step (root step matches the root element)
    a/b, a//b         chained steps
    *                 any element name (star/2)
    name(2)           index among same-name siblings (nth_element)
    name(last), name(last-1)
    name(@attr)       project the attribute's value
    name(@attr=v)     attribute condition (keeps the element)
    name(text=v)      text condition
    name(contains(@attr,v)) / name(contains(text,v))
    .../text()        concatenated subtree text (text_of_dom)
    .../normalize_space()
    .../number()      XSD-number of the normalized text
    .../@attr         attribute projection as the final value
    .../content       the element's content list
    .../self          the element itself (default)

xpath(dom, spec) is a generator over matches in document order;
xpath_chk(dom, spec) returns the first match or None (xpath_chk/3).
Index/count semantics follow the reference exactly: position and
'last' count among SAME-NAME siblings within one content list
(xpath.pl:352-390), including for the // axis (sub_dom yields each
node with its sibling index/count, xpath.pl:325-349).
"""

import re

from .dom import Element
from .xsd import xsd_number

_STEP_RE = re.compile(
    r"(//|/)?([^/()@]+|\*)(?:\(([^()]*(?:\([^()]*\)[^()]*)*)\))?")
_FUNCS = ("text()", "normalize_space()", "number()", "self", "content")


class XPathError(ValueError):
    pass


def _parse(spec):
    """spec -> (steps, func) where steps = [(deep, name, mods)]."""
    func = None
    for f in _FUNCS:
        if spec.endswith("/" + f):
            spec, func = spec[: -len(f) - 1], f
            break
    else:
        m = re.search(r"/(@[A-Za-z_][\w:.-]*)$", spec)
        if m:
            spec, func = spec[: m.start()], m.group(1)
    steps = []
    pos = 0
    while pos < len(spec):
        m = _STEP_RE.match(spec, pos)
        if m is None or m.start() != pos:
            raise XPathError("bad xpath spec at %r" % spec[pos:])
        axis, name, mods = m.group(1), m.group(2), m.group(3)
        if axis is None and steps:
            raise XPathError("missing axis in %r" % spec)
        deep = axis == "//"
        steps.append((deep, name,
                      _split_mods(mods) if mods else []))
        pos = m.end()
    if not steps:
        raise XPathError("empty xpath spec")
    return steps, func


def _split_mods(mods):
    out, depth, cur = [], 0, []
    for c in mods:
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += c == "("
            depth -= c == ")"
            cur.append(c)
    if cur:
        out.append("".join(cur).strip())
    return out


def _name_matches(el, name):
    return name == "*" or el.name == name


def _sub_dom(content, name):
    """sub_dom/5: every descendant(-or-list-member) element matching
    name, in document order, with (index, count) sibling numbering —
    iterative (deep tag-soup safe), pre-order."""
    stack = [iter(_children(content, name, all_=True))]
    while stack:
        it = stack[-1]
        entry = next(it, None)
        if entry is None:
            stack.pop()
            continue
        i, ln, el, matched = entry
        if matched:
            yield i, ln, el
        stack.append(iter(_children(el.content, name, all_=True)))


def _children(content, name, all_=False):
    """nth_element/count_named_elements: child elements with sibling
    (index, count).  For a named step the numbering runs among
    SAME-NAME siblings; for '*' the reference's unbound-name counting
    numbers ALL element siblings (xpath.pl:356-390).  With all_=True
    every element is yielded, flagged by whether it matches (used by
    _sub_dom, which must descend through non-matching elements)."""
    star = name == "*"
    counts = {}
    n_all = 0
    for n in content:
        if isinstance(n, Element):
            counts[n.name] = counts.get(n.name, 0) + 1
            n_all += 1
    seen = {}
    i_all = 0
    for n in content:
        if not isinstance(n, Element):
            continue
        seen[n.name] = seen.get(n.name, 0) + 1
        i_all += 1
        matched = star or n.name == name
        if matched or all_:
            if star:
                entry = (i_all, n_all, n)
            else:
                entry = (seen[n.name], counts[n.name], n)
            if all_:
                yield entry + (matched,)
            else:
                yield entry


def text_of_dom(node):
    """text_of_dom (xpath.pl:584-620): concatenated data of the
    subtree, including SDATA/NDATA nodes — delegates to the shared
    dom.extract_text walker."""
    from .dom import extract_text
    return extract_text(node if isinstance(node, list) else [node])


def _attr(el, name):
    for k, v in el.attrs:
        if k == name:
            return v
    return None


def _check_mod(mod, i, ln, el):
    """One modifier: returns True/False for conditions, or ('proj',
    value) for projections (xpath.pl:397-439 modifiers + conditions).
    """
    if mod == "last":
        return i == ln
    m = re.fullmatch(r"last-(\d+)", mod)
    if m:
        return i == ln - int(m.group(1))
    if re.fullmatch(r"-?\d+", mod):
        return i == int(mod)
    m = re.fullmatch(r"contains\((.+?),(.+)\)", mod)
    if m:
        hay = _val_of(m.group(1).strip(), el)
        needle = _unquote(m.group(2).strip())
        return hay is not None and needle in str(hay)
    m = re.fullmatch(r"(@[\w:.-]+|text)\s*=\s*(.+)", mod)
    if m:
        left = _val_of(m.group(1), el)
        return left is not None and str(left) == _unquote(m.group(2))
    if mod.startswith("@"):
        v = _attr(el, mod[1:])
        if v is None:
            return False
        return ("proj", v)
    raise XPathError("unsupported modifier %r" % mod)


def _val_of(expr, el):
    if expr.startswith("@"):
        return _attr(el, expr[1:])
    if expr == "text":
        return text_of_dom(el)
    return _unquote(expr)


def _unquote(s):
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


def _apply_func(func, node):
    if func is None or func == "self":
        return node
    if func == "content":
        return node.content if isinstance(node, Element) else node
    if func == "text()":
        return text_of_dom(node)
    if func == "normalize_space()":
        return re.sub(r"\s+", " ", text_of_dom(node)).strip()
    if func == "number()":
        v = xsd_number(re.sub(r"\s+", " ", text_of_dom(node)).strip())
        if v is None:
            raise StopIteration
        return v
    if func.startswith("@"):
        v = _attr(node, func[1:])
        if v is None:
            raise StopIteration
        return v
    raise XPathError("unsupported function %r" % func)


def xpath(dom, spec):
    """Generator over matches of `spec` in `dom` (an Element or a
    content list), in document order."""
    steps, func = _parse(spec)
    if isinstance(dom, Element):
        roots = [dom]
    else:
        roots = list(dom)

    def run(nodes, step_idx):
        deep, name, mods = steps[step_idx]
        if step_idx == 0 and not deep:
            # root child step matches the root element itself
            # (in_dom /Spec, xpath.pl:277-284)
            cands = [(1, 1, n) for n in nodes
                     if isinstance(n, Element) and
                     (name == "self" or _name_matches(n, name))]
        elif deep:
            cands = _sub_dom(nodes, name)
        else:
            cands = _children(nodes, name)
        for i, ln, el in cands:
            ok = True
            projected = None
            for mod in mods:
                r = _check_mod(mod, i, ln, el)
                if r is False:
                    ok = False
                    break
                if isinstance(r, tuple):
                    projected = r[1]
            if not ok:
                continue
            if step_idx + 1 < len(steps):
                # a following // step is descendant-OR-SELF of this
                # element (sub_dom's first clause, xpath.pl:332-334)
                nxt_deep = steps[step_idx + 1][0]
                yield from run([el] if nxt_deep else el.content,
                               step_idx + 1)
            elif projected is not None:
                yield projected
            else:
                try:
                    yield _apply_func(func, el)
                except StopIteration:
                    pass

    yield from run(roots, 0)


def xpath_chk(dom, spec):
    """xpath_chk/3: first solution or None."""
    for v in xpath(dom, spec):
        return v
    return None
