"""HTML DOM -> Markdown, the text shape modern LLM corpora train on
(structure kept as cheap syntax instead of thrown away).

Deliberately minimal and DETERMINISTIC:
- headings, paragraphs, lists (nested, ordered + unordered),
  blockquotes, fenced code blocks, inline code, emphasis, links,
  images, hr, br;
- table cells degrade to ``a | b`` lines (no alignment row — lossy,
  documented);
- script/style/template/noscript/head subtrees are dropped;
- no character escaping is applied to text (corpus text, not
  round-trippable markup — documented).

The walker is an explicit-stack post-order fold (no recursion: the
r6 serializer lesson — 20k-deep DOMs must not RecursionError).
Chunks carry ("i", text) inline / ("b", text) block / ("li", text)
list-item tags; each element folds its children's chunks into its
own.  Whitespace collapses at inline-merge time so <pre> can opt out.
"""

from .dom import Element, SData, NData, Entity, PI

_SKIP = frozenset(("script", "style", "template", "noscript", "head"))
_WRAP = {"strong": "**", "b": "**", "em": "*", "i": "*"}
_H = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
# elements that imply a line break when they appear INSIDE <pre>
_PRE_LINE = frozenset(("div", "p", "li", "tr", "h1", "h2", "h3",
                       "h4", "h5", "h6", "blockquote"))
_BR = "\x00br\x00"


def _text_of(node):
    if isinstance(node, str):
        return node
    if isinstance(node, (SData, NData)):
        return node.text
    if isinstance(node, Entity):
        return "&%s;" % node.name
    return None


def _collapse(s):
    return " ".join(s.split())


def _merge_inline(chunks, collapse=True):
    parts = []
    for tag, text in chunks:
        parts.append(("\n" + text + "\n") if tag != "i" else text)
    s = "".join(parts)
    if collapse:
        s = _collapse(s).replace(_BR, "\n")
    return s


def _attr(el, name):
    for k, v in el.attrs:
        if k == name:
            return v if isinstance(v, str) else str(v)
    return None


def _indent(text, pad):
    lines = text.split("\n")
    return "\n".join([lines[0]] + [(pad + l) if l else l
                                   for l in lines[1:]])


def _fold(el, chunks, in_pre=False):
    """Element + its children's chunks -> the chunks it hands up."""
    name = el.name if isinstance(el.name, str) else str(el.name)
    name = name.rsplit(":", 1)[-1].lower()
    if in_pre and name != "pre":
        # verbatim context: markup inside <pre> contributes raw text,
        # but line STRUCTURE must survive — syntax-highlighted code
        # viewers emit div-per-line or br-separated pre blocks
        if name == "br":
            return [("i", "\n")]
        if name in _PRE_LINE:
            return chunks + [("i", "\n")]
        return chunks
    if name in _H:
        return [("b", "#" * _H[name] + " " + _merge_inline(chunks))]
    if name == "p":
        # soup DOMs can nest block children under p (the engine's
        # DTD decides; golden-gated) — keep them as separate blocks
        t = _blocks(chunks)
        return [("b", t)] if t else []
    if name in _WRAP:
        t = _merge_inline(chunks)
        return [("i", _WRAP[name] + t + _WRAP[name])] if t else []
    if name == "a":
        t = _merge_inline(chunks) or (_attr(el, "href") or "")
        href = _attr(el, "href")
        return [("i", "[%s](%s)" % (t, href) if href else t)]
    if name == "img":
        return [("i", "![%s](%s)" % (_attr(el, "alt") or "",
                                     _attr(el, "src") or ""))]
    if name == "br":
        return [("i", _BR)]
    if name == "hr":
        return [("b", "---")]
    if name == "code":
        t = _merge_inline(chunks)
        return [("i", "`%s`" % t)] if t else []
    if name == "pre":
        raw = _merge_inline(chunks, collapse=False)
        return [("b", "```\n%s\n```" % raw.strip("\n"))]
    if name == "blockquote":
        body = _blocks(chunks)
        return [("b", "\n".join("> " + l if l else ">"
                                for l in body.split("\n")))]
    if name == "li":
        # tight list items: single newline between the item's blocks
        return [("li", _blocks(chunks).replace("\n\n", "\n"))]
    if name in ("ul", "ol"):
        out = []
        n = 0
        for tag, text in chunks:
            if tag != "li":
                continue
            n += 1
            mark = "- " if name == "ul" else "%d. " % n
            out.append(mark + _indent(text, " " * len(mark)))
        return [("b", "\n".join(out))] if out else []
    if name in ("td", "th"):
        return [("cell", _merge_inline(chunks))]
    if name == "tr":
        cells = [t for tag, t in chunks if tag == "cell"]
        return [("b", " | ".join(cells))] if cells else \
            [c for c in chunks if c[0] != "cell"]
    # everything else: transparent container
    return chunks


def _blocks(chunks):
    """Container fold: inline runs become their own paragraphs,
    blocks separate with blank lines."""
    out, run = [], []
    for tag, text in chunks:
        if tag == "i":
            run.append((tag, text))
            continue
        lead = _merge_inline(run)
        run = []
        if lead:
            out.append(lead)
        if text:
            out.append(text)
    tail = _merge_inline(run)
    if tail:
        out.append(tail)
    return "\n\n".join(out)


def dom_to_markdown(dom) -> str:
    """Render an extract() DOM (Element) to markdown text."""
    if not isinstance(dom, Element):
        t = _text_of(dom)
        return _collapse(t) if t else ""
    root_pre = (dom.name if isinstance(dom.name, str)
                else str(dom.name)).rsplit(":", 1)[-1].lower() == "pre"
    stack = [(dom, iter(dom.content), [], root_pre)]
    result = []
    while stack:
        el, it, chunks, in_pre = stack[-1]
        advanced = False
        for child in it:
            t = _text_of(child)
            if t is not None:
                if t:
                    chunks.append(("i", t))
                continue
            if isinstance(child, PI):
                continue
            if isinstance(child, Element):
                cname = child.name if isinstance(child.name, str) \
                    else str(child.name)
                cname = cname.rsplit(":", 1)[-1].lower()
                if cname in _SKIP:
                    continue
                stack.append((child, iter(child.content), [],
                              in_pre or cname == "pre"))
                advanced = True
                break
        if advanced:
            continue
        stack.pop()
        # in_pre means "inside a pre ancestor" for the fold: the pre
        # element itself folds with its own rule
        parent_pre = stack[-1][3] if stack else False
        folded = _fold(el, chunks, parent_pre)
        if stack:
            stack[-1][2].extend(folded)
        else:
            result = folded
    return _blocks(result)
