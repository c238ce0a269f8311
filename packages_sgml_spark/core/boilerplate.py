"""Main-content extraction: HTML boilerplate stripping via DOM
heuristics (north rule: 'main-content extraction pipeline — HTML
boilerplate strip, DOM heuristics').

A jusText/Readability-style block classifier over the parsed DOM:

1. Prune non-content subtrees outright (script/style/nav/header/
   footer/aside/form/iframe/button/select + aria/role hints).
2. Flatten the remainder into text blocks at paragraph-ish
   boundaries (p, h1-h6, li, td, blockquote, pre, div-leaves).
3. Score each block: word count, link density (chars of text inside
   <a> / total chars), stopword-free ratio.  Keep blocks that are
   long enough and not link-dominated; short blocks survive only
   when adjacent to kept blocks (headline rescue).

Pure-Python over the DOM (runs inside the extraction UDF); no
network, no models — deterministic and cheap.
"""

from .dom import Element, SData, NData

PRUNE_TAGS = frozenset(
    "script style noscript template nav header footer aside form iframe "
    "button select option svg canvas object embed applet map area "
    "menu dialog".split())

BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li dt dd td th blockquote pre figcaption "
    "summary article section div body main".split())

HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6 summary dt".split())

_PRUNE_ROLES = frozenset(("navigation", "banner", "contentinfo",
                          "complementary", "search"))


def _tagname(el):
    n = el.name
    return n if isinstance(n, str) else getattr(n, "local", str(n))


def _pruned(el):
    tag = _tagname(el)
    if tag in PRUNE_TAGS:
        return True
    for k, v in el.attrs:
        if k == "role" and str(v).lower() in _PRUNE_ROLES:
            return True
        if k == "hidden" or (k == "aria-hidden" and str(v) == "true"):
            return True
    return False


class Block:
    __slots__ = ("texts", "link_chars", "tag")

    def __init__(self, tag):
        self.texts = []
        self.link_chars = 0
        self.tag = tag

    def text(self):
        return "".join(self.texts)


def collect_blocks(dom):
    """DOM -> list of Blocks in document order (iterative: crawl
    soup nests arbitrarily deep)."""
    blocks = []
    stack = [(n, None, False) for n in reversed(dom)]
    while stack:
        n, block, in_link = stack.pop()
        if isinstance(n, str):
            if block is not None:
                block.texts.append(n)
                if in_link:
                    block.link_chars += len(n)
            continue
        if isinstance(n, (SData, NData)):
            if block is not None:
                block.texts.append(n.text)
            continue
        if not isinstance(n, Element) or _pruned(n):
            continue
        tag = _tagname(n)
        link = in_link or tag == "a"
        if tag in BLOCK_TAGS:
            nb = Block(tag)
            blocks.append(nb)
            for c in reversed(n.content):
                stack.append((c, nb, link))
        else:
            for c in reversed(n.content):
                stack.append((c, block, link))
    return [b for b in blocks if b.text().strip()]


def score_block(b, min_words=3, max_link_density=0.4):
    """True if the block is content (not boilerplate)."""
    text = b.text()
    n_chars = len(text)
    words = text.split()
    if not words:
        return False
    link_density = b.link_chars / n_chars if n_chars else 1.0
    if link_density > max_link_density:
        return False
    if len(words) < min_words and b.tag not in HEADING_TAGS:
        return False
    return True


def main_content(dom, min_words=3, max_link_density=0.4,
                 separator="\n") -> str:
    """Extract main-content text from a parsed DOM."""
    blocks = collect_blocks(dom)
    kept = []
    flags = [score_block(b, min_words, max_link_density)
             for b in blocks]
    # headline rescue: short headings adjacent to kept content stay
    for i, b in enumerate(blocks):
        if flags[i]:
            kept.append(b)
        elif (b.tag in HEADING_TAGS and
              i + 1 < len(blocks) and flags[i + 1]):
            kept.append(b)
    return separator.join(b.text().strip() for b in kept)
