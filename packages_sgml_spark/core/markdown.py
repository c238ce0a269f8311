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
Chunks are bare strings for INLINE text (the overwhelmingly common
kind — no tuple per text event) and ("b", text) block / ("li", text)
list-item / ("cell", text) tagged tuples; each element folds its
children's chunks into its own.  Whitespace collapses at inline-merge time so <pre> can opt out.
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
    if len(chunks) == 1 and type(chunks[0]) is str:
        s = chunks[0]               # "".join of one part is itself
    else:
        parts = []
        for c in chunks:
            parts.append(c if type(c) is str
                         else "\n" + c[1] + "\n")
        s = "".join(parts)
    if collapse:
        s = _collapse(s).replace(_BR, "\n")
    return s


def _attr(attrs, name):
    for k, v in attrs:
        if k == name:
            return v if isinstance(v, str) else str(v)
    return None


def _indent(text, pad):
    lines = text.split("\n")
    return "\n".join([lines[0]] + [(pad + l) if l else l
                                   for l in lines[1:]])


_NAME_FOLD = {}


def _fold_name(raw):
    """Element name -> the markdown dispatch key: str()-coerced,
    xmlns/QName prefix stripped, lowercased.  Memoized for str names
    (tag names repeat heavily; bounded so a pathological corpus of
    unique names can't pin memory)."""
    r = _NAME_FOLD.get(raw) if type(raw) is str else None
    if r is None:
        name = raw if isinstance(raw, str) else str(raw)
        r = name.rsplit(":", 1)[-1].lower()
        if type(raw) is str and len(_NAME_FOLD) < 8192:
            _NAME_FOLD[raw] = r
    return r


# every name with a non-transparent fold rule: ev_end/_drain_tape
# skip the _fold call entirely for transparent containers (div,
# span, body, ... — the common case)
_SPECIAL = (frozenset(_H) | frozenset(_WRAP) |
            frozenset(("p", "a", "img", "br", "hr", "code", "pre",
                       "blockquote", "li", "ul", "ol", "td", "th",
                       "tr")))
# fold rules that read the element's attributes
_WANT_ATTRS = frozenset(("a", "img"))


def _fold(name, attrs, chunks, in_pre=False):
    """Element (pre-folded name + attr pairs) + its children's chunks
    -> the chunks it hands up.  Takes plain (name, attrs) rather than
    an Element so the event-sink renderer (MarkdownParser) and the
    DOM walker (dom_to_markdown) share one fold."""
    if in_pre and name != "pre":
        # verbatim context: markup inside <pre> contributes raw text,
        # but line STRUCTURE must survive — syntax-highlighted code
        # viewers emit div-per-line or br-separated pre blocks
        if name == "br":
            return ["\n"]
        if name in _PRE_LINE:
            return chunks + ["\n"]
        return chunks
    if name in _H:
        return [("b", "#" * _H[name] + " " + _merge_inline(chunks))]
    if name == "p":
        # soup DOMs can nest block children under p (the engine's
        # DTD decides; golden-gated) — keep them as separate blocks
        t = _blocks(chunks)
        return [("b", t)] if t else []
    if name in _WRAP:
        if len(chunks) == 1 and type(chunks[0]) is str:
            t = _collapse(chunks[0]).replace(_BR, "\n")
        else:
            t = _merge_inline(chunks)
        return [_WRAP[name] + t + _WRAP[name]] if t else []
    if name == "a":
        if len(chunks) == 1 and type(chunks[0]) is str:
            t = _collapse(chunks[0]).replace(_BR, "\n")
        else:
            t = _merge_inline(chunks)
        href = _attr(attrs, "href")
        if not t:
            t = href or ""
        return ["[%s](%s)" % (t, href) if href else t]
    if name == "img":
        return ["![%s](%s)" % (_attr(attrs, "alt") or "",
                               _attr(attrs, "src") or "")]
    if name == "br":
        return [_BR]
    if name == "hr":
        return [("b", "---")]
    if name == "code":
        t = _merge_inline(chunks)
        return ["`%s`" % t] if t else []
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
        for c in chunks:
            if type(c) is str or c[0] != "li":
                continue
            n += 1
            mark = "- " if name == "ul" else "%d. " % n
            out.append(mark + _indent(c[1], " " * len(mark)))
        return [("b", "\n".join(out))] if out else []
    if name in ("td", "th"):
        return [("cell", _merge_inline(chunks))]
    if name == "tr":
        cells = [c[1] for c in chunks
                 if type(c) is not str and c[0] == "cell"]
        return [("b", " | ".join(cells))] if cells else \
            [c for c in chunks
             if type(c) is str or c[0] != "cell"]
    # everything else: transparent container
    return chunks


def _blocks(chunks):
    """Container fold: inline runs become their own paragraphs,
    blocks separate with blank lines."""
    if len(chunks) == 1:
        c = chunks[0]
        return _merge_inline(chunks) if type(c) is str else c[1]
    for c in chunks:
        if type(c) is not str:
            break
    else:
        # all-inline (the common paragraph shape): one run, one merge
        return _merge_inline(chunks)
    out, run = [], []
    for c in chunks:
        if type(c) is str:
            run.append(c)
            continue
        lead = _merge_inline(run)
        run = []
        if lead:
            out.append(lead)
        if c[1]:
            out.append(c[1])
    tail = _merge_inline(run)
    if tail:
        out.append(tail)
    return "\n\n".join(out)


def dom_to_markdown(dom) -> str:
    """Render an extract() DOM (Element) to markdown text."""
    if not isinstance(dom, Element):
        t = _text_of(dom)
        return _collapse(t) if t else ""
    root_name = _fold_name(dom.name)
    stack = [(dom, root_name, iter(dom.content), [],
              root_name == "pre")]
    result = []
    while stack:
        el, fname, it, chunks, in_pre = stack[-1]
        advanced = False
        for child in it:
            t = _text_of(child)
            if t is not None:
                if t:
                    chunks.append(t)
                continue
            if isinstance(child, PI):
                continue
            if isinstance(child, Element):
                cname = _fold_name(child.name)
                if cname in _SKIP:
                    continue
                stack.append((child, cname, iter(child.content), [],
                              in_pre or cname == "pre"))
                advanced = True
                break
        if advanced:
            continue
        stack.pop()
        # in_pre means "inside a pre ancestor" for the fold: the pre
        # element itself folds with its own rule
        parent_pre = stack[-1][4] if stack else False
        folded = _fold(fname, el.attrs, chunks, parent_pre)
        if stack:
            stack[-1][3].extend(folded)
        else:
            result = folded
    return _blocks(result)


# ---------------------------------------------------------------------
# event-sink renderer (r8): markdown straight from parse events
# ---------------------------------------------------------------------

from .parser import SGMLParser  # noqa: E402  (parser does not import us)

# compiled fold drain (md_drain in _cspeed.c) — resolved lazily so a
# build failure degrades to the Python loop; C_MD_DRAIN is the test
# kill switch (SGML_FAST_C=0 already kills the whole C module, which
# also kills tape mode itself)
C_MD_DRAIN = True
_C_MD = None


def _c_md_drain():
    global _C_MD
    if _C_MD is None:
        from .cspeed import MOD
        _C_MD = (getattr(MOD, "md_drain", None)
                 if MOD is not None else False)
    return _C_MD or None


class MarkdownParser(SGMLParser):
    """Markdown extraction fast path: folds begin/data/end events into
    markdown chunks directly — no Element DOM, no post-hoc walk — the
    same trick TextOnlyParser plays for plain text.  Rendering rules
    are the SAME _fold/_blocks functions dom_to_markdown uses, driven
    by a frame stack mirroring the walker exactly, so the output is
    byte-identical (differential-pytested across the reference golden
    corpus + soup fuzz in tests/test_markdown.py).  A pure event
    consumer, so parses ride the compiled executor's tape mode."""

    def __init__(self, options=None, dtd=None):
        super().__init__(options, dtd)
        self._frames = []    # [fname, attrs, chunks, in_pre]
        self._mds = []       # rendered markdown, one per DOM root
        self._skip = 0       # depth inside a script/style/... subtree

    def ev_begin(self, name, attrs):
        if self._skip:
            self._skip += 1
            return
        fname = _fold_name(name)
        frames = self._frames
        # the walker only skips _SKIP elements encountered as
        # CHILDREN; a top-level script/style root still renders as a
        # transparent container (mirrored here: frames must be
        # non-empty for the skip to engage)
        if frames and fname in _SKIP:
            self._skip = 1
            return
        in_pre = ((frames[-1][3] if frames else False) or
                  fname == "pre")
        frames.append([fname, attrs, [], in_pre])

    def ev_end(self, name):
        if self._skip:
            self._skip -= 1
            return
        frames = self._frames
        fname, attrs, chunks, _in_pre = frames.pop()
        # the element folds under its PARENT's pre-ness (the pre
        # element itself folds with its own rule) — walker parity
        parent_pre = frames[-1][3] if frames else False
        if parent_pre or fname in _SPECIAL:
            folded = _fold(fname, attrs, chunks, parent_pre)
        else:
            folded = chunks       # transparent container fast path
        if frames:
            frames[-1][2].extend(folded)
        else:
            md = _blocks(folded)
            if md:
                self._mds.append(md)
            if self.options.stop_at == "element":
                self.stopped = True

    def ev_data(self, kind, text):
        if self._skip:
            return
        frames = self._frames
        if frames:
            if text:
                frames[-1][2].append(text)
        else:
            # top-level character data renders as its own collapsed
            # block (dom_to_markdown on a non-Element root)
            md = _collapse(text)
            if md:
                self._mds.append(md)

    def ev_pi(self, text):
        pass

    def markdown(self):
        return "\n\n".join(self._mds)

    def _drain_tape(self, ns_snap=None):
        """Dispatch: compiled fold drain when the C module carries it
        (md_drain in _cspeed.c — the same loop and fold rules in C,
        operating on the SAME Python frame/chunk/memo structures so
        Python ev_* events interleave freely), else the pure-Python
        loop below.  C_MD_DRAIN=False forces Python (differential
        tests); byte-parity is pinned by tests/test_markdown.py."""
        fn = _c_md_drain() if C_MD_DRAIN else None
        if fn is None:
            return self._drain_tape_py(ns_snap)
        cache = getattr(self.dtd, "_md_fold_cache", None)
        if cache is None:
            cache = self.dtd._md_fold_cache = ({}, [])
        # id(attr def) -> name memo for md_drain's in-C CDATA
        # convert_attributes fast path (complex types fall back to
        # the Python callable); keep-alive list pins the defs
        acache = getattr(self.dtd, "_md_att_cache", None)
        if acache is None:
            acache = self.dtd._md_att_cache = ({}, [])
        tape = self._c_tape
        # skip_box: md_drain publishes the skip depth at every change
        # so an exception mid-tape (convert callback, OOM) leaves
        # self._skip consistent with the frames it already mutated —
        # same guarantee as the Python loop's finally writeback
        box = [self._skip]
        try:
            box[0] = fn(tape, self._frames, self._mds,
                        self._skip, self.convert_attributes,
                        cache[0], cache[1], box,
                        acache[0], acache[1])
        finally:
            self._skip = box[0]
            del tape[:]

    def _drain_tape_py(self, ns_snap=None, _fold=_fold,
                       _fold_name=_fold_name, _blocks=_blocks,
                       _collapse=_collapse, _SKIP=_SKIP,
                       _SPECIAL=_SPECIAL, _WANT_ATTRS=_WANT_ATTRS):
        # keyword defaults bind the fold helpers as locals: the loop
        # below runs once per parse event on the crawl hot path
        """Markdown tape drain: one tight loop folding tape events
        straight into the frame stack — no position save/restore (the
        fold never reads spans), no _emit_begin (no elem_spans, no
        xmlns resolution: the fold strips everything up to the last
        ':' so raw and resolved names have the same local part, and
        unprefixed attrs never resolve with qualify_attributes off),
        and attribute conversion only for the two fold rules that
        read attributes (a/img — which are EMPTY-model in HTML and
        arrive via the Python begin path anyway; the conversion here
        covers non-EMPTY DTDs).  ns_snap is accepted and ignored for
        that reason.  Byte-parity with the generic drain is pinned by
        the differential tests (goldens + fuzz + dialects)."""
        tape = self._c_tape
        frames = self._frames
        mds = self._mds
        skip = self._skip
        convert = self.convert_attributes
        # per-DTD def->fold-name memo; def_keep pins the defs so a
        # GC'd def's id can never be reused by a different object
        cache = getattr(self.dtd, "_md_fold_cache", None)
        if cache is None:
            cache = self.dtd._md_fold_cache = ({}, [])
        def_fold, def_keep = cache
        try:
            for ev in tape:
                k = ev[0]
                if k == "d":
                    if skip:
                        continue
                    s = ev[1]
                    if frames:
                        if s:
                            frames[-1][2].append(s)
                    elif s:
                        md = _collapse(s)
                        if md:
                            mds.append(md)
                elif k == "b":
                    if skip:
                        skip += 1
                        continue
                    entry = ev[1]
                    e = entry[1]
                    fname = def_fold.get(id(e))
                    if fname is None:
                        fname = _fold_name(e.name)
                        if len(def_fold) < 4096:
                            def_fold[id(e)] = fname
                            def_keep.append(e)
                    if frames:
                        if fname in _SKIP:
                            skip = 1
                            continue
                        in_pre = frames[-1][3] or fname == "pre"
                    else:
                        in_pre = fname == "pre"
                    atts = entry[2]
                    frames.append([
                        fname,
                        convert(atts) if (atts and
                                          fname in _WANT_ATTRS) else (),
                        [], in_pre])
                else:
                    if skip:
                        skip -= 1
                        continue
                    fname, attrs, chunks, _in_pre = frames.pop()
                    parent_pre = frames[-1][3] if frames else False
                    if parent_pre or fname in _SPECIAL:
                        folded = _fold(fname, attrs, chunks,
                                       parent_pre)
                    else:
                        folded = chunks
                    if frames:
                        frames[-1][2].extend(folded)
                    else:
                        md = _blocks(folded)
                        if md:
                            mds.append(md)
        finally:
            self._skip = skip
            del tape[:]
