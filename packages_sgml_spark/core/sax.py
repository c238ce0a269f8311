"""SAX-style callback parsing (reference entry point B,
SURVEY.md §3: sgml_parse/2 with call(...) callbacks,
sgml2pl.c:1910-1960) including the re-entrant sub-document capture
used by the reference's callback test (test_sgml.pl:225-254: a
`begin` callback materialises just that element's content).
"""

from .dom import Element, SData, NData, PI
from .parser import SGMLParser


class IncompleteContentError(RuntimeError):
    """parse_content() was called from a feed()-mode parse and the
    element's content is not yet fully buffered.  The sub-parse has
    already consumed the buffered prefix, so the parser cannot be
    resumed meaningfully — callers that cannot guarantee the content
    is buffered should use capture_content() (asynchronous, works
    across arbitrary chunk boundaries) instead."""


class CallbackParser(SGMLParser):
    """Event-callback parser.  Callbacks:

        on_begin(name, attrs, parser)
        on_end(name, parser)
        on_data(kind, text, parser)     kind: cdata|sdata|ndata
        on_pi(text, parser)

    From inside on_begin, call parser.capture_content(done) to
    materialise the current element's content as a DOM list; `done`
    is invoked with the content when the element closes (the
    parse(content) re-entrancy analog)."""

    _retain_feed = True     # keep fed text so parse_content() works
                            # from push parsing (see SGMLParser.feed)
    _TAPE_SINKS = False     # user callbacks may re-enter the parser
                            # (capture_content / parse_content), so
                            # events must fire at tokenization time —
                            # no compiled-executor tape mode here

    def __init__(self, options=None, on_begin=None, on_end=None,
                 on_data=None, on_pi=None):
        super().__init__(options)
        self._cb_begin = on_begin
        self._cb_end = on_end
        self._cb_data = on_data
        self._cb_pi = on_pi
        self._depth = 0
        self._captures = []     # active _Capture list (innermost last)

    # -- capture machinery -------------------------------------------------

    class _Capture:
        __slots__ = ("depth", "content", "stack", "done")

        def __init__(self, depth, done):
            self.depth = depth
            self.content = []
            self.stack = []
            self.done = done

    def capture_content(self, done):
        """Begin capturing the content of the element whose begin
        event is currently being delivered.  Captures nest: each
        active capture maintains its own independent tree."""
        self._captures.append(self._Capture(self._depth, done))

    def parse_content(self):
        """True re-entrant sub-parse — the analog of calling
        sgml_parse(Parser, [document(D), parse(content)]) from inside
        a begin callback (sgml2pl.c:1981-2012 closure swap +
        SA_CONTENT stop, test_sgml.pl:249-254).

        Re-enters the tokenizer on the unconsumed document buffer,
        routing events to a fresh DOM builder (outer callbacks are
        suspended, as the reference's closure swap does) until the
        current element's content closes; returns the content list
        SYNCHRONOUSLY from within the callback.  The suspended outer
        scan loop then skips the consumed span and resumes after the
        element's end tag.  Sub-parses nest.

        Available inside a whole-buffer parse() and — since the
        parser retains fed text (buffer-retention mode) — inside an
        incremental feed() as well, PROVIDED the element's complete
        content has already been fed.  If it has not, the sub-parse
        runs off the buffered tail and IncompleteContentError is
        raised; that state is not resumable (use capture_content for
        chunk-boundary-proof streaming capture)."""
        if self._emitting_empty:
            # <e/> / EMPTY content model: nothing to consume
            # (sgml2pl.c:2148 `stopat == SA_CONTENT && empty_element`)
            return []
        if self._ent_frames:
            # inside an entity expansion: consume from the innermost
            # replacement text (the reference's input-stack pull,
            # sgml2pl.c:1981-2012 — entity text is just the top of
            # its input stack).  charpos was reset to 0 for this
            # frame and tracks the frame index exactly.
            return self._parse_content_in_entity()
        if self._doc_text is None:
            raise RuntimeError(
                "parse_content requires a whole-buffer parse() or a "
                "retained feed() buffer")
        if self._locstack or self._entity_startloc:
            # charpos points into pushed subset replacement text, not
            # into the document buffer, so the re-entrant slice would
            # be garbage.  Refuse loudly; the async capture_content
            # API still works here.
            raise RuntimeError(
                "parse_content is not available from inside a DTD "
                "subset replay; use capture_content()")
        completed = []
        cap = self._Capture(
            self._depth,
            lambda _content: (completed.append(True),
                              setattr(self, "stopped", True)))
        self._captures.append(cap)
        saved = (self._cb_begin, self._cb_end, self._cb_data,
                 self._cb_pi)
        self._cb_begin = self._cb_end = self._cb_data = self._cb_pi = None
        start = self.charpos - self._doc_base
        try:
            self.process_chars_toplevel(self._doc_text[start:])
        finally:
            (self._cb_begin, self._cb_end, self._cb_data,
             self._cb_pi) = saved
            self.stopped = False
        if self._feed_mode and not completed:
            raise IncompleteContentError(
                "parse_content: element content not fully fed yet "
                "(the buffered prefix has been consumed; this parse "
                "cannot be resumed — use capture_content())")
        consumed = (self.charpos - self._doc_base) - start
        self._pending_skip += consumed
        return cap.content

    def _parse_content_in_entity(self):
        """Re-entrant sub-parse while expanding an EC_SGML entity:
        consume the rest of the innermost replacement text until the
        current element's content closes, then advance the expansion
        frame past the consumed span.  Content that is not closed
        within this replacement text (it would have to continue in an
        outer source) raises IncompleteContentError — same contract
        as the not-yet-fed case in feed() mode."""
        text, frame, subdepth = self._ent_frames[-1]
        completed = []

        def done(_content):
            completed.append(True)
            self.stopped = True

        cap = self._Capture(self._depth, done)
        self._captures.append(cap)
        saved = (self._cb_begin, self._cb_end, self._cb_data,
                 self._cb_pi)
        self._cb_begin = self._cb_end = self._cb_data = self._cb_pi = None
        start = self.charpos            # == chars consumed this frame
        outermost = subdepth[0] == 0
        subdepth[0] += 1
        try:
            self.process_chars_toplevel(text[start:])
        finally:
            subdepth[0] -= 1
            (self._cb_begin, self._cb_end, self._cb_data,
             self._cb_pi) = saved
            self.stopped = False
        if not completed:
            raise IncompleteContentError(
                "parse_content: element content does not close inside "
                "this entity expansion (the expanded prefix has been "
                "consumed; use capture_content())")
        if outermost:
            # the per-char expansion loop resumes from the frame index
            frame[0] = self.charpos
        else:
            # nested inside another sub-parse over this same frame:
            # that sub-parse's scan loop consumes the skip instead
            self._pending_skip += self.charpos - start
        return cap.content

    def _cap_nodes(self, make_node):
        for cap in self._captures:
            node = make_node()
            (cap.stack[-1].content if cap.stack
             else cap.content).append(node)

    # -- event plumbing ----------------------------------------------------

    def ev_begin(self, name, attrs):
        self._depth += 1
        for cap in self._captures:
            el = Element(name, attrs, [])
            (cap.stack[-1].content if cap.stack
             else cap.content).append(el)
            cap.stack.append(el)
        if self._cb_begin:
            self._cb_begin(name, attrs, self)

    def ev_end(self, name):
        for cap in self._captures:
            if cap.stack:
                cap.stack.pop()
        while self._captures and self._captures[-1].depth == self._depth:
            cap = self._captures.pop()
            cap.done(cap.content)
        self._depth -= 1
        if self._cb_end:
            self._cb_end(name, self)

    def ev_data(self, kind, text):
        if self._captures:
            self._cap_nodes(lambda: text if kind == "cdata" else
                            SData(text) if kind == "sdata"
                            else NData(text))
        if self._cb_data:
            self._cb_data(kind, text, self)

    def ev_pi(self, text):
        if self._captures:
            self._cap_nodes(lambda: PI(text))
        if self._cb_pi:
            self._cb_pi(text, self)
