"""SAX-style callback parsing (reference entry point B,
SURVEY.md §3: sgml_parse/2 with call(...) callbacks,
sgml2pl.c:1910-1960) including the re-entrant sub-document capture
used by the reference's callback test (test_sgml.pl:225-254: a
`begin` callback materialises just that element's content).
"""

from .dom import Element, SData, NData, PI
from .parser import SGMLParser


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

    def __init__(self, options=None, on_begin=None, on_end=None,
                 on_data=None, on_pi=None):
        super().__init__(options)
        self._cb_begin = on_begin
        self._cb_end = on_end
        self._cb_data = on_data
        self._cb_pi = on_pi
        self._depth = 0
        self._captures = []     # (start_depth, content_list, stack, done)

    # -- capture machinery -------------------------------------------------

    def capture_content(self, done):
        """Begin capturing the content of the element whose begin
        event is currently being delivered."""
        self._captures.append((self._depth, [], [], done))

    def _cap_add(self, node):
        if self._captures:
            _d, content, stack, _done = self._captures[-1]
            (stack[-1].content if stack else content).append(node)

    # -- event plumbing ----------------------------------------------------

    def ev_begin(self, name, attrs):
        self._depth += 1
        if self._captures:
            el = Element(name, attrs, [])
            self._cap_add(el)
            self._captures[-1][2].append(el)
        if self._cb_begin:
            self._cb_begin(name, attrs, self)

    def ev_end(self, name):
        if self._captures:
            d, content, stack, done = self._captures[-1]
            if stack:
                stack.pop()
            if self._depth == d:
                self._captures.pop()
                done(content)
        self._depth -= 1
        if self._cb_end:
            self._cb_end(name, self)

    def ev_data(self, kind, text):
        if self._captures:
            node = (text if kind == "cdata" else
                    SData(text) if kind == "sdata" else NData(text))
            self._cap_add(node)
        if self._cb_data:
            self._cb_data(kind, text, self)

    def ev_pi(self, text):
        if self._captures:
            self._cap_add(PI(text))
        if self._cb_pi:
            self._cb_pi(text, self)
