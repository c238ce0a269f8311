"""Minimal Prolog term reader for the reference's golden `.ok` files.

Format (reference test harness /root/reference/test_sgml.pl:184-197):
first term = DOM list, optional second term = error list.  Terms use
element/3, sdata/1, ndata/1, pi/1, entity/1, sgml/4, '='/2 infix,
quoted/unquoted atoms, integers, floats, and lists.

Parsed into the same Python structures as core.dom so DOM comparison
is direct (attribute lists compared sorted, test_sgml.pl:210-213).
"""

from .dom import Element, SData, NData, PI, Entity


class Term:
    """Generic compound term."""

    def __init__(self, functor, args):
        self.functor = functor
        self.args = args

    def __repr__(self):
        return "%s(%s)" % (self.functor, ", ".join(map(repr, self.args)))


class PrologReader:
    def __init__(self, text):
        self.s = text
        self.i = 0

    def skip_ws(self):
        s, n = self.s, len(self.s)
        while self.i < n:
            c = s[self.i]
            if c.isspace():
                self.i += 1
            elif c == '%':
                j = s.find('\n', self.i)
                self.i = n if j < 0 else j + 1
            elif s.startswith('/*', self.i):
                j = s.find('*/', self.i + 2)
                self.i = n if j < 0 else j + 2
            else:
                return

    def read_term(self):
        """Read one term followed by '.'"""
        t = self.read_expr()
        self.skip_ws()
        if self.i < len(self.s) and self.s[self.i] == '.':
            self.i += 1
        return t

    def read_expr(self):
        left = self.read_primary()
        self.skip_ws()
        if self.i < len(self.s) and self.s[self.i] == '=':
            self.i += 1
            right = self.read_expr()
            return Term('=', [left, right])
        return left

    def read_primary(self):
        self.skip_ws()
        s, n = self.s, len(self.s)
        c = s[self.i]
        if c == '[':
            return self.read_list()
        if c == "'":
            atom = self.read_quoted_atom()
            return self.maybe_compound(atom)
        if c == '"':
            return self.read_string()
        if c == '-' or c.isdigit():
            return self.read_number()
        # unquoted atom / name
        j = self.i
        while j < n and (s[j].isalnum() or s[j] == '_'):
            j += 1
        atom = s[self.i:j]
        self.i = j
        if atom == '':
            # operator-ish atom (e.g. ?, \\, etc.) until delimiter
            while j < n and s[j] not in "(),]|='\" \t\n":
                j += 1
            atom = s[self.i:j]
            self.i = j
        return self.maybe_compound(atom)

    def maybe_compound(self, functor):
        if self.i < len(self.s) and self.s[self.i] == '(':
            self.i += 1
            args = []
            while True:
                args.append(self.read_expr())
                self.skip_ws()
                if self.s[self.i] == ',':
                    self.i += 1
                    continue
                if self.s[self.i] == ')':
                    self.i += 1
                    break
            return Term(functor, args)
        return functor

    def read_list(self):
        self.i += 1  # [
        items = []
        self.skip_ws()
        if self.s[self.i] == ']':
            self.i += 1
            return items
        while True:
            items.append(self.read_expr())
            self.skip_ws()
            c = self.s[self.i]
            if c == ',':
                self.i += 1
                continue
            if c == ']':
                self.i += 1
                return items
            raise ValueError("bad list at %d: %r" % (self.i,
                                                     self.s[self.i:self.i+30]))

    def read_quoted_atom(self):
        s, n = self.s, len(self.s)
        assert s[self.i] == "'"
        self.i += 1
        out = []
        while self.i < n:
            c = s[self.i]
            if c == '\\':
                nxt = s[self.i + 1]
                if nxt == 'n':
                    out.append('\n')
                    self.i += 2
                elif nxt == 't':
                    out.append('\t')
                    self.i += 2
                elif nxt == 'r':
                    out.append('\r')
                    self.i += 2
                elif nxt == '\\':
                    out.append('\\')
                    self.i += 2
                elif nxt == "'":
                    out.append("'")
                    self.i += 2
                elif nxt == 'x':
                    j = s.find('\\', self.i + 2)
                    out.append(chr(int(s[self.i + 2:j], 16)))
                    self.i = j + 1
                elif nxt.isdigit():
                    j = s.find('\\', self.i + 1)
                    out.append(chr(int(s[self.i + 1:j], 8)))
                    self.i = j + 1
                else:
                    out.append(nxt)
                    self.i += 2
            elif c == "'":
                if self.i + 1 < n and s[self.i + 1] == "'":
                    out.append("'")
                    self.i += 2
                else:
                    self.i += 1
                    return ''.join(out)
            else:
                out.append(c)
                self.i += 1
        raise ValueError("unterminated atom")

    def read_string(self):
        s = self.s
        assert s[self.i] == '"'
        j = s.find('"', self.i + 1)
        out = s[self.i + 1:j]
        self.i = j + 1
        return out

    def read_number(self):
        s, n = self.s, len(self.s)
        j = self.i
        if s[j] == '-':
            j += 1
        while j < n and s[j].isdigit():
            j += 1
        if j < n and s[j] == '.' and j + 1 < n and s[j + 1].isdigit():
            j += 1
            while j < n and s[j].isdigit():
                j += 1
            if j < n and s[j] in 'eE':
                j += 1
                if s[j] in '+-':
                    j += 1
                while j < n and s[j].isdigit():
                    j += 1
            v = float(s[self.i:j])
        else:
            v = int(s[self.i:j])
        self.i = j
        return v


def term_to_dom(t):
    """Convert parsed term to core.dom structures."""
    if isinstance(t, Term):
        if t.functor == 'element':
            name, attrs, content = t.args
            al = []
            for a in attrs:
                if isinstance(a, Term) and a.functor == '=':
                    al.append((term_to_dom(a.args[0]), term_to_dom(a.args[1])))
            return Element(term_to_dom(name), al,
                           [term_to_dom(c) for c in content])
        if t.functor == 'sdata':
            return SData(term_to_dom(t.args[0]))
        if t.functor == 'ndata':
            return NData(term_to_dom(t.args[0]))
        if t.functor == 'pi':
            return PI(term_to_dom(t.args[0]))
        if t.functor == 'entity':
            return Entity(term_to_dom(t.args[0]))
        if t.functor == ':':  # ns:local names
            return "%s:%s" % (term_to_dom(t.args[0]), term_to_dom(t.args[1]))
        return t
    if isinstance(t, list):
        return [term_to_dom(x) for x in t]
    return t


def read_ok_file(path):
    """Returns (dom_list, error_list) where error_list is
    [(line, message)] from sgml/4 terms."""
    with open(path, encoding='utf-8') as f:
        text = f.read()
    r = PrologReader(text)
    dom_term = r.read_term()
    r.skip_ws()
    errors = []
    if r.i < len(r.s):
        try:
            err_term = r.read_term()
        except (ValueError, IndexError, AssertionError):
            err_term = []
        if isinstance(err_term, list):
            for e in err_term:
                if isinstance(e, Term) and e.functor == 'sgml':
                    errors.append((e.args[2], e.args[3]))
    return term_to_dom(dom_term), errors
