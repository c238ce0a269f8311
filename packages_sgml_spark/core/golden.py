"""Golden-corpus harness: parse /root/reference/Test files and compare
against Test/ok/*.ok, mirroring the reference test driver
(/root/reference/test_sgml.pl:53-217).

Loader selection by extension (test_sgml.pl:173-175): .sgml->sgml
dialect, .xml->xml dialect; all with encoding('utf-8')
(test_sgml.pl:168-171).  DOM compare is structural with attribute
lists compared order-insensitively (test_sgml.pl:199-213); error
compare is (line, message) pairwise (test_sgml.pl:153-156).
"""

import os

from .dom import Element, SData, NData, PI, Entity
from .parser import SGMLParser, ParserOptions
from .prolog import read_ok_file

TEST_DIR = "/root/reference/Test"


def make_resolver(base_dir):
    """Resolve SYSTEM entity urls relative to the test directory
    (catalog analog; only used for DTD/*.ent fixtures)."""

    def resolver(entity):
        url = entity.exturl
        if not url:
            return None
        path = os.path.normpath(os.path.join(base_dir, url))
        # never read outside the reference tree
        if not os.path.isfile(path):
            return None
        with open(path, 'rb') as f:
            return f.read()

    return resolver


def parse_test_file(path):
    ext = path.rsplit('.', 1)[-1]
    dialect = {"sgml": "sgml", "xml": "xml", "html": "html"}[ext]
    opts = ParserOptions(dialect=dialect, encoding="utf-8",
                         file=os.path.basename(path),
                         resolver=make_resolver(os.path.dirname(path)))
    if dialect == "html":
        opts.max_errors = -1
        opts.quiet = True
    p = SGMLParser(opts)
    with open(path, 'rb') as f:
        data = f.read()
    dom, errors = p.parse(data)
    return dom, [(e.line, e.message) for e in errors]


def compare_dom(a, b, path="dom"):
    """Returns None if equal, else a string describing first diff."""
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return "%s: length %d != %d (%r vs %r)" % (
                path, len(a), len(b), _short(a), _short(b))
        for i, (x, y) in enumerate(zip(a, b)):
            r = compare_dom(x, y, "%s[%d]" % (path, i))
            if r:
                return r
        return None
    if isinstance(a, Element) and isinstance(b, Element):
        if a.name != b.name:
            return "%s: name %r != %r" % (path, a.name, b.name)
        if _attr_key(a.attrs) != _attr_key(b.attrs):
            return "%s<%s>: attrs %r != %r" % (path, a.name, a.attrs, b.attrs)
        return compare_dom(a.content, b.content, "%s<%s>" % (path, a.name))
    for cls in (SData, NData, PI, Entity):
        if isinstance(a, cls) or isinstance(b, cls):
            if type(a) is not type(b):
                return "%s: type %r != %r" % (path, a, b)
            va = a.text if hasattr(a, 'text') else a.name
            vb = b.text if hasattr(b, 'text') else b.name
            if va != vb:
                return "%s: %r != %r" % (path, a, b)
            return None
    if a != b:
        return "%s: %r != %r" % (path, _short(a), _short(b))
    return None


def _attr_key(attrs):
    return sorted((k, repr(v)) for k, v in attrs)


def _short(x):
    r = repr(x)
    return r if len(r) < 120 else r[:120] + "..."


def run_one(base):
    """Run one golden test; returns (ok: bool, detail: str)."""
    for ext in ("sgml", "xml", "html"):
        path = os.path.join(TEST_DIR, base + "." + ext)
        if os.path.isfile(path):
            break
    else:
        return False, "no input file"
    okfile = os.path.join(TEST_DIR, "ok", base + ".ok")
    if not os.path.isfile(okfile):
        return False, "no ok file"
    want_dom, want_errors = read_ok_file(okfile)
    got_dom, got_errors = parse_test_file(path)
    diff = compare_dom(got_dom, want_dom)
    if diff:
        return False, "DOM: " + diff
    if len(want_errors) != len(got_errors) or any(
            (gl != wl or gm != wm)
            for (gl, gm), (wl, wm) in zip(got_errors, want_errors)):
        return False, "errors: got %r want %r" % (got_errors, want_errors)
    return True, "ok"


def all_bases():
    bases = []
    for f in sorted(os.listdir(TEST_DIR)):
        if f.endswith((".sgml", ".xml", ".html")):
            base = f.rsplit('.', 1)[0]
            if os.path.isfile(os.path.join(TEST_DIR, "ok", base + ".ok")):
                bases.append(base)
    return bases


def run_all(verbose=True):
    results = {}
    for base in all_bases():
        try:
            ok, detail = run_one(base)
        except Exception as ex:        # noqa: BLE001 - harness report
            ok, detail = False, "EXC %s: %s" % (type(ex).__name__, ex)
        results[base] = (ok, detail)
        if verbose:
            print("%-12s %s %s" % (base, "PASS" if ok else "FAIL",
                                   "" if ok else detail[:160]))
    npass = sum(1 for ok, _ in results.values() if ok)
    if verbose:
        print("== %d/%d pass" % (npass, len(results)))
    return results


if __name__ == "__main__":
    run_all()
