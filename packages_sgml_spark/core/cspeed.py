"""Loader/glue for the compiled steady-state PCDATA executor.

`_cspeed.c` is compiled on demand with the system gcc into a
per-source-hash shared object under the user cache dir, then loaded
as the `_sgml_cspeed` extension module.  Pure-Python remains the
always-on fallback: any build/import failure leaves `MOD` as None and
the parser silently uses `_pcdata_fast` (parser.py).  The env var
SGML_FAST_C=0 is the kill switch (differential-testing oracle, same
pattern as parser.FAST_PCDATA).

Worker story (Spark): local-mode workers share this filesystem, so
the first worker to import pays the one-time gcc compile (file-locked)
and the rest dlopen the cached .so.  On a multi-node cluster, ship a
prebuilt artifact or let each node lazily build; correctness never
depends on the .so being present.
"""

import hashlib
import importlib.util
import os
import subprocess
import sys
import sysconfig

FAST_C = os.environ.get("SGML_FAST_C", "1") != "0"

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_cspeed.c")

MOD = None
_BUILD_ERR = None


def _read_source():
    """Read _cspeed.c whether the package lives on disk or inside an
    addPyFile zip (Spark workers import from the shipped archive)."""
    try:
        with open(_SRC, "rb") as f:
            return f.read()
    except OSError:
        import importlib.resources as res
        return (res.files("packages_sgml_spark.core")
                .joinpath("_cspeed.c").read_bytes())


def _build_and_load():
    """Compile (once per source hash) and import the extension."""
    src = _read_source()
    tag = hashlib.sha256(src + sys.version.encode()).hexdigest()[:16]
    cache = os.environ.get("SGML_CSPEED_DIR") or os.path.join(
        os.environ.get("XDG_CACHE_HOME") or
        os.path.join(os.path.expanduser("~"), ".cache"),
        "sgml_cspeed")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "_sgml_cspeed_%s.so" % tag)
    if not os.path.exists(so_path):
        lock = so_path + ".lock"
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            holder = True
        except FileExistsError:
            holder = False
        if holder:
            try:
                inc = sysconfig.get_paths()["include"]
                csrc = os.path.join(cache, "_cspeed_%s.c" % tag)
                with open(csrc, "wb") as f:
                    f.write(src)
                tmp = so_path + ".tmp.%d" % os.getpid()
                subprocess.run(
                    ["gcc", "-O2", "-fPIC", "-shared", "-I", inc,
                     csrc, "-o", tmp],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so_path)
            finally:
                os.unlink(lock)
        else:
            # someone else is building: wait briefly for the artifact
            import time
            for _ in range(300):
                if os.path.exists(so_path):
                    break
                time.sleep(0.1)
            if not os.path.exists(so_path):
                raise RuntimeError("cspeed build lock timeout")
    spec = importlib.util.spec_from_file_location("_sgml_cspeed", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


if FAST_C:
    try:
        MOD = _build_and_load()
    except Exception as ex:     # noqa: BLE001 - fallback is pure Python
        _BUILD_ERR = ex
        MOD = None


_CTX = {}      # id(dtd) -> (dtd, ctx)  (dtd kept alive deliberately;
               # insertion-ordered for LRU eviction)
_CTX_CAP = 8   # shared dialect DTDs stay hot; per-document DTDs
               # (fresh xml/xmlns parses) must not accumulate one
               # registry each across a long-lived worker's millions
               # of documents


from . import dtd as D   # module-level: _space_flag runs per C tag
from . import errors as E  # ParseError/WARNING for C-side gripe replay
                         # registration (a local import there showed
                         # up in unique-attr-corpus profiles)


def _space_flag(entry, dtd=None):
    """Precompute update_space_mode's outcome for a memoized begin
    tag (parser.update_space_mode is deterministic per entry: the
    atts list and the element's declared space mode are fixed until
    the next declaration, which bumps the DTD's _omit_gen and
    flushes its C registries).  Returns:
      -1  no-op (no xml:space attr, element inherits space)
      -2  must bail to Python (invalid xml:space value -> gripe)
      >=0 the space mode to install on the pushed environment

    For the xmlns dialect (r6) the same -2 bail also gates namespace
    safety: binding-carrying tags (xmlns attrs) must go through
    Python so bindings land on real environments, and prefixed
    names/attrs must go through Python because their resolution can
    gripe or define implicit prefixes (xmlns.c:210-266) — the C
    replay does neither.
    """
    if entry[0] != "b":
        return -1
    e, atts = entry[1], entry[2]
    if dtd is not None and dtd.dialect == D.DL_XMLNS:
        if ':' in e.name:
            return -2
        for a, _v in atts:
            nm = a.name
            if nm == "xmlns" or ':' in nm:
                return -2
    for a, v in atts:
        if (a.name == "xml:space" and a.type == D.AT_CDATA and
                isinstance(v, str)):
            m = D.SPACE_MODE_NAMES.get(v)
            return -2 if m is None else m
    if e.space_mode != D.SP_INHERIT:
        return e.space_mode
    return -1


def ctx_for(dtd):
    """Per-DTD executor context (registries + callback table)."""
    key = id(dtd)
    hit = _CTX.get(key)
    if hit is not None and hit[0] is dtd:
        # LRU touch (dict preserves insertion order)
        del _CTX[key]
        _CTX[key] = hit
        return hit[1]
    if hit is not None:
        # stale entry: a freed DTD's id was recycled
        del _CTX[key]
    while len(_CTX) >= _CTX_CAP:
        del _CTX[next(iter(_CTX))]
    from . import dtd as D
    from . import model as M
    from .parser import (Environment, S_CDATA, S_PCDATA, S_RCDATA)
    consts = {
        "S_PCDATA": S_PCDATA, "S_CDATA": S_CDATA, "S_RCDATA": S_RCDATA,
        "SP_STRICT": D.SP_STRICT, "SP_SGML": D.SP_SGML,
        "SP_DEFAULT": D.SP_DEFAULT, "SP_REMOVE": D.SP_REMOVE,
        "SP_PRESERVE": D.SP_PRESERVE,
        "C_EMPTY": M.C_EMPTY, "C_CDATA": M.C_CDATA,
        "C_RCDATA": M.C_RCDATA, "C_ANY": M.C_ANY,
        "MT_PCDATA": M.MT_PCDATA, "MT_ELEMENT": M.MT_ELEMENT,
    }
    cbs = {
        "make_dtd_transition": M.make_dtd_transition,
        "same_state": M.same_state,
        "find_omitted_path": (
            lambda st, e, _g=dtd._omit_gen, _f=M.find_omitted_path:
            _f(st, e, _g)),
        "make_state_engine": M.make_state_engine,
        # per-DTD generations (model.py design note): a private
        # DTD's flips flush only its own ctx, not the shared
        # dialect DTDs' warm registries
        "omit_gen": dtd._omit_gen,
        "allow_gen": dtd._allow_gen,
        "environment": Environment,
        "cdata_element": M.CDATA_ELEMENT,
        "space_flag": (lambda entry, _dtd=dtd: _space_flag(entry,
                                                           _dtd)),
        "parse_error": E.ParseError,
        "sev_warning": E.WARNING,
    }
    ctx = MOD.make_ctx(dtd, consts, cbs)
    _CTX[key] = (dtd, ctx)
    return ctx
