#!/usr/bin/env python3
"""Measure the reference C parser's throughput (BENCH.md round-3
"measured reference-parser baseline") reproducibly.

Builds the reference's own standalone `sgml` CLI (sgml.c:378) from
/root/reference sources into a scratch dir — nothing is copied into
this repo — with two build fixes it needs outside the SWI tree:
  * a hand-written config.h (the package generates one via cmake);
  * its `.dtd` extension matching patched from the broken
    narrow-as-wide `strcaseeq` cast (sgml.c:373) to strcasecmp.
Then parses a deterministic corpus with the same tag-density shape
as this repo's single-thread A/B corpus (seeded with crc32, not the
salted Python hash), scaled to ~1 MB docs so the per-invocation
fixed cost (process spawn + full HTML4.dtd parse) can be measured
with a tiny-file baseline and subtracted.

Usage: python3 tools/bench_reference.py [n_docs] [scale]
Prints one JSON line.
"""

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zlib as _zlib

REF = "/root/reference"

CONFIG_H = """
#define HAVE_UNISTD_H 1
#define HAVE_SYS_TIME_H 1
#define HAVE_FCNTL_H 1
#define HAVE_SNPRINTF 1
#define HAVE_STRERROR 1
#define HAVE_STRTOLL 1
#define SIZEOF_WCHAR_T 4
#define SIZEOF_LONG 8
"""

SOURCES = ["parser.c", "util.c", "charmap.c", "catalog.c", "model.c",
           "xmlns.c", "utf8.c", "xml_unicode.c"]


def page(i, scale):
    # deterministic across processes (Python str hash is salted)
    h = _zlib.crc32(b"x%d" % i)
    host = "host%d.example.org" % (h % 1000)
    n_paras = (h % 7 + 1) * scale
    para = ('<p>Paragraph about topic %d with some &amp; entities, a '
            '<b>bold</b> claim, and a link to <a href="https://%s/ref">'
            'a reference</a>.' % (h % 97, host) +
            ("" if h % 3 == 0 else "</p>"))
    items = ('<ul><li>item one<li>item two<li>item %d</ul>' % (h % 13))
    body = (para * n_paras + items +
            '<script>var x = 1 < 2 && 3 > 2;</script>'
            '<!-- trailing comment -->')
    return ('<!DOCTYPE html><html><head><title>Page %d</title>'
            '<meta charset="utf-8"></head><body><h1>Page %d</h1>%s'
            '</body></html>' % (i, i, body))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    work = tempfile.mkdtemp(prefix="refbench-")
    try:
        with open(os.path.join(work, "config.h"), "w") as f:
            f.write(CONFIG_H)
        # patch the CLI's broken narrow-as-wide extension compare
        src = open(os.path.join(REF, "sgml.c")).read()
        src = src.replace(
            "#define strcaseeq(x, y) istrcaseeq((ichar const *)(x), "
            "(ichar const *)(y))",
            "#include <strings.h>\n#define strcaseeq(x, y) "
            "(strcasecmp((const char *)(x), (const char *)(y)) == 0)")
        with open(os.path.join(work, "sgml_cli.c"), "w") as f:
            f.write(src)
        objs = [os.path.join(work, "sgml_cli.c")] + \
            [os.path.join(REF, s) for s in SOURCES]
        exe = os.path.join(work, "ref_sgml")
        subprocess.run(["gcc", "-O2", "-w", "-I", work, "-I", REF,
                        "-o", exe] + objs, check=True)
        for fn in ("HTML4.dtd", "HTML4.soc", "HTMLlat1.ent",
                   "HTMLspec.ent", "HTMLsym.ent"):
            shutil.copy(os.path.join(REF, "DTD", fn), work)
        total = 0
        for i in range(n_docs):
            d = page(i, scale)
            total += len(d)
            with open(os.path.join(work, "p%03d.html" % i), "w") as f:
                f.write(d)
        with open(os.path.join(work, "tiny.html"), "w") as f:
            f.write("<html><body><p>x</p></body></html>")
        env = dict(os.environ, SGML_CATALOG_FILES="HTML4.soc")
        files = sorted(glob.glob(os.path.join(work, "p*.html")))

        def run_all(paths):
            t0 = time.perf_counter()
            for f in paths:
                r = subprocess.run([exe, "-s", "HTML4.dtd", f],
                                   env=env, cwd=work,
                                   stdout=subprocess.DEVNULL,
                                   stderr=subprocess.DEVNULL)
                if r.returncode not in (0, 1):
                    # 1 = parsed with warnings/errors; anything else
                    # means the CLI itself failed -> the timing would
                    # be garbage, refuse to print a bogus number
                    raise RuntimeError(
                        "ref_sgml failed (%d) on %s" %
                        (r.returncode, f))
            return time.perf_counter() - t0

        run_all(files[:2])                      # warm cache
        t_real = min(run_all(files) for _ in range(3))
        t_base = min(run_all([os.path.join(work, "tiny.html")] *
                             len(files)) for _ in range(3))
        parse_t = max(t_real - t_base, 1e-9)
        print(json.dumps({
            "metric": "reference C parser single-thread parse "
                      "throughput (spawn+DTD-load subtracted)",
            "value": round(total / 1e6 / parse_t, 2),
            "unit": "MB/s",
            "bytes": total, "n_docs": n_docs,
            "t_real_sec": round(t_real, 3),
            "t_fixed_sec": round(t_base, 3),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
