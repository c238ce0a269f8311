"""Build the --py-files zip for spark-submit.

    python tools/make_pyfiles_zip.py [out.zip]
"""

import os
import sys
import zipfile


def build(out_path="packages_sgml_spark.zip"):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "packages_sgml_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith((".py", ".c")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, repo))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "packages_sgml_spark.zip"
    print(build(out))
