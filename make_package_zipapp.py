"""Freeze the CLI tools into single-file executables (zipapp).

Role parity with reference make_package_pyinstaller.py:1 (one-file
executables for MetDetPy / MetDetPhoto / ClipToolkit). PyInstaller/nuitka
are not available in this image, so the freeze target is PEP 441 zipapps:
each tool becomes a self-contained .pyz holding the package, the tool
script, and the config/global/resource data trees; on first run the data
trees are extracted to a per-build cache directory and
METDET_RESOURCE_DIR is pointed there (the one-file-extraction model
PyInstaller uses).

Usage: python make_package_zipapp.py [--out dist_pyz] [--tools ...]
"""

import argparse
import hashlib
import os
import shutil
import sys
import zipapp

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_TOOLS = ["MetDetPy.py", "MetDetPhoto.py", "ClipToolkit.py",
                 "evaluate.py"]
DATA_TREES = ["config", "global", "resource", "weights"]

MAIN_TEMPLATE = '''\
"""zipapp entry: extract bundled data trees once, then run {tool}."""
import hashlib
import os
import runpy
import sys
import zipfile

ARCHIVE = os.path.dirname(os.path.abspath(__file__))  # the .pyz itself


def _extract_data() -> str:
    with open(ARCHIVE, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "metdetpy_tpu", "bundle-" + digest)
    stamp = os.path.join(cache, ".complete")
    if not os.path.exists(stamp):
        os.makedirs(cache, exist_ok=True)
        with zipfile.ZipFile(ARCHIVE) as z:
            for name in z.namelist():
                if name.split("/", 1)[0] in {data_trees!r}:
                    z.extract(name, cache)
        open(stamp, "w").close()
    return cache


def main():
    os.environ.setdefault("METDET_RESOURCE_DIR", _extract_data())
    sys.argv[0] = {tool!r}
    runpy.run_module({module!r}, run_name="__main__", alter_sys=True)


if __name__ == "__main__":
    main()
'''


def build_tool(tool: str, out_dir: str) -> str:
    staging = os.path.join(out_dir, "_staging_" + tool)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging)
    shutil.copytree(os.path.join(HERE, "metdetpy_tpu"),
                    os.path.join(staging, "metdetpy_tpu"),
                    ignore=shutil.ignore_patterns("__pycache__", "*.o"))
    shutil.copy(os.path.join(HERE, tool), staging)
    for tree in DATA_TREES:
        src = os.path.join(HERE, tree)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(staging, tree))
    module = os.path.splitext(tool)[0]
    with open(os.path.join(staging, "__main__.py"), "w") as f:
        f.write(MAIN_TEMPLATE.format(tool=tool, module=module,
                                     data_trees=set(DATA_TREES)))
    target = os.path.join(out_dir, module + ".pyz")
    zipapp.create_archive(staging, target,
                          interpreter="/usr/bin/env python3")
    shutil.rmtree(staging)
    os.chmod(target, 0o755)
    print(f"[make_package_zipapp] {target} "
          f"({os.path.getsize(target) // 1024} KiB)")
    return target


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=os.path.join(HERE, "dist_pyz"))
    parser.add_argument("--tools", nargs="*", default=DEFAULT_TOOLS)
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for tool in args.tools:
        build_tool(tool, args.out)


if __name__ == "__main__":
    main()
