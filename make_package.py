"""Build a relocatable distribution of MetDetPy-TPU.

Role parity with reference make_package.py:209-244 (freeze the three CLI
tools + copy config/weights/resource/global trees). nuitka/pyinstaller are
not available in this environment, so the default target is a relocatable
directory bundle with launcher scripts plus the compiled native library;
``--sdist`` additionally produces a pip-installable source archive via
setuptools.
"""

import argparse
import os
import shutil
import subprocess
import sys
import tarfile

HERE = os.path.dirname(os.path.abspath(__file__))
CLI_TOOLS = ["MetDetPy.py", "MetDetPhoto.py", "ClipToolkit.py",
             "evaluate.py", "bench.py"]
DATA_TREES = ["config", "global", "weights", "resource"]
LAUNCHER = """#!/bin/sh
# MetDetPy-TPU launcher
DIR="$(cd "$(dirname "$0")" && pwd)"
export METDET_RESOURCE_DIR="$DIR"
exec python3 "$DIR/{tool}" "$@"
"""


def build_native() -> None:
    native = os.path.join(HERE, "metdetpy_tpu", "native")
    ret = subprocess.run(["make", "-C", native], capture_output=True)
    if ret.returncode != 0:
        print("[make_package] native build failed (continuing; numpy "
              "fallbacks remain):", ret.stderr.decode()[-300:])


def build_dir_bundle(out_dir: str) -> None:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    shutil.copytree(os.path.join(HERE, "metdetpy_tpu"),
                    os.path.join(out_dir, "metdetpy_tpu"),
                    ignore=shutil.ignore_patterns("__pycache__", "*.o"))
    for tool in CLI_TOOLS:
        shutil.copy(os.path.join(HERE, tool), out_dir)
        name = os.path.splitext(tool)[0]
        launcher = os.path.join(out_dir, name)
        with open(launcher, "w") as f:
            f.write(LAUNCHER.format(tool=tool))
        os.chmod(launcher, 0o755)
    for tree in DATA_TREES:
        src = os.path.join(HERE, tree)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(out_dir, tree))
    for doc in ["README.md", "SURVEY.md"]:
        if os.path.isfile(os.path.join(HERE, doc)):
            shutil.copy(os.path.join(HERE, doc), out_dir)
    print(f"[make_package] bundle at {out_dir}")


def build_sdist(out_dir: str, version: str) -> None:
    archive = os.path.join(out_dir + ".tar.gz")
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(out_dir, arcname=f"metdetpy-tpu-{version}")
    print(f"[make_package] archive at {archive}")


def main() -> None:
    from metdetpy_tpu.version import VERSION
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(HERE, "dist",
                                                      "metdetpy-tpu"))
    parser.add_argument("--sdist", action="store_true",
                        help="also produce a .tar.gz archive")
    parser.add_argument("--skip-native", action="store_true")
    args = parser.parse_args()
    if not args.skip_native:
        build_native()
    build_dir_bundle(args.out)
    if args.sdist:
        build_sdist(args.out, VERSION)


if __name__ == "__main__":
    main()
