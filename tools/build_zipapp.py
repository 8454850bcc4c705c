"""One-file distribution build — the analog of the reference's PyInstaller
spec (BPM_Analyzer.spec:1-58), re-interpreted for this stack.

PyInstaller freezes CPython + every wheel into one .exe; for a JAX/TPU
framework that is neither possible nor desirable (jaxlib is a
platform-matched native wheel and the TPU runtime comes from the host
image).  The deliverable here is a stdlib ``zipapp``: one self-contained
``bpm-analyzer.pyz`` holding the full ``bpm_analysis_tpu`` package plus a
``__main__`` that dispatches to the CLI / GUI / labeler front-ends —
runnable as ``python bpm-analyzer.pyz [args]`` on any machine with the
runtime dependencies installed (jax, numpy; optional ffmpeg/plotly/gradio
are gated at import time exactly as in the package).

Usage:
    python tools/build_zipapp.py [-o dist/bpm-analyzer.pyz]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import zipapp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAIN = '''\
"""bpm-analyzer.pyz — single-file distribution entry point."""
import sys


def main():
    args = sys.argv[1:]
    if args and args[0] == "gui":
        from bpm_analysis_tpu.apps.gui import main as entry
        sys.argv = [sys.argv[0]] + args[1:]
    elif args and args[0] == "labeler":
        from bpm_analysis_tpu.apps.labeler import main as entry
        sys.argv = [sys.argv[0]] + args[1:]
    else:
        from bpm_analysis_tpu.apps.cli import main as entry
    raise SystemExit(entry() or 0)


if __name__ == "__main__":
    main()
'''


def build(output: str) -> str:
    output = os.path.abspath(output)
    os.makedirs(os.path.dirname(output), exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        pkg_src = os.path.join(REPO, "bpm_analysis_tpu")
        shutil.copytree(
            pkg_src, os.path.join(td, "bpm_analysis_tpu"),
            ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))
        with open(os.path.join(td, "__main__.py"), "w") as f:
            f.write(MAIN)
        zipapp.create_archive(td, output,
                              interpreter="/usr/bin/env python3",
                              compressed=True)
    return output


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", default=os.path.join(REPO, "dist", "bpm-analyzer.pyz"))
    args = p.parse_args(argv)
    out = build(args.output)
    print(f"built {out} ({os.path.getsize(out)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
