"""Build the native preprocessing library: ``python -m iuvl_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "preprocess.cpp")
    out = os.path.join(here, "libiuvl_preprocess.so")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
