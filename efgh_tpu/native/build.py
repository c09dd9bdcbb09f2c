"""Build the native lattice oracle shared library with g++.

Usage: python -m efgh_tpu.native.build
The library is cached next to the source; `efgh_tpu.native.load()` rebuilds
automatically when the source is newer than the .so.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "lattice_oracle.cpp")
LIB = os.path.join(_DIR, "liblattice_oracle.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", LIB]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
