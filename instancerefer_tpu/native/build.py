"""Build the native voxelizer shared library.

    python instancerefer_tpu/native/build.py

Produces ``libirvoxelizer.so`` next to this file; ``ops/voxelize.py`` picks it
up automatically (falling back to numpy when absent).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "voxelizer.cpp")
OUT = os.path.join(HERE, "libirvoxelizer.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        SRC, "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
