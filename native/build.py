"""Build the native graph-builder extension with g++ (no pip involved).

Produces ``native/_ghf_native.<abi>.so``; the Python layer adds ``native/``
to the module search path and falls back to pure-Python implementations when
the module is absent or the build fails.

Run: ``python native/build.py``
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def extension_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(here, f"_ghf_native{suffix}")


def build(verbose: bool = True) -> str:
    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "ghf_native.cpp")
    out = extension_path()

    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include_py}",
        f"-I{include_np}",
        src,
        "-o",
        out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def ensure_built(quiet: bool = True) -> str | None:
    """Build if missing; return the .so path or None on failure."""
    path = extension_path()
    src = os.path.join(os.path.dirname(path), "ghf_native.cpp")
    try:
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(src):
            build(verbose=not quiet)
        return path
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        if not quiet:
            print(f"native build failed: {exc}", file=sys.stderr)
        return None


if __name__ == "__main__":
    print(build())
