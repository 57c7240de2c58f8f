"""Loader for the native C++ graph-builder (``native/_ghf_native``).

The native module implements the host-side hot path (relation dedup,
tokenization, CSR build, relation counting-sort) in C++; see
``native/ghf_native.cpp``. This bridge attempts a lazy build with the local
toolchain on first import and degrades silently to the pure-Python
implementations if unavailable — library behavior is identical either way
(tests assert equivalence).
"""

from __future__ import annotations

import os
import sys

_NATIVE = None
_TRIED = False


def get_native():
    """The ``_ghf_native`` module, or None if unavailable."""
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
    )
    if not os.path.isdir(native_dir):
        return None
    try:
        sys.path.insert(0, native_dir)
        try:
            import _ghf_native  # noqa: F401
        except ImportError:
            build_py = os.path.join(native_dir, "build.py")
            if os.path.exists(build_py):
                import importlib

                sys.path.insert(0, native_dir)
                import build as _build_mod  # type: ignore

                if _build_mod.ensure_built(quiet=True) is None:
                    return None
                importlib.invalidate_caches()
                import _ghf_native  # noqa: F401
            else:
                return None
        _NATIVE = sys.modules.get("_ghf_native")
    except Exception:
        _NATIVE = None
    finally:
        try:
            sys.path.remove(native_dir)
        except ValueError:
            pass
    return _NATIVE


def native_available() -> bool:
    return get_native() is not None
