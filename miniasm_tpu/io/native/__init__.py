"""Native (C++) accelerators: exact radix argsort, gzip PAF tokenizer.

Compiled on demand from the sources in this directory (see build.py);
callers fall back to the pure-Python implementations when unavailable.
"""

from __future__ import annotations

HAS_PAF = True


def available() -> bool:
    try:
        from .build import get_lib

        return get_lib() is not None
    except Exception:
        return False


def load_paf(fn, min_span, min_match, excl=None, d=None):
    from .pafload import load_paf_native

    return load_paf_native(fn, min_span, min_match, excl=excl, d=d)
