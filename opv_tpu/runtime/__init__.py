"""Native runtime (C extension) with graceful fallback.

`HAVE_NATIVE` is True when the _iqio C extension is importable; io/iq.py
routes hot conversions through it automatically.
"""

try:
    from opv_tpu.runtime import _iqio  # type: ignore

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - build-environment dependent
    _iqio = None
    HAVE_NATIVE = False

__all__ = ["_iqio", "HAVE_NATIVE"]
