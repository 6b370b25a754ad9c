"""Native runtime (C extensions) with graceful fallback.

`HAVE_NATIVE` is True when the _iqio C extension is importable; io/iq.py
routes hot conversions through it automatically.  `HAVE_TRACKING` is True
when the _tracking symbol-loop runtime is importable; stream/chunked.py's
"auto" backend routes the serial AFC/TED loop through it on the float64
parity path.
"""

try:
    from opv_tpu.runtime import _iqio  # type: ignore

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - build-environment dependent
    _iqio = None
    HAVE_NATIVE = False

try:
    from opv_tpu.runtime import _tracking  # type: ignore

    HAVE_TRACKING = True
except ImportError:  # pragma: no cover - build-environment dependent
    _tracking = None
    HAVE_TRACKING = False

__all__ = ["_iqio", "_tracking", "HAVE_NATIVE", "HAVE_TRACKING"]
