"""Kernel backend registry: XLA reference implementations vs Pallas kernels.

Default is "auto": the Pallas VMEM Viterbi on TPU (measured faster than the
XLA scan — see PERF.md), the portable XLA scan everywhere else.  Switch with
`set_backend(...)` or env OPV_BACKEND={xla,pallas,pallas_interpret,auto}
before tracing; pipelines read the registry at trace time, so flip it before
the first jitted call (or clear jax caches).
"""

from __future__ import annotations

import os

_backend = os.environ.get("OPV_BACKEND", "auto")
_VALID = ("auto", "xla", "pallas", "pallas_interpret")


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _backend = name


def get_backend() -> str:
    """The resolved backend ("auto" resolves per the current jax platform)."""
    if _backend != "auto":
        return _backend
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def viterbi_batch(soft):
    """Dispatch batched Viterbi: (B, 2144) int32 -> (bits, metrics)."""
    backend = get_backend()
    if backend == "xla":
        from opv_tpu.rx.viterbi import viterbi_decode_batch
        bits, metrics = viterbi_decode_batch(soft)
        return bits, metrics
    import jax
    from opv_tpu.ops.pallas.viterbi import viterbi_pallas
    # compiled pallas (Mosaic) only exists on TPU; interpret elsewhere
    interpret = (backend == "pallas_interpret"
                 or jax.default_backend() != "tpu")
    bits, metrics = viterbi_pallas(soft, interpret=interpret)
    return bits.astype("uint8"), metrics
