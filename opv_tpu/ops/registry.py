"""Kernel backend registry: XLA reference implementations vs Pallas kernels.

Default is "xla" (portable, used by all parity paths).  Switch with
`set_backend("pallas")` or env OPV_BACKEND=pallas before tracing; pipelines
read the registry at trace time, so flip it before the first jitted call (or
clear jax caches).
"""

from __future__ import annotations

import os

_backend = os.environ.get("OPV_BACKEND", "xla")
_VALID = ("xla", "pallas", "pallas_interpret")


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _backend = name


def get_backend() -> str:
    return _backend


def viterbi_batch(soft):
    """Dispatch batched Viterbi: (B, 2144) int32 -> (bits, metrics)."""
    if _backend == "xla":
        from opv_tpu.rx.viterbi import viterbi_decode_batch
        bits, metrics = viterbi_decode_batch(soft)
        return bits, metrics
    import jax
    from opv_tpu.ops.pallas.viterbi import viterbi_pallas
    # compiled pallas (Mosaic) only exists on TPU; interpret elsewhere
    interpret = (_backend == "pallas_interpret"
                 or jax.default_backend() != "tpu")
    bits, metrics = viterbi_pallas(soft, interpret=interpret)
    return bits.astype("uint8"), metrics
