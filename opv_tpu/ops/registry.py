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


def symbol_corr(sym_f, kern_f):
    """Dispatch the soft-stage window correlation:
    (C, M, 80) f32 x (C, 80, 8) f32 -> (C, M, 8) f32.

    Default is the XLA einsum on EVERY backend: it measures 2.2 ms/block
    amortized (64ch x 20f, ~2x the HBM roofline) while the Pallas tiling
    in ops/pallas/correlate.py measured 28.7 ms — the (TM, 80) x (80, 8)
    dot puts the contraction on the lane axis and N=8 on the output lanes,
    forcing Mosaic relayouts every grid step (negative result recorded in
    PERF.md).  The kernel stays available for layout experiments via
    OPV_CORR=pallas (or pallas_interpret off-TPU)."""
    import jax.numpy as jnp
    backend = os.environ.get("OPV_CORR", "xla")
    einsum = lambda s, k: jnp.einsum("cst,cto->cso", s, k)
    use_pallas = backend == "pallas_interpret" or (
        backend == "pallas" and _on_tpu())
    if not use_pallas:
        return einsum(sym_f, kern_f)
    from opv_tpu.ops.pallas.correlate import TM, symbol_corr_pallas
    m = sym_f.shape[1]
    m_main = (m // TM) * TM
    if m_main == 0:
        return einsum(sym_f, kern_f)
    main = symbol_corr_pallas(sym_f[:, :m_main], kern_f,
                              interpret=(backend == "pallas_interpret"
                                         or not _on_tpu()))
    main = jnp.swapaxes(main, 1, 2)      # kernel emits (C, 8, M) rows
    if m_main == m:
        return main
    return jnp.concatenate([main, einsum(sym_f[:, m_main:], kern_f)], axis=1)


def _on_tpu() -> bool:
    import jax
    return jax.default_backend() == "tpu"
