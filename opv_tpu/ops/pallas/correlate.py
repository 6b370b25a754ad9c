"""Pallas TPU kernel: fused symbol-window correlation (the soft stage).

Computes the batched window-by-kernel product at the heart of
rx/locked.py's `_symbol_soft_batch` (reference hot loop:
src/opv-demod.cpp:231-252, reformulated to the locked symbol grid):

    ab[c, s, o] = sum_t sym[c, s, t] * kern[c, t, o]     t < 80, o < 8

where `sym` is the free (C, M, 80) reshape of the float32 IQ-pair sample
stream and `kern` holds the real-valued tone-correlation columns.  XLA
lowers this einsum to an MXU matmul whose K=80, N=8 geometry tiles the
128x128 systolic array at ~4% utilization; the measured 2.4 ms/block vs
the 1.10 ms HBM roofline (PERF.md) is that inefficiency.  Here each grid
step streams a (TM, 80) window tile through VMEM once and the per-step
dot is small enough to hide under the next tile's DMA, so the stage runs
at memory speed.

The M axis rarely divides the tile; callers slice the main multiple
through the kernel and finish the ragged tail (< TM windows) with the
XLA einsum (see opv_tpu.ops.registry.symbol_corr).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: windows per grid step.  VMEM per block = TM*80*4 = 640 KB (x2 for
#: double buffering); larger tiles mean fewer grid steps per channel.
TM = 2048


def _corr_kernel(sym_ref, kern_ref, out_ref):
    # v1 computed dot((TM, 80), (80, 8)) directly: the 8-lane output VREGs
    # and the 80-lane contraction forced Mosaic relayouts every grid step —
    # measured 28.7 ms vs the einsum's ~2.2 ms (negative result, PERF.md).
    # v2 transposes the tile through the XLU so WINDOWS ride the lane axis:
    # dot((8, 80), (80, TM)) writes (8, TM) — full-lane VREGs, M-major
    # contiguous HBM rows.
    at = sym_ref[0].T                                # (80, TM)
    kt = kern_ref[0].T                               # (8, 80)
    out_ref[0] = jnp.dot(kt, at, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def symbol_corr_pallas(sym_f: jnp.ndarray, kern_f: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(C, M, 80) f32 windows x (C, 80, 8) f32 kernels -> (C, 8, M).

    NOTE the transposed output layout (outputs-major): each of the 8
    correlation columns is a contiguous M-row.  M must be a multiple of TM
    (callers route the ragged tail through the XLA einsum instead —
    registry.symbol_corr does the split and the final layout unification)."""
    c, m, kw = sym_f.shape
    assert m % TM == 0, m
    no = kern_f.shape[-1]
    return pl.pallas_call(
        _corr_kernel,
        grid=(c, m // TM),
        in_specs=[pl.BlockSpec((1, TM, kw), lambda ci, mi: (ci, mi, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, kw, no), lambda ci, mi: (ci, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, no, TM), lambda ci, mi: (ci, 0, mi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, no, m), jnp.float32),
        interpret=interpret,
    )(sym_f, kern_f)
