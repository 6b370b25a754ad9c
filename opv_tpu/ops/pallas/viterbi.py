"""Pallas TPU kernel: batched 64-state soft-decision Viterbi.

Same trellis semantics as opv_tpu.rx.viterbi (reference parity:
src/opv-demod.cpp:800-847) but executed as ONE kernel per frame tile —
metrics, decisions, and the traceback all live in VMEM, avoiding the
1072-step XLA while-loop's per-iteration HBM traffic and dispatch overhead.

Gather-free formulation:
  * parent metrics:  metrics[p0] for s=0..63 is repeat(metrics[:32], 2) and
    metrics[p1] is repeat(metrics[32:], 2) — pure reshape/broadcast.
  * branch metrics: expected-bit tables are compile-time (1, 64) constants.
  * traceback state select: 64-lane one-hot masked reduce.

Layouts: the 64-state axis lives in the lane dimension (x128 padded), the
frame-batch axis in sublanes.  Decisions are staged in a VMEM scratch of
shape (1072, B_TILE, 64) int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opv_tpu.config import CONFIG
from opv_tpu.rx.viterbi import _tables

_NS = CONFIG.num_states          # 64
_FB = CONFIG.frame_bits          # 1072
_EB = CONFIG.encoded_bits        # 2144
_INF = np.int32(0x7FFFFFFF)
_GUARD = np.int32(0x7FFFFFF0)

B_TILE = 8                       # frames per kernel instance


def _expected_tables():
    _, _, e1_0, e2_0, e1_1, e2_1 = _tables()
    return (np.asarray(e1_0, np.int32)[None, :], np.asarray(e2_0, np.int32)[None, :],
            np.asarray(e1_1, np.int32)[None, :], np.asarray(e2_1, np.int32)[None, :])


def _viterbi_kernel(exp_ref, soft_ref, bits_ref, metric_ref, dec_ref):
    e1_0 = exp_ref[0:1, :]
    e2_0 = exp_ref[1:2, :]
    e1_1 = exp_ref[2:3, :]
    e2_1 = exp_ref[3:4, :]
    soft_max = jnp.int32(CONFIG.soft_max)
    b = B_TILE

    metrics0 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, _NS), 1) == 0,
        jnp.int32(0), _INF)

    def acs_step(t, metrics):
        sg = soft_ref[:, pl.ds(2 * t, 2)]            # (B, 2)
        sg1 = sg[:, 0:1]                             # (B, 1)
        sg2 = sg[:, 1:2]
        bm0 = jnp.where(e1_0 == 1, soft_max - sg1, sg1) + \
              jnp.where(e2_0 == 1, soft_max - sg2, sg2)      # (B, 64)
        bm1 = jnp.where(e1_1 == 1, soft_max - sg1, sg1) + \
              jnp.where(e2_1 == 1, soft_max - sg2, sg2)
        # parent p0 = s>>1: repeat lower half; p1 = p0+32: repeat upper half
        mp0 = jnp.broadcast_to(metrics[:, : _NS // 2, None],
                               (b, _NS // 2, 2)).reshape(b, _NS)
        mp1 = jnp.broadcast_to(metrics[:, _NS // 2 :, None],
                               (b, _NS // 2, 2)).reshape(b, _NS)
        m0 = jnp.where(mp0 < _GUARD, mp0 + bm0, _INF)
        m1 = jnp.where(mp1 < _GUARD, mp1 + bm1, _INF)
        dec = (m1 < m0).astype(jnp.int32)
        dec_ref[t] = dec
        return jnp.where(dec == 1, m1, m0)

    metrics = jax.lax.fori_loop(0, _FB, acs_step, metrics0)

    best = jnp.argmin(metrics, axis=-1).astype(jnp.int32)        # (B,)
    metric_ref[:, 0] = jnp.min(metrics, axis=-1)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (b, _NS), 1)

    def tb_step(i, s):
        t = _FB - 1 - i
        bits_ref[:, pl.ds(t, 1)] = (s[:, None] & 1)
        dec_t = dec_ref[t]                                       # (B, 64)
        took_p1 = jnp.sum(jnp.where(lanes == s[:, None], dec_t, 0), axis=-1)
        return jnp.where(took_p1 == 1, (s >> 1) + _NS // 2, s >> 1)

    jax.lax.fori_loop(0, _FB, tb_step, best)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas(soft: jnp.ndarray, interpret: bool = False):
    """Batched Viterbi via the Pallas kernel.

    soft: (B, 2144) int32 quantized soft symbols; B padded to B_TILE.
    Returns (bits (B, 1072) int32, metrics (B,) int32).
    """
    bsz = soft.shape[0]
    pad = (-bsz) % B_TILE
    if pad:
        soft = jnp.pad(soft, ((0, pad), (0, 0)))
    nb = soft.shape[0] // B_TILE

    exp = jnp.asarray(np.concatenate(_expected_tables(), axis=0))   # (4, 64)
    bits, metric = pl.pallas_call(
        _viterbi_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((4, _NS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B_TILE, _EB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((B_TILE, _FB), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((soft.shape[0], _FB), jnp.int32),
                   jax.ShapeDtypeStruct((soft.shape[0], 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((_FB, B_TILE, _NS), jnp.int32)],
        interpret=interpret,
    )(exp, soft.astype(jnp.int32))
    return bits[:bsz], metric[:bsz, 0]
