"""Pallas TPU kernel: batched 64-state soft-decision Viterbi.

Same trellis semantics as opv_tpu.rx.viterbi (reference parity:
src/opv-demod.cpp:800-847) but executed as ONE kernel per 128-frame tile —
metrics, decisions, and the traceback all live in VMEM, avoiding the
1072-step XLA while-loop's per-iteration HBM traffic.

Layout (Mosaic-native):
  * the frame batch rides the LANE axis (128 frames per tile),
  * the 64 trellis states ride the SUBLANE axis,
  * the trellis time axis is the major dimension of every dynamically
    indexed ref (soft (1072, 2, 128), bits (1072, 128), decisions
    (1072, 2, 128)),
  * decisions are BIT-PACKED: two int32 words per (step, frame) hold the 64
    per-state survivor choices, so the decision tape is ~1 MB of VMEM.

Gather-free: parent metrics via sublane repeat-reshape, branch metrics from
a (64, 1) expected-bit table input, traceback via per-lane shift/mask of the
packed words.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opv_tpu.config import CONFIG
from opv_tpu.rx.viterbi import _tables

_NS = CONFIG.num_states          # 64
_FB = CONFIG.frame_bits          # 1072
_INF = np.int32(0x7FFFFFFF)
_GUARD = np.int32(0x7FFFFFF0)

# trellis steps that keep the INT_MAX reachability guard: state s first
# becomes reachable at step ceil(log2(s+1)) <= 6, so after 8 steps every
# metric is finite and the steady ACS loop can drop the guard entirely
_GUARD_STEPS = 8

# frames per kernel instance (lane-axis width, multiple of 128).  The ACS
# recurrence and traceback are SERIAL over 1072 trellis steps, so per-step
# loop overhead is amortized over the lane width: wider tiles trade VMEM
# (~21 KB/frame for soft+decisions+bits) for fewer sequential grid steps.
# Amortized v5e sweep (64ch x 20f = 1280 frames): 128 -> 2.93 ms,
# 256 -> 2.57 ms, 512 -> scoped-VMEM OOM (16.79 M > 16 M limit).  Default
# is batch-adaptive: 256 when the batch fills at least one wide tile, 128
# below that (small streaming batches would pay 2x padding at 256).
# Overridable per-call or via OPV_VITERBI_TILE for hardware sweeps.
B_TILE = int(os.environ.get("OPV_VITERBI_TILE", "0")) or None

# trellis steps per loop iteration (ACS and traceback).  The vector work
# per step is fixed; unrolling U steps per iteration divides BOTH the
# serial-loop management overhead and the number of dynamically indexed
# VMEM accesses by U (soft loads / decision stores become one (U, 2, B)
# block access instead of U separate (2, B) ones).  Must divide 1072
# (= 16 x 67): 1, 2, 4, 8, 16.  v5e amortized sweep at t256, 1280 frames
# (fetch-timed, interleaved reps): u1 1.70-1.94, u2 1.47-1.49, u4 1.52-1.82,
# u8 2.01, u16 2.10 ms — u2 wins; past u4 the longer kernel body loses more
# to scheduling than the loop amortization gains.  Hardware-validated
# bit-exact vs the XLA scan for every factor.
UNROLL = int(os.environ.get("OPV_VITERBI_UNROLL", "2"))

# survivor-word packing strategy: "vpu" (two 32-row weighted sublane
# reductions) or "mxu" (one tiny f32 dot per step — exact, see
# _viterbi_kernel).  v5e amortized sweep at t256 u2 (same session):
# vpu 1.32 ms, mxu 1.48 ms — the per-step MXU round trip costs more than
# the sublane reduction tree saves, so vpu is the default.
PACK = os.environ.get("OPV_VITERBI_PACK", "vpu")


def _default_tile(bsz: int) -> int:
    return B_TILE or (256 if bsz >= 256 else 128)


def _expected_cols():
    """(4, 64) expected-bit tables -> (64, 4) column layout for sublanes."""
    _, _, e1_0, e2_0, e1_1, e2_1 = _tables()
    return np.stack([e1_0, e2_0, e1_1, e2_1], axis=1).astype(np.int32)


def _pack_weights():
    """(8, 64) MXU packing matrix: row r holds weights 2^0..2^15 over states
    16r..16r+15 (rows 4-7 zero — sublane padding to the (8, 128) tile)."""
    w = np.zeros((8, _NS), np.float32)
    for r in range(4):
        w[r, 16 * r : 16 * (r + 1)] = 2.0 ** np.arange(16)
    return w


def _viterbi_kernel(exp_ref, wpk_ref, soft_ref, bits_ref, metric_ref,
                    dec_ref, *, b_tile, unroll, pack):
    e1_0 = exp_ref[:, 0:1]                           # (64, 1)
    e2_0 = exp_ref[:, 1:2]
    soft_max = jnp.int32(CONFIG.soft_max)

    states = jax.lax.broadcasted_iota(jnp.int32, (_NS, b_tile), 0)
    weight = jnp.int32(1) << (states % 32)           # per-state pack weight
    wpk = wpk_ref[...]                               # (8, 64) MXU pack rows

    metrics0 = jnp.where(states == 0, jnp.int32(0), _INF)

    def acs_sub(metrics, sg1, sg2, guarded):
        """One radix-2 ACS update from (1, B) soft rows -> metrics, (2, B)
        packed survivor words.

        Branch-metric symmetry: g1 (0x4F) has trellis bit 5 CLEAR and g2
        (0x6D) has it SET, so for parent p1 = p0 + 32 the expected g1 bit is
        unchanged and the g2 bit flips: bm1 = a - b + soft_max where
        bm0 = a + b (two selects instead of four).

        `guarded` applies the INT_MAX reachability guard; every state is
        structurally reachable after step 6, so only the first 8 steps need
        it — the steady loop drops the two compare+selects per step.
        """
        a = jnp.where(e1_0 == 1, soft_max - sg1, sg1)          # (64, B)
        b = jnp.where(e2_0 == 1, soft_max - sg2, sg2)
        bm0 = a + b
        bm1 = a - b + soft_max
        # parent p0 = s>>1: repeat lower half along sublanes; p1: upper half
        # (jnp.repeat — Mosaic rejects the broadcast_to+reshape equivalent)
        mp0 = jnp.repeat(metrics[: _NS // 2], 2, axis=0)
        mp1 = jnp.repeat(metrics[_NS // 2 :], 2, axis=0)
        if guarded:
            m0 = jnp.where(mp0 < _GUARD, mp0 + bm0, _INF)
            m1 = jnp.where(mp1 < _GUARD, mp1 + bm1, _INF)
        else:
            m0 = mp0 + bm0
            m1 = mp1 + bm1
        dec = m1 < m0                                # (64, B); ties -> p0
        # pack survivor bits: word0 = states 0..31, word1 = states 32..63
        # (all values kept 2-D — Mosaic mislowers 1-D vectors)
        if pack == "mxu":
            # one tiny MXU dot replaces the two 32-row weighted reductions.
            # Exact: weights are powers of two <= 2^15 (exactly bf16, so
            # f32 operands split losslessly for the MXU's bf16 passes),
            # dec is 0/1, accumulation is f32 and the 16-term row sums stay
            # < 2^16 — every product and partial sum is representable.
            decw = jax.lax.dot_general(
                wpk, dec.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            w0 = decw[0:1] + decw[1:2] * 65536       # states 0..15 | 16..31
            w1 = decw[2:3] + decw[3:4] * 65536       # states 32..47 | 48..63
        else:
            packed = dec.astype(jnp.int32) * weight
            w0 = jnp.sum(packed[: _NS // 2], axis=0, keepdims=True)  # (1, B)
            w1 = jnp.sum(packed[_NS // 2 :], axis=0, keepdims=True)
        return jnp.minimum(m0, m1), jnp.concatenate([w0, w1], axis=0)

    def acs_block(j, metrics, base, guarded):
        # one dynamic load / store of `unroll` trellis steps; the sub-steps
        # index the loaded block statically
        t = base + j * unroll
        sg_u = soft_ref[pl.ds(t, unroll)]            # (U, 2, B)
        words = []
        for k in range(unroll):
            metrics, w = acs_sub(metrics, sg_u[k, 0:1, :], sg_u[k, 1:2, :],
                                 guarded)
            words.append(w[None])
        dec_ref[pl.ds(t, unroll)] = jnp.concatenate(words, axis=0)
        return metrics

    metrics = jax.lax.fori_loop(
        0, _GUARD_STEPS // unroll,
        functools.partial(acs_block, base=0, guarded=True), metrics0)
    metrics = jax.lax.fori_loop(
        0, (_FB - _GUARD_STEPS) // unroll,
        functools.partial(acs_block, base=_GUARD_STEPS, guarded=False),
        metrics)

    # Mosaic argmin supports float32 only, and its tie-breaking differs from
    # XLA's first-occurrence rule (the reference scans states upward,
    # opv-demod.cpp:836-837).  Make ties impossible with a composite key
    # metric*64 + state — max value ~9.6e5 is exactly representable in f32.
    composite = (metrics * _NS + states).astype(jnp.float32)
    best = jnp.argmin(composite, axis=0, keepdims=True).astype(jnp.int32)
    metric_ref[pl.ds(0, 1)] = jnp.min(metrics, axis=0, keepdims=True)

    def tb_block(j, s):                                          # s (1, B)
        tb = _FB - unroll - j * unroll
        words_u = dec_ref[pl.ds(tb, unroll)]                     # (U, 2, B)
        # bits are stored one row at a time: a multi-row dynamic store on
        # the 2-D (1072, B) ref hits the sublane axis, and Mosaic requires
        # provable 8-alignment there ("cannot statically prove that index
        # in dimension 0 is a multiple of 8"); single-row stores lower at
        # any index.  The expensive access (the decision-word load) is
        # still one (U, 2, B) block per iteration.
        for k in reversed(range(unroll)):
            bits_ref[pl.ds(tb + k, 1)] = s & 1
            words = words_u[k]                                   # (2, B)
            sel = jnp.where(s < _NS // 2, words[0:1, :], words[1:2, :])
            took_p1 = (sel >> (s % 32)) & 1
            s = jnp.where(took_p1 == 1, (s >> 1) + _NS // 2, s >> 1)
        return s

    jax.lax.fori_loop(0, _FB // unroll, tb_block, best)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "b_tile", "unroll", "pack"))
def viterbi_pallas(soft: jnp.ndarray, interpret: bool = False,
                   b_tile: int | None = None, unroll: int | None = None,
                   pack: str | None = None):
    """Batched Viterbi via the Pallas kernel.

    soft: (B, 2144) int32 quantized soft symbols; B padded to b_tile
    (default: batch-adaptive 256/128, env OPV_VITERBI_TILE overrides).
    unroll: trellis steps per loop iteration (default UNROLL /
    OPV_VITERBI_UNROLL; must divide 8 and 1072: 1, 2, 4 or 8).
    pack: survivor-word packing — "mxu" (tiny bf16 dot, default) or "vpu"
    (weighted sublane reductions); OPV_VITERBI_PACK overrides.
    Returns (bits (B, 1072) int32, metrics (B,) int32).
    """
    u = unroll or UNROLL
    assert _FB % u == 0 and _GUARD_STEPS % u == 0, u
    pk = pack or PACK
    assert pk in ("mxu", "vpu"), pk
    bt = b_tile or _default_tile(soft.shape[0])
    bsz = soft.shape[0]
    pad = (-bsz) % bt
    if pad:
        soft = jnp.pad(soft, ((0, pad), (0, 0)))
    nb = soft.shape[0] // bt
    # layout: (1072, 2, Btot) — time major, (g1,g2) sublane, batch lanes
    soft_t = soft.astype(jnp.int32).reshape(-1, _FB, 2).transpose(1, 2, 0)

    exp = jnp.asarray(_expected_cols())              # (64, 4)
    wpk = jnp.asarray(_pack_weights())               # (8, 64)
    bits_t, metric = pl.pallas_call(
        functools.partial(_viterbi_kernel, b_tile=bt, unroll=u, pack=pk),
        grid=(nb,),
        in_specs=[pl.BlockSpec((_NS, 4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, _NS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_FB, 2, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((_FB, bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((_FB, soft.shape[0]), jnp.int32),
                   jax.ShapeDtypeStruct((1, soft.shape[0]), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((_FB, 2, bt), jnp.int32)],
        interpret=interpret,
    )(exp, wpk, soft_t)
    return bits_t.T[:bsz], metric[0, :bsz]
