"""Frame finisher: soft symbols -> decoded 134-byte frames.

Chain per src/opv-demod.cpp:852-902: scale by mean |soft|, 3-bit quantize
with the reference's exact rule  clamp(trunc((-soft/scale)*3.5 + 3.5 + 0.5),
0, 7), deinterleave gather, Viterbi, pack reverse-byte-order, derandomize.
Fully batched over a leading frame axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core.framing import derandomize, pack_frame_bits
from opv_tpu.core.interleave import deinterleave_gather
from opv_tpu.ops.registry import viterbi_batch


def quantize_soft(soft: jnp.ndarray):
    """(B, 2144) float -> ((B, 2144) int32 in [0,7], ok mask (B,))."""
    scale = jnp.mean(jnp.abs(soft), axis=-1, keepdims=True)
    ok = scale[..., 0] >= 1e-10           # reference rejects all-zero payloads
    safe = jnp.where(scale > 0, scale, 1.0)
    n = (-soft / safe) * 3.5 + 3.5
    q = jnp.clip(jnp.trunc(n + 0.5), 0, CONFIG.soft_max).astype(jnp.int32)
    return q, ok


def decode_payloads(soft_payloads: jnp.ndarray):
    """Decode a batch of payload windows.

    soft_payloads: (B, 2144) float soft symbols (demodulator output order).
    Returns (frames (B, 134) uint8, metrics (B,) int32, ok (B,) bool).
    A metric of 0 is a "perfect" frame; ok=False mirrors the reference's
    metric<0 rejection for degenerate (all-zero) payloads.
    """
    q, ok = quantize_soft(soft_payloads)
    deint = q[..., jnp.asarray(deinterleave_gather())]
    bits, metrics = viterbi_batch(deint)
    frames = derandomize(pack_frame_bits(bits))
    return frames, metrics, ok
