"""Frame codec chain: the L3 "frame pipeline" of the reference, as batched ops.

TX chain (randomize -> conv-encode -> interleave) matches
src/opv-mod.cpp:159-213: the encoder consumes bytes from index 133 down to 0,
MSB-first within each byte, emitting (g1, g2) pairs, then block-interleaves.

RX finishing (pack reverse-byte-order -> derandomize) matches
src/opv-demod.cpp:878-895.

Everything here is shape-polymorphic over leading batch axes and jit/vmap
friendly; permutations and the randomizer mask are precomputed host tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opv_tpu.config import CONFIG
from opv_tpu.core.base40 import base40_encode
from opv_tpu.core.convcode import conv_encode_bits
from opv_tpu.core.interleave import interleave_perm
from opv_tpu.core.lfsr import randomizer_mask

_BIT_WEIGHTS_MSB = np.arange(7, -1, -1, dtype=np.uint8)   # MSB-first unpack shifts


def bytes_to_bits_msb(b: jnp.ndarray) -> jnp.ndarray:
    """(..., B) uint8 -> (..., 8B) bits, MSB first within each byte."""
    bits = (b[..., :, None] >> jnp.asarray(_BIT_WEIGHTS_MSB)) & 1
    return bits.reshape(*b.shape[:-1], b.shape[-1] * 8).astype(jnp.uint8)


def bits_to_bytes_msb(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8B) bits -> (..., B) uint8, MSB first within each byte."""
    n = bits.shape[-1] // 8
    g = bits.reshape(*bits.shape[:-1], n, 8).astype(jnp.uint8)
    w = (jnp.uint8(1) << jnp.asarray(_BIT_WEIGHTS_MSB)).astype(jnp.uint8)
    return (g * w).sum(axis=-1).astype(jnp.uint8)


def randomize(payload: jnp.ndarray) -> jnp.ndarray:
    """XOR-whiten (or de-whiten — it is an involution) a (..., 134) frame."""
    mask = jnp.asarray(randomizer_mask())
    return (payload.astype(jnp.uint8) ^ mask).astype(jnp.uint8)


derandomize = randomize  # the LFSR mask XOR is its own inverse


def encode_frame(payload: jnp.ndarray) -> jnp.ndarray:
    """(..., 134) uint8 payload -> (..., 2144) encoded+interleaved bits."""
    rnd = randomize(payload)
    # Encoder byte order: byte 133 first (opv-mod.cpp:186), MSB-first bits.
    u = bytes_to_bits_msb(rnd[..., ::-1])
    enc = conv_encode_bits(u)
    return enc[..., jnp.asarray(interleave_perm())]


def pack_frame_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """Viterbi output bits (..., 1072) -> (..., 134) bytes.

    Reverse byte order per src/opv-demod.cpp:878-884:
    packed[i] bit j = bits[1071 - 8i - j]  ==  reversed(bits) packed MSB-first?
    No — reversed(bits)[8i + j] = bits[1071-8i-j] goes to bit position j
    (LSB-first within each output byte of the reversed stream).
    """
    rev = bits[..., ::-1]
    n = rev.shape[-1] // 8
    g = rev.reshape(*rev.shape[:-1], n, 8).astype(jnp.uint8)
    w = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return (g * w).sum(axis=-1).astype(jnp.uint8)


def frame_to_symbol_bits(encoded: jnp.ndarray) -> jnp.ndarray:
    """Prepend the 24-bit sync word (MSB first): (..., 2144) -> (..., 2168)."""
    sync = jnp.asarray(np.array(CONFIG.sync_pattern_bits(), dtype=np.uint8))
    sync = jnp.broadcast_to(sync, (*encoded.shape[:-1], CONFIG.sync_bits))
    return jnp.concatenate([sync, encoded.astype(jnp.uint8)], axis=-1)


def build_bert_frame(callsign: str, token: int = CONFIG.default_token,
                     frame_num: int | np.ndarray = 0) -> np.ndarray:
    """BERT test frame(s) per src/opv-mod.cpp:339-361.

    frame_num may be an array of shape (B,) to build a batch (B, 134).
    """
    fn = np.atleast_1d(np.asarray(frame_num, dtype=np.int64))
    b = fn.shape[0]
    frame = np.zeros((b, CONFIG.frame_bytes), dtype=np.uint8)
    frame[:, :6] = np.frombuffer(base40_encode(callsign), dtype=np.uint8)
    frame[:, 6] = (token >> 16) & 0xFF
    frame[:, 7] = (token >> 8) & 0xFF
    frame[:, 8] = token & 0xFF
    idx = np.arange(CONFIG.frame_bytes - CONFIG.payload_offset, dtype=np.int64)
    frame[:, CONFIG.payload_offset:] = ((fn[:, None] + idx[None, :]) & 0xFF).astype(np.uint8)
    if np.isscalar(frame_num) or np.asarray(frame_num).ndim == 0:
        return frame[0]
    return frame
