"""Locked-grid multichannel demodulator — the steady-state production path.

A continuous OPV transmission places one frame every 86,720 samples at a
fixed sample phase (locked clocks).  Once that grid is known, the entire RX
pipeline becomes gather-free, fixed-stride tensor algebra — the shape the MXU
and every TPU backend lowers happily:

  1. dense tone correlation (40-tap convs, as rx/fast.py)
  2. grid acquisition: argmax of the dilated sync correlation over the first
     frame interval per channel
  3. payload extraction as ONE unbatched dynamic_slice per channel plus a
     static strided reshape (no batched gathers, no nonzero)
  4. batched Viterbi + frame finishing

Use rx_fast for exploratory/bursty captures; use rx_locked for continuous
streams and throughput benchmarking.  Validity of the lock is reported via
the per-frame sync quality so callers can fall back to re-acquisition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.rx.fast import dense_soft, dense_sync
from opv_tpu.rx.frame_decoder import decode_payloads

_SPS = CONFIG.samples_per_symbol
_SB = CONFIG.sync_bits
_EB = CONFIG.encoded_bits
_FS = CONFIG.frame_symbols


def acquire_grid(raw: jnp.ndarray) -> jnp.ndarray:
    """(C, M) dense sync correlation -> (C,) sample index of the first sync.

    Earliest position within the first frame interval whose raw correlation
    reaches 90% of that interval's maximum (the first sync can be slightly
    weaker than later ones — e.g. the modulator's silent first symbol after
    reset — so a plain argmax would lock onto frame 2).  argmax of a boolean
    returns the first True: gather-free."""
    window = raw[:, : _FS * _SPS]
    wmax = window.max(axis=-1, keepdims=True)
    cand = window >= 0.9 * wmax
    first = jnp.argmax(cand, axis=-1).astype(jnp.int32)[:, None]
    # refine to the true peak within one symbol of the first candidate
    # (the 90% threshold can fire on the rising edge a few samples early)
    idx = jnp.arange(window.shape[-1], dtype=jnp.int32)[None, :]
    near = (idx >= first) & (idx < first + _SPS)
    return jnp.argmax(jnp.where(near, window, -jnp.inf), axis=-1).astype(jnp.int32)


def extract_grid_payloads(soft: jnp.ndarray, p0: jnp.ndarray, n_frames: int):
    """(C, M) dense soft + (C,) sync positions -> (C, F, 2144) payloads.

    One unbatched dynamic_slice per channel (python-unrolled over the static
    channel count), then static strided reshape: payload symbol j of frame f
    sits at p0 + 86720*f + 960 + 40*j.
    """
    c, m = soft.shape
    span = n_frames * _FS * _SPS
    start_max = m - span - _SB * _SPS
    outs = []
    for ci in range(c):
        start = jnp.clip(p0[ci] + _SB * _SPS, 0, start_max + _SB * _SPS)
        w = jax.lax.dynamic_slice(soft[ci], (start,), (span,))
        w = w.reshape(n_frames, _FS, _SPS)[:, :_EB, 0]
        outs.append(w)
    return jnp.stack(outs)


def grid_sync_quality(norm: jnp.ndarray, p0: jnp.ndarray, n_frames: int):
    """Normalized sync correlation at each expected frame position (C, F)."""
    c, m = norm.shape
    outs = []
    for ci in range(c):
        start = jnp.clip(p0[ci], 0, m - (n_frames - 1) * _FS * _SPS - 1)
        w = jax.lax.dynamic_slice(norm[ci], (start,),
                                  ((n_frames - 1) * _FS * _SPS + 1,))
        outs.append(jnp.concatenate([w[:: _FS * _SPS]]))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_frames", "estimate_cfo_flag"))
def rx_locked(samples: jnp.ndarray, n_frames: int, freq_offset=None,
              estimate_cfo_flag: bool = True):
    """Locked-grid pipeline: (C, N) complex -> n_frames decoded frames/chan.

    N must cover p0 + n_frames full frames; callers size blocks with one
    frame of slack.  Returns dict with frames (C, F, 134), metrics (C, F),
    frame_valid (C, F), sync_q (C, F), p0 (C,), freq_offset (C,).
    """
    c, n = samples.shape
    if freq_offset is None:
        freq_offset = jnp.zeros((c,), jnp.float32)
    if estimate_cfo_flag:
        from opv_tpu.rx.cfo import estimate_cfo_batch
        freq_offset = estimate_cfo_batch(samples).astype(jnp.float32)

    soft = dense_soft(samples, freq_offset)
    raw, norm = dense_sync(soft)
    p0 = acquire_grid(raw)
    payloads = extract_grid_payloads(soft, p0, n_frames)
    q = grid_sync_quality(norm, p0, n_frames)
    flat = payloads.reshape(-1, _EB)
    frames, metrics, ok = decode_payloads(flat)
    fv = ok.reshape(c, n_frames) & (q >= CONFIG.sync_locked_norm_thresh)
    return dict(
        frames=frames.reshape(c, n_frames, CONFIG.frame_bytes),
        metrics=metrics.reshape(c, n_frames),
        frame_valid=fv, sync_q=q, p0=p0,
        freq_offset=freq_offset,
        n_decoded=fv.sum(),
    )
