"""Whole-capture RX pipelines gluing the demod stages together.

`rx_batch` mirrors the reference's batch mode (opv-demod.cpp:1127-1216): one
CFO estimate, one demodulate pass over the full capture, sync scan, frame
decode.  Everything after sample load is one jit-compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from opv_tpu.config import CONFIG
from opv_tpu.rx.cfo import estimate_cfo
from opv_tpu.rx.demod import LoopState, demodulate_block, loop_state_init, max_symbols
from opv_tpu.rx.frame_decoder import decode_payloads
from opv_tpu.rx.sync import (
    SyncTrackerState, extract_payload_windows, sync_correlate, sync_scan,
    sync_tracker_init,
)


def rx_block_from_soft(soft: jnp.ndarray, sym_valid: jnp.ndarray,
                       tstate: SyncTrackerState, hist: jnp.ndarray,
                       max_frames: int, with_events: bool = False):
    """Sync + decode from an already-demodulated soft-symbol block.

    The seam between the symbol-tracking loop (JAX scan in rx/demod.py, or
    the native C runtime in opv_tpu/runtime/tracking.c) and the batched
    sync/FEC machinery — both front-ends feed this one program.
    """
    eb = CONFIG.encoded_bits
    v = sym_valid.sum().astype(jnp.int32)
    soft_cat = jnp.concatenate([hist, soft])
    raw, norm = sync_correlate(soft_cat[eb - (CONFIG.sync_bits - 1):])
    tstate2, ready, q, events, ev_misses, ev_frames = sync_scan(
        tstate, raw, norm, sym_valid)
    payloads, qs, slot_valid, t_idx = extract_payload_windows(
        soft_cat, ready, q, max_frames)
    frames, metrics, ok = decode_payloads(payloads)
    hist2 = jax.lax.dynamic_slice(soft_cat, (v,), (eb,))
    out = dict(
        frames=frames, metrics=metrics, frame_valid=ok & slot_valid,
        sync_q=qs, t_idx=t_idx, n_symbols=v,
        soft=soft, sym_valid=sym_valid,
    )
    if with_events:
        out.update(events=events, ev_misses=ev_misses, ev_frames=ev_frames,
                   sync_raw=raw, sync_norm=norm)
    return out, tstate2, hist2


def rx_block(samples: jnp.ndarray, n_valid, lstate: LoopState,
             tstate: SyncTrackerState, hist: jnp.ndarray,
             max_frames: int, afc_alpha=None, with_events: bool = False):
    """Demod + sync + decode one fixed-capacity block of IQ.

    hist: (2144,) soft-symbol history from the previous block (zeros at
    stream start).  Returns a dict of fixed-shape results + updated carries.
    with_events=True adds per-symbol sync-lifecycle streams (events/
    ev_misses/ev_frames/sync_raw/sync_norm) so streaming front-ends can
    print the reference's transition diagnostics (src/opv-demod.cpp:651-706).
    """
    soft, sym_valid, lstate2, used = demodulate_block(
        samples, n_valid, lstate, afc_alpha=afc_alpha)
    out, tstate2, hist2 = rx_block_from_soft(
        soft, sym_valid, tstate, hist, max_frames, with_events=with_events)
    out["samples_used"] = used
    return out, lstate2, tstate2, hist2


@functools.partial(jax.jit, static_argnames=("max_frames", "estimate", "dtype",
                                             "coherent"))
def _rx_batch_jit(samples, init_offset, max_frames, estimate, dtype, afc_alpha,
                  coherent=False, pll_alpha=0.01, pll_beta=0.001):
    rdtype = jnp.float64 if dtype == "float64" else jnp.float32
    if estimate:
        offset = estimate_cfo(samples).astype(rdtype)
    else:
        offset = jnp.asarray(init_offset, rdtype)
    tstate = sync_tracker_init(dtype=rdtype)
    hist = jnp.zeros(CONFIG.encoded_bits, rdtype)
    n = jnp.int32(samples.shape[0])
    if coherent:
        from opv_tpu.rx.coherent import coherent_state_init, demodulate_coherent
        cstate = coherent_state_init(offset, dtype=rdtype)
        soft, cstate2 = demodulate_coherent(samples, cstate, afc_alpha,
                                            pll_alpha, pll_beta)
        eb = CONFIG.encoded_bits
        soft_cat = jnp.concatenate([hist, soft])
        raw, norm = sync_correlate(soft_cat[eb - (CONFIG.sync_bits - 1):])
        valid = jnp.ones(soft.shape, bool)
        tstate2, ready, q, _ev, _evm, _evf = sync_scan(tstate, raw, norm, valid)
        payloads, qs, slot_valid, t_idx = extract_payload_windows(
            soft_cat, ready, q, max_frames)
        frames, metrics, ok = decode_payloads(payloads)
        out = dict(frames=frames, metrics=metrics, frame_valid=ok & slot_valid,
                   sync_q=qs, t_idx=t_idx, n_symbols=valid.sum().astype(jnp.int32),
                   samples_used=n)
        out["freq_offset"] = cstate2.freq_offset
    else:
        lstate = loop_state_init(offset, dtype=rdtype)
        out, lstate2, tstate2, _ = rx_block(
            samples, n, lstate, tstate, hist, max_frames, afc_alpha=afc_alpha)
        out["freq_offset"] = lstate2.freq_offset
    out["est_offset"] = offset
    out["tracker_state"] = tstate2.state
    return out


def rx_batch(samples: np.ndarray, init_offset: float | None = None,
             afc_alpha: float = CONFIG.afc_alpha, dtype: str = "float64",
             coherent: bool = False, pll_bw: float = 50.0):
    """Batch-demodulate a whole capture (reference batch mode).

    samples: (N,) complex.  If init_offset is None the coarse CFO grid search
    runs first (opv-demod.cpp:1166).  coherent=True selects the Costas-loop
    demod (C12 parity; non-functional in the reference too).  Returns the
    rx_block result dict with only valid frame slots retained.
    """
    n = len(samples)
    cdtype = np.complex128 if dtype == "float64" else np.complex64
    samples = jnp.asarray(np.asarray(samples, dtype=cdtype))
    max_frames = max_symbols(n) // CONFIG.frame_symbols + 2
    from opv_tpu.rx.coherent import pll_gains
    pa, pb = pll_gains(pll_bw) if coherent else (0.01, 0.001)
    out = _rx_batch_jit(samples,
                        0.0 if init_offset is None else float(init_offset),
                        max_frames, init_offset is None, dtype,
                        float(afc_alpha), coherent, pa, pb)
    out = {k: np.asarray(v) for k, v in out.items()}
    keep = out["frame_valid"]
    for k in ("frames", "metrics", "sync_q", "t_idx"):
        out[k] = out[k][keep]
    out["decoded"] = int(keep.sum())
    out["perfect"] = int((out["metrics"] == 0).sum())
    return out
