"""Analysis channelizer: one wideband capture -> K-channel bank.

The multichannel pipelines (rx_locked / stream.multichannel) consume per-
channel baseband at 2.168 MSPS.  In deployment those channels arrive as ONE
wideband digitizer stream at K x 2.168 MSPS; this module splits it
(SURVEY.md section 7.4 "channelizer for the 64-channel bank config").

Formulation: channel c is  decimate_K( lowpass_h( x[n] e^{-j2pi c n/K} ) ).
Pulling the mixer through the filter gives

    y_c[m] = const_phase * sum_t (h[t] e^{j2pi c t/K}) x[mK + d - t]

i.e. a stride-K convolution of the wideband stream with K modulated copies
of the prototype — ONE grouped strided conv (MXU work), no gathers, no FFT
bookkeeping, and constant per-channel phase (irrelevant to the non-coherent
OPV demod).  Cost is N*taps*2 MACs per channel — trivial next to the demod.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def prototype_filter(k: int, taps_per_branch: int = 12, beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed-sinc lowpass, cutoff at half the channel spacing.

    Length K * taps_per_branch, unit passband gain.  OPV occupies only the
    inner few percent of a 2.168 MHz channel, so the passband is flat where
    it matters and adjacent-channel rejection is set by `beta`.
    """
    n = k * taps_per_branch
    t = np.arange(n) - (n - 1) / 2
    h = np.sinc(t / k) * np.kaiser(n, beta)
    return (h / h.sum()).astype(np.float64)


@functools.partial(jax.jit, static_argnames=("k", "taps_per_branch"))
def channelize(x: jnp.ndarray, k: int, taps_per_branch: int = 12) -> jnp.ndarray:
    """(N,) complex wideband at K*fs_ch -> (K, M) channel basebands at fs_ch.

    Output channel c carries the band centered at +c * fs_ch (c > K/2 wraps
    to negative frequencies) with a constant group delay of
    (K*taps_per_branch-1)/K output samples.

    Formulated as the POLYPHASE decomposition mapped to TPU primitives:
    the stride-K modulated filterbank splits (t = pK + q) into

        y_c[m] = sum_r W[c,r] * u[m,r],
        u[m,r] = sum_p g[p,r] * X[m+p, r],       X[j,r] = x[jK + r]

    i.e. a free contiguous reshape into polyphase rows X, a taps_per_branch-
    term accumulation of SHIFTED X slices weighted per column (one fused
    elementwise pass; no gathers, no strided conv), and one (M, K) x (K, K)
    DFT-matrix matmul on the MXU (complex via a real (M, 2K) x (2K, 2K)
    kernel, as rx/locked.py's soft stage).  The previous formulation — a
    stride-K `conv_general_dilated` with a K*taps-long kernel — lowered
    ~200x off the HBM roofline on this TPU (22.7 ms/frame-quantum at K=64
    vs ~0.8 ms here); that conv path survives only in git history.
    Numerically this reorders the same MACs (ulp-level differences; frame
    decodes and the channel-power tests are unaffected).
    """
    h = prototype_filter(k, taps_per_branch)
    taps = taps_per_branch
    n = x.shape[0]
    m = (n - k * taps) // k + 1
    real_dt = x.real.dtype
    # polyphase rows: X[j, r] = x[jK + r]  (free reshape of the stream)
    rows = m + taps - 1
    xr = x[: rows * k].reshape(rows, k)
    xf = jnp.stack([xr.real, xr.imag], axis=-1).astype(real_dt)  # (rows,K,2)
    # g[p, r] = h[(taps-1-p)K + (K-1-r)]: the doubly-reversed tap matrix
    g = np.asarray(h.reshape(taps, k)[::-1, ::-1])
    gj = jnp.asarray(g, real_dt)[:, :, None]
    acc = jnp.zeros((m, k, 2), real_dt)
    for p in range(taps):                # taps is small & static: unrolled,
        acc = acc + xf[p: p + m] * gj[p]  # XLA fuses into one pass
    # DFT across polyphase legs: W[c, r] = e^{+2j pi c (K-1-r) / K}, as one
    # real matmul (M, 2K) x (2K, 2K) with interleaved re/im kernel rows
    w = np.exp(2j * np.pi * np.arange(k)[:, None]
               * (k - 1 - np.arange(k))[None, :] / k)   # (c, r)
    wr, wi = w.real.T, w.imag.T                          # (r, c)
    kern = np.stack([np.concatenate([wr, wi], axis=1),   # re leg of u
                     np.concatenate([-wi, wr], axis=1)],  # im leg of u
                    axis=1).reshape(2 * k, 2 * k)
    y = acc.reshape(m, 2 * k) @ jnp.asarray(kern, real_dt)   # (M, 2K)
    return (y[:, :k] + 1j * y[:, k:]).astype(x.dtype).T


def synthesize_wideband(channel_signals: dict, k: int, n: int) -> np.ndarray:
    """Simulation helper: place signals (already sampled at the WIDEBAND
    rate) on the channelizer grid by direct frequency shift and summation.

    channel_signals: {channel_index c: (<=N,) complex wideband-rate signal}.
    """
    out = np.zeros(n, np.complex128)
    t = np.arange(n)
    for c, s in channel_signals.items():
        m = min(len(s), n)
        out[:m] += np.asarray(s[:m]) * np.exp(2j * np.pi * c * t[:m] / k)
    return out
