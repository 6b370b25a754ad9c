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
    """
    h = prototype_filter(k, taps_per_branch)
    t = np.arange(len(h))
    hc = h[None, :] * np.exp(2j * np.pi * np.arange(k)[:, None] * t / k)
    ker = hc[:, ::-1]                                   # conv orientation
    # real-valued grouped conv: inputs (I, Q), outputs (re_c, im_c) per c
    kr, ki = np.real(ker), np.imag(ker)
    kernels = np.concatenate([
        np.stack([kr, -ki], axis=1),                    # re out
        np.stack([ki, kr], axis=1),                     # im out
    ], axis=0)                                          # (2K, 2, taps)
    kj = jnp.asarray(kernels, x.real.dtype)
    xin = jnp.stack([x.real, x.imag])[None]             # (1, 2, N)
    y = jax.lax.conv_general_dilated(
        xin, kj, window_strides=(k,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))[0]     # (2K, M)
    return (y[:k] + 1j * y[k:]).astype(x.dtype)


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
