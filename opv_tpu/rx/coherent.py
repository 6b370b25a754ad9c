"""Coherent MSK demodulator (decision-directed Costas loop) — C12 parity.

Faithful reformulation of the reference's CoherentMSKDemodulator
(src/opv-demod.cpp:365-572) as a lax.scan: fixed symbol grid (no timing
recovery), per-sample carrier de-rotation advancing by loop_freq, soft
decision Re(corr_f2) - Re(corr_f1), 2nd-order PLL (alpha/beta from the -p
bandwidth via zeta=0.707), plus the same AFC side loop.

NOTE: the reference's coherent mode is demonstrably non-functional (AFC rails
at +2000 Hz and zero frames decode on clean IQ — SURVEY.md section 2 C12 and
section 4).  This port reproduces the algorithm for parity and experiments;
do not gate anything on it.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opv_tpu.config import CONFIG

_TWO_PI = 2.0 * math.pi
_PI = math.pi
_SPS = CONFIG.samples_per_symbol


class CoherentState(NamedTuple):
    freq_offset: jnp.ndarray
    carrier_phase: jnp.ndarray
    phase_f1: jnp.ndarray
    phase_f2: jnp.ndarray
    loop_freq: jnp.ndarray
    prev_dom: jnp.ndarray


def coherent_state_init(freq_offset=0.0, dtype=jnp.float64) -> CoherentState:
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    z = jnp.asarray(0.0, dtype)
    return CoherentState(jnp.asarray(freq_offset, dtype), z, z, z, z,
                         jnp.asarray(0.0, cdtype))


def pll_gains(pll_bw_hz: float):
    """-p bandwidth -> (alpha, beta), opv-demod.cpp:554-561."""
    wn = pll_bw_hz * _TWO_PI
    zeta = 0.707
    return (2.0 * zeta * wn / CONFIG.symbol_rate,
            wn * wn / (CONFIG.symbol_rate ** 2))


def _wrap_pi(p):
    p = jnp.where(p > _PI, p - _TWO_PI, p)
    return jnp.where(p < -_PI, p + _TWO_PI, p)


def demodulate_coherent(samples: jnp.ndarray, state: CoherentState,
                        afc_alpha: float, pll_alpha: float, pll_beta: float):
    """(N,) complex -> ((nsym,) soft, final state)."""
    rdtype = state.freq_offset.dtype
    nsym = samples.shape[0] // _SPS
    sym = samples[: nsym * _SPS].reshape(nsym, _SPS)
    i40 = jnp.arange(_SPS, dtype=rdtype)
    fd = jnp.asarray(CONFIG.freq_dev, rdtype)
    fs = jnp.asarray(CONFIG.sample_rate, rdtype)
    sr = jnp.asarray(CONFIG.symbol_rate, rdtype)

    def step(carry, x):
        foff, cp, ph1, ph2, lf, pdom, k = carry
        s = x
        inc1 = _TWO_PI * (-fd + foff) / fs
        inc2 = _TWO_PI * (fd + foff) / fs
        cp_i = cp + i40 * lf
        rot = jnp.exp(-1j * cp_i).astype(s.dtype)
        corrected = s * rot
        lo1 = jnp.exp(1j * (ph1 + i40 * inc1)).astype(s.dtype)
        lo2 = jnp.exp(1j * (ph2 + i40 * inc2)).astype(s.dtype)
        c1 = jnp.sum(corrected * jnp.conj(lo1))
        c2 = jnp.sum(corrected * jnp.conj(lo2))
        ph1n = _wrap_pi(ph1 + _SPS * inc1)
        ph2n = _wrap_pi(ph2 + _SPS * inc2)
        cpn = _wrap_pi(cp + _SPS * lf)

        e1 = c1.real ** 2 + c1.imag ** 2
        e2 = c2.real ** 2 + c2.imag ** 2
        soft = c2.real - c1.real
        dom = jnp.where(e1 > e2, c1, c2)
        mag = jnp.abs(dom)
        pe = jnp.where(mag > 1e-10, dom.imag / mag, 0.0).astype(rdtype)
        lfn = jnp.clip(lf + pll_beta * pe, -0.1, 0.1)
        cpn = cpn + pll_alpha * pe

        pd = jnp.angle(dom * jnp.conj(pdom)).astype(rdtype)
        ferr = pd * sr / _TWO_PI
        foff_n = jnp.where(k > 0,
                           jnp.clip(foff + afc_alpha * ferr,
                                    -CONFIG.afc_clamp_hz, CONFIG.afc_clamp_hz),
                           foff)
        return (foff_n, cpn, ph1n, ph2n, lfn, dom, k + 1), soft

    carry0 = (state.freq_offset, state.carrier_phase, state.phase_f1,
              state.phase_f2, state.loop_freq, state.prev_dom, jnp.int32(0))
    carry_f, soft = jax.lax.scan(step, carry0, sym)
    foff, cp, ph1, ph2, lf, pdom, _ = carry_f
    return soft, CoherentState(foff, cp, ph1, ph2, lf, pdom)
