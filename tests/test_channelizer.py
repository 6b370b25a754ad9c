"""Channelizer tests: wideband multi-carrier capture -> channel bank ->
per-channel OPV demodulation."""

import numpy as np
import pytest
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame
from opv_tpu.rx.channelizer import (channelize, msk_wideband,
                                    prototype_filter, synthesize_wideband)
from opv_tpu.rx.locked import rx_locked


class TestPrototype:
    def test_unit_passband(self):
        h = prototype_filter(8)
        assert abs(h.sum() - 1.0) < 1e-12
        # stopband rejection at the adjacent channel center
        w = np.exp(-2j * np.pi * np.arange(len(h)) * 1.0 / 8)
        assert abs((h * w).sum()) < 1e-3


class TestChannelize:
    def test_tone_separation(self):
        """Pure tones at channel centers land in their channels only."""
        k = 8
        n = 40960
        t = np.arange(n)
        x = sum(np.exp(2j * np.pi * c * t / k) * amp
                for c, amp in [(0, 1.0), (2, 2.0), (5, 3.0)])
        y = np.asarray(channelize(jnp.asarray(x.astype(np.complex64)), k))
        power = (np.abs(y[:, 50:-50]) ** 2).mean(axis=1)
        assert power[0] > 100 * max(power[1], power[3], power[4])
        assert power[2] > 100 * power[1]
        assert power[5] > 100 * power[4]
        # amplitude preserved (unit passband)
        assert abs(np.sqrt(power[2]) - 2.0) < 0.05

    def test_opv_multicarrier_decode(self):
        """3 OPV transmissions on a 4-channel wideband grid: channelize,
        then demodulate each channel and recover its own frames."""
        k = 4
        sets = {0: build_bert_frame("W5NYV", frame_num=np.arange(2)),
                1: build_bert_frame("KI5ZDF", frame_num=10 + np.arange(2)),
                3: build_bert_frame("TEST", frame_num=20 + np.arange(2))}
        wb_signals = {c: msk_wideband(f, k) for c, f in sets.items()}
        n = max(len(s) for s in wb_signals.values())
        x = synthesize_wideband(wb_signals, k, n)
        y = channelize(jnp.asarray(x.astype(np.complex64)), k)
        out = rx_locked(jnp.asarray(y), n_frames=2)
        fv = np.asarray(out["frame_valid"])
        frames = np.asarray(out["frames"])
        metrics = np.asarray(out["metrics"])
        for c, expected in sets.items():
            assert fv[c].all(), f"channel {c} frames invalid"
            np.testing.assert_array_equal(frames[c], expected)
            # prototype-filter ISI costs a couple of soft-metric points but
            # zero post-FEC errors
            assert (metrics[c] <= 16).all(), f"channel {c} metrics {metrics[c]}"
        # empty channel 2 must not produce valid frames
        assert not fv[2].any() or (metrics[2] > 100).all()
