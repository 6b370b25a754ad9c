"""Multichannel tracking-parity streaming: must be bit-identical to running
independent single-channel StreamingDemodulators."""

import numpy as np
import pytest

from opv_tpu.config import CONFIG
from opv_tpu.stream import StreamingDemodulator
from opv_tpu.stream.tracking import MultiChannelTrackingDemodulator


def _load_iq(golden_dir, name):
    raw = np.fromfile(golden_dir / name, dtype="<i2").reshape(-1, 2)
    return raw[:, 0].astype(np.float64) + 1j * raw[:, 1].astype(np.float64)


class TestTrackingParity:
    def test_two_heterogeneous_channels(self, golden_dir):
        """Channel 0: clean bert3; channel 1: +500 Hz cfo500 — the batched
        tracker must reproduce each single-channel result exactly."""
        s0 = _load_iq(golden_dir, "bert3.iq")
        s1 = _load_iq(golden_dir, "cfo500.iq")
        n = min(len(s0), len(s1))
        chans = np.stack([s0[:n], s1[:n]])

        singles = []
        for s in chans:
            sd = StreamingDemodulator()
            r = sd.feed(s) + sd.flush()
            singles.append([(fb, m) for fb, m, q, i in r])

        mc = MultiChannelTrackingDemodulator(channels=2)
        res = mc.feed(chans)
        res += mc.flush()
        got = {0: [], 1: []}
        for c, fb, m, q, i in res:
            got[c].append((fb, m))
        assert got[0] == singles[0]
        assert got[1] == singles[1]
        assert mc.sync_state == ["LOCKED", "LOCKED"]

    def test_slicing_invariance(self, golden_dir):
        s0 = _load_iq(golden_dir, "bert3.iq")
        chans = np.stack([s0, s0])
        rng = np.random.default_rng(1)
        mc = MultiChannelTrackingDemodulator(channels=2)
        res = []
        off = 0
        while off < chans.shape[1]:
            k = int(rng.integers(1, 60_000))
            res += mc.feed(chans[:, off:off + k])
            off += k
        res += mc.flush()
        golden = np.frombuffer((golden_dir / "bert3.frames").read_bytes(),
                               dtype=np.uint8).reshape(-1, CONFIG.frame_bytes)
        for c in (0, 1):
            got = [np.frombuffer(fb, np.uint8) for cc, fb, m, q, i in res if cc == c]
            np.testing.assert_array_equal(np.stack(got), golden)


class TestDivergentClocks:
    def test_no_deadlock_no_data_loss(self, golden_dir):
        """Channels with a 300 ppm relative clock offset: per-channel buffer
        counts drift apart indefinitely; the driver must neither deadlock
        nor silently drop input (regression for the lockstep-fill bug)."""
        s = _load_iq(golden_dir, "bert3.iq")
        # simulate a slower clock on channel 1 by resampling +300 ppm
        ppm = 300e-6
        n_out = int(len(s) / (1 + ppm)) - 2
        t = np.arange(n_out) * (1 + ppm)
        i0 = t.astype(np.int64)
        f = t - i0
        s_slow = s[i0] * (1 - f) + s[i0 + 1] * f
        n = min(len(s), len(s_slow))
        chans = np.stack([s[:n], s_slow[:n]])
        # tile the stream 3x so the count spread grows well past the slack
        chans = np.concatenate([chans] * 3, axis=1)
        mc = MultiChannelTrackingDemodulator(channels=2)
        res = mc.feed(chans)
        res += mc.flush()
        # every complete pass decodes its frames on both channels
        c0 = sum(1 for r in res if r[0] == 0)
        c1 = sum(1 for r in res if r[0] == 1)
        assert c0 >= 8 and c1 >= 8, (c0, c1)
