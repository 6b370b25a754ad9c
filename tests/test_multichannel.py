"""Multichannel overlap-save streaming runtime tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.stream.multichannel import MultiChannelDemodulator
from opv_tpu.tx import modulate_frames, tx_flush_zeros


@pytest.fixture(scope="module")
def capture10():
    frames = build_bert_frame("W5NYV", frame_num=np.arange(10))
    enc = encode_frame(jnp.asarray(frames))
    iq, _ = modulate_frames(enc, exact=False)
    iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
    s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
    return s, frames


class TestMultiChannel:
    def test_all_frames_once(self, capture10):
        s, frames = capture10
        mc = MultiChannelDemodulator(channels=3, block_frames=4)
        res = mc.feed(np.stack([s] * 3))
        res += mc.flush()
        per_chan = {}
        for c, fb, metric, q, pos in res:
            per_chan.setdefault(c, []).append((pos, fb, metric))
        assert set(per_chan) == {0, 1, 2}
        for c, lst in per_chan.items():
            lst.sort()
            assert len(lst) == 10, f"channel {c}: {len(lst)} frames"
            got = np.stack([np.frombuffer(fb, np.uint8) for _, fb, _ in lst])
            np.testing.assert_array_equal(got, frames)
            assert all(m == 0 for _, _, m in lst)
            # absolute positions land on the frame grid (+-1 sample of
            # detection-plateau wobble between blocks)
            positions = np.array([p for p, _, _ in lst])
            assert np.abs(np.diff(positions) - CONFIG.samples_per_frame).max() <= 2

    def test_slicing_invariance(self, capture10):
        s, frames = capture10
        rng = np.random.default_rng(0)
        mc = MultiChannelDemodulator(channels=2, block_frames=3)
        res = []
        off = 0
        x = np.stack([s, s])
        while off < x.shape[1]:
            n = int(rng.integers(1, 120_000))
            res += mc.feed(x[:, off:off + n])
            off += n
        res += mc.flush()
        assert sum(1 for r in res if r[0] == 0) == 10
        assert sum(1 for r in res if r[0] == 1) == 10
        assert mc.perfect == 20

    def test_channel_offset_independence(self, capture10):
        """Channels with different sample offsets and CFOs decode
        independently."""
        s, frames = capture10
        n = np.arange(len(s))
        chans = np.stack([
            s,
            np.concatenate([np.zeros(17, np.complex64), s[:-17]]),
            (s * np.exp(-2j * np.pi * 700.0 * n / CONFIG.sample_rate)
             ).astype(np.complex64),
        ])
        mc = MultiChannelDemodulator(channels=3, block_frames=5)
        res = mc.feed(chans)
        res += mc.flush()
        counts = [sum(1 for r in res if r[0] == c) for c in range(3)]
        assert counts[0] == 10 and counts[1] == 10
        assert counts[2] >= 9          # CFO channel may lose one to AFC-free bias
        for c, fb, metric, q, pos in res:
            f = np.frombuffer(fb, np.uint8)
            assert f[12] == f[13] - 1  # BERT payload structure intact


class TestTruncatedStream:
    def test_flush_no_phantom_frames(self, capture10):
        """A stream cut off mid-frame must not yield a corrupted phantom
        frame from the zero padding (regression)."""
        s, frames = capture10
        spf = CONFIG.samples_per_frame
        cut = 5 * spf + 960 + spf // 5     # sync + ~20% of frame 6's payload
        mc = MultiChannelDemodulator(channels=1, block_frames=4)
        res = mc.feed(s[None, :cut])
        res += mc.flush()
        got = np.stack([np.frombuffer(fb, np.uint8) for _, fb, m, q, p in res])
        assert got.shape[0] == 5           # only the complete frames
        np.testing.assert_array_equal(got, frames[:5])
