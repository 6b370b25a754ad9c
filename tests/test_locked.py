"""Locked-grid (production steady-state) pipeline tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.rx.locked import rx_locked
from opv_tpu.tx import modulate_frames, tx_flush_zeros


def _load_iq_c64(path):
    raw = np.fromfile(path, dtype="<i2").reshape(-1, 2)
    return (raw[:, 0] + 1j * raw[:, 1]).astype(np.complex64)


class TestLocked:
    def test_golden_bit_exact(self, golden_dir):
        s = _load_iq_c64(golden_dir / "bert3.iq")
        golden = np.frombuffer((golden_dir / "bert3.frames").read_bytes(),
                               dtype=np.uint8).reshape(-1, CONFIG.frame_bytes)
        out = rx_locked(jnp.asarray(np.stack([s] * 4)), n_frames=3)
        fv = np.asarray(out["frame_valid"])
        assert fv.all()
        for c in range(4):
            np.testing.assert_array_equal(np.asarray(out["frames"])[c], golden)
        np.testing.assert_array_equal(np.asarray(out["metrics"]), 0)

    def test_sample_offsets(self, golden_dir):
        s = _load_iq_c64(golden_dir / "bert3.iq")
        golden = np.frombuffer((golden_dir / "bert3.frames").read_bytes(),
                               dtype=np.uint8).reshape(-1, CONFIG.frame_bytes)
        chans = np.stack([
            np.concatenate([np.zeros(off, np.complex64), s])[:len(s)]
            for off in (0, 13, 27, 39)])
        out = rx_locked(jnp.asarray(chans), n_frames=2)
        fv = np.asarray(out["frame_valid"])
        assert fv.all()
        np.testing.assert_array_equal(np.asarray(out["metrics"]), 0)
        for c in range(4):
            np.testing.assert_array_equal(np.asarray(out["frames"])[c], golden[:2])

    def test_many_frames(self):
        frames = build_bert_frame("KI5ZDF", frame_num=np.arange(10))
        enc = encode_frame(jnp.asarray(frames))
        iq, _ = modulate_frames(enc, exact=False)
        iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
        s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
        out = rx_locked(jnp.asarray(np.stack([s] * 2)), n_frames=10)
        fv = np.asarray(out["frame_valid"])
        assert fv.all()
        np.testing.assert_array_equal(np.asarray(out["metrics"]), 0)
        for c in range(2):
            np.testing.assert_array_equal(np.asarray(out["frames"])[c], frames)

    def test_bad_lock_detectable(self):
        """Noise-only channels: rx_locked assumes a transmission is present
        (it's the steady-state path), so garbage can pass the sync-quality
        gate — but never with a perfect Viterbi metric.  Callers distinguish
        real traffic by metric, as the reference's operators do."""
        rng = np.random.default_rng(0)
        noise = ((rng.standard_normal((2, 2 * CONFIG.samples_per_frame)) +
                  1j * rng.standard_normal((2, 2 * CONFIG.samples_per_frame)))
                 * 100).astype(np.complex64)
        out = rx_locked(jnp.asarray(noise), n_frames=1)
        assert (np.asarray(out["metrics"]) > 100).all()
