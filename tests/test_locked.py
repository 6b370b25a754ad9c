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

    def test_int8_window_buffer_matches_f32(self):
        """int8 window rows (the quantized production buffer,
        rx/locked.py INT8_SCALE) must decode the SAME frames as the f32
        windowed buffer — the s8 x s8 -> s32 correlation plus wire-scale
        rescaling keeps sync thresholds and the 3-bit soft quantizer
        inside their margins, clean and at moderate SNR."""
        from opv_tpu.rx.locked import INT8_SCALE, rx_locked_steady
        frames = build_bert_frame("W5NYV", frame_num=np.arange(5))
        enc = encode_frame(jnp.asarray(frames))
        iq, _ = modulate_frames(enc, exact=False)
        iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
        s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
        rng = np.random.default_rng(3)
        chans = np.stack([
            np.concatenate([np.zeros(off, np.complex64), s])[:len(s)]
            for off in (0, 13, 37)])
        chans[2] += (2000.0 * (rng.standard_normal(chans[2].shape)
                               + 1j * rng.standard_normal(chans[2].shape))
                     ).astype(np.complex64)

        out = rx_locked(jnp.asarray(chans), n_frames=5)
        p0, foff = out["p0"], out["freq_offset"]
        n40 = (chans.shape[1] // 40) * 40
        pairs = np.stack([chans.real, chans.imag], -1)[:, :n40]
        win_f = jnp.asarray(pairs.reshape(3, -1, 80).astype(np.float32))
        win_q = jnp.asarray(
            np.clip(np.round(pairs / INT8_SCALE), -127, 127)
            .astype(np.int8).reshape(3, -1, 80))
        o_f = rx_locked_steady(win_f, p0, foff, n_frames=5)
        o_q = rx_locked_steady(win_q, p0, foff, n_frames=5)
        assert np.asarray(o_f["frame_valid"]).all()
        np.testing.assert_array_equal(np.asarray(o_f["frames"]),
                                      np.asarray(o_q["frames"]))
        np.testing.assert_array_equal(np.asarray(o_f["frame_valid"]),
                                      np.asarray(o_q["frame_valid"]))
        # clean channels stay metric-0; sync quality unaffected at 3 d.p.
        np.testing.assert_array_equal(np.asarray(o_q["metrics"])[:2], 0)
        np.testing.assert_allclose(np.asarray(o_q["sync_q"]),
                                   np.asarray(o_f["sync_q"]), atol=2e-3)

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
