"""RX stack tests: Viterbi unit tests, frame decoder round trips, CFO
estimator, and end-to-end batch demodulation against golden reference IQ."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.core.convcode import conv_encode_bits_np
from opv_tpu.core.framing import bytes_to_bits_msb, randomize
from opv_tpu.core.interleave import deinterleave_gather
from opv_tpu.rx.viterbi import viterbi_decode
from opv_tpu.rx.frame_decoder import decode_payloads
from opv_tpu.rx.cfo import estimate_cfo
from opv_tpu.rx.pipeline import rx_batch
from opv_tpu.tx import modulate_frames, tx_flush_zeros


def _load_iq(path):
    raw = np.fromfile(path, dtype="<i2").reshape(-1, 2)
    return raw[:, 0].astype(np.float64) + 1j * raw[:, 1].astype(np.float64)


class TestViterbi:
    def _encode(self, bits):
        return conv_encode_bits_np(bits)

    def test_clean_round_trip(self):
        rng = np.random.default_rng(0)
        u = rng.integers(0, 2, CONFIG.frame_bits, dtype=np.uint8)
        enc = self._encode(u)
        # map bit -> ideal soft: expected 1 -> 7, expected 0 -> 0
        soft = jnp.asarray(np.where(enc == 1, 7, 0), jnp.int32)
        bits, metric = viterbi_decode(soft)
        assert int(metric) == 0
        np.testing.assert_array_equal(np.asarray(bits), u)

    def test_corrects_errors(self):
        rng = np.random.default_rng(1)
        u = rng.integers(0, 2, CONFIG.frame_bits, dtype=np.uint8)
        enc = self._encode(u)
        soft = np.where(enc == 1, 7, 0).astype(np.int32)
        # flip 30 well-separated coded symbols hard
        for pos in range(0, 30 * 70, 70):
            soft[pos] = 7 - soft[pos]
        bits, metric = viterbi_decode(jnp.asarray(soft))
        assert int(metric) > 0
        np.testing.assert_array_equal(np.asarray(bits), u)

    def test_soft_beats_hard(self):
        # mid-scale (uncertain) symbols shouldn't destroy the path
        rng = np.random.default_rng(2)
        u = rng.integers(0, 2, CONFIG.frame_bits, dtype=np.uint8)
        enc = self._encode(u)
        soft = np.where(enc == 1, 7, 0).astype(np.int32)
        noisy = soft.copy()
        idx = rng.choice(len(soft), 200, replace=False)
        noisy[idx] = np.clip(noisy[idx] + rng.integers(-3, 4, 200), 0, 7)
        bits, _ = viterbi_decode(jnp.asarray(noisy))
        np.testing.assert_array_equal(np.asarray(bits), u)

    def test_radix4_scan_matches_reference(self):
        """viterbi_decode_r4 (the radix-4 fusion oracle, plain XLA) and
        viterbi_decode_fast (the slimmed scan the registry's XLA backend
        runs) are decision- and metric-identical to the sequential scan,
        including under massive metric ties (low-entropy inputs)."""
        from opv_tpu.rx.viterbi import (viterbi_decode_batch,
                                        viterbi_decode_fast_batch,
                                        viterbi_decode_r4_batch)
        rng = np.random.default_rng(11)
        soft = np.concatenate([
            rng.integers(0, 256, (3, CONFIG.encoded_bits)),
            np.zeros((1, CONFIG.encoded_bits)),
            np.full((1, CONFIG.encoded_bits), 7),
            rng.integers(0, 2, (3, CONFIG.encoded_bits))]).astype(np.int32)
        b1, m1 = viterbi_decode_batch(jnp.asarray(soft))
        for alt in (viterbi_decode_r4_batch, viterbi_decode_fast_batch):
            b2, m2 = alt(jnp.asarray(soft))
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


class TestFrameDecoder:
    def test_ideal_soft_round_trip(self):
        """encode_frame -> ideal soft symbols -> decode_payloads recovers the
        payload with metric 0 (the TX/RX chain inverse property)."""
        rng = np.random.default_rng(3)
        payloads = rng.integers(0, 256, (2, CONFIG.frame_bytes), dtype=np.uint8)
        enc = np.asarray(encode_frame(jnp.asarray(payloads)))
        # encoded bit 1 -> F1 tone dominant -> negative soft (sync convention)
        soft = np.where(enc == 1, -1000.0, 1000.0)
        frames, metrics, ok = decode_payloads(jnp.asarray(soft))
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(metrics), 0)
        np.testing.assert_array_equal(np.asarray(frames), payloads)

    def test_zero_payload_rejected(self):
        frames, metrics, ok = decode_payloads(jnp.zeros((1, CONFIG.encoded_bits)))
        assert not bool(np.asarray(ok)[0])


class TestCFO:
    def test_zero_offset_capture(self, golden_dir):
        # The reference's grid search is biased on this capture (+1430 Hz,
        # SURVEY.md section 2 C10) — we must reproduce exactly that bias.
        samples = _load_iq(golden_dir / "bert3.iq")
        off = float(jax.jit(estimate_cfo)(jnp.asarray(samples)))
        assert off == pytest.approx(1430.0)

    def test_tracks_applied_offset(self, golden_dir):
        samples = _load_iq(golden_dir / "bert3.iq")[:200_000]
        n = np.arange(len(samples))
        # note: grid clamps at +-1500 and this capture biases +1430, so only
        # negative applied offsets stay inside the search range
        for cfo in (-500.0, -1000.0):
            shifted = samples * np.exp(2j * np.pi * cfo * n / CONFIG.sample_rate)
            off = float(jax.jit(estimate_cfo)(jnp.asarray(shifted)))
            # grid resolution is 5 Hz, bias is ~1430 on this signal; offset
            # estimate must move by the applied shift
            assert off - 1430.0 == pytest.approx(cfo, abs=10.0)


class TestBatchPipeline:
    def test_golden_bert3_bit_exact(self, golden_dir):
        samples = _load_iq(golden_dir / "bert3.iq")
        out = rx_batch(samples)
        golden = np.frombuffer((golden_dir / "bert3.frames").read_bytes(),
                               dtype=np.uint8).reshape(-1, CONFIG.frame_bytes)
        assert out["decoded"] == len(golden) == 3
        assert out["perfect"] == 3
        np.testing.assert_array_equal(out["frames"], golden)

    def test_golden_raw3_bit_exact(self, golden_dir):
        samples = _load_iq(golden_dir / "raw3.iq")
        out = rx_batch(samples)
        golden = np.frombuffer((golden_dir / "raw3.bin").read_bytes(),
                               dtype=np.uint8).reshape(-1, CONFIG.frame_bytes)
        assert out["decoded"] == 3 and out["perfect"] == 3
        np.testing.assert_array_equal(out["frames"], golden)

    def test_own_tx_loopback(self):
        """Self loopback through our own fast TX (no offset): every frame
        decodes perfectly."""
        frames = build_bert_frame("KI5ZDF", frame_num=np.arange(4))
        enc = encode_frame(jnp.asarray(frames))
        iq, _ = modulate_frames(enc, exact=False)
        iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
        samples = np.asarray(iq)[:, 0] + 1j * np.asarray(iq)[:, 1].astype(np.float64)
        out = rx_batch(samples)
        assert out["decoded"] == 4 and out["perfect"] == 4
        np.testing.assert_array_equal(out["frames"], frames)

    def test_awgn_10db(self):
        """At Eb/N0 = 10 dB (per-sample SNR x 40) decoding still works; noise
        may cost sync acquisition on the first frame but everything after
        must be error-free (cf. BASELINE.md AWGN row; exact reference parity
        is covered by the awgn10 golden test in test_streaming.py)."""
        frames = build_bert_frame("W5NYV", frame_num=np.arange(4))
        enc = encode_frame(jnp.asarray(frames))
        iq, _ = modulate_frames(enc, exact=False)
        iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
        samples = (np.asarray(iq)[:, 0] + 1j * np.asarray(iq)[:, 1]).astype(np.complex128)
        sig_pow = np.mean(np.abs(samples[:4 * CONFIG.samples_per_frame]) ** 2)
        ebn0 = 10 ** (10.0 / 10)
        noise_pow = sig_pow / (ebn0 / CONFIG.samples_per_symbol)
        rng = np.random.default_rng(42)
        noise = (rng.standard_normal(len(samples)) +
                 1j * rng.standard_normal(len(samples))) * np.sqrt(noise_pow / 2)
        out = rx_batch(samples + noise)
        assert out["decoded"] >= 3
        k = 4 - out["decoded"]
        np.testing.assert_array_equal(out["frames"], frames[k:])
