"""TX modulator tests, including bit-exact golden comparison vs the IQ
produced by the reference opv-mod binary (tests/golden/*.iq)."""

import numpy as np
import pytest

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.tx import mod_reset, modulate_frames, symbol_signs

import jax.numpy as jnp


def load_golden_iq(path):
    raw = np.fromfile(path, dtype="<i2").reshape(-1, 2)
    return raw


class TestSymbolSigns:
    def test_first_symbol_silent(self):
        # After reset t_xor==0, so both signs are 0 for the first symbol
        st = mod_reset()
        d1, d2, t, bn = symbol_signs(jnp.array([0, 0, 1, 1]), st.t_xor, st.b_n)
        assert int(d1[0]) == 0 and int(d2[0]) == 0

    def test_one_tone_active_per_symbol(self):
        st = mod_reset()
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, 100))
        d1, d2, _, _ = symbol_signs(bits, st.t_xor, st.b_n)
        d1, d2 = np.asarray(d1), np.asarray(d2)
        # after the silent first symbol, exactly one of (d1, d2) is +/-1
        assert np.all((np.abs(d1[1:]) + np.abs(d2[1:])) == 1)
        # bit 0 -> tone 1 path, bit 1 -> tone 2 path
        b = np.asarray(bits)
        assert np.all(np.abs(d1[1:]) == (1 - b[1:]))
        assert np.all(np.abs(d2[1:]) == b[1:])

    @pytest.mark.parametrize("t0,bn0", [(0, 1), (1, 0), (-1, 1), (1, 1)])
    def test_closed_form_matches_recurrence(self, t0, bn0):
        """symbol_signs is a cumsum closed form; pin it step-for-step
        against the reference recurrence (src/opv-mod.cpp:241-258) from
        every reachable carry state, including mid-stream resumes."""
        rng = np.random.default_rng(3)
        for n in (1, 2, 7, 500):
            bits = rng.integers(0, 2, n)
            t, bn = t0, bn0
            r1, r2 = [], []
            for b in bits:                      # the original recurrence
                d_neg_enc = -b if bn == 0 else b
                r1.append((1 - b) * t)
                r2.append(d_neg_enc * t)
                t = 1 if t == 0 else (1 - 2 * b) * t
                bn = 1 - bn
            d1, d2, t_f, bn_f = symbol_signs(
                jnp.asarray(bits), jnp.int32(t0), jnp.int32(bn0))
            assert np.asarray(d1).tolist() == r1, (t0, bn0, n)
            assert np.asarray(d2).tolist() == r2, (t0, bn0, n)
            assert (int(t_f), int(bn_f)) == (t, bn), (t0, bn0, n)


def _bert3_iq(exact):
    frames = build_bert_frame("W5NYV", CONFIG.default_token, np.arange(3))
    enc = encode_frame(jnp.asarray(frames))
    iq, _ = modulate_frames(enc, exact=exact)
    return np.asarray(iq)


class TestGoldenIQ:
    def test_exact_matches_reference_bit_for_bit(self, golden_dir):
        golden = load_golden_iq(golden_dir / "bert3.iq")
        n_signal = 3 * CONFIG.samples_per_frame
        # file = signal + 100 symbols of zero flush (opv-mod.cpp:528-530)
        assert golden.shape[0] == n_signal + 100 * CONFIG.samples_per_symbol
        assert np.all(golden[n_signal:] == 0)
        ours = _bert3_iq(exact=True)
        assert ours.shape[0] == n_signal
        np.testing.assert_array_equal(ours, golden[:n_signal])

    def test_fast_path_close_to_exact(self, golden_dir):
        golden = load_golden_iq(golden_dir / "bert3.iq")
        n_signal = 3 * CONFIG.samples_per_frame
        fast = _bert3_iq(exact=False)
        # closed-form periodic phase vs serial accumulation: at most 1 LSB off
        diff = np.abs(fast.astype(np.int32) - golden[:n_signal].astype(np.int32))
        assert diff.max() <= 1
        # and almost everywhere identical
        assert (diff == 0).mean() > 0.999

    def test_raw_mode_golden(self, golden_dir):
        payloads = np.frombuffer((golden_dir / "raw3.bin").read_bytes(),
                                 dtype=np.uint8).reshape(3, CONFIG.frame_bytes)
        enc = encode_frame(jnp.asarray(payloads))
        iq, _ = modulate_frames(enc, exact=True)
        golden = load_golden_iq(golden_dir / "raw3.iq")
        n_signal = 3 * CONFIG.samples_per_frame
        np.testing.assert_array_equal(np.asarray(iq), golden[:n_signal])

    def test_state_continuity_across_calls(self):
        # Modulating frame-by-frame must equal modulating the whole stream
        frames = build_bert_frame("TEST", frame_num=np.arange(2))
        enc = encode_frame(jnp.asarray(frames))
        whole, _ = modulate_frames(enc, exact=True)
        st = mod_reset()
        parts = []
        for i in range(2):
            iq, st = modulate_frames(enc[i:i + 1], state=st, exact=True)
            parts.append(np.asarray(iq))
        np.testing.assert_array_equal(np.concatenate(parts), np.asarray(whole))


class TestWireWords:
    """modulate_bits_wire: the packed-int32 production TX form (its LE bytes
    ARE the reference's interleaved int16 I,Q wire stream — the (N, 2) API
    view is a bitcast of the same words, see PERF.md TX section)."""

    def test_wire_bytes_equal_interleaved_view(self):
        from opv_tpu.core.framing import frame_to_symbol_bits
        from opv_tpu.tx import modulate_bits_wire
        frames = build_bert_frame("W5NYV", frame_num=np.arange(2))
        enc = encode_frame(jnp.asarray(frames))
        bits = frame_to_symbol_bits(enc).reshape(-1).astype(jnp.int32)
        wire, st_w = modulate_bits_wire(bits, mod_reset())
        iq, st_f = modulate_frames(enc, exact=False)
        assert np.asarray(wire).tobytes() == np.asarray(iq).tobytes()
        assert int(st_w.n160) == int(st_f.n160)

    def test_wire_state_continuity_odd_lengths(self):
        # odd (non-multiple-of-4-symbol) calls pad rows internally but must
        # carry n160/t/b state exactly as one whole call would
        from opv_tpu.tx import modulate_bits_wire
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, 433), jnp.int32)
        whole, _ = modulate_bits_wire(bits, mod_reset())
        st = mod_reset()
        parts = []
        for lo, hi in [(0, 1), (1, 10), (10, 217), (217, 433)]:
            w, st = modulate_bits_wire(bits[lo:hi], st)
            parts.append(np.asarray(w))
        np.testing.assert_array_equal(np.concatenate(parts), np.asarray(whole))
