"""Unit tests for the codec core: base40, LFSR mask, conv code, interleaver,
frame encode chain.  These are the per-component tests the reference lacks
(SURVEY.md section 4 implication)."""

import numpy as np
import pytest

from opv_tpu.config import CONFIG
from opv_tpu.core import (
    base40_encode, base40_decode, randomizer_mask, conv_encode_bits,
    interleave_perm, deinterleave_gather, encode_frame, build_bert_frame,
    pack_frame_bits, derandomize,
)
from opv_tpu.core.convcode import conv_encode_bits_np
from opv_tpu.core.framing import bytes_to_bits_msb, bits_to_bytes_msb, randomize


class TestBase40:
    def test_known_w5nyv(self):
        # From the reference Makefile test fixture (Makefile:30):
        # W5NYV encodes to [0,0,3,0x74,0x26,0x97]
        assert list(base40_encode("W5NYV")) == [0, 0, 3, 0x74, 0x26, 0x97]

    def test_round_trip(self):
        for cs in ["W5NYV", "TEST", "A", "KI5ZDF", "N0-X/Y.Z", "9ABCDEFGH"]:
            assert base40_decode(base40_encode(cs)) == cs.upper()

    def test_empty(self):
        assert base40_decode(b"\x00" * 6) == "(empty)"

    def test_lowercase_accepted(self):
        assert base40_encode("w5nyv") == base40_encode("W5NYV")

    def test_unknown_char_is_zero_digit(self):
        # '?' -> digit 0, same as reference char_to_digit fallthrough
        assert base40_encode("?") == b"\x00" * 6


class TestLFSR:
    def test_reference_sequence_prefix(self):
        # Direct bitwise simulation of the reference LFSR (opv-mod.cpp:97-113)
        state = 0xFF
        ref = []
        for _ in range(CONFIG.frame_bytes):
            b = 0
            for i in range(7, -1, -1):
                b |= ((state >> 7) & 1) << i
                fb = ((state >> 7) ^ (state >> 6) ^ (state >> 4) ^ (state >> 2)) & 1
                state = ((state << 1) | fb) & 0xFF
            ref.append(b)
        np.testing.assert_array_equal(randomizer_mask(), np.array(ref, dtype=np.uint8))

    def test_first_byte_is_ff(self):
        assert randomizer_mask()[0] == 0xFF

    def test_involution(self):
        rng = np.random.default_rng(0)
        payload = rng.integers(0, 256, CONFIG.frame_bytes, dtype=np.uint8)
        assert np.array_equal(np.asarray(derandomize(randomize(payload))), payload)


class TestConvCode:
    def _ref_encode(self, u):
        """Bitwise shift-register simulation (opv-mod.cpp:120-136)."""
        sr = 0
        out = []
        for b in u:
            state = (int(b) << 6) | sr
            out.append(bin(state & CONFIG.g1_mask).count("1") & 1)
            out.append(bin(state & CONFIG.g2_mask).count("1") & 1)
            sr = ((sr << 1) | int(b)) & 0x3F
        return np.array(out, dtype=np.uint8)

    def test_vs_shift_register(self):
        rng = np.random.default_rng(1)
        u = rng.integers(0, 2, 200, dtype=np.uint8)
        np.testing.assert_array_equal(np.asarray(conv_encode_bits(u)), self._ref_encode(u))
        np.testing.assert_array_equal(conv_encode_bits_np(u), self._ref_encode(u))

    def test_batched(self):
        rng = np.random.default_rng(2)
        u = rng.integers(0, 2, (3, 64), dtype=np.uint8)
        out = np.asarray(conv_encode_bits(u))
        for i in range(3):
            np.testing.assert_array_equal(out[i], self._ref_encode(u[i]))

    def test_impulse_response(self):
        # Single 1 at t=0: g outputs trace the polynomial taps
        u = np.zeros(8, dtype=np.uint8)
        u[0] = 1
        out = np.asarray(conv_encode_bits(u)).reshape(-1, 2)
        # g1 delays {0,1,2,3,4}, g2 delays {0,1,3,4,6} from masks 0x4F/0x6D
        np.testing.assert_array_equal(out[:, 0], [1, 1, 1, 1, 1, 0, 0, 0])
        np.testing.assert_array_equal(out[:, 1], [1, 1, 0, 1, 1, 0, 1, 0])


class TestInterleaver:
    def test_perm_is_bijection(self):
        p = interleave_perm()
        assert sorted(p) == list(range(CONFIG.encoded_bits))

    def test_scatter_formula(self):
        # Direct check against the reference closed form (opv-mod.cpp:142-153)
        n = CONFIG.encoded_bits
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, n, dtype=np.uint8)
        temp = np.zeros(n, dtype=np.uint8)
        for i in range(n):
            pos = (i % 32) * 67 + (i // 32)
            corrected = (pos // 8) * 8 + (7 - pos % 8)
            temp[corrected] = bits[i]
        np.testing.assert_array_equal(bits[interleave_perm()], temp)

    def test_deinterleave_inverts(self):
        rng = np.random.default_rng(4)
        bits = rng.integers(0, 2, CONFIG.encoded_bits, dtype=np.uint8)
        tx = bits[interleave_perm()]
        np.testing.assert_array_equal(tx[deinterleave_gather()], bits)


class TestFraming:
    def test_bits_bytes_round_trip(self):
        rng = np.random.default_rng(5)
        b = rng.integers(0, 256, (2, 17), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(bits_to_bytes_msb(bytes_to_bits_msb(b))), b)

    def test_bert_frame_layout(self):
        f = build_bert_frame("W5NYV", 0xBBAADD, 7)
        assert list(f[:6]) == [0, 0, 3, 0x74, 0x26, 0x97]
        assert list(f[6:9]) == [0xBB, 0xAA, 0xDD]
        assert list(f[9:12]) == [0, 0, 0]
        assert f[12] == 7 and f[13] == 8 and f[133] == (7 + 121) & 0xFF

    def test_bert_frame_batch(self):
        fb = build_bert_frame("TEST", frame_num=np.arange(4))
        assert fb.shape == (4, CONFIG.frame_bytes)
        np.testing.assert_array_equal(fb[2], build_bert_frame("TEST", frame_num=2))

    def test_encode_frame_reference_sim(self):
        """encode_frame vs a direct simulation of opv-mod.cpp:159-213."""
        rng = np.random.default_rng(6)
        payload = rng.integers(0, 256, CONFIG.frame_bytes, dtype=np.uint8)

        # reference sim
        mask = randomizer_mask()
        rnd = payload ^ mask
        u = []
        for byte_idx in range(CONFIG.frame_bytes - 1, -1, -1):
            for bit_pos in range(7, -1, -1):
                u.append((int(rnd[byte_idx]) >> bit_pos) & 1)
        sr = 0
        enc = []
        for b in u:
            state = (b << 6) | sr
            enc.append(bin(state & 0x4F).count("1") & 1)
            enc.append(bin(state & 0x6D).count("1") & 1)
            sr = ((sr << 1) | b) & 0x3F
        enc = np.array(enc, dtype=np.uint8)
        temp = np.zeros_like(enc)
        for i in range(len(enc)):
            pos = (i % 32) * 67 + (i // 32)
            temp[(pos // 8) * 8 + (7 - pos % 8)] = enc[i]

        np.testing.assert_array_equal(np.asarray(encode_frame(payload)), temp)

    def test_pack_frame_bits_inverts_tx_bit_order(self):
        """pack(bits in TX clock order reversed...) — verify pack matches the
        reference packing rule packed[i] bit j = bits[1071-8i-j]."""
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, CONFIG.frame_bits, dtype=np.uint8)
        ref = np.zeros(CONFIG.frame_bytes, dtype=np.uint8)
        for i in range(CONFIG.frame_bytes):
            v = 0
            for j in range(8):
                v |= int(bits[CONFIG.frame_bits - 1 - i * 8 - j]) << j
            ref[i] = v
        np.testing.assert_array_equal(np.asarray(pack_frame_bits(bits)), ref)

    def test_tx_bit_order_and_pack_consistency(self):
        """The encoder clock order (byte 133 down, MSB first) must invert
        through pack_frame_bits: conv input u == decoded Viterbi bits, so
        pack(u) must recover the randomized frame."""
        rng = np.random.default_rng(8)
        payload = rng.integers(0, 256, CONFIG.frame_bytes, dtype=np.uint8)
        rnd = np.asarray(randomize(payload))
        u = np.asarray(bytes_to_bits_msb(rnd[::-1]))
        packed = np.asarray(pack_frame_bits(u))
        np.testing.assert_array_equal(packed, rnd)
