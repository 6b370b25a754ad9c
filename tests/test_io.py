"""Sample I/O tests: wire-format conversions (numpy and native C paths)."""

import numpy as np
import pytest

from opv_tpu.io.iq import (complex_to_iq_bytes, iq_bytes_to_complex,
                           iq_bytes_to_f32_pairs)
from opv_tpu.runtime import HAVE_NATIVE


class TestIQWire:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        iq = rng.integers(-16384, 16384, (1000, 2), dtype=np.int16)
        buf = iq.astype("<i2").tobytes()
        c = iq_bytes_to_complex(buf)
        np.testing.assert_array_equal(c.real, iq[:, 0])
        np.testing.assert_array_equal(c.imag, iq[:, 1])
        assert iq_bytes_to_complex(buf, dtype=np.complex64).dtype == np.complex64

    def test_f32_pairs_matches_complex(self):
        rng = np.random.default_rng(3)
        iq = rng.integers(-16384, 16384, size=(24, 2), dtype=np.int16)
        buf = iq.astype("<i2").tobytes()
        # single channel: pairs view == complex view, channel-major
        p = iq_bytes_to_f32_pairs(buf)
        assert p.shape == (1, 24, 2) and p.dtype == np.float32
        c = iq_bytes_to_complex(buf, dtype=np.complex64)
        np.testing.assert_array_equal(p[0, :, 0] + 1j * p[0, :, 1], c)
        # 3 channels, sample-interleaved I0 Q0 I1 Q1 I2 Q2 per instant
        p3 = iq_bytes_to_f32_pairs(buf, channels=3)
        assert p3.shape == (3, 8, 2)
        np.testing.assert_array_equal(
            p3[1, :, 0] + 1j * p3[1, :, 1], c.reshape(-1, 3).T[1])
        # trailing partial instant dropped
        assert iq_bytes_to_f32_pairs(buf + b"xy", channels=3).shape == (3, 8, 2)

    def test_odd_length_truncated(self):
        buf = b"\x01\x02\x03\x04\x05"     # 1.25 samples
        assert len(iq_bytes_to_complex(buf)) == 1
        assert len(iq_bytes_to_complex(b"\x01\x02\x03")) == 0

    def test_native_matches_numpy(self):
        if not HAVE_NATIVE:
            pytest.skip("native extension not built")
        rng = np.random.default_rng(1)
        iq = rng.integers(-32768, 32768, (513, 2), dtype=np.int16)
        buf = iq.astype("<i2").tobytes()
        c64 = iq_bytes_to_complex(buf, dtype=np.complex64)       # native
        ref = iq_bytes_to_complex(buf, dtype=np.complex128).astype(np.complex64)
        np.testing.assert_array_equal(c64, ref)

    def test_complex_to_bytes_truncates_toward_zero(self):
        s = np.array([1.9 + 2.9j, -1.9 - 2.9j, 0.5 - 0.5j])
        out = np.frombuffer(complex_to_iq_bytes(s), dtype="<i2").reshape(-1, 2)
        np.testing.assert_array_equal(out, [[1, 2], [-1, -2], [0, 0]])

    def test_complex_to_bytes_saturates(self):
        """Out-of-range samples saturate at the int16 rails instead of
        wrapping — on both the native and numpy paths."""
        s = np.array([40000.0 - 40000.0j, -1e9 + 1e9j])
        for path in ("auto", "numpy"):
            if path == "numpy":
                import opv_tpu.io.iq as m
                old = m.HAVE_NATIVE
                m.HAVE_NATIVE = False
            try:
                out = np.frombuffer(complex_to_iq_bytes(s), dtype="<i2").reshape(-1, 2)
                np.testing.assert_array_equal(
                    out, [[32767, -32768], [-32768, 32767]])
            finally:
                if path == "numpy":
                    m.HAVE_NATIVE = old

    def test_native_read_exact(self):
        if not HAVE_NATIVE:
            pytest.skip("native extension not built")
        import os
        from opv_tpu.runtime import _iqio
        r, w = os.pipe()
        os.write(w, b"x" * 7)
        os.close(w)
        assert _iqio.read_exact(r, 4) == b"xxxx"
        assert _iqio.read_exact(r, 10) == b"xxx"   # short at EOF
        os.close(r)


class TestCoherentParity:
    def test_coherent_decodes_nothing_on_clean_iq(self, golden_dir):
        """The reference's coherent mode is non-functional (0 frames, AFC
        rails toward the clamp on clean IQ — SURVEY.md C12).  Our faithful
        port must fail the same way."""
        import jax.numpy as jnp
        from opv_tpu.rx.pipeline import rx_batch
        raw = np.fromfile(golden_dir / "bert3.iq", dtype="<i2").reshape(-1, 2)
        s = raw[:, 0].astype(np.float64) + 1j * raw[:, 1]
        out = rx_batch(s, coherent=True)
        assert out["decoded"] == 0


class TestUDPBridge:
    def test_frame_round_trip(self):
        from opv_tpu.io.udp import UDPFrameBridge
        from opv_tpu.config import CONFIG
        import socket
        a = UDPFrameBridge()
        b = UDPFrameBridge()
        frame = bytes(range(134))
        a.send(frame, dest=("127.0.0.1", b.port))
        got = list(b.poll(timeout=5.0))
        assert got == [frame]
        # reply goes back to the last sender automatically
        assert b.send(b"\x00" * CONFIG.frame_bytes)
        back = list(a.poll(timeout=5.0))
        assert back == [b"\x00" * CONFIG.frame_bytes]
        # wrong-size datagrams are dropped
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(b"short", ("127.0.0.1", b.port))
        assert list(b.poll(timeout=0.5)) == []
        a.close(); b.close(); s.close()

    def test_send_without_sender_fails(self):
        from opv_tpu.io.udp import UDPFrameBridge
        br = UDPFrameBridge()
        assert br.send(b"\x00" * 134) is False
        import pytest as _pytest
        with _pytest.raises(ValueError):
            br.send(b"short", dest=("127.0.0.1", 1))
        br.close()
