"""Native symbol-tracking runtime (opv_tpu/runtime/tracking.c): the serial
AFC/TED loop as C, fronting the same JAX sync/FEC program
(rx/pipeline.py::rx_block_from_soft).

Parity standard: decoded FRAMES identical to the JAX-scan backend on every
stress class (the two backends may differ at ulp scale in the 40-tap
correlation reduction order — CLAUDE.md bit-exactness rules).  Speed is the
point (the lax.scan caps one CPU stream at ~1.9 MS/s, the reference C++
does 4.77, this loop ~20), but timing is not asserted here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.runtime import HAVE_TRACKING
from opv_tpu.stream import StreamingDemodulator, save_state, load_state
from opv_tpu.tx import modulate_frames, tx_flush_zeros

pytestmark = pytest.mark.skipif(not HAVE_TRACKING,
                                reason="_tracking extension not built")


def _signal(n_frames):
    frames = build_bert_frame("W5NYV", frame_num=np.arange(n_frames))
    iq, _ = modulate_frames(encode_frame(jnp.asarray(frames)))
    iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
    return (iq[:, 0].astype(np.float64) + 1j * iq[:, 1]), np.asarray(frames)


def _run(sd, s, chunk=None):
    out = []
    if chunk is None:
        out += sd.feed(s)
    else:
        for off in range(0, len(s), chunk):
            out += sd.feed(s[off:off + chunk])
    return out + sd.flush()


def _load_iq(path):
    raw = np.fromfile(path, dtype="<i2").reshape(-1, 2)
    return raw[:, 0].astype(np.float64) + 1j * raw[:, 1]


class TestNativeBackendParity:
    def test_auto_picks_native_on_float64(self):
        assert StreamingDemodulator().backend == "native"
        assert StreamingDemodulator(backend="jax").backend == "jax"
        # the native loop is float64-only; float32 streams fall back
        assert StreamingDemodulator(dtype="float32").backend == "jax"

    def test_clean_and_noisy_tuple_identical(self):
        s, frames = _signal(8)
        rng = np.random.default_rng(3)
        noisy = s + (rng.standard_normal(len(s))
                     + 1j * rng.standard_normal(len(s))) * 1200.0
        for sig in (s, noisy):
            a = _run(StreamingDemodulator(backend="jax"), sig, chunk=50_001)
            b = _run(StreamingDemodulator(backend="native"), sig,
                     chunk=50_001)
            assert a == b and len(a) == 8

    @pytest.mark.parametrize("name", ["cfo500", "drift", "dropout", "awgn7"])
    def test_golden_capture_parity(self, golden_dir, name):
        """The reference-pinned golden captures (AFC convergence, timing
        drift, flywheel, FEC waterfall) decode to the SAME frame sequence
        through the native loop as through the JAX scan — which the golden
        suites already pin to the reference binary."""
        s = _load_iq(golden_dir / f"{name}.iq")
        golden = np.frombuffer((golden_dir / f"{name}.frames").read_bytes(),
                               dtype=np.uint8).reshape(-1, CONFIG.frame_bytes)
        sd = StreamingDemodulator(backend="native")
        res = _run(sd, s)
        got = np.stack([np.frombuffer(r[0], np.uint8) for r in res])
        np.testing.assert_array_equal(got, golden)

    def test_checkpoint_cross_backend(self, tmp_path):
        """A native-backend stream checkpoint restores into a JAX-backend
        stream (and vice versa) and continues to the same output — the
        LoopState pytree is the shared contract."""
        s, frames = _signal(8)
        cut = 3 * CONFIG.chunk_samples + 17_001
        ref = _run(StreamingDemodulator(backend="jax"), s)
        for a, b in (("native", "jax"), ("jax", "native")):
            sd = StreamingDemodulator(backend=a)
            out = list(sd.feed(s[:cut]))
            save_state(str(tmp_path / "ck"), sd.state_tree())
            sd2 = StreamingDemodulator(backend=b)
            sd2.restore(load_state(str(tmp_path / "ck"), sd.state_tree()))
            out += sd2.feed(s[cut:]) + sd2.flush()
            assert out == ref, (a, b)
