"""Multi-device sharding tests on the 8-device virtual CPU mesh:
channel-parallel and time-sharded pipelines (halo exchange + seam dedup)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.parallel import make_mesh, channel_mesh, rx_fast_sharded, rx_time_sharded
from opv_tpu.tx import modulate_frames, tx_flush_zeros


@pytest.fixture(scope="module")
def capture8():
    frames = build_bert_frame("W5NYV", frame_num=np.arange(8))
    enc = encode_frame(jnp.asarray(frames))
    iq, _ = modulate_frames(enc, exact=False)
    iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
    s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
    return s, frames


def test_eight_devices_present():
    assert len(jax.devices()) == 8


class TestChannelParallel:
    def test_eight_channels_over_eight_devices(self, capture8):
        s, frames = capture8
        mesh = channel_mesh(8)
        samples = jnp.asarray(np.stack([s] * 8))
        out_frames, n = rx_fast_sharded(mesh, samples, max_frames_per_shard=10)
        assert int(n) == 8 * 8
        assert out_frames.shape[0] == 8

    def test_matches_single_device(self, capture8):
        from opv_tpu.rx.fast import rx_fast
        s, frames = capture8
        mesh = channel_mesh(4)
        samples = jnp.asarray(np.stack([s] * 4))
        sharded_frames, n = rx_fast_sharded(mesh, samples, max_frames_per_shard=10)
        local = rx_fast(samples, max_frames=10)
        fv = np.asarray(local["frame_valid"])
        assert int(n) == int(fv.sum())
        np.testing.assert_array_equal(np.asarray(sharded_frames),
                                      np.asarray(local["frames"]))


class TestTimeSharded:
    def test_long_capture_time_blocks(self, capture8):
        """One long channel split over 4 time blocks: every frame decoded
        exactly once (halo covers seam-spanning frames; ownership dedups)."""
        s, frames = capture8
        ntime = 4
        block = (len(s) + ntime - 1) // ntime
        pad = np.zeros(ntime * block - len(s), np.complex64)
        s_pad = np.concatenate([s, pad])
        mesh = make_mesh({"time": ntime})
        samples = jnp.asarray(s_pad[None, :])
        out = rx_time_sharded(mesh, samples, max_frames_per_shard=6)
        assert int(out["n"]) == len(frames)
        owned = np.asarray(out["owned"])
        got = np.asarray(out["frames"])[0][owned[0]]
        # global sync positions: frame i's sync word starts at i*86,720
        # (+-1 sample peak ambiguity under shard-local CFO estimates)
        starts = np.asarray(out["starts"])[0][owned[0]]
        ref = np.arange(len(frames)) * CONFIG.samples_per_frame
        assert np.abs(starts - ref).max() <= 1
        # order within shards is ascending; shards concatenate in time order
        np.testing.assert_array_equal(got, frames)
