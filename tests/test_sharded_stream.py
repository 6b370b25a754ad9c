"""Sharded streaming with seam-state handoff (stream/sharded.py): the
rolling-window driver over rx_grid_sharded must decode every frame exactly
once — including frames straddling a batch (window) boundary — and be
invariant to how the input is sliced (VERDICT round-1 item 3)."""

import numpy as np
import pytest
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core import build_bert_frame, encode_frame
from opv_tpu.parallel import make_mesh
from opv_tpu.parallel.sharded import HALO_SAMPLES
from opv_tpu.stream import ShardedStreamDemodulator
from opv_tpu.tx import modulate_frames, tx_flush_zeros

SPF = CONFIG.samples_per_frame
NCH, NTIME = 2, 2          # 4 of the 8 virtual devices
SHARD = HALO_SAMPLES       # minimum legal window slice (87,680 samples)


@pytest.fixture(scope="module")
def capture4():
    """4 BERT frames on 2 channels (same signal; per-channel results must
    agree), ~351k samples — window is 175,360 so >= 3 batches stream."""
    frames = build_bert_frame("W5NYV", frame_num=np.arange(4))
    enc = encode_frame(jnp.asarray(frames))
    iq, _ = modulate_frames(enc, exact=False)
    iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
    s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
    return np.stack([s] * NCH), frames


def make_sd():
    mesh = make_mesh({"ch": NCH, "time": NTIME})
    return ShardedStreamDemodulator(mesh, channels=NCH, shard_samples=SHARD,
                                    max_frames_per_shard=4)


def run_stream(samples, chunk):
    sd = make_sd()
    out = []
    for off in range(0, samples.shape[1], chunk):
        out.extend(sd.feed(samples[:, off:off + chunk]))
    out.extend(sd.flush())
    return sd, out


class TestShardedStream:
    def test_every_frame_exactly_once(self, capture4):
        samples, frames = capture4
        sd, out = run_stream(samples, chunk=samples.shape[1])
        assert len(out) == NCH * len(frames)
        assert sd.decoded == NCH * len(frames)
        for c in range(NCH):
            mine = [r for r in out if r[0] == c]
            got = np.stack([np.frombuffer(r[1], np.uint8) for r in mine])
            np.testing.assert_array_equal(got, frames)
            # absolute sync positions are stream indices (+-1 sample: the
            # raw-correlation peak can land one sample off under the
            # shard-local CFO estimate; payloads above are still bit-exact)
            pos = np.array([r[4] for r in mine])
            ref = np.arange(len(frames)) * SPF
            assert np.abs(pos - ref).max() <= 1

    def test_batch_seam_straddle(self, capture4):
        """Frame 2's samples span [173,440, 260,160) — crossing the first
        window boundary at 175,360 on every shard — and must decode once,
        in the SECOND batch (it cannot fit the first)."""
        samples, frames = capture4
        sd = make_sd()
        first = sd.feed(samples[:, :sd.window])
        rest = sd.feed(samples[:, sd.window:]) + sd.flush()
        first_pos = np.array(sorted(r[4] for r in first))
        assert not np.any(np.abs(first_pos - 2 * SPF) <= 1)
        assert np.any(np.abs(first_pos - 1 * SPF) <= 1)
        seam = [r for r in rest if abs(r[4] - 2 * SPF) <= 1]
        assert len(seam) == NCH
        for r in seam:
            np.testing.assert_array_equal(np.frombuffer(r[1], np.uint8),
                                          frames[2])
        # and nothing decoded twice across the batch seam
        assert len(first) + len(rest) == NCH * len(frames)

    def test_slicing_invariance(self, capture4):
        samples, frames = capture4
        _, a = run_stream(samples, chunk=samples.shape[1])
        _, b = run_stream(samples, chunk=13_337)
        assert a == b

    def test_checkpoint_resume_mid_stream(self, capture4, tmp_path):
        """state_tree -> save/load -> identical remaining emissions: the
        seam-handoff carry is fully captured by the checkpoint."""
        from opv_tpu.stream import save_state, load_state
        samples, frames = capture4
        cut = samples.shape[1] // 2
        sd = make_sd()
        head = sd.feed(samples[:, :cut])
        save_state(str(tmp_path / "ck"), sd.state_tree())

        sd2 = make_sd()
        sd2.load_state_tree(load_state(str(tmp_path / "ck"),
                                       sd2.state_tree()))
        tail_a = sd.feed(samples[:, cut:]) + sd.flush()
        tail_b = sd2.feed(samples[:, cut:]) + sd2.flush()
        assert tail_a == tail_b
        assert len(head) + len(tail_a) == NCH * len(frames)
