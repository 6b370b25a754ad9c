"""Multichannel streaming runtime: N concurrent channels through the
feed-forward pipeline in fixed-size overlapped blocks.

This is the production-throughput counterpart of StreamingDemodulator (which
is single-channel and reference-parity).  Architecture: overlap-save block
pipeline — every processing step sees `block_frames` frames of new samples
plus one frame of overlap so frames straddling block boundaries are decoded
exactly once (ownership rule: a frame belongs to the block where its sync
word starts — the same dedup used by the time-sharded mesh path,
parallel/sharded.py).

All channels advance in lockstep (same block geometry), so each step is ONE
jit-compiled device invocation regardless of channel count.  Per-channel CFO
is re-estimated each block (one batched matmul).
"""

from __future__ import annotations

import numpy as np

from opv_tpu.config import CONFIG


class MultiChannelDemodulator:
    """Feed (C, n) sample blocks; yields (channel, frame_bytes, metric,
    sync_quality, abs_sample_pos) tuples."""

    def __init__(self, channels: int, block_frames: int = 4,
                 max_frames_per_block: int | None = None):
        import jax
        import jax.numpy as jnp
        from opv_tpu.rx.fast import rx_fast

        self.channels = channels
        self.spf = CONFIG.samples_per_frame
        self.advance = block_frames * self.spf
        # overlap: one frame + sync so any frame starting in the advance
        # region is fully contained in the window
        self.overlap = self.spf + CONFIG.sync_bits * CONFIG.samples_per_symbol
        self.window = self.advance + self.overlap
        self.max_frames = max_frames_per_block or (block_frames + 2)

        self._buf = np.zeros((channels, self.window), dtype=np.complex64)
        self._count = 0                 # valid samples in buffer
        self._abs_base = 0              # absolute index of buffer sample 0
        self.decoded = 0
        self.perfect = 0

        mf = self.max_frames

        def step(block):
            return rx_fast(block, max_frames=mf, estimate_cfo_flag=True)

        self._step = jax.jit(step)
        self._jnp = jnp

    def feed(self, samples: np.ndarray):
        """samples: (C, n) complex.  Returns decoded-frame tuples."""
        samples = np.asarray(samples, dtype=np.complex64)
        if samples.shape[0] != self.channels:
            raise ValueError(f"expected {self.channels} channels")
        out = []
        off = 0
        n = samples.shape[1]
        while off < n:
            take = min(self.window - self._count, n - off)
            self._buf[:, self._count:self._count + take] = samples[:, off:off + take]
            self._count += take
            off += take
            if self._count >= self.window:
                out.extend(self._process())
        return out

    def flush(self):
        """Process the remaining tail (pad with zeros)."""
        if self._count <= self.overlap // 2:
            return []
        self._buf[:, self._count:] = 0
        # allow ownership over the whole remaining valid region, but reject
        # frames whose payload would extend into the zero padding (a stream
        # truncated mid-frame must not yield a corrupted phantom frame)
        results = self._process(own_limit=self._count, valid_limit=self._count)
        self._count = 0
        return results

    def _process(self, own_limit: int | None = None,
                 valid_limit: int | None = None):
        own = self.advance if own_limit is None else own_limit
        vlim = self.window if valid_limit is None else valid_limit
        payload_extent = (CONFIG.encoded_bits - 1) * CONFIG.samples_per_symbol + 1
        out = self._step(self._jnp.asarray(self._buf))
        starts = np.asarray(out["starts"])
        valid = np.asarray(out["frame_valid"])
        frames = np.asarray(out["frames"])
        metrics = np.asarray(out["metrics"])
        qs = np.asarray(out["sync_q"])
        sync_off = CONFIG.sync_bits * CONFIG.samples_per_symbol

        results = []
        for c in range(self.channels):
            for k in np.argsort(starts[c]):
                if not valid[c, k]:
                    continue
                sync_start = int(starts[c, k]) - sync_off
                if sync_start >= own:          # owned by the next block
                    continue
                if int(starts[c, k]) + payload_extent > vlim:
                    continue                   # payload extends into padding
                self.decoded += 1
                if metrics[c, k] == 0:
                    self.perfect += 1
                results.append((c, bytes(frames[c, k]), int(metrics[c, k]),
                                float(qs[c, k]),
                                self._abs_base + sync_start))
        # slide: keep the overlap tail
        if own_limit is None:
            self._buf[:, : self.overlap] = self._buf[:, self.advance:]
            self._count = self.overlap
            self._abs_base += self.advance
        return results
