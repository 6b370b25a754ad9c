"""Wideband receiver: one digitizer stream in, decoded frames from every
OPV channel out.

Composes the analysis channelizer (rx/channelizer.py) with the multichannel
overlap-save demodulator (stream/multichannel.py).  Feed blocks of wideband
IQ at K x 2.168 MSPS; get (channel, frame, metric, quality, position)
tuples.  Filter history is carried across block seams so channelization is
streaming-exact.
"""

from __future__ import annotations

import numpy as np

from opv_tpu.config import CONFIG
from opv_tpu.rx.channelizer import channelize
from opv_tpu.stream.multichannel import MultiChannelDemodulator


class WidebandReceiver:
    def __init__(self, k: int, block_frames: int = 4, taps_per_branch: int = 12):
        self.k = k
        self.taps = taps_per_branch
        self._hist_len = k * taps_per_branch - 1     # conv VALID history
        self._carry = np.zeros(0, np.complex64)      # history + remainder
        # fixed processing quantum: channelize jit-compiles per input length,
        # so ragged feeds would otherwise trigger up to K recompilations
        # (20-120 s each through a TPU tunnel); only flush sees one ragged
        # tail compile
        self._quantum = k * 65536
        self.demod = MultiChannelDemodulator(channels=k,
                                             block_frames=block_frames)

    def feed(self, wideband: np.ndarray):
        """wideband: (n,) complex at K*fs_ch.  Returns decoded-frame tuples
        (channel, frame_bytes, metric, sync_quality, abs_sample_pos)."""
        import jax.numpy as jnp

        x = np.concatenate([self._carry,
                            np.asarray(wideband, dtype=np.complex64)])
        h = self._hist_len
        results = []
        # consume fixed quanta past the filter history (one compiled shape);
        # carry BOTH the history tail and the remainder forward so
        # channelization is streaming-exact (no dropped samples)
        while len(x) >= h + self._quantum:
            consumed = x[: h + self._quantum]
            x = x[self._quantum:]
            y = np.asarray(channelize(jnp.asarray(consumed), self.k, self.taps))
            results.extend(self.demod.feed(y))
        self._carry = x
        return results

    def flush(self):
        import jax.numpy as jnp

        h = self._hist_len
        x = self._carry
        results = []
        if len(x) >= h + self.k:
            # one ragged-tail compile at end of stream
            usable = h + ((len(x) - h) // self.k) * self.k
            y = np.asarray(channelize(jnp.asarray(x[:usable]), self.k, self.taps))
            results.extend(self.demod.feed(y))
        self._carry = np.zeros(0, np.complex64)
        results.extend(self.demod.flush())
        return results

    @property
    def decoded(self):
        return self.demod.decoded

    @property
    def perfect(self):
        return self.demod.perfect
