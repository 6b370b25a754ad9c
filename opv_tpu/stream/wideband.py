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
        self._carry = np.zeros(0, np.complex64)      # history + K-remainder
        self.demod = MultiChannelDemodulator(channels=k,
                                             block_frames=block_frames)

    def feed(self, wideband: np.ndarray):
        """wideband: (n,) complex at K*fs_ch.  Returns decoded-frame tuples
        (channel, frame_bytes, metric, sync_quality, abs_sample_pos)."""
        import jax.numpy as jnp

        x = np.concatenate([self._carry,
                            np.asarray(wideband, dtype=np.complex64)])
        h = self._hist_len
        # consume whole K-sample commutator cycles past the filter history;
        # carry BOTH the history tail and the sub-cycle remainder forward so
        # channelization is streaming-exact (no dropped samples)
        if len(x) < h + self.k:
            self._carry = x
            return []
        usable = h + ((len(x) - h) // self.k) * self.k
        consumed = x[:usable]
        self._carry = x[usable - h:]
        y = np.asarray(channelize(jnp.asarray(consumed), self.k, self.taps))
        return self.demod.feed(y)

    def flush(self):
        return self.demod.flush()

    @property
    def decoded(self):
        return self.demod.decoded

    @property
    def perfect(self):
        return self.demod.perfect
