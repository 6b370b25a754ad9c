"""Sharded RX pipelines: shard_map over (channel, time) mesh axes.

Channel parallelism shards independent channels (embarrassingly parallel;
`psum` only for aggregate metrics).  Time parallelism shards contiguous IQ
blocks of long captures with an overlap-save halo exchanged from the right
neighbor via `ppermute` — the halo covers one full frame (sync + payload +
slack) so every frame whose sync lands in a device's own block is decodable
locally; ownership of a frame belongs to the device where its sync start
falls, which makes the seam dedup exact (SURVEY.md section 5, long-context
row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from opv_tpu.config import CONFIG
from opv_tpu.rx.fast import rx_fast

# halo: one frame of symbols (payload may start up to a sync-word before the
# seam and extend a full payload past it) plus timing-phase slack
HALO_SYMBOLS = CONFIG.frame_symbols + CONFIG.sync_bits
HALO_SAMPLES = HALO_SYMBOLS * CONFIG.samples_per_symbol


def rx_fast_sharded(mesh, samples, max_frames_per_shard: int = 8, **kw):
    """Channel-parallel rx_fast: (C, N) sharded over mesh axis 'ch'.

    Each device demodulates its channel shard independently; the global
    decode count is psum-reduced over the mesh.
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("ch", None),
        out_specs=(P("ch", None, None), P()),
        check_vma=False,
    )
    def run(block):
        out = rx_fast(block, max_frames=max_frames_per_shard, **kw)
        n = jax.lax.psum(out["n_decoded"], "ch")
        return out["frames"], n

    return run(samples)


def rx_time_sharded(mesh, samples, max_frames_per_shard: int = 8, **kw):
    """Time-parallel rx_fast over one (or a few) very long channels.

    samples: (C, T) with T sharded over mesh axis 'time'.  Each device
    receives its block plus a right-neighbor halo (ppermute), demodulates
    feed-forward, and keeps only frames whose sync start falls inside its
    own block.  Returns (frames (C, time*F, 134) gathered, valid mask,
    global decoded count).
    """
    ntime = mesh.shape["time"]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, "time"),
        out_specs=(P(None, "time", None), P(None, "time"), P()),
        check_vma=False,
    )
    def run(block):
        # block: (C, T/ntime) local shard
        halo_src = block[:, :HALO_SAMPLES]
        # receive the *right* neighbor's head: send ours left (i -> i-1)
        idx = jax.lax.axis_index("time")
        perm = [(i, (i - 1) % ntime) for i in range(ntime)]
        halo = jax.lax.ppermute(halo_src, "time", perm)
        # last device has no right neighbor: its halo (wrapped from device 0)
        # is zeroed so no phantom frames appear
        halo = jnp.where(idx == ntime - 1, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([block, halo], axis=1)

        out = rx_fast(ext, max_frames=max_frames_per_shard, **kw)
        # ownership: the frame's sync (sample position = payload start minus
        # the 24-symbol sync word) falls inside the local block, not the halo
        sync_start = out["starts"] - CONFIG.sync_bits * CONFIG.samples_per_symbol
        owned = out["frame_valid"] & (sync_start < block.shape[1])
        n = jax.lax.psum(owned.sum(), "time")
        return out["frames"], owned, n

    return run(samples)
