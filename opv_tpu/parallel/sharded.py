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


def check_time_shard_geometry(total_samples: int, ntime: int) -> None:
    """A time shard smaller than the halo cannot lend its neighbor a full
    frame of lookahead — seam-spanning frames would silently vanish."""
    block = total_samples // ntime
    if ntime > 1 and block < HALO_SAMPLES:
        raise ValueError(
            f"time shard of {block} samples is smaller than the "
            f"{HALO_SAMPLES}-sample overlap halo; use <= "
            f"{total_samples // HALO_SAMPLES} time shards for this capture")


def halo_demod(block, ntime: int, time_axis: str,
               max_frames_per_shard: int, **kw):
    """Shared shard-body: right-neighbor halo exchange + feed-forward demod +
    sync-start ownership.  Returns (frames, owned, sync_starts, metrics,
    sync_q) for the local block; sync_starts are GLOBAL sample positions
    (within the whole sharded capture), so streaming drivers can apply
    cross-batch ownership and report absolute stream indices.

    Used by both the pure time-sharded and the (ch x time) grid pipelines so
    the seam logic exists exactly once.
    """
    if ntime > 1:
        halo_src = block[:, :HALO_SAMPLES]
        idx = jax.lax.axis_index(time_axis)
        # receive the right neighbor's head: everyone sends theirs left
        perm = [(i, (i - 1) % ntime) for i in range(ntime)]
        halo = jax.lax.ppermute(halo_src, time_axis, perm)
        # the last device has no right neighbor: zero the wrapped halo so no
        # phantom frames appear
        halo = jnp.where(idx == ntime - 1, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([block, halo], axis=1)
        base = jax.lax.axis_index(time_axis).astype(jnp.int32) * block.shape[1]
    else:
        ext = block
        base = jnp.int32(0)
    out = rx_fast(ext, max_frames=max_frames_per_shard, **kw)
    # ownership: the frame's sync (sample position = payload start minus the
    # 24-symbol sync word) falls inside the local block, not the halo
    sync_start = out["starts"] - CONFIG.sync_bits * CONFIG.samples_per_symbol
    owned = out["frame_valid"] & (sync_start < block.shape[1])
    return (out["frames"], owned, base + sync_start, out["metrics"],
            out["sync_q"])


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

    samples: (C, T) with T sharded over mesh axis 'time'.  Returns
    (frames (C, time*F, 134) gathered, owned mask, global decoded count).
    """
    ntime = mesh.shape["time"]
    check_time_shard_geometry(samples.shape[1], ntime)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, "time"),
        out_specs=(P(None, "time", None), P(None, "time"),
                   P(None, "time"), P(None, "time"), P(None, "time"), P()),
        check_vma=False,
    )
    def run(block):
        frames, owned, starts, metrics, q = halo_demod(
            block, ntime, "time", max_frames_per_shard, **kw)
        n = jax.lax.psum(owned.sum(), "time")
        return frames, owned, starts, metrics, q, n

    frames, owned, starts, metrics, q, n = run(samples)
    return dict(frames=frames, owned=owned, starts=starts,
                metrics=metrics, sync_q=q, n=n)
