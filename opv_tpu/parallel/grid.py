"""Combined (channel x time) sharded RX step — the flagship multi-chip
program: channels sharded like a batch axis, long captures sharded into time
blocks with ppermute halo exchange, metrics psum-reduced over the whole mesh.

The seam logic (halo exchange + ownership dedup) is shared with
rx_time_sharded via parallel.sharded.halo_demod — one implementation.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P

from opv_tpu.parallel.sharded import check_time_shard_geometry, halo_demod


def rx_grid_sharded(mesh, samples, max_frames_per_shard: int = 8, **kw):
    """Full sharded RX step over mesh axes ('ch', 'time').

    samples: (C, T) with C sharded over 'ch' and T sharded over 'time'.
    Returns dict with frames (C, ntime*F, 134), owned mask, starts (global
    sync sample positions), metrics, sync_q, and the global decoded count n.
    """
    ntime = mesh.shape["time"]
    check_time_shard_geometry(samples.shape[1], ntime)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("ch", "time"),
        out_specs=(P("ch", "time", None), P("ch", "time"),
                   P("ch", "time"), P("ch", "time"), P("ch", "time"), P()),
        check_vma=False,
    )
    def run(block):
        frames, owned, starts, metrics, q = halo_demod(
            block, ntime, "time", max_frames_per_shard, **kw)
        n = jax.lax.psum(owned.sum(), ("ch", "time"))
        return frames, owned, starts, metrics, q, n

    frames, owned, starts, metrics, q, n = run(samples)
    return dict(frames=frames, owned=owned, starts=starts,
                metrics=metrics, sync_q=q, n=n)
