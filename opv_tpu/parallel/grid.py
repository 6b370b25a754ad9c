"""Combined (channel x time) sharded RX step — the flagship multi-chip
program: channels sharded like a batch axis, long captures sharded into time
blocks with ppermute halo exchange, metrics psum-reduced over the whole mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from opv_tpu.config import CONFIG
from opv_tpu.rx.fast import rx_fast
from opv_tpu.parallel.sharded import HALO_SAMPLES


def rx_grid_sharded(mesh, samples, max_frames_per_shard: int = 8, **kw):
    """Full sharded RX step over mesh axes ('ch', 'time').

    samples: (C, T) with C sharded over 'ch' and T sharded over 'time'.
    Returns (frames (C, ntime*F, 134), owned mask, global decoded count).
    """
    ntime = mesh.shape["time"]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("ch", "time"),
        out_specs=(P("ch", "time", None), P("ch", "time"), P()),
        check_vma=False,
    )
    def run(block):
        if ntime > 1:
            halo_src = block[:, :HALO_SAMPLES]
            idx = jax.lax.axis_index("time")
            perm = [(i, (i - 1) % ntime) for i in range(ntime)]
            halo = jax.lax.ppermute(halo_src, "time", perm)
            halo = jnp.where(idx == ntime - 1, jnp.zeros_like(halo), halo)
            ext = jnp.concatenate([block, halo], axis=1)
        else:
            ext = block
        out = rx_fast(ext, max_frames=max_frames_per_shard, **kw)
        sync_start = out["starts"] - CONFIG.sync_bits * CONFIG.samples_per_symbol
        owned = out["frame_valid"] & (sync_start < block.shape[1])
        n = jax.lax.psum(owned.sum(), ("ch", "time"))
        return out["frames"], owned, n

    return run(samples)
