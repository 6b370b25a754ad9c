"""Multi-process worker for the multihost test (tests/test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; jax.distributed stitches them into
one 4-device runtime.  global_mesh puts `ch` across processes (DCN-analog)
and `time` within each process (ICI-analog), then rx_grid_sharded runs the
full halo-exchange + psum pipeline across the process boundary — the
reference's "multi-node" analog is localhost UDP/pipes (SURVEY.md section
4); ours is an actual jax.distributed collective run.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from opv_tpu.parallel.multihost import global_mesh, initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from opv_tpu.core import build_bert_frame, encode_frame
    from opv_tpu.parallel.grid import rx_grid_sharded
    from opv_tpu.tx import modulate_frames, tx_flush_zeros

    mesh = global_mesh(ch=nproc, time=2)

    # every process synthesizes the identical capture, then contributes its
    # addressable shards of the (nproc-channel, T) global array
    frames = build_bert_frame("W5NYV", frame_num=np.arange(2))
    enc = encode_frame(jnp.asarray(frames))
    iq, _ = modulate_frames(enc, exact=False)
    iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
    s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
    t = 2 * 87_680            # 2 time shards at the minimum halo-legal size
    s = np.concatenate([s, np.zeros(max(0, t - len(s)), np.complex64)])[:t]
    host = np.stack([s] * nproc)

    sharding = NamedSharding(mesh, P("ch", "time"))
    samples = jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx])

    out = rx_grid_sharded(mesh, samples, max_frames_per_shard=4)
    n = int(out["n"])
    expect = nproc * len(frames)
    assert n == expect, f"process {pid}: decoded {n}, expected {expect}"

    # check the locally-addressable decoded payloads bit-exactly
    for shard in out["frames"].addressable_shards:
        own = np.asarray(
            [np.asarray(sh.data) for sh in out["owned"].addressable_shards
             if sh.index == shard.index[:2]][0])
        got = np.asarray(shard.data)[own]
        for f in got:
            assert any(np.array_equal(f, r) for r in frames), \
                f"process {pid}: payload mismatch"
    print(f"MULTIHOST OK pid={pid} n={n}", flush=True)


if __name__ == "__main__":
    main()
