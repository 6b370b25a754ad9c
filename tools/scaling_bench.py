#!/usr/bin/env python
"""Scaling-efficiency benchmark for the time-sharded RX pipeline.

Weak scaling: each device gets the same per-device block of a long capture
(with overlap-save halos exchanged via ppermute); perfect scaling keeps
per-device wall time flat as devices are added.  Reports throughput and
efficiency vs the 1-device run.

NOTE: on a virtual CPU mesh (xla_force_host_platform_device_count) all
"devices" share the same physical cores, so wall-clock efficiency there
measures sharding OVERHEAD only (expect ~1/N "efficiency"); meaningful
scaling numbers require a real multi-chip slice.  The tool runs on whatever
mesh is available and labels the result accordingly.

Usage: python tools/scaling_bench.py [--devices 1 2 4 8] [--frames-per-dev 4]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--frames-per-dev", type=int, default=4)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force an N-virtual-device CPU mesh")
    args = ap.parse_args()

    import os
    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.cpu_mesh}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np
    from opv_tpu.config import CONFIG
    from opv_tpu.core import build_bert_frame, encode_frame
    from opv_tpu.core.framing import frame_to_symbol_bits
    from opv_tpu.parallel.grid import rx_grid_sharded
    from opv_tpu.parallel.mesh import make_mesh
    from opv_tpu.tx.modulator import mod_reset, modulate_bits_fast

    ndev_avail = len(jax.devices())
    sweep = args.devices or [n for n in (1, 2, 4, 8) if n <= ndev_avail]
    fpd = args.frames_per_dev
    virtual = jax.devices()[0].platform == "cpu"
    print(f"devices available: {ndev_avail} ({jax.devices()[0].platform}"
          f"{', VIRTUAL shared-core mesh' if virtual else ''})", file=sys.stderr)

    results = []
    base = None
    for n in sweep:
        frames = build_bert_frame("W5NYV", frame_num=np.arange(n * fpd))
        enc = encode_frame(jnp.asarray(frames))
        bits = np.asarray(frame_to_symbol_bits(enc)).reshape(-1)

        @jax.jit
        def synth(b):
            iq, _ = modulate_bits_fast(b, mod_reset())
            s = (iq[:, 0].astype(jnp.float32) +
                 1j * iq[:, 1].astype(jnp.float32)).astype(jnp.complex64)
            return jnp.concatenate(
                [s, jnp.zeros(100 * CONFIG.samples_per_symbol, jnp.complex64)])

        s = synth(jnp.asarray(bits))
        block = -(-s.shape[0] // n)
        block = -(-block // 8) * 8
        s = jnp.concatenate([s, jnp.zeros(n * block - s.shape[0], jnp.complex64)])
        samples = s[None, :]
        mesh = make_mesh({"ch": 1, "time": n})

        def run():
            return rx_grid_sharded(mesh, samples, max_frames_per_shard=fpd + 2)

        out = run()
        decoded = int(out["n"])
        expect = n * fpd
        times = []
        for _ in range(3):
            t0 = time.time()
            out = run()
            _ = int(out["n"])
            times.append(time.time() - t0)
        dt = min(times)
        msps = samples.size / dt / 1e6
        if base is None:
            base = msps
        eff = msps / (base * n)
        results.append({"devices": n, "msps": round(msps, 1),
                        "efficiency": round(eff, 3),
                        "decoded": decoded, "expected": expect,
                        "virtual_mesh": virtual})
        print(f"N={n}: {decoded}/{expect} frames, {msps:.1f} MS/s, "
              f"efficiency {eff:.2f}{' (virtual mesh!)' if virtual else ''}",
              file=sys.stderr)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
