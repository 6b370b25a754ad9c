#!/usr/bin/env python
"""TX (modulator) throughput on the current accelerator — the counterpart
of the reference's other headline number (opv-mod, 10.7 MS/s on one Xeon
core, hot loop src/opv-mod.cpp:262-280; BASELINE.md).

With symbol_signs in closed form (bit-parity prefix sum) the whole TX
chain — frame encode, sync-word interposition, gating signs, waveform
synthesis, int16 quantization — is embarrassingly parallel: one fused
elementwise program per (channel, sample).  This tool times

  modulate   — batched modulate_bits_fast: bits -> int16 IQ (the synthesis
               hot loop; HBM-bound on the 4 B/sample output write)
  tx_chain   — encode_frame + frame_to_symbol_bits + modulate (full frame
               pipeline from 134-byte payloads)

using the hardened amortized harness (PERF.md): digest folded back into
the input via in-place dynamic_update_slice, nonlinear digests, scalar
fetch inside the timed region, two-K differencing so the dispatch RTT
cancels.

Prints one JSON object on stdout; progress to stderr.  Usage:
  python tools/tx_bench.py [--cpu] [--channels 64] [--frames 20]
"""

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    log(f"platform: {platform}")
    if platform != "cpu":
        import os
        import threading
        done = threading.Event()

        def _watch():
            if not done.wait(150):
                log("pre-flight probe hung; aborting")
                os._exit(3)

        threading.Thread(target=_watch, daemon=True).start()
        assert float(jax.jit(lambda: jnp.ones((8, 128)).sum())()) == 1024.0
        done.set()
        log("pre-flight ok")

    from opv_tpu.config import CONFIG
    from opv_tpu.core import build_bert_frame, encode_frame
    from opv_tpu.core.framing import frame_to_symbol_bits
    from opv_tpu.tx.modulator import mod_reset, modulate_bits_wire

    C, F = args.channels, args.frames
    sps = CONFIG.samples_per_symbol
    spf = CONFIG.samples_per_frame

    # per-channel payloads (distinct frame numbers so nothing folds)
    payloads = np.stack([
        np.asarray(build_bert_frame("W5NYV", frame_num=np.arange(F) + 97 * c))
        for c in range(C)])                          # (C, F, 134) uint8
    payloads_d = jnp.asarray(payloads)
    st0 = mod_reset()

    bits = jax.jit(lambda p: jax.vmap(
        lambda q: frame_to_symbol_bits(encode_frame(q)).reshape(-1))(p)
        .astype(jnp.int32))(payloads_d)              # (C, F*2168)
    jax.block_until_ready(bits)
    n_out = C * F * spf
    log(f"geometry: {C} ch x {F} frames = {n_out/1e6:.1f} M output samples "
        f"({n_out*4/1e6:.0f} MB int16 IQ)")

    # wire-packed form: one int32 word per sample whose LE bytes are the
    # interleaved int16 I,Q wire sample — the (N, 2) stack costs ~5x the
    # whole synthesis on TPU (minor-axis-2 concat defeats fusion; PERF.md)
    mod_b = jax.vmap(lambda b: modulate_bits_wire(b, st0)[0])   # (C, S*40)

    def chain(p):
        bb = jax.vmap(
            lambda q: frame_to_symbol_bits(encode_frame(q)).reshape(-1))(p)
        return mod_b(bb.astype(jnp.int32))

    res = {"platform": platform, "channels": C, "frames_per_chan": F,
           "out_samples": n_out, "stages_ms": {}}

    def fetchf(x):
        return float(x)

    def bench(fn, *a):
        out = fn(*a)
        fetchf(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            fetchf(out)                  # fetch inside the timed region
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # hardened amortized harness — see tools/stage_bench.py / PERF.md
    def amortized(step, x, label, ks=(10, 50)):
        nd = x.ndim
        idx = (jnp.int32(0),) * nd

        def body(_i, carry):
            digest, xx = carry
            eps = jnp.where(digest > 1e30, 1, 0).astype(xx.dtype)
            cell = jax.lax.dynamic_slice(xx, idx, (1,) * nd)
            xx = jax.lax.dynamic_update_slice(xx, cell + eps, idx)
            return (digest + step(xx).astype(jnp.float32), xx)

        ts, d0 = [], None
        for k in ks:
            f = jax.jit(functools.partial(
                lambda xx, k: jax.lax.fori_loop(
                    0, k, body, (jnp.float32(0), xx))[0], k=k))
            t = bench(f, x)
            d = float(f(x))
            if d0 is not None:
                np.testing.assert_allclose(d / k, d0, rtol=1e-6)
            d0 = d / k
            ts.append(t)
            log(f"{label}_loop[k={k}]: {t*1e3:.2f} ms")
        per = (ts[1] - ts[0]) / (ks[1] - ks[0])
        log(f"{label} amortized: {per*1e3:.3f} ms")
        return per

    def _mod_digest(b):
        iq = mod_b(b)
        return jnp.abs(iq.astype(jnp.int32)).sum().astype(jnp.float32)

    per = amortized(_mod_digest, bits, "modulate")
    res["stages_ms"]["modulate_amortized"] = per * 1e3
    res["modulate_msps"] = n_out / per / 1e6
    res["modulate_vs_baseline"] = res["modulate_msps"] / 10.7
    log(f"modulate: {per*1e3:.2f} ms -> {res['modulate_msps']:.0f} MS/s "
        f"out ({res['modulate_vs_baseline']:.0f}x the 10.7 MS/s reference)")

    def _chain_digest(p):
        iq = chain(p)
        return jnp.abs(iq.astype(jnp.int32)).sum().astype(jnp.float32)

    per = amortized(_chain_digest, payloads_d, "tx_chain")
    res["stages_ms"]["tx_chain_amortized"] = per * 1e3
    res["tx_chain_msps"] = n_out / per / 1e6
    log(f"tx_chain (encode+interleave+sync+modulate): {per*1e3:.2f} ms -> "
        f"{res['tx_chain_msps']:.0f} MS/s out")

    # roofline: the synthesis writes n_out int16 IQ pairs (4 B/sample) and
    # reads ~n_out/40 int32 bits — output-write bound
    out_bytes = n_out * 4
    res["roofline"] = {
        "out_bytes": out_bytes,
        "write_min_ms_at_819GBs": out_bytes / 819e9 * 1e3,
    }
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
