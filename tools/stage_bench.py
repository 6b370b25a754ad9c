#!/usr/bin/env python
"""Per-stage timing of the production (locked-grid) RX pipeline on the
current accelerator — the kernel-level performance accounting BASELINE.md
line 34 demands ("per-chip speed of light").

Times, in isolation (jit-compiled, device-resident inputs, scalar-only
fetches):

  soft      — _symbol_soft_batch: phase-aligned symbol-rate tone
              correlation, the HBM-bandwidth stage (reads every sample once)
  extract   — _extract_frames: per-channel slice + strided reshape + sync
              quality (src/opv-demod.cpp:743-757 analog)
  viterbi   — 64-state soft Viterbi on (C*F, 2144), XLA scan vs Pallas
              VMEM kernel (src/opv-demod.cpp:800-847 analog)
  finish    — full frame finisher (quantize/deinterleave/viterbi/pack/
              derandomize) per backend
  steady    — the whole rx_locked_steady block per backend

Prints one JSON object on stdout; progress to stderr.  Usage:
  python tools/stage_bench.py [--cpu] [--channels 64] [--frames 20]
"""

import argparse
import functools
import json
import os
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--backends", nargs="+", default=None,
                    help="viterbi backends to time (default: xla+pallas on "
                         "TPU, xla elsewhere); split runs to keep each "
                         "tunnel session short")
    ap.add_argument("--tiles", type=int, nargs="+", default=None,
                    help="extra pallas-viterbi lane-tile widths to sweep "
                         "(multiples of 128)")
    ap.add_argument("--vit-split", action="store_true",
                    help="also time the pallas Viterbi with the traceback "
                         "loop traced out (ops.pallas.viterbi._TB hook), "
                         "isolating the ACS recurrence")
    ap.add_argument("--vit", nargs="+", default=None,
                    metavar="TILE,UNROLL[,PACK[,RADIX]]",
                    help="amortized pallas-viterbi (lane_tile, unroll[, "
                         "pack[, radix]]) combos to sweep, e.g. --vit "
                         "256,1 256,4 256,2,vpu 256,2,vpu,4")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    log(f"platform: {platform}")
    if platform != "cpu":
        # pre-flight probe with hard watchdog (see bench.py: a wedged tunnel
        # hangs in uninterruptible fetches)
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
    from opv_tpu.core.interleave import deinterleave_gather
    from opv_tpu.ops import registry
    from opv_tpu.rx.frame_decoder import decode_payloads, quantize_soft
    from opv_tpu.rx.locked import (_extract_frames, _locked_body,
                                   _symbol_soft_batch, rx_locked)
    from opv_tpu.tx.modulator import mod_reset, modulate_bits_fast

    C, F = args.channels, args.frames
    sps = CONFIG.samples_per_symbol

    frames = build_bert_frame("W5NYV", frame_num=np.arange(F))
    enc = encode_frame(jnp.asarray(frames))
    bits = np.asarray(frame_to_symbol_bits(enc)).reshape(-1)

    @jax.jit
    def synth(b):
        iq, _ = modulate_bits_fast(b, mod_reset())
        s = (iq[:, 0].astype(jnp.float32) +
             1j * iq[:, 1].astype(jnp.float32)).astype(jnp.complex64)
        s = jnp.concatenate([s, jnp.zeros(100 * sps, jnp.complex64)])
        return jnp.broadcast_to(s, (C, s.shape[0]))

    samples = synth(jnp.asarray(bits))
    jax.block_until_ready(samples)
    c, n = samples.shape
    n_total = c * n
    log(f"signal: {c} x {n} samples on {platform}")
    # production wire form: (C, N, 2) float32 IQ pairs (zero re-interleave)
    samples_i = jax.jit(lambda s: jnp.stack(
        [s.real.astype(jnp.float32), s.imag.astype(jnp.float32)], -1))(samples)
    jax.block_until_ready(samples_i)
    # production BUFFER form: (C, N/40, 80) window rows, bf16 on TPU — the
    # correlation matmul's own operand layout (zero relayout, see
    # stream/locked.py); n is 40-aligned by construction (frames + pad)
    buf_dt = jnp.bfloat16 if platform == "tpu" else jnp.float32
    samples_w = jax.jit(lambda s: jnp.stack(
        [s.real.astype(buf_dt), s.imag.astype(buf_dt)], -1)
        .reshape(C, -1, 2 * sps))(samples)
    jax.block_until_ready(samples_w)
    # quantized int8 window rows (wire/INT8_SCALE): halves the soft-stage
    # HBM read once more vs bf16; s8 x s8 -> s32 matmul path
    from opv_tpu.rx.locked import INT8_SCALE
    samples_w8 = jax.jit(lambda s: jnp.clip(jnp.round(
        jnp.stack([s.real, s.imag], -1) * (1.0 / INT8_SCALE)),
        -127, 127).astype(jnp.int8).reshape(C, -1, 2 * sps))(samples)
    jax.block_until_ready(samples_w8)

    acq = rx_locked(samples, n_frames=F, estimate_cfo_flag=True)
    p0, foff = acq["p0"], acq["freq_offset"]
    assert int(acq["n_decoded"]) == C * F, int(acq["n_decoded"])
    nsym = (n - sps) // sps
    r = p0 % sps
    k0 = (p0 - r) // sps

    def _wait(out):
        # On the axon tunnel block_until_ready has been observed returning
        # BEFORE execution (a 50-iteration kernel loop "finished" in 60 us);
        # fetching a value is the only reliable wait.  Scalar outputs are
        # fetched (KB-scale, safe); larger outputs fall back to block (the
        # amortized paths — the honest numbers — all digest to scalars).
        for leaf in jax.tree_util.tree_leaves(out):
            if getattr(leaf, "size", 0) == 1:
                np.asarray(leaf)
            else:
                jax.block_until_ready(leaf)

    def bench(fn, *a):
        out = fn(*a)
        _wait(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _wait(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    res = {"platform": platform, "channels": C, "frames_per_chan": F,
           "samples_per_block": n_total, "stages_ms": {}}

    # --- stage: symbol-rate tone correlation ---
    f_soft = jax.jit(lambda s, rr, ff: _symbol_soft_batch(s, rr, ff, nsym))
    t, soft = bench(f_soft, samples, r, foff)
    res["stages_ms"]["soft"] = t * 1e3
    log(f"soft: {t*1e3:.2f} ms")

    # --- stage: frame extraction + sync quality ---
    f_ext = jax.jit(lambda sf, kk: _extract_frames(sf, kk, F))
    t, (payloads, q, raw) = bench(f_ext, soft, k0)
    res["stages_ms"]["extract"] = t * 1e3
    log(f"extract: {t*1e3:.2f} ms")

    flat = payloads.reshape(-1, 2144)
    qsoft, _ = jax.jit(quantize_soft)(flat)
    deint = jax.jit(lambda x: x[..., jnp.asarray(deinterleave_gather())])(qsoft)
    jax.block_until_ready(deint)

    for t in (args.tiles or []):
        from opv_tpu.ops.pallas.viterbi import viterbi_pallas
        f_vt = jax.jit(lambda d, tt=t: viterbi_pallas(
            d, interpret=(platform != "tpu"), b_tile=tt))
        tsec, _ = bench(f_vt, deint)
        res["stages_ms"][f"viterbi_pallas_t{t}"] = tsec * 1e3
        log(f"viterbi[pallas t={t}]: {tsec*1e3:.2f} ms")

    backends = args.backends or (
        ["xla", "pallas"] if platform == "tpu" else ["xla"])
    for be in backends:
        registry.set_backend(be)
        f_vit = jax.jit(lambda d: registry.viterbi_batch(d))
        t, _ = bench(f_vit, deint)
        res["stages_ms"][f"viterbi_{be}"] = t * 1e3
        log(f"viterbi[{be}]: {t*1e3:.2f} ms   ({flat.shape[0]} frames)")

        f_fin = jax.jit(lambda fl: decode_payloads(fl))
        t, _ = bench(f_fin, flat)
        res["stages_ms"][f"finish_{be}"] = t * 1e3
        log(f"finish[{be}]: {t*1e3:.2f} ms")

        f_steady = jax.jit(lambda s, pp, ff: _locked_body(s, pp, ff, F))
        t, out = bench(f_steady, samples, p0, foff)
        assert int(out["n_decoded"]) == C * F
        res["stages_ms"][f"steady_{be}"] = t * 1e3
        msps = n_total / t / 1e6
        res[f"steady_{be}_msps"] = msps
        log(f"steady[{be}]: {t*1e3:.2f} ms  -> {msps:.0f} MS/s")
    registry.set_backend("xla")

    # --- amortized timings: the tunnel's dispatch round trip is ~40-60 ms
    # (measured via a (8,128) add), so every isolated number above is
    # RTT-dominated.  TRUE device time comes from running K iterations
    # inside ONE dispatch and differencing two K values (RTT cancels).
    #
    # Hardened harness (see PERF.md "Measurement-harness hardening"): an
    # optimization_barrier alone is NOT enough — chained barriers collapse
    # and LICM hoists a pure loop body (a stage then "times" faster than
    # its own HBM read).  Instead the scalar digest is folded back into ONE
    # element of the big input each iteration via dynamic_update_slice:
    # the folded value is provably +0 to us (digest > 1e30 never happens)
    # but unprovable to XLA, so xx is genuinely loop-variant — a true
    # serial data chain digest->xx->digest that nothing can hoist or DCE.
    # The DUS is an in-place loop-carry update (no copy); measured overhead
    # ~0.2 ms/iter on a 890 MB operand.  Digests must also be NONLINEAR in
    # the input (abs before the reduction) so XLA cannot commute the
    # reduction through a linear stage and contract the small operand first.
    def amortized(step, x, label, ks=(10, 50)):
        nd = x.ndim
        idx = (jnp.int32(0),) * nd

        def body(_i, carry):
            digest, xx = carry
            eps = jnp.where(digest > 1e30, 1.0, 0.0).astype(xx.dtype)
            cell = jax.lax.dynamic_slice(xx, idx, (1,) * nd)
            xx = jax.lax.dynamic_update_slice(xx, cell + eps, idx)
            return (digest + step(xx).astype(jnp.float32), xx)

        ts, d0 = [], None
        for k in ks:
            f = jax.jit(functools.partial(
                lambda xx, k: jax.lax.fori_loop(
                    0, k, body, (jnp.float32(0), xx))[0], k=k))
            t, d = bench(f, x)
            if d0 is not None:       # digest must scale exactly with k
                np.testing.assert_allclose(float(d) / k, d0, rtol=1e-6)
            d0 = float(d) / k
            ts.append(t)
            log(f"{label}_loop[k={k}]: {t*1e3:.2f} ms")
        per = (ts[1] - ts[0]) / (ks[1] - ks[0])
        log(f"{label} amortized: {per*1e3:.3f} ms")
        return per

    def _soft_digest(s):      # abs: nonlinear between input and reduction
        return jnp.abs(_symbol_soft_batch(s, r, foff, nsym)).sum()

    per = amortized(_soft_digest, samples, "soft")
    res["stages_ms"]["soft_amortized"] = per * 1e3
    per = amortized(_soft_digest, samples_i, "soft_ilv")
    res["stages_ms"]["soft_ilv_amortized"] = per * 1e3
    per = amortized(_soft_digest, samples_w, "soft_win")
    res["stages_ms"]["soft_win_amortized"] = per * 1e3
    per = amortized(_soft_digest, samples_w8, "soft_win8")
    res["stages_ms"]["soft_win8_amortized"] = per * 1e3

    def _ext_digest(sf):
        pl, q, raw = _extract_frames(sf, k0, F)
        return jnp.abs(pl).sum() + jnp.abs(q).sum() + jnp.abs(raw).sum()
    per = amortized(_ext_digest, soft, "extract")
    res["stages_ms"]["extract_amortized"] = per * 1e3

    for spec in (args.vit or []):
        # amortized (tile, unroll[, pack]) sweep — isolated timings are
        # RTT-bound
        from opv_tpu.ops.pallas.viterbi import PACK, RADIX, viterbi_pallas
        parts = spec.split(",")
        bt, u = int(parts[0]), int(parts[1])
        pk = parts[2] if len(parts) > 2 else PACK
        rx = int(parts[3]) if len(parts) > 3 else RADIX

        def _vp_digest(d, bt=bt, u=u, pk=pk, rx=rx):
            bits, metrics = viterbi_pallas(d, interpret=(platform != "tpu"),
                                           b_tile=bt, unroll=u, pack=pk,
                                           radix=rx)
            return (bits.astype(jnp.float32).sum()
                    + metrics.astype(jnp.float32).sum())
        per = amortized(_vp_digest, deint, f"viterbi_p_t{bt}u{u}{pk}r{rx}")
        res["stages_ms"][f"viterbi_p_t{bt}u{u}{pk}r{rx}_amortized"] = per * 1e3

        if args.vit_split:
            def _acs_digest(d, bt=bt, u=u, pk=pk, rx=rx):
                # metrics only — bits output is unwritten without traceback
                _, metrics = viterbi_pallas(d, interpret=(platform != "tpu"),
                                            b_tile=bt, unroll=u, pack=pk,
                                            radix=rx, _tb=False)
                return metrics.astype(jnp.float32).sum()
            per = amortized(_acs_digest, deint,
                            f"viterbi_acs_t{bt}u{u}{pk}r{rx}")
            res["stages_ms"][f"viterbi_acs_t{bt}u{u}{pk}r{rx}_amortized"] = \
                per * 1e3

    for be in backends:
        registry.set_backend(be)
        if os.environ.get("OPV_CORR", "xla") != "xla":
            # correlator experiment (OPV_CORR=pallas): time the soft stage
            # under the alternate kernel
            per = amortized(_soft_digest, samples_i, f"soft_ilv_{be}")
            res["stages_ms"][f"soft_ilv_{be}_amortized"] = per * 1e3

        def _vit_digest(d):
            bits, metrics = registry.viterbi_batch(d)
            return (bits.astype(jnp.float32).sum()
                    + metrics.astype(jnp.float32).sum())
        per = amortized(_vit_digest, deint, f"viterbi_{be}")
        res["stages_ms"][f"viterbi_{be}_amortized"] = per * 1e3

        def _steady_digest(s):
            out = _locked_body(s, p0, foff, F)
            return (out["n_decoded"].astype(jnp.float32)
                    + out["metrics"].sum().astype(jnp.float32)
                    + out["frames"].astype(jnp.int32).sum()
                      .astype(jnp.float32))
        per = amortized(_steady_digest, samples_i, f"steady_{be}")
        res[f"steady_{be}_amortized_ms"] = per * 1e3
        res[f"steady_{be}_amortized_msps"] = n_total / per / 1e6
        log(f"steady[{be}] amortized (wire-form input): {per*1e3:.2f} "
            f"ms/block -> {res[f'steady_{be}_amortized_msps']:.0f} MS/s "
            f"(dispatch RTT excluded)")
        per = amortized(_steady_digest, samples_w, f"steady_win_{be}")
        res[f"steady_win_{be}_amortized_ms"] = per * 1e3
        res[f"steady_win_{be}_amortized_msps"] = n_total / per / 1e6
        log(f"steady[{be}] amortized (windowed {buf_dt.__name__} buffer): "
            f"{per*1e3:.2f} ms/block -> "
            f"{res[f'steady_win_{be}_amortized_msps']:.0f} MS/s")
        out8 = jax.jit(lambda s: _locked_body(s, p0, foff, F))(samples_w8)
        assert int(out8["n_decoded"]) == C * F     # int8 decode correctness
        per = amortized(_steady_digest, samples_w8, f"steady_win8_{be}")
        res[f"steady_win8_{be}_amortized_ms"] = per * 1e3
        res[f"steady_win8_{be}_amortized_msps"] = n_total / per / 1e6
        log(f"steady[{be}] amortized (windowed int8 buffer): "
            f"{per*1e3:.2f} ms/block -> "
            f"{res[f'steady_win8_{be}_amortized_msps']:.0f} MS/s")
    registry.set_backend("xla")

    # --- roofline accounting (v5e: ~819 GB/s HBM, ~197 bf16 TFLOP/s) ---
    hbm_bytes_soft = n_total * 8 + c * nsym * 4     # read c64, write f32
    res["roofline"] = {
        "soft_hbm_bytes": hbm_bytes_soft,
        "soft_min_ms_at_819GBs": hbm_bytes_soft / 819e9 * 1e3,
        "viterbi_in_bytes": int(np.prod(deint.shape)) * 4,
    }
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
