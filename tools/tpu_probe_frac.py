#!/usr/bin/env python
"""Staged on-TPU probe of the round-3 frac/refine path.

A LockedStreamDemodulator noise run on the axon backend once surfaced
`UNIMPLEMENTED: TPU backend error` at fetch time (async dispatch defers
compile/runtime errors to the first block), in a session where the tunnel
later wedged — so it is unknown whether the new sub-sample-timing path
(rx/locked.py refine_timing_locked + the frac-blended soft kernel) fails
to lower on hardware or the tunnel was already degraded.  This tool
isolates it: each stage compiles/executes one new program under a
watchdog, printing progress BEFORE each device interaction so a hang
identifies its stage.  Run when the tunnel is healthy:

    python tools/tpu_probe_frac.py            # all stages
    python tools/tpu_probe_frac.py --stage 3  # one stage

Stages:
  0  health check (8x128 ones sum)
  1  AOT lower+compile refine_timing_locked (no execution)
  2  execute refine_timing_locked, fetch scalars
  3  rx_locked_steady with frac on the int8 windowed buffer
  4  rx_locked_reacquire (mixed keep) — the program the noise run used
  5  LockedStreamDemodulator end-to-end on-device noise+signal scenario
"""

import argparse
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def watchdog(seconds, label):
    done = threading.Event()

    def _watch():
        if not done.wait(seconds):
            log(f"WATCHDOG: stage '{label}' exceeded {seconds}s; aborting "
                f"(leave the tunnel alone — see CLAUDE.md)")
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform == "cpu":
        log("no accelerator visible; nothing to probe")
        return 0

    from opv_tpu.rx.locked import (INT8_SCALE, refine_timing_locked,
                                   rx_locked_reacquire, rx_locked_steady)

    C, NF = 2, 3
    SPF = 86_720
    N = (NF + 1) * SPF

    def stages():
        return args.stage is None

    if stages() or args.stage == 0:
        d = watchdog(60, "health")
        t0 = time.time()
        assert float(jax.jit(lambda: jnp.ones((8, 128)).sum())()) == 1024.0
        d.set()
        log(f"stage 0 health OK ({time.time() - t0:.1f}s)")

    # on-device synthesized inputs (keep transfers tiny — CLAUDE.md)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def synth():
        a = jax.random.normal(key, (C, N, 2), jnp.float32) * 4000.0
        return (a[..., 0] + 1j * a[..., 1]).astype(jnp.complex64)

    if stages() or args.stage in (1, 2):
        d = watchdog(240, "refine compile")
        t0 = time.time()
        x = synth()
        jax.block_until_ready(x)
        fn = jax.jit(lambda s, p, f: refine_timing_locked(s, p, f,
                                                          n_frames=NF))
        lowered = fn.lower(jax.ShapeDtypeStruct((C, N), jnp.complex64),
                           jax.ShapeDtypeStruct((C,), jnp.int32),
                           jax.ShapeDtypeStruct((C,), jnp.float32))
        compiled = lowered.compile()
        d.set()
        log(f"stage 1 refine_timing compile OK ({time.time() - t0:.1f}s)")
        if stages() or args.stage == 2:
            d = watchdog(120, "refine execute")
            t0 = time.time()
            p0r, frac, _fold = compiled(x, jnp.array([100, 5000], jnp.int32),
                                        jnp.zeros(C, jnp.float32))
            log(f"stage 2 refine execute OK p0r={np.asarray(p0r)} "
                f"frac={np.asarray(frac)} ({time.time() - t0:.1f}s)")
            d.set()

    if stages() or args.stage == 3:
        d = watchdog(300, "steady+frac")
        t0 = time.time()

        @jax.jit
        def synth8():
            a = jax.random.normal(key, (C, N // 40, 80), jnp.float32) * 3.0
            return jnp.clip(jnp.round(a), -127, 127).astype(jnp.int8)

        q8 = synth8()
        jax.block_until_ready(q8)
        o = rx_locked_steady(q8, jnp.array([100, 5000], jnp.int32),
                             jnp.zeros(C, jnp.float32), n_frames=NF,
                             scale=jnp.full(C, INT8_SCALE, jnp.float32),
                             frac=jnp.full(C, 0.5, jnp.float32))
        nd = int(o["n_decoded"])
        d.set()
        log(f"stage 3 steady+frac OK n_decoded={nd} "
            f"({time.time() - t0:.1f}s)")

    if stages() or args.stage == 4:
        d = watchdog(300, "reacquire")
        t0 = time.time()
        x = synth()
        jax.block_until_ready(x)
        o = rx_locked_reacquire(x, jnp.array([100, 5000], jnp.int32),
                                jnp.zeros(C, jnp.float32),
                                jnp.array([True, False]), n_frames=NF,
                                frac_old=jnp.zeros(C, jnp.float32))
        q = np.asarray(o["sync_q"])
        d.set()
        log(f"stage 4 reacquire OK q={q.round(3).tolist()} "
            f"({time.time() - t0:.1f}s)")

    if stages() or args.stage == 5:
        d = watchdog(600, "engine noise scenario")
        t0 = time.time()
        from opv_tpu.core import build_bert_frame, encode_frame
        from opv_tpu.core.framing import frame_to_symbol_bits
        from opv_tpu.stream import LockedStreamDemodulator
        from opv_tpu.tx.modulator import mod_reset, modulate_bits_fast

        frames = build_bert_frame("W5NYV", frame_num=np.arange(4))
        enc = encode_frame(jnp.asarray(frames))
        bits = np.asarray(frame_to_symbol_bits(enc)).reshape(-1)

        @jax.jit
        def mix():
            iq, _ = modulate_bits_fast(jnp.asarray(bits), mod_reset())
            s = (iq[:, 0].astype(jnp.float32)
                 + 1j * iq[:, 1].astype(jnp.float32)).astype(jnp.complex64)
            noise = jax.random.normal(key, (C, 7 * SPF, 2),
                                      jnp.float32) * 6000.0
            nz = (noise[..., 0] + 1j * noise[..., 1]).astype(jnp.complex64)
            sig = jnp.zeros((C, 7 * SPF), jnp.complex64)
            sig = sig.at[0, SPF:SPF + s.shape[0]].set(s)
            return sig + nz                     # ch0 signal+noise, ch1 noise

        x = mix()
        jax.block_until_ready(x)
        sd = LockedStreamDemodulator(C, block_frames=2)
        out = []
        for i in range(0, 7 * SPF, SPF):
            out += sd.feed(x[:, i:i + SPF])
        out += sd.flush()
        ok = sum(1 for c, b, m, q, p in out
                 if c == 0 and any(bytes(f) == b for f in np.asarray(frames)))
        d.set()
        log(f"stage 5 engine OK: {len(out)} tuples, {ok}/4 bit-exact on ch0 "
            f"({time.time() - t0:.1f}s)")

    print('{"probe": "frac", "ok": true}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
