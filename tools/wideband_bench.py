#!/usr/bin/env python
"""End-to-end wideband digitizer -> frames throughput at K channels.

Drives the DEVICE-RESIDENT composition (stream/wideband.py): polyphase
analysis channelizer (one grouped strided conv, rx/channelizer.py) feeding
the locked-grid multichannel engine — the SURVEY section 7.4 "64-channel
bank" deployment shape.  The wideband test signal is synthesized on-device
(zero-order-hold upsample x K + per-channel mixer tones; the channelizer's
lowpass absorbs the ZOH images) so only scalars cross the tunnel.

Prints one JSON object on stdout; progress to stderr.  Usage:
  python tools/wideband_bench.py [--cpu] [--k 64] [--frames 4] [--active 8]
"""

import argparse
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
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--frames", type=int, default=4,
                    help="frames per channel per cycle (frame-periodic)")
    ap.add_argument("--active", type=int, default=8,
                    help="channels carrying signal (channelizer cost is "
                         "independent of this; memory is not)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pipeline", action="store_true",
                    help="pipelined inner demod driver (block N computes "
                         "while N-1's results are fetched)")
    ap.add_argument("--block-frames", type=int, default=2,
                    help="inner demod block size in frames: larger blocks "
                         "amortize the per-block result fetch (one tunnel "
                         "RTT) over more air time at the cost of latency")
    ap.add_argument("--quantum-frames", type=int, default=0,
                    help="channelizer feed quantum in frames per channel; "
                         "must divide --block-frames; 0 = the block "
                         "advance (the production default).  Feeding the "
                         "whole block advance in one quantum collapses "
                         "the per-block dispatch count to ONE fused "
                         "channelize+stat+append program — on a degraded "
                         "tunnel where every enqueue costs ~an RTT this "
                         "is the wall-clock lever (26.6 -> 523.7 MS/s)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    log(f"platform: {platform}")
    if platform != "cpu":
        import threading, os
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
    from opv_tpu.stream.wideband import WidebandReceiver
    from opv_tpu.tx.modulator import mod_reset, modulate_bits_fast

    if args.quantum_frames == 0:
        args.quantum_frames = args.block_frames
    k, act = args.k, min(args.active, args.k)
    # the synthesized cycle must be a quantum multiple AND longer than the
    # channelizer window (history + one quantum), so big --quantum-frames
    # runs need a longer cycle than the --frames default
    f = max(args.frames, 2 * args.quantum_frames)
    f -= f % args.quantum_frames
    spf = CONFIG.samples_per_frame
    n_ch = f * spf                       # channel-rate samples per cycle
    n_wb = n_ch * k                      # wideband samples per cycle
    active = list(range(0, k, max(1, k // act)))[:act]

    frames = build_bert_frame("W5NYV", frame_num=np.arange(f))
    enc = encode_frame(jnp.asarray(frames))
    bits = np.asarray(frame_to_symbol_bits(enc)).reshape(-1)

    # every active channel carries the same MSK content at its own carrier
    # with a random (deterministic-seed) phase: the per-sample mixer sum
    # over active carriers is PERIODIC in t with period K, so it reduces to
    # one precomputed K-point comb — O(n) synthesis for ANY active count
    # (the old per-channel unrolled mix was O(n x active))
    ph = np.random.default_rng(0).uniform(0, 2 * np.pi, len(active))
    u = np.arange(k)[:, None]
    comb = (np.exp(1j * ph)[None, :]
            * np.exp(2j * np.pi * np.asarray(active)[None, :] * u / k)
            ).sum(axis=1).astype(np.complex64)

    @jax.jit
    def synth(bits_dev):
        iq, _ = modulate_bits_fast(bits_dev, mod_reset())
        s = (iq[:, 0].astype(jnp.float32) +
             1j * iq[:, 1].astype(jnp.float32)).astype(jnp.complex64)
        up = jnp.repeat(s, k)            # ZOH to the wideband rate
        return up * jnp.tile(jnp.asarray(comb), n_wb // k)

    wideband = synth(jnp.asarray(bits))
    jax.block_until_ready(wideband)
    log(f"wideband synthesized on-device: {n_wb} samples "
        f"({k} channels, {len(active)} active)")

    if args.block_frames % args.quantum_frames:
        raise SystemExit("--quantum-frames must divide --block-frames")
    rx = WidebandReceiver(k, block_frames=args.block_frames,
                          quantum_out=args.quantum_frames * spf,
                          pipeline=args.pipeline, timing=True)
    quantum = rx._quantum
    if n_wb < rx.window:
        raise SystemExit("cycle shorter than one channelizer window")
    # extend on-device so every chunk is one contiguous static slice
    x2 = jnp.concatenate([wideband, wideband[: rx.window]])
    jax.block_until_ready(x2)

    rx.feed(x2[: rx.window])             # prime: history + first quantum
    pos = rx.window
    n_cycle_chunks = n_wb // quantum
    for _ in range(n_cycle_chunks):      # warm every slice offset
        rx.feed(x2[pos % n_wb: pos % n_wb + quantum])
        pos += quantum

    dec0 = rx.decoded
    chunks = args.reps * n_cycle_chunks
    t0 = time.time()
    for _ in range(chunks):
        rx.feed(x2[pos % n_wb: pos % n_wb + quantum])
        pos += quantum
    dt = time.time() - t0
    msps = chunks * quantum / dt / 1e6
    rt = msps * 1e6 / (k * CONFIG.sample_rate)
    decoded = rx.decoded - dec0
    log(f"wideband: {msps:.1f} MS/s ({rt:.2f}x real time at K={k}), "
        f"{decoded} frames decoded in the timed window")

    stats = rx.stats()
    res = {"platform": platform, "k": k, "active_channels": len(active),
           "device_wait_ms_mean": stats.get("device_wait_ms_mean"),
           "host_ms_mean": stats.get("host_ms_mean"),
           "blocks_timed": stats.get("blocks"),
           "block_frames": args.block_frames,
           "quantum_frames": args.quantum_frames,
           "pipeline": bool(args.pipeline),
           "wideband_msps": round(msps, 2),
           "x_realtime": round(rt, 3),
           "frames_decoded_timed": int(decoded),
           "frames_per_chan_per_cycle": f}
    out = json.dumps(res)
    if args.json:
        open(args.json, "w").write(out + "\n")
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
