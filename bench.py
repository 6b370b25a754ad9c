#!/usr/bin/env python
"""Benchmark: multichannel feed-forward MSK demodulation throughput.

Measures the flagship RX pipeline (dense correlator bank -> dilated sync
correlation -> batched soft-decision Viterbi -> frame finishing) on whatever
accelerator jax exposes (TPU under the driver; CPU as fallback), in
steady state (jit warm, samples resident on device).

Baseline: the reference C++ demodulator (`opv-demod -s`) sustains
4.77 Msamples/s on one Xeon core (BASELINE.md) — vs_baseline is measured
throughput divided by that.

Prints exactly ONE JSON line on stdout:
  {"metric": "demod_throughput", "value": <Msamples/s>, "unit": "Msamples/s",
   "vs_baseline": <x>}
Details go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_MSPS = 4.77           # reference opv-demod -s, 1 Xeon core


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    log(f"devices: {devs}")
    platform = devs[0].platform

    from opv_tpu.config import CONFIG
    from opv_tpu.core import build_bert_frame, encode_frame
    from opv_tpu.rx.locked import rx_locked
    from opv_tpu.tx import modulate_frames, tx_flush_zeros

    # ---- build the test signal on host (not part of the measurement) ----
    frames_per_chan = 3
    channels = 32 if platform != "cpu" else 8
    frames = build_bert_frame("W5NYV", frame_num=np.arange(frames_per_chan))
    enc = encode_frame(jnp.asarray(frames))
    iq, _ = modulate_frames(enc, exact=False)
    iq = np.concatenate([np.asarray(iq), tx_flush_zeros()])
    s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
    block = np.stack([s] * channels)
    samples = jax.device_put(jnp.asarray(block))
    n_samples = block.size
    log(f"signal: {channels} channels x {block.shape[1]} samples "
        f"({frames_per_chan} frames/chan)")

    def step(x):
        out = rx_locked(x, n_frames=frames_per_chan, estimate_cfo_flag=True)
        return out["n_decoded"], out["frames"], out["metrics"], out["frame_valid"]

    # ---- warm up / compile ----
    t0 = time.time()
    out = step(samples)
    jax.block_until_ready(out)
    log(f"first call (compile): {time.time() - t0:.1f}s")

    n_decoded = int(out[0])
    expect = channels * frames_per_chan
    fv = np.asarray(out[3])
    metrics = np.asarray(out[2])
    perfect = int((metrics[fv] == 0).sum())
    log(f"decoded {n_decoded}/{expect} frames, {perfect} perfect")
    if n_decoded != expect or perfect != expect:
        log("WARNING: decode check failed — reporting throughput anyway")

    # ---- steady state ----
    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = step(samples)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = min(times)
    msps = n_samples / dt / 1e6
    rt_channels = msps * 1e6 / CONFIG.sample_rate
    log(f"steady-state: {dt * 1e3:.1f} ms/block -> {msps:.1f} Msamples/s "
        f"({rt_channels:.0f} real-time 2.168 MSPS channels) on {platform}")

    print(json.dumps({
        "metric": "demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
