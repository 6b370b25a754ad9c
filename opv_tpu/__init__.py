"""opv_tpu — a TPU-native (JAX/XLA/Pallas) framework for the Opulent Voice
(OPV) amateur-radio digital voice modem.

Re-designed from scratch against the behavior of the reference C++ modem
(OpenResearchInstitute/opv-cxx-demod): MSK modulator, MSK demodulator with
AFC + symbol-timing recovery + soft-decision Viterbi, and a UDP modem server
— re-architected as batched, sharded TPU computation.

Layout (see SURVEY.md for the reference layer map this mirrors):
  core/     numerology + codec chain (base40, LFSR, conv code, interleaver,
            frame encode/decode bit plumbing) as vectorized array ops
  tx/       MSK modulator (symbol state-machine scan + batched synthesis)
  rx/       demodulator stages: CFO estimator, correlator/loop scan, sync
            tracker, Viterbi, frame finisher, whole-block pipelines
  ops/      Pallas TPU kernels for the hot ops (+ XLA reference impls)
  stream/   streaming runtime: DemodState pytree, chunked driver
  parallel/ device-mesh sharding: channel-parallel and time-sharded blocks
  io/       sample I/O: int16 IQ wire format, UDP framing (host side)
  cli/      CLI-compatible entry points (opv-mod / opv-demod / opv-modem)
"""

from opv_tpu.config import OPVConfig, CONFIG

__all__ = ["OPVConfig", "CONFIG"]
__version__ = "0.1.0"
