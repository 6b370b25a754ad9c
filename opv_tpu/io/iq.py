"""Sample I/O: the int16 IQ wire format.

Wire format per the reference (opv-mod.cpp:53, 304-309; README.md:205):
interleaved little-endian int16 (I, Q) pairs, full scale 16383.

NumPy-vectorized here; a C-extension fast path (opv_tpu/runtime) replaces
these on hot streaming paths when built.
"""

from __future__ import annotations

import numpy as np

from opv_tpu.runtime import HAVE_NATIVE, _iqio


def iq_bytes_to_complex(buf: bytes | bytearray | memoryview,
                        dtype=np.complex128) -> np.ndarray:
    """Interleaved int16 LE bytes -> (N,) complex samples (I + jQ)."""
    nb = (len(buf) // 4) * 4          # drop any trailing partial sample
    if HAVE_NATIVE and dtype == np.complex64:
        return np.frombuffer(_iqio.iq_to_c64(buf[:nb]), dtype=np.complex64)
    a = np.frombuffer(buf[:nb] if nb != len(buf) else buf, dtype="<i2")
    a = a.reshape(-1, 2)
    return (a[:, 0].astype(np.float64) + 1j * a[:, 1].astype(np.float64)).astype(dtype)


def int16_pairs_to_complex(iq: np.ndarray, dtype=np.complex128) -> np.ndarray:
    """(N, 2) int16 -> (N,) complex."""
    return (iq[:, 0].astype(np.float64) + 1j * iq[:, 1].astype(np.float64)).astype(dtype)


def iq_bytes_to_f32_pairs(buf: bytes | bytearray | memoryview,
                          channels: int = 1) -> np.ndarray:
    """Interleaved int16 LE bytes -> (channels, N, 2) float32 IQ pairs.

    The zero-copy wire form the locked-grid pipeline consumes directly
    (rx/locked.py _symbol_soft_batch): no complex materialization at any
    point.  Multichannel streams interleave channel pairs per sample
    instant (I0 Q0 I1 Q1 ...), matching opv-demod --channels framing."""
    quantum = 4 * channels
    nb = (len(buf) // quantum) * quantum
    a = np.frombuffer(buf[:nb] if nb != len(buf) else buf, dtype="<i2")
    return np.ascontiguousarray(
        a.astype(np.float32).reshape(-1, channels, 2).transpose(1, 0, 2))


def complex_to_iq_bytes(samples: np.ndarray) -> bytes:
    """(N,) complex (already scaled to int16 range) -> wire bytes.
    Truncates toward zero like the reference's static_cast<int16_t>, with
    saturation at the int16 rails."""
    if HAVE_NATIVE and samples.dtype == np.complex64:
        # float64 input must NOT take this path: rounding to float32 before
        # truncation can flip values one ulp below an integer, breaking the
        # reference's double-cast semantics
        inter = np.empty((len(samples), 2), dtype=np.float32)
        inter[:, 0] = samples.real
        inter[:, 1] = samples.imag
        return _iqio.f32_to_iq(inter.tobytes())
    out = np.empty((len(samples), 2), dtype="<i2")
    out[:, 0] = np.clip(np.trunc(samples.real), -32768, 32767).astype(np.int16)
    out[:, 1] = np.clip(np.trunc(samples.imag), -32768, 32767).astype(np.int16)
    return out.tobytes()
