"""Pallas kernel tests (interpret mode on CPU; real lowering is exercised on
TPU by bench.py / the driver)."""

import numpy as np
import jax.numpy as jnp

from opv_tpu.config import CONFIG
from opv_tpu.core.convcode import conv_encode_bits_np
from opv_tpu.ops.pallas.viterbi import viterbi_pallas, _default_tile
from opv_tpu.rx.viterbi import viterbi_decode_batch


class TestPallasViterbi:
    def test_matches_xla_random(self):
        rng = np.random.default_rng(0)
        soft = jnp.asarray(rng.integers(0, 8, (5, CONFIG.encoded_bits))
                           .astype(np.int32))
        b1, m1 = viterbi_decode_batch(soft)
        b2, m2 = viterbi_pallas(soft, interpret=True)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_clean_decode(self):
        rng = np.random.default_rng(1)
        u = rng.integers(0, 2, (3, CONFIG.frame_bits)).astype(np.uint8)
        enc = conv_encode_bits_np(u)
        soft = jnp.asarray(np.where(enc == 1, 7, 0).astype(np.int32))
        bits, metrics = viterbi_pallas(soft, interpret=True)
        np.testing.assert_array_equal(np.asarray(bits).astype(np.uint8), u)
        np.testing.assert_array_equal(np.asarray(metrics), 0)

    def test_batch_padding(self):
        """Batch sizes that are not multiples of B_TILE are padded/cropped."""
        rng = np.random.default_rng(2)
        for b in (1, _default_tile(1), _default_tile(1) + 3, 300):
            soft = jnp.asarray(rng.integers(0, 8, (b, CONFIG.encoded_bits))
                               .astype(np.int32))
            b1, m1 = viterbi_decode_batch(soft)
            b2, m2 = viterbi_pallas(soft, interpret=True)
            assert b2.shape[0] == b
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_registry_dispatch(self):
        from opv_tpu.ops import registry
        rng = np.random.default_rng(3)
        soft = jnp.asarray(rng.integers(0, 8, (2, CONFIG.encoded_bits))
                           .astype(np.int32))
        registry.set_backend("pallas_interpret")
        try:
            b2, m2 = registry.viterbi_batch(soft)
        finally:
            registry.set_backend("xla")
        b1, m1 = registry.viterbi_batch(soft)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_wide_tile_equivalence(self):
        """Lane-tile widths beyond 128 (serial-chain amortization) decode
        identically."""
        rng = np.random.default_rng(4)
        soft = jnp.asarray(rng.integers(0, 8, (5, CONFIG.encoded_bits))
                           .astype(np.int32))
        b1, m1 = viterbi_decode_batch(soft)
        for bt in (256, 512):
            b2, m2 = viterbi_pallas(soft, interpret=True, b_tile=bt)
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_unroll_equivalence(self):
        """Every trellis-step unroll factor (U-step block loads/stores in
        ACS and traceback) decodes identically to the XLA scan."""
        rng = np.random.default_rng(6)
        soft = jnp.asarray(rng.integers(0, 256, (3, CONFIG.encoded_bits))
                           .astype(np.int32))
        b1, m1 = viterbi_decode_batch(soft)
        # u must divide the 8-step guarded prologue (u16 measured slower
        # than u2 anyway); sweep both survivor-packing strategies
        for u in (1, 2, 4, 8):
            for pk in ("mxu", "vpu"):
                b2, m2 = viterbi_pallas(soft, interpret=True, unroll=u,
                                        pack=pk, radix=2)
                np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
                np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        # radix-4 fused double-steps (u8 would not divide the 4-double-step
        # guarded prologue)
        for u in (1, 2, 4):
            b2, m2 = viterbi_pallas(soft, interpret=True, unroll=u, radix=4)
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_radix4_tie_stress(self):
        """Low-entropy inputs force massive metric ties; the radix-4
        priority-ordered min tree must reproduce the sequential radix-2
        tie rules (lower grandparent, then lower parent) exactly."""
        rng = np.random.default_rng(8)
        soft = np.concatenate([
            rng.integers(0, 2, (4, CONFIG.encoded_bits)),
            np.zeros((2, CONFIG.encoded_bits)),
            np.full((2, CONFIG.encoded_bits), 7),
            rng.integers(3, 5, (2, CONFIG.encoded_bits))]).astype(np.int32)
        soft = jnp.asarray(soft)
        b1, m1 = viterbi_decode_batch(soft)
        for r in (2, 4):
            b2, m2 = viterbi_pallas(soft, interpret=True, radix=r)
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        # independent radix-4 oracle (plain-XLA fusion, rx/viterbi.py)
        from opv_tpu.rx.viterbi import viterbi_decode_r4_batch
        b3, m3 = viterbi_decode_r4_batch(soft)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b3))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))


class TestPallasCorrelator:
    def test_matches_einsum_with_ragged_tail(self):
        """Interpret-mode kernel == XLA einsum, incl. the tail split that
        registry.symbol_corr routes around the TM tiling."""
        from opv_tpu.ops import registry
        from opv_tpu.ops.pallas.correlate import TM
        rng = np.random.default_rng(5)
        for m in (TM, TM + 37, 64):          # exact, ragged, tail-only
            sym = jnp.asarray(rng.standard_normal((2, m, 80)), jnp.float32)
            kern = jnp.asarray(rng.standard_normal((2, 80, 8)), jnp.float32)
            want = jnp.einsum("cst,cto->cso", sym, kern)
            import os
            os.environ["OPV_CORR"] = "pallas_interpret"
            try:
                got = registry.symbol_corr(sym, kern)
            finally:
                del os.environ["OPV_CORR"]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-6, atol=1e-4)

