"""C12 coherent-mode parity pin (VERDICT round-1 item 6).

The reference's Costas-loop demodulator is demonstrably NON-functional
(src/opv-demod.cpp:365-572): on its own clean loopback capture it decodes
zero frames and the AFC side loop rails at the +2000 Hz clamp.  Verified
against the reference binary in this environment:

    $ opv-demod -c < tests/golden/bert3.iq
    Estimated carrier offset: 1430.0 Hz
    Demodulated 6604 symbols, final AFC offset: 2000.0 Hz
    Summary: 0 frames (0 perfect, 0 errors)
    Final state: HUNTING, AFC: 2000.0 Hz          (exit code 1)

Parity with a broken mode is still a behavior: this test pins those exact
observables so a future "fix" of the port cannot silently diverge from the
reference's air-interface behavior.
"""

import numpy as np

from opv_tpu.config import CONFIG
from opv_tpu.io.iq import iq_bytes_to_complex
from opv_tpu.rx.pipeline import rx_batch


def test_coherent_mode_matches_reference_failure(golden_dir):
    s = iq_bytes_to_complex((golden_dir / "bert3.iq").read_bytes())
    out = rx_batch(s, coherent=True)
    # the coarse estimator's documented +1430 Hz bias on clean captures
    assert float(out["est_offset"]) == 1430.0
    # zero frames decode...
    assert out["decoded"] == 0
    # ...the AFC rails at exactly the +2000 Hz clamp...
    assert float(out["freq_offset"]) == CONFIG.afc_clamp_hz == 2000.0
    # ...and the sync tracker never leaves HUNTING
    assert int(out["tracker_state"]) == 0     # _HUNT (rx/sync.py:38)
