from opv_tpu.io.iq import (iq_bytes_to_complex, complex_to_iq_bytes,
                           int16_pairs_to_complex, iq_bytes_to_f32_pairs)
from opv_tpu.io.udp import UDPFrameBridge

__all__ = ["iq_bytes_to_complex", "complex_to_iq_bytes", "iq_bytes_to_f32_pairs",
           "int16_pairs_to_complex", "UDPFrameBridge"]
