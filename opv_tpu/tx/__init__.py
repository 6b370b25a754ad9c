from opv_tpu.tx.modulator import (
    ModulatorState,
    mod_reset,
    symbol_signs,
    modulate_bits_exact,
    modulate_bits_fast,
    modulate_bits_wire,
    modulate_frames,
    tx_flush_zeros,
)

__all__ = [
    "ModulatorState", "mod_reset", "symbol_signs",
    "modulate_bits_exact", "modulate_bits_fast", "modulate_bits_wire",
    "modulate_frames",
    "tx_flush_zeros",
]
