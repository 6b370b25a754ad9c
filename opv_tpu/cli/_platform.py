"""CLI platform selection.

The compat (reference-parity) DSP paths run in float64, which TPU backends do
not support — so CLIs default to CPU and opt into an accelerator with
--device.  Must be called before any jax computation.
"""

from __future__ import annotations


def setup_platform(device: str = "cpu", x64: bool = True) -> None:
    import jax
    if device:
        jax.config.update("jax_platforms", device)
    if x64:
        jax.config.update("jax_enable_x64", True)
