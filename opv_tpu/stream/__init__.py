from opv_tpu.stream.chunked import StreamingDemodulator
from opv_tpu.stream.state import save_state, load_state

__all__ = ["StreamingDemodulator", "save_state", "load_state"]
