from opv_tpu.stream.chunked import StreamingDemodulator
from opv_tpu.stream.locked import LockedStreamDemodulator
from opv_tpu.stream.multichannel import MultiChannelDemodulator
from opv_tpu.stream.sharded import ShardedStreamDemodulator
from opv_tpu.stream.tracking import MultiChannelTrackingDemodulator
from opv_tpu.stream.wideband import WidebandReceiver
from opv_tpu.stream.state import save_state, load_state

__all__ = ["StreamingDemodulator", "LockedStreamDemodulator",
           "MultiChannelDemodulator", "ShardedStreamDemodulator",
           "MultiChannelTrackingDemodulator", "WidebandReceiver",
           "save_state", "load_state"]
