from opv_tpu.parallel.mesh import make_mesh, channel_mesh
from opv_tpu.parallel.sharded import rx_fast_sharded, rx_time_sharded

__all__ = ["make_mesh", "channel_mesh", "rx_fast_sharded", "rx_time_sharded"]
