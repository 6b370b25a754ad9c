from opv_tpu.parallel.mesh import make_mesh, channel_mesh
from opv_tpu.parallel.sharded import rx_fast_sharded, rx_time_sharded
from opv_tpu.parallel.grid import rx_grid_sharded
from opv_tpu.parallel.multihost import initialize_multihost, global_mesh

__all__ = ["make_mesh", "channel_mesh", "rx_fast_sharded", "rx_time_sharded",
           "rx_grid_sharded", "initialize_multihost", "global_mesh"]
