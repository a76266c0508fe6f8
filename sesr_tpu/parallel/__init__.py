from sesr_tpu.parallel.tiling import (
    make_mesh, make_mesh_2d, sharded_integer_forward,
    sharded_integer_forward_2d, sharded_float_forward,
    sharded_float_forward_2d, sharded_calibrate,
    sharded_packed_forward, sharded_hybrid_forward,
    sharded_deployment_forward,
)
from sesr_tpu.parallel.multihost import (
    make_mesh_multihost, multihost_integer_forward,
    multihost_packed_forward, stream_frames,
)
from sesr_tpu.ops.halo import halo_exchange, halo_exchange_2d, halo_exchange_w
