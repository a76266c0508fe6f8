from sesr_tpu.parallel.tiling import (
    make_mesh, sharded_integer_forward, sharded_float_forward,
)
from sesr_tpu.ops.halo import halo_exchange_w
