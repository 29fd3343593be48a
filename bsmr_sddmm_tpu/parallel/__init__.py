from bsmr_sddmm_tpu.parallel import distributed
from bsmr_sddmm_tpu.parallel.sharding import (make_mesh, shard_device_plan,
                                              make_sharded_sddmm_fn,
                                              shard_operands)

__all__ = ["distributed", "make_mesh", "shard_device_plan",
           "make_sharded_sddmm_fn", "shard_operands"]
