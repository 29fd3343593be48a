from bsmr_sddmm_tpu.parallel import distributed
from bsmr_sddmm_tpu.parallel.sharding import (make_mesh,
                                              make_sharded_sddmm,
                                              shard_device_plan,
                                              shard_operands,
                                              sharded_rphm_to_csr)

__all__ = ["distributed", "make_mesh", "make_sharded_sddmm",
           "shard_device_plan", "shard_operands", "sharded_rphm_to_csr"]
