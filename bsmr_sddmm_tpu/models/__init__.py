from bsmr_sddmm_tpu.models.graph_transformer import (GraphTransformer,
                                                     init_params,
                                                     make_forward,
                                                     make_train_step)

__all__ = ["GraphTransformer", "init_params", "make_forward",
           "make_train_step"]
