from sesr_tpu.models.blocks import collapse_block, fold_residual_identity
from sesr_tpu.models.sesr import CollapsedParams, forward_float, init_params
