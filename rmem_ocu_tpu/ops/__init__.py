from rmem_ocu_tpu.ops.resize import interpolate_bilinear, interpolate_nearest  # noqa: F401
from rmem_ocu_tpu.ops.masks import one_hot_mask  # noqa: F401
