from rmem_ocu_tpu.models.decoders.fpn import FPNSegmentationHead  # noqa: F401
