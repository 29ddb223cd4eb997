"""Encoder factory (reference: aot_plus/networks/encoders/__init__.py:10-37).

All encoders consume NHWC images and return a 4-element multi-scale feature
list [4x, 8x, 16x, 16x] (stage 5 dropped, 16x duplicated — reference
encoders/resnet.py:184-194).
"""
from __future__ import annotations


def build_encoder(name: str, frozen_bn: bool = True, freeze_at: int = 0,
                  use_mask: bool = False):
    from rmem_ocu_tpu.models.encoders.resnet import ResNetEncoder
    from rmem_ocu_tpu.models.encoders.mobilenetv2 import MobileNetV2Encoder
    from rmem_ocu_tpu.models.encoders.mobilenetv3 import MobileNetV3Encoder

    # frozen_bn=False builds trainable BatchNorm encoders (reference
    # BatchNorm2d path); running stats then live in the 'batch_stats'
    # collection, updated when the train engine applies the encoder with
    # mutable=['batch_stats']. Swin has no BN (LayerNorm only), matching
    # the reference.
    if name == 'mobilenetv2':
        return MobileNetV2Encoder(frozen_bn=frozen_bn, name='encoder')
    if name == 'mobilenetv3':
        return MobileNetV3Encoder(frozen_bn=frozen_bn, name='encoder')
    if name == 'resnet50':
        return ResNetEncoder(layers=(3, 4, 6), frozen_bn=frozen_bn,
                             name='encoder')
    if 'resnet50_topdown' in name:
        # use_mask=True switches the prompt-similarity modulation to GT-mask
        # conditioning (reference encoders/__init__.py:10 forwards
        # use_mask=cfg.USE_MASK into ResNet_TopDown).
        from rmem_ocu_tpu.models.encoders.resnet_topdown import (
            ResNetTopDownEncoder)
        return ResNetTopDownEncoder(layers=(3, 4, 6), frozen_bn=frozen_bn,
                                    use_mask=use_mask, name='encoder')
    if name == 'resnet101':
        return ResNetEncoder(layers=(3, 4, 23), frozen_bn=frozen_bn,
                             name='encoder')
    if name == 'swin_base':
        from rmem_ocu_tpu.models.encoders.swin import SwinEncoder
        return SwinEncoder(name='encoder')
    if name.startswith('resnest'):
        from rmem_ocu_tpu.models.encoders.resnest import ResNeStEncoder
        return ResNeStEncoder(
            layers=(3, 4, 23) if '101' in name else (3, 4, 6),
            frozen_bn=frozen_bn, name='encoder')
    raise NotImplementedError(f'unknown encoder {name}')
