"""Encoder factory (reference: aot_plus/networks/encoders/__init__.py:10-37).

All encoders consume NHWC images and return a 4-element multi-scale feature
list [4x, 8x, 16x, 16x] (stage 5 dropped, 16x duplicated — reference
encoders/resnet.py:184-194).
"""
from __future__ import annotations


def build_encoder(name: str, frozen_bn: bool = True, freeze_at: int = 0):
    from rmem_ocu_tpu.models.encoders.resnet import ResNetEncoder
    from rmem_ocu_tpu.models.encoders.mobilenetv2 import MobileNetV2Encoder
    from rmem_ocu_tpu.models.encoders.mobilenetv3 import MobileNetV3Encoder

    if not frozen_bn:
        raise NotImplementedError(
            'trainable BatchNorm encoders are not wired yet; every reference '
            'model config sets MODEL_FREEZE_BN=True '
            '(configs/models/default.py:15)')
    if name == 'mobilenetv2':
        return MobileNetV2Encoder(name='encoder')
    if name == 'mobilenetv3':
        return MobileNetV3Encoder(name='encoder')
    if name == 'resnet50':
        return ResNetEncoder(layers=(3, 4, 6), name='encoder')
    if 'resnet50_topdown' in name:
        from rmem_ocu_tpu.models.encoders.resnet_topdown import (
            ResNetTopDownEncoder)
        return ResNetTopDownEncoder(layers=(3, 4, 6), name='encoder')
    if name == 'resnet101':
        return ResNetEncoder(layers=(3, 4, 23), name='encoder')
    if name == 'swin_base':
        from rmem_ocu_tpu.models.encoders.swin import SwinEncoder
        return SwinEncoder(name='encoder')
    if name.startswith('resnest'):
        from rmem_ocu_tpu.models.encoders.resnest import ResNeStEncoder
        return ResNeStEncoder(
            layers=(3, 4, 23) if '101' in name else (3, 4, 6),
            name='encoder')
    raise NotImplementedError(f'unknown encoder {name}')
