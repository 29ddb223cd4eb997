"""One-way PyTorch -> JAX weight conversion.

Maps a reference checkpoint state_dict (aot_plus networks) onto this
package's flax parameter pytree. Needed for (a) loading the published
pretrained checkpoints and (b) per-layer parity tests against the reference
math (SURVEY.md §7 "checkpoint conversion").

Layout transforms:
- torch Linear weight [O, I]        -> flax Dense kernel [I, O]
- torch Conv2d weight [O, I/g, kh, kw] -> flax Conv kernel [kh, kw, I/g, O]
- torch LayerNorm/GroupNorm weight  -> flax scale
- FrozenBatchNorm buffers keep their names
- grouped relative_emb_k conv [H*ws*ws, d_att, 1, 1] ->
  (w [H, d_att, ws*ws], b [H, ws*ws])
"""
from __future__ import annotations

import functools
import re
from typing import Dict

import jax
import numpy as np


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)


@functools.lru_cache(maxsize=1)
def _mnv3_no_expand():
    """Block indices whose InvertedResidual has inp == hidden (the
    reference then omits the pw expansion, mobilenetv3.py:92-110), which
    shifts the .conv Sequential sub-indices."""
    from rmem_ocu_tpu.models.encoders.mobilenetv3 import (_CFGS,
                                                          _make_divisible)
    out = set()
    inp = _make_divisible(16)
    for i, (k, t, c, use_se, use_hs, s) in enumerate(_CFGS):
        hidden = _make_divisible(inp * t)
        if hidden == inp:
            out.add(i)
        inp = _make_divisible(c)
    return out


# repo MBV3Block submodule -> index in the reference's .conv Sequential
# (mobilenetv3.py:92-133): with expansion [pw, bn, act, dw, bn, SE, act,
# pw-linear, bn]; without [dw, bn, act, SE, pw-linear, bn]
_MNV3_SUB = {
    True: {'pw': 'conv.0', 'pw_bn': 'conv.1', 'dw': 'conv.3',
           'dw_bn': 'conv.4', 'se': 'conv.5', 'pw_linear': 'conv.7',
           'pw_linear_bn': 'conv.8'},
    False: {'dw': 'conv.0', 'dw_bn': 'conv.1', 'se': 'conv.3',
            'pw_linear': 'conv.4', 'pw_linear_bn': 'conv.5'},
}


def _flax_key_to_torch(path: tuple, cfg) -> str:
    """Translate a flax param path (tuple of name components) into the
    reference torch state_dict key prefix (module path, no leaf)."""
    parts = list(path)
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r'feat_(\d+)', p)
        if m:
            # MobileNetV2 (reference encoders/mobilenetv2.py:173-206):
            # features.N is either a top-level ConvBNReLU (stem/last) or an
            # InvertedResidual whose .conv Sequential interleaves
            # ConvBNReLU / Conv2d / BatchNorm.
            n = m.group(1)
            rest = parts[i + 1:]
            if rest and rest[0] in ('conv', 'bn'):        # top ConvBNReLU
                out.append(f'features.{n}.' + ('0' if rest[0] == 'conv'
                                               else '1'))
                i += 2
                continue
            if rest and (mm := re.fullmatch(r'conv_(\d+)', rest[0])):
                j = mm.group(1)
                if len(rest) > 1 and rest[1] in ('conv', 'bn'):
                    # nested ConvBNReLU
                    out.append(f'features.{n}.conv.{j}.' +
                               ('0' if rest[1] == 'conv' else '1'))
                    i += 3
                    continue
                out.append(f'features.{n}.conv.{j}')      # plain pw-linear
                i += 2
                continue
            if rest and (mm := re.fullmatch(r'bn_(\d+)', rest[0])):
                out.append(f'features.{n}.conv.{int(mm.group(1)) + 1}')
                i += 2
                continue
            out.append(f'features.{n}')
            i += 1
            continue
        m = re.fullmatch(r'block_(\d+)', p)
        if m and i + 1 < len(parts) and parts[i + 1] in (
                'pw', 'pw_bn', 'dw', 'dw_bn', 'se', 'pw_linear',
                'pw_linear_bn'):
            # MobileNetV3: features.{i+1}.conv.{j} with j depending on
            # whether the block expands (mobilenetv3.py:92-133)
            bi = int(m.group(1))
            sub = parts[i + 1]
            out.append(f'features.{bi + 1}.'
                       f'{_MNV3_SUB[bi not in _mnv3_no_expand()][sub]}')
            i += 2
            if sub == 'se' and i < len(parts):
                # SELayer.fc = Sequential(Linear, ReLU, Linear, h_sigmoid)
                out.append('fc.0' if parts[i] == 'fc1' else 'fc.2')
                i += 1
            continue
        if m:
            out.append(f'layers.{m.group(1)}')
        # --- Swin (reference encoders/swin/swin_transformer.py) ---
        elif p == 'patch_embed':
            out.append('patch_embed.proj')
        elif p == 'patch_norm':
            out.append('patch_embed.norm')
        elif (m := re.fullmatch(r'stage(\d+)_block(\d+)', p)):
            out.append(f'layers.{m.group(1)}.blocks.{m.group(2)}')
        elif (m := re.fullmatch(r'mlp_fc(\d)', p)):
            out.append(f'mlp.fc{m.group(1)}')
        elif (m := re.fullmatch(r'downsample(\d+)', p)):
            out.append(f'layers.{m.group(1)}.downsample')
        elif (m := re.fullmatch(r'out_norm(\d+)', p)):
            out.append(f'norm{m.group(1)}')
        # --- ResNeSt deep stem (reference encoders/resnest/resnet.py) ---
        elif (m := re.fullmatch(r'stem_conv(\d)', p)):
            out.append(f'conv1.{(int(m.group(1)) - 1) * 3}')
        elif (m := re.fullmatch(r'stem_bn(\d)', p)):
            n = int(m.group(1))
            out.append('bn1' if n == 3 else f'conv1.{(n - 1) * 3 + 1}')
        elif (m := re.fullmatch(r'decoder_norm_(\d+)', p)):
            out.append(f'decoder_norms.{m.group(1)}')
            # GPM decoder norms are GroupNorm1D wrappers with an inner .gn
            # (reference transformer.py:755-758 via _get_norm type='gn')
            if cfg.vos == 'deaot':
                out.append('gn')
        elif p == 'stem':
            out.append('features.0.0')       # mnv3 stem conv_3x3_bn
        elif p == 'stem_bn':
            out.append('features.0.1')
        elif p == 'last_conv':
            out.append('conv.0')             # mnv3 trailing conv_1x1_bn
        elif p == 'last_bn':
            out.append('conv.1')
        # --- ResNet TopDown feedback decoders (resnet.py:270-284) ---
        elif p == 'dec0_up':
            out.append('decoders.0.0')
        elif p == 'dec0':
            out.append('decoders.0.1')
        elif (m := re.fullmatch(r'dec(\d)', p)):
            out.append(f'decoders.{m.group(1)}')
        elif (m := re.fullmatch(r'layer(\d)_(\d+)', p)):
            out.append(f'layer{m.group(1)}.{m.group(2)}')
        elif p == 'downsample_conv':
            # ResNeSt avg-down prepends an AvgPool (resnest/resnet.py:330-352)
            out.append('downsample.1' if 'resnest' in cfg.encoder
                       else 'downsample.0')
        elif p == 'downsample_bn':
            out.append('downsample.2' if 'resnest' in cfg.encoder
                       else 'downsample.1')
        elif p == 'lstt':
            out.append('LSTT')
        elif p == 'memory_gru_k':
            # per-layer ConvGRU compressors: ModuleList [K-gru, V-gru]
            # (reference transformer.py:529-545)
            out.append('memory_grus.0')
        elif p == 'memory_gru_v':
            out.append('memory_grus.1')
        elif p == 'gn' and i > 0 and parts[i - 1].startswith('norm'):
            out.append('gn')  # GroupNorm1D inner
        else:
            out.append(p)
        i += 1
    return '.'.join(out)


def _convert_leaf(flax_path: tuple, flax_val, sd: Dict, torch_prefix: str):
    """Return the converted numpy array for one flax leaf."""
    leaf = flax_path[-1]
    shape = flax_val.shape

    if leaf == 'kernel':
        w = _t2n(sd[f'{torch_prefix}.weight'])
        if w.ndim == 4:      # conv
            w = w.transpose(2, 3, 1, 0)
        elif w.ndim == 2:    # linear (or 1x1 conv stored 4D handled above)
            w = w.T
        return w.reshape(shape)
    if leaf == 'scale':
        return _t2n(sd[f'{torch_prefix}.weight']).reshape(shape)
    if leaf in ('bias', 'weight', 'running_mean', 'running_var',
                'relative_position_bias_table'):
        return _t2n(sd[f'{torch_prefix}.{leaf}']).reshape(shape)
    raise KeyError(f'unhandled leaf {flax_path}')


def convert_torch_params(state_dict: Dict, flax_params, cfg,
                         torch_root: str = '', strict: bool = True):
    """Fill `flax_params` (the {'params': ...} pytree) from a torch
    state_dict. `torch_root` prefixes every torch key (e.g. 'AOT.' when the
    checkpoint stores an engine). Returns a new pytree.
    """
    sd = {k[len('module.'):] if k.startswith('module.') else k: v
          for k, v in state_dict.items()}
    if torch_root:
        sd = {k[len(torch_root):]: v for k, v in sd.items()
              if k.startswith(torch_root)}

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out = {}
    missing = []
    for keypath, val in flat:
        path = tuple(getattr(k, 'key', getattr(k, 'idx', None))
                     for k in keypath)
        # pass through non-param collections (e.g. the TopDown encoder's
        # init-time 'losses' sow) untouched
        if path and path[0] in ('losses', 'intermediates', 'cache'):
            out[path] = np.asarray(val)
            continue
        # drop the top-level collection name: 'params', and 'batch_stats'
        # for trainable-BN running stats (same torch key, running_mean/
        # running_var leaves, just a different flax collection)
        parts = tuple(p for p in path if p not in ('params', 'batch_stats'))
        leaf = parts[-1]
        prefix_parts = parts[:-1]

        try:
            if leaf in ('relative_emb_k_w', 'relative_emb_k_b'):
                tp = _flax_key_to_torch(prefix_parts, cfg)
                tp = f'{tp}.relative_emb_k' if tp else 'relative_emb_k'
                if leaf.endswith('_w'):
                    w = _t2n(sd[f'{tp}.weight'])
                    heads, d_att = val.shape[0], val.shape[1]
                    ws2 = val.shape[2]
                    w = w.reshape(heads, ws2, d_att, 1, 1)[..., 0, 0]
                    arr = w.transpose(0, 2, 1)
                else:
                    b = _t2n(sd[f'{tp}.bias'])
                    arr = b.reshape(val.shape)
            elif leaf in ('cur_pos_emb', 'mem_pos_emb', 'prompt',
                          'top_down_transform'):
                tp = _flax_key_to_torch(prefix_parts, cfg)
                key = f'{tp}.{leaf}' if tp else leaf
                arr = _t2n(sd[key]).reshape(val.shape)
            else:
                tp = _flax_key_to_torch(prefix_parts, cfg)
                arr = _convert_leaf(parts, val, sd, tp)
        except KeyError as e:
            missing.append((parts, str(e)))
            arr = np.asarray(val)
        out[path] = arr.astype(np.asarray(val).dtype)

    if missing and strict:
        raise KeyError(f'{len(missing)} unmapped params, e.g. {missing[:5]}')

    leaves = [out[tuple(getattr(k, 'key', getattr(k, 'idx', None))
                        for k in kp)] for kp, _ in flat]
    treedef = jax.tree_util.tree_structure(flax_params)
    return jax.tree_util.tree_unflatten(treedef, leaves), missing
