"""Typed configuration system.

Mirrors the reference's three-level composition (default engine config ->
stage override -> model config; aot_plus/configs/default.py:5-9,
aot_plus/tools/get_config.py:4-6) as frozen dataclasses composed by plain
functions instead of dynamic imports and attribute mutation.

All hyper-parameter values are taken from the reference's config tree so a
user of the reference finds the same knobs with the same defaults.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Model family/size/backbone selection + RMem feature flags.

    Reference: aot_plus/configs/models/default.py:1-27 (AOT defaults),
    default_deaot.py:4-18 (DeAOT defaults), r50_deaotl.py:4-41 (flagship).
    """

    model_name: str = 'aott'
    vos: str = 'aot'                      # 'aot' | 'deaot'
    engine: str = 'aotengine'             # 'aotengine' | 'deaotengine'
    align_corners: bool = True
    encoder: str = 'mobilenetv2'
    # documentation of the multi-scale channel dims (reference
    # MODEL_ENCODER_DIM feeds torch constructors; flax infers input dims,
    # so this is schema/metadata only)
    encoder_dim: Tuple[int, ...] = (24, 32, 96, 1280)  # 4x, 8x, 16x, 16x
    encoder_embedding_dim: int = 256
    decoder_intermediate_lstt: bool = True
    linear_q: bool = True
    # MODEL_NORM_INP is dead in the reference: accepted by the LSTT
    # constructor (transformer.py:152) and never read. Schema-only.
    norm_inp: bool = True
    freeze_bn: bool = True
    freeze_backbone: bool = False
    max_obj_num: int = 10
    ignore_token: bool = True
    self_heads: int = 8
    att_heads: int = 8
    lstt_num: int = 1
    epsilon: float = 1e-5

    train_long_term_mem_gap: int = 9999
    test_long_term_mem_gap: int = 9999

    # --- RMem feature flags (reference: configs/models/r50_deaotl.py:7-28) ---
    former_mem_len: int = 1
    latter_mem_len: int = 8
    use_temporal_pe: bool = False
    temporal_pe_slot_4: bool = True       # 4-slot learnable memory PE vs 2-slot
    freeze_except_temporal_pe: bool = False
    gru_memory: bool = False
    freeze_except_gru: bool = False
    # TIME_ENCODE / TIME_ENCODE_NORM are dead in the reference: the
    # sinusoidal encoding is computed into engine.temporal_encoding
    # (aot_engine.py:293-303, 413-420) but only temporal_pos_emb is ever
    # passed to the transformer (:318, :431), and the Q/K_time_encode MLPs
    # (transformer.py:518-526) are instantiated and never called. Kept as
    # schema-compatible no-ops; intentionally not replicated (see §2.13).
    time_encode: bool = False
    time_encode_norm: bool = False
    no_long_memory: bool = False
    no_memory_gap: bool = False
    reverse_infer: bool = False
    reverse_loss: float = 0.4
    use_mask: bool = False                # topdown-encoder mask conditioning
    oracle: bool = False
    var_loss_weight: Optional[float] = None  # topdown reconstruction loss
    # Reference configs/models/r50_topdown_aotl.py:7 + configs/default.py:121:
    # when set, the engine config forces TRAIN_ENCODER_FREEZE_AT = 4 (freeze
    # the whole backbone below the topdown feedback decoders). Coupling is
    # applied in get_config (the composition layer), so an explicit
    # train_encoder_freeze_at override still wins, like the reference CLI.
    top_down_freeze_encoder: bool = False

    def __post_init__(self):
        # ORACLE implies mask conditioning (reference
        # configs/models/r50_topdown_aotl.py:13: USE_MASK = ORACLE or
        # PREV_PROBE); without it the per-frame GT would be silently
        # dropped by the encoder.
        if self.oracle and not self.use_mask:
            object.__setattr__(self, 'use_mask', True)
        # Only the TopDown encoder consumes a mask (reference
        # networks/models/aot.py:23 forwards USE_MASK into build_encoder;
        # all other encoder forwards take no mask argument and would
        # crash). Fail loudly at config time instead.
        if self.use_mask and 'topdown' not in self.encoder:
            raise ValueError(
                f'use_mask/oracle requires the mask-conditioned topdown '
                f'encoder (got encoder={self.encoder!r}); use model '
                f'r50_topdown_aotl')

    @property
    def id_dim(self) -> int:
        return self.max_obj_num + (2 if self.ignore_token else 1)

    @property
    def mem_bank_capacity(self) -> int:
        """Static ring capacity: budget + the not-yet-restricted newest slot."""
        return self.former_mem_len + self.latter_mem_len + 1


@dataclass(frozen=True)
class ExpConfig:
    """Full experiment config (training + eval + data), composed with a model.

    Reference: aot_plus/configs/default.py:5-151 plus stage overrides.
    """

    model: ModelConfig = field(default_factory=ModelConfig)
    exp_name: str = 'default'
    stage_name: str = 'default'

    # --- data ---
    datasets: Tuple[str, ...] = ('youtubevos',)
    data_workers: int = 8
    data_randomcrop: Tuple[int, int] = (465, 465)
    data_randomflip: float = 0.5
    data_max_crop_steps: int = 10
    data_short_edge_len: int = 480
    data_min_scale_factor: float = 0.7
    data_max_scale_factor: float = 1.3
    data_random_reverse_seq: bool = True
    data_seq_len: int = 5
    data_davis_repeat: int = 5
    data_vost_repeat: int = 1
    data_vost_ignore_thresh: float = 0.2
    # DATA_VOST_ALL_FRAMES / DATA_VOST_VALID_FRAMES are dead in the
    # reference (defined in configs/default.py:30-31, consumed nowhere;
    # VOST_Train computes valid_root and never uses it). Schema-only —
    # the all-frames EVAL split is the separate youtubevos mechanism.
    data_vost_all_frames: bool = False
    data_vost_valid_frames: bool = False
    data_random_gap_davis: int = 12
    data_random_gap_ytb: int = 3
    data_random_gap_vost: int = 3
    data_random_gap_visor: int = 1
    data_dynamic_merge_prob: float = 0.2
    ignore_in_merge: bool = True
    # prev-frame episode layout: ref sampled anywhere + randomly-placed
    # prev + curr frames walking from prev (reference ENABLE_PREV_FRAME,
    # train_datasets.py:264, 460-492; default-off in every recipe)
    enable_prev_frame: bool = False
    data_visor_repeat: int = 1
    data_visor_ignore_thresh: float = 0.2

    # --- pretrain ---
    pretrain: bool = True
    pretrain_full: bool = False
    pretrain_model: str = ''

    # --- training ---
    train_total_steps: int = 100_000
    train_start_step: int = 0
    train_tblog: bool = False             # TensorBoard scalars + image logs
    train_img_log_step: int = 200
    train_weight_decay: float = 0.07
    train_weight_decay_exemption: Tuple[str, ...] = (
        'absolute_pos_embed', 'relative_position_bias_table',
        'relative_emb_v', 'conv_out')
    train_lr: float = 2e-4
    train_lr_min: float = 1e-5
    train_lr_power: float = 0.9
    train_lr_encoder_ratio: float = 0.1
    train_lr_warm_up_ratio: float = 0.05
    train_lr_cosine_decay: bool = False
    # LR-schedule restarts (reference configs/default.py:93 TRAIN_LR_RESTART,
    # consumed at trainer.py:483 / utils/learning.py:16-19): split the run
    # into N identical warmup+decay cycles (warmup steps shrink by 1/N).
    train_lr_restart: int = 1
    train_aux_loss_weight: float = 1.0
    train_aux_loss_ratio: float = 1.0
    train_opt: str = 'adamw'
    train_sgd_momentum: float = 0.9
    train_batch_size: int = 16
    train_log_step: int = 20
    train_top_k_percent_pixels: float = 0.15
    train_seq_training_freeze_params: Tuple[str, ...] = ('patch_wise_id_bank',)
    train_seq_training_start_ratio: float = 0.5
    train_hard_mining_ratio: float = 0.5
    train_ema_ratio: float = 0.1
    train_clip_grad_norm: float = 5.0
    train_save_step: int = 500
    train_max_keep_ckpt: int = 8
    # the reference sets TRAIN_RESUME internally from auto-resume
    # discovery (trainer.py:198-204); here resumption is driven by
    # train_auto_resume + the checkpoint directory contents
    train_resume: bool = False
    train_auto_resume: bool = True
    train_encoder_freeze_at: int = 2
    train_lstt_emb_dropout: float = 0.0
    train_lstt_id_dropout: float = 0.0
    train_lstt_droppath: float = 0.1
    train_lstt_droppath_scaling: bool = False
    train_lstt_droppath_lst: bool = False
    train_lstt_lt_dropout: float = 0.0
    train_lstt_st_dropout: float = 0.0
    train_long_term_mem_gap: int = 9999
    train_short_term_mem_skip: int = 1
    # rematerialization policy for the per-frame episode scan step
    # (TPU-native knob, no reference equivalent): 'full' recomputes the
    # whole step in backward (min HBM), 'dots' saves matmul outputs with
    # no batch dims (jax.checkpoint_policies.dots_with_no_batch_dims_
    # saveable — more HBM, fewer recomputed FLOPs), 'dots_k<N>' saves only
    # dot outputs with contraction size K >= N (K = flops/byte, so the
    # highest-value saves first; 'dots' OOMs at recipe scale, 'dots_k1024'
    # fits), 'none' disables remat.
    train_remat_policy: str = 'full'
    # chunk the offline encoder pass through a lax.scan over groups of
    # `train_encoder_chunk` frames (0 = one monolithic batch). The
    # monolithic rematted encode recomputes ALL B*T frames' conv
    # activations at once in backward — at the reference recipe shape
    # (8x15 @ 465²) that alone pushes HBM to ~98% and forces XLA into a
    # pathological spill schedule. Chunking bounds the recompute working
    # set to one chunk; numerically identical for frozen-BN encoders.
    train_encoder_chunk: int = 0
    # mixed-precision training — the reference's --amp (autocast +
    # GradScaler, trainer.py:170-176). TPU-native version: forward/backward
    # compute in bfloat16 (params cast inside the loss fn, so gradients and
    # the optimizer chain stay float32); losses reduce in float32; no loss
    # scaling needed for bf16's fp32-sized exponent.
    train_amp: bool = False
    # lax.scan unroll factor for the per-frame episode loop (TPU-native
    # knob): >1 inlines that many scan bodies per while-iteration. Used by
    # bench.py's FLOPs accounting (XLA cost analysis counts a while body
    # once regardless of trip count, so the true episode FLOPs are
    # recovered from the unroll=1 vs unroll=2 lowering difference); can
    # also trade compile time for less loop overhead on real runs.
    train_scan_unroll: int = 1

    # --- eval ---
    test_dataset: str = 'youtubevos'
    test_dataset_split: str = 'val'
    test_ckpt_path: Optional[str] = None
    test_ckpt_step: Optional[int] = None
    test_ema: bool = True                 # reference cfg.TEST_EMA
    # multi-group logit merge: 'soft' (bg = prod of bg probs,
    # aot_engine.py:650-673) or 'min' (bg = min logit, :630-648)
    test_aggregation: str = 'soft'
    test_flip: bool = False
    test_multiscale: Tuple[float, ...] = (1.0,)
    # DAVIS Full-Resolution vs 480p image root (reference
    # configs/default.py TEST_DATASET_FULL_RESOLUTION, consumed at
    # evaluator.py:171-197)
    test_dataset_full_resolution: bool = False
    test_min_size: Optional[int] = None
    test_max_size: float = 800 * 1.3
    # reference DataLoader worker count; eval here is synchronous with
    # prefetch handled by the engine pipeline, so schema-only
    test_workers: int = 4
    test_long_term_mem_gap: int = 9999
    test_short_term_mem_skip: int = 1
    # pin the eval write gap to test_long_term_mem_gap instead of the
    # per-sequence adaptive max(round(frames/30), 5). The reference always
    # uses the adaptive value (evaluator.py:331-335, 356 overwrites the
    # engine's TEST_LONG_TERM_MEM_GAP), so False is reference behavior;
    # --gap in tools/eval.py sets this for explicit control
    test_fixed_mem_gap: bool = False

    # --- dirs ---
    dir_data: str = './datasets'
    dir_root: str = './results'

    # --- precision / sharding (TPU-native; no reference equivalent) ---
    compute_dtype: str = 'float32'        # 'float32' | 'bfloat16'
    mesh_shape: Tuple[int, ...] = (1,)    # data-parallel mesh (ICI)
    mesh_axes: Tuple[str, ...] = ('data',)
    # Megatron-style sequence/spatial parallelism: additionally shard the
    # episode's image H axis over the mesh's `model` axis, so the
    # conv-heavy encode/decode runs spatially partitioned (GSPMD inserts
    # the halo exchanges) while the LSTT keeps its tensor-parallel specs.
    # No-op on a mesh without a model axis.
    train_spatial_sharding: bool = False
    # ZeRO stage 1 (TPU-native, no reference equivalent — DDP replicates
    # optimizer state per rank): shard the Adam/SGD moment trees over the
    # `data` axis; GSPMD all-gathers the parameter updates. Cuts optimizer
    # HBM per device to 1/dp. No-op on a 1-device data axis.
    train_zero1: bool = False

    def dir_result(self) -> str:
        import os
        return os.path.join(self.dir_root,
                            f'{self.exp_name}_{self.model.model_name}',
                            self.stage_name)


def _aot_defaults(**kw) -> ModelConfig:
    return ModelConfig(**kw)


def _deaot_defaults(**kw) -> ModelConfig:
    """Reference: configs/models/default_deaot.py:4-18."""
    base = dict(vos='deaot', engine='deaotengine',
                decoder_intermediate_lstt=False, self_heads=1, att_heads=1)
    base.update(kw)
    return ModelConfig(**base)


_R50 = dict(encoder='resnet50', encoder_dim=(256, 512, 1024, 1024),
            lstt_num=3, train_long_term_mem_gap=2, test_long_term_mem_gap=5)
_RMEM = dict(former_mem_len=1, latter_mem_len=8, use_temporal_pe=True,
             temporal_pe_slot_4=True)

MODEL_REGISTRY: Dict[str, ModelConfig] = {
    # AOT family (reference: configs/models/aott.py, aots.py, aotb.py, aotl.py)
    'aott': _aot_defaults(model_name='aott'),
    'aots': _aot_defaults(model_name='aots', lstt_num=2),
    'aotb': _aot_defaults(model_name='aotb', lstt_num=3),
    'aotl': _aot_defaults(model_name='aotl', lstt_num=3,
                          train_long_term_mem_gap=2, test_long_term_mem_gap=5),
    # ResNet/ResNeSt/Swin AOT-L (r50_aotl.py, r101_aotl.py, rs101_aotl.py,
    # swinb_aotl.py). r50_aotl carries the RMem flags in the reference fork.
    'r50_aotl': _aot_defaults(model_name='r50_aotl', **_R50, **_RMEM),
    'r101_aotl': _aot_defaults(model_name='r101_aotl', **{
        **_R50, 'encoder': 'resnet101'}),
    'rs101_aotl': _aot_defaults(model_name='rs101_aotl', **{
        **_R50, 'encoder': 'resnest101'}),
    'swinb_aotl': _aot_defaults(model_name='swinb_aotl', encoder='swin_base',
                                encoder_dim=(128, 256, 512, 512),
                                align_corners=False, lstt_num=3,
                                train_long_term_mem_gap=2,
                                test_long_term_mem_gap=5),
    'r50_topdown_aotl': _aot_defaults(model_name='r50_topdown_aotl', **{
        **_R50, 'encoder': 'resnet50_topdown'}, var_loss_weight=0.01),
    # DeAOT family (default_deaot.py, r50_deaotl.py)
    'deaott': _deaot_defaults(model_name='deaott'),
    'deaots': _deaot_defaults(model_name='deaots', lstt_num=2),
    'deaotb': _deaot_defaults(model_name='deaotb', lstt_num=3),
    'deaotl': _deaot_defaults(model_name='deaotl', lstt_num=3,
                              train_long_term_mem_gap=2,
                              test_long_term_mem_gap=5),
    'r50_deaotl': _deaot_defaults(model_name='r50_deaotl', **_R50, **_RMEM),
    'swinb_deaotl': _deaot_defaults(model_name='swinb_deaotl',
                                    encoder='swin_base',
                                    encoder_dim=(128, 256, 512, 512),
                                    align_corners=False, lstt_num=3,
                                    train_long_term_mem_gap=2,
                                    test_long_term_mem_gap=5, **_RMEM),
}


def _couple_no_memory_gap(base: ModelConfig, overrides: dict) -> dict:
    """NO_MEMORY_GAP couples two derived settings in the reference's model
    config file (configs/models/r50_deaotl.py:23,27): MODEL_ATT_HEADS
    becomes 2 and REVERSE_LOSS is quartered. Applied here in the
    composition layer (where the reference's config file does it) so an
    explicitly passed att_heads/reverse_loss is never clobbered."""
    if overrides.get('no_memory_gap') and not base.no_memory_gap:
        overrides.setdefault('att_heads', 2)
        overrides.setdefault('reverse_loss', 0.1)
    return overrides


def get_model_config(name: str, **overrides) -> ModelConfig:
    cfg = MODEL_REGISTRY[name.lower()]
    overrides = _couple_no_memory_gap(cfg, overrides)
    return replace(cfg, **overrides) if overrides else cfg


def _stage_default(model: ModelConfig, exp_name: str) -> ExpConfig:
    return ExpConfig(
        model=model, exp_name=exp_name,
        data_randomcrop=(465, 465) if model.align_corners else (464, 464),
        train_lr_min=2e-5 if 'mobilenetv2' in model.encoder else 1e-5,
        train_long_term_mem_gap=model.train_long_term_mem_gap,
        test_long_term_mem_gap=model.test_long_term_mem_gap,
    )


def _stage_pre(model, exp):
    # Reference: configs/pre.py
    return replace(_stage_default(model, exp), stage_name='pre',
                   datasets=('static',), data_dynamic_merge_prob=1.0,
                   train_lr=4e-4, train_lr_min=2e-5, train_weight_decay=0.03,
                   train_seq_training_start_ratio=1.0, train_aux_loss_ratio=0.1,
                   model=replace(model, linear_q=True))


def _stage_pre_vost(model, exp, stage_name='pre_vost', seq_len=15):
    # Reference: configs/pre_vost.py, pre_vost_2.py (seq 17), pre_vost_25q.py
    model = replace(model, linear_q=False, ignore_token=True)
    gap = 1 if model.no_memory_gap else 4
    return replace(_stage_default(model, exp), stage_name=stage_name,
                   datasets=('vost',), train_total_steps=20_000,
                   data_seq_len=seq_len, train_long_term_mem_gap=gap,
                   train_auto_resume=False, pretrain_full=True)


def _stage_pre_ytb(model, exp):
    return replace(_stage_default(model, exp), stage_name='pre_ytb',
                   data_seq_len=10, train_long_term_mem_gap=4,
                   train_total_steps=80_000, pretrain_full=True,
                   model=replace(model, linear_q=True))


def _stage_pre_dav(model, exp):
    return replace(_stage_default(model, exp), stage_name='pre_dav',
                   datasets=('davis2017',), train_total_steps=50_000,
                   pretrain_full=True)


def _stage_pre_ytb_dav(model, exp):
    return replace(_stage_default(model, exp), stage_name='pre_ytb_dav',
                   datasets=('youtubevos', 'davis2017'), pretrain_full=True)


def _stage_ytb(model, exp):
    return replace(_stage_default(model, exp), stage_name='ytb')


STAGE_REGISTRY = {
    'default': lambda m, e: _stage_default(m, e),
    'pre': _stage_pre,
    'pre_vost': lambda m, e: _stage_pre_vost(m, e, 'pre_vost', 15),
    'pre_vost_2': lambda m, e: _stage_pre_vost(m, e, 'pre_vost_2', 17),
    'pre_vost_25q': lambda m, e: _stage_pre_vost(m, e, 'pre_vost_25q', 25),
    'pre_ytb': _stage_pre_ytb,
    'pre_dav': _stage_pre_dav,
    'pre_ytb_dav': _stage_pre_ytb_dav,
    'ytb': _stage_ytb,
}


def config_to_dict(exp: ExpConfig) -> dict:
    """JSON-serializable snapshot (reference cfg.save_self(),
    configs/default.py:186-196, writes a reloadable config)."""
    return dataclasses.asdict(exp)


def config_from_dict(d: dict) -> ExpConfig:
    """Rebuild an ExpConfig from config_to_dict output (the reference's
    eval.py:97-102 reload of the saved snapshot)."""
    def untuple(v):
        return tuple(v) if isinstance(v, list) else v

    d = dict(d)
    model = ModelConfig(**{k: untuple(v) for k, v in d.pop('model').items()})
    return ExpConfig(model=model,
                     **{k: untuple(v) for k, v in d.items()})


def get_config(stage: str, exp_name: str = 'default',
               model: str = 'aott', **overrides) -> ExpConfig:
    """Compose stage + model the way tools/get_config.py:4-6 does by import."""
    model_cfg = get_model_config(model)
    cfg = STAGE_REGISTRY[stage](model_cfg, exp_name)
    exp_overrides = {}
    if overrides:
        model_overrides = {k: v for k, v in overrides.items()
                           if k in {f.name for f in
                                    dataclasses.fields(ModelConfig)}}
        exp_overrides = {k: v for k, v in overrides.items()
                         if k not in model_overrides}
        if model_overrides:
            model_overrides = _couple_no_memory_gap(cfg.model,
                                                    model_overrides)
            cfg = replace(cfg, model=replace(cfg.model, **model_overrides))
    if cfg.model.top_down_freeze_encoder:
        # reference configs/default.py:121; an explicit CLI/exp
        # train_encoder_freeze_at override below still wins
        cfg = replace(cfg, train_encoder_freeze_at=4)
    if exp_overrides:
        cfg = replace(cfg, **exp_overrides)
    return cfg
