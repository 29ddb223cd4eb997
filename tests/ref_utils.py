"""Helpers to load the reference PyTorch modules for parity testing.

The reference at /root/reference is imported read-only purely as a numerical
oracle; none of its code ships in this package.
"""
import sys
import types

REF = '/root/reference/aot_plus'


def setup_reference_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # shim timm (not installed): the reference only uses trunc_normal_
    if 'timm' not in sys.modules:
        import torch
        timm = types.ModuleType('timm')
        timm_models = types.ModuleType('timm.models')
        timm_layers = types.ModuleType('timm.models.layers')
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules['timm'] = timm
        sys.modules['timm.models'] = timm_models
        sys.modules['timm.models.layers'] = timm_layers
    # shim torchvision (not installed): only ResNet_TopDown's mask-resize
    # uses it (resnet.py:328, bilinear, tensor input -> antialias off)
    if 'torchvision' not in sys.modules:
        import torch
        tv = types.ModuleType('torchvision')
        tv_t = types.ModuleType('torchvision.transforms')
        tv_f = types.ModuleType('torchvision.transforms.functional')
        class _IM:  # noqa: N801
            NEAREST = 0
            BILINEAR = 2
        def _resize(img, size, interpolation=_IM.BILINEAR, **kw):
            mode = 'nearest' if interpolation == _IM.NEAREST else 'bilinear'
            kwargs = {} if mode == 'nearest' else {'align_corners': False}
            return torch.nn.functional.interpolate(
                img, size=list(size), mode=mode, **kwargs)
        tv_f.resize = _resize
        tv_t.functional = tv_f
        tv_t.InterpolationMode = _IM
        tv.transforms = tv_t
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.transforms'] = tv_t
        sys.modules['torchvision.transforms.functional'] = tv_f


def make_torch_cfg(model_cfg, train_cfg=None):
    """Build the attribute-style config object the reference modules read."""
    ns = types.SimpleNamespace()
    m = model_cfg
    ns.MODEL_MAX_OBJ_NUM = m.max_obj_num
    ns.MODEL_EPSILON = m.epsilon
    ns.MODEL_ENCODER = m.encoder
    ns.MODEL_ENCODER_DIM = list(m.encoder_dim)
    ns.MODEL_ENCODER_EMBEDDING_DIM = m.encoder_embedding_dim
    ns.MODEL_DECODER_INTERMEDIATE_LSTT = m.decoder_intermediate_lstt
    ns.MODEL_LINEAR_Q = m.linear_q
    ns.MODEL_NORM_INP = m.norm_inp
    ns.MODEL_FREEZE_BN = m.freeze_bn
    ns.MODEL_IGNORE_TOKEN = m.ignore_token
    ns.MODEL_SELF_HEADS = m.self_heads
    ns.MODEL_ATT_HEADS = m.att_heads
    ns.MODEL_LSTT_NUM = m.lstt_num
    ns.MODEL_ALIGN_CORNERS = m.align_corners
    ns.TRAIN_ENCODER_FREEZE_AT = 2
    ns.TRAIN_LSTT_EMB_DROPOUT = 0.0
    ns.TRAIN_LSTT_ID_DROPOUT = 0.0
    ns.TRAIN_LSTT_DROPPATH = 0.1
    ns.TRAIN_LSTT_DROPPATH_SCALING = False
    ns.TRAIN_LSTT_DROPPATH_LST = False
    ns.TRAIN_LSTT_LT_DROPOUT = 0.0
    ns.TRAIN_LSTT_ST_DROPOUT = 0.0
    ns.USE_MASK = m.use_mask
    ns.ORACLE = m.oracle
    if m.var_loss_weight is not None:
        # reference gates on hasattr (aot_engine.py:116); only topdown
        # configs define it (configs/models/r50_topdown_aotl.py:9)
        ns.VAR_LOSS_WEIGHT = m.var_loss_weight
    ns.USE_TEMPORAL_POSITIONAL_EMBEDDING = m.use_temporal_pe
    ns.TEMPORAL_POSITIONAL_EMBEDDING_SLOT_4 = m.temporal_pe_slot_4
    ns.TIME_ENCODE = m.time_encode
    ns.TIME_ENCODE_NORM = m.time_encode_norm
    ns.GRU_MEMORY = m.gru_memory
    ns.NO_LONG_MEMORY = m.no_long_memory
    ns.NO_MEMORY_GAP = m.no_memory_gap
    ns.REVERSE_INFER = m.reverse_infer
    ns.REVERSE_LOSS = m.reverse_loss
    ns.FORMER_MEM_LEN = m.former_mem_len
    ns.LATTER_MEM_LEN = m.latter_mem_len
    if train_cfg is not None:
        ns.TRAIN_TOP_K_PERCENT_PIXELS = train_cfg.train_top_k_percent_pixels
        ns.TRAIN_HARD_MINING_RATIO = train_cfg.train_hard_mining_ratio
        ns.TRAIN_TOTAL_STEPS = train_cfg.train_total_steps
        ns.TRAIN_AUX_LOSS_WEIGHT = train_cfg.train_aux_loss_weight
        ns.TRAIN_AUX_LOSS_RATIO = train_cfg.train_aux_loss_ratio
        ns.TRAIN_LOG_STEP = train_cfg.train_log_step
    return ns


def randomize_state_dict(module, seed=0, scale=0.1):
    """Fill every param/buffer with reproducible random values (keeps
    running_var positive). A larger `scale` sharpens the attention —
    needed when a test asserts eviction argmins, which tie at fp-noise
    level under near-uniform attention."""
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            new = torch.randn(v.shape, generator=g) * scale
            if 'running_var' in k:
                new = new.abs() + 0.5
            sd[k] = new
    module.load_state_dict(sd)
    return module
