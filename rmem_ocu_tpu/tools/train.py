"""Training CLI.

Reference: aot_plus/tools/train.py (argparse + mp.spawn + Trainer). One
process drives all local TPU chips through a data mesh; multi-host runs use
jax.distributed (one process per host) with the same code path.

Example:
    python -m rmem_ocu_tpu.tools.train --stage pre_vost --model r50_deaotl \
        --exp_name rmem --batch_size 8
"""
from __future__ import annotations

import argparse
import json
import os
import time
from dataclasses import replace


def parse_args():
    p = argparse.ArgumentParser(description='Train VOS (TPU-native)')
    p.add_argument('--exp_name', type=str, default='default')
    p.add_argument('--stage', type=str, default='pre_vost')
    p.add_argument('--model', type=str, default='r50_deaotl')
    p.add_argument('--batch_size', type=int, default=None)
    p.add_argument('--total_steps', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--datasets', nargs='+', default=None)
    p.add_argument('--data_root', type=str, default=None)
    p.add_argument('--pretrained_path', type=str, default=None)
    p.add_argument('--log_step', type=int, default=None)
    p.add_argument('--save_step', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--crop_size', type=int, default=None)
    p.add_argument('--seq_len', type=int, default=None,
                   help='training episode length (reference --seq_len / '
                        'DATA_SEQ_LEN; the notebook fine-tune recipe uses '
                        '5)')
    p.add_argument('--mem_gap', type=int, default=None,
                   help='train long-term memory write gap (reference '
                        'TRAIN_LONG_TERM_MEM_GAP)')
    p.add_argument('--freeze_at', type=int, default=None,
                   help='encoder stage freezing (reference FREEZE_AT / '
                        'encoders freeze(freeze_at)); 0 trains the whole '
                        'encoder — required when training from scratch, '
                        'where freezing would pin a random stem')
    p.add_argument('--no_freeze_bn', action='store_true',
                   help='train encoder BatchNorm statistics (reference '
                        'MODEL_FREEZE_BN=False); the default frozen BN '
                        'assumes an ImageNet-pretrained encoder and is an '
                        'identity affine at random init')
    p.add_argument('--fix_random', action='store_true',
                   help='deterministic per-rank seeding of python/numpy/JAX '
                        '(reference tools/train.py:20-37: seed = 1 << rank); '
                        'overrides --seed')
    p.add_argument('--tblog', action='store_true',
                   help='TensorBoard scalar + pred/GT image logging '
                        '(reference trainer.py:687-804)')
    p.add_argument('--mesh', type=str, default=None,
                   help="device mesh as DATAxMODEL, e.g. '4x2' = 4-way "
                        'data x 2-way tensor parallel over the LSTT '
                        '(parallel/tp.py); default: all devices on one '
                        'data axis')
    p.add_argument('--zero1', action='store_true',
                   help='ZeRO stage 1: shard the optimizer moment trees '
                        'over the data axis (GSPMD all-gathers the '
                        'updates); cuts optimizer HBM per device to 1/dp')
    p.add_argument('--multihost', action='store_true',
                   help='initialize jax.distributed (one process per host; '
                        'replaces the reference mp.spawn + gloo DDP, '
                        'trainer.py:94-113)')
    p.add_argument('--amp', action='store_true',
                   help='mixed-precision training: bf16 forward/backward, '
                        'fp32 params/optimizer (reference --amp autocast + '
                        'GradScaler, trainer.py:170-176; no loss scaling '
                        'needed for bf16)')
    p.add_argument('--enc_chunk', type=int, default=0,
                   help='chunk the offline encoder pass through lax.scan '
                        '(frames per chunk; 0 = one monolithic batch). '
                        'Bounds the encoder-backward working set at '
                        'recipe-scale shapes; numerically identical for '
                        'frozen-BN encoders')
    p.add_argument('--remat', type=str, default=None,
                   choices=['full', 'dots', 'none'],
                   help='episode rematerialization policy: full = '
                        'recompute each scan step in backward (lowest '
                        'HBM), dots = keep matmul outputs '
                        '(dots_with_no_batch_dims_saveable; faster when '
                        'HBM allows), none = save everything')
    return p.parse_args()


def _tb_log_images(tb, step: int, batch, metrics):
    """Pred/GT overlay image logs for the episode's final frame
    (reference trainer.py:712-761)."""
    import numpy as np
    from rmem_ocu_tpu.data.eval_datasets import IMAGENET_MEAN, IMAGENET_STD
    from rmem_ocu_tpu.ops.masks import label2colormap

    img = np.asarray(batch['frames'][0, -1])
    img = np.clip((img * IMAGENET_STD + IMAGENET_MEAN) * 255, 0,
                  255).astype(np.uint8)
    gt = np.asarray(batch['masks'][0, -1]).astype(np.uint8)
    pred = np.asarray(metrics['pred_mask'][0]).astype(np.uint8)
    if pred.shape != gt.shape:           # pred is at 4x decoder resolution
        from PIL import Image
        pred = np.asarray(Image.fromarray(pred).resize(
            (gt.shape[1], gt.shape[0]), Image.NEAREST))

    def overlay(mask):
        cm = label2colormap(mask)
        return (0.5 * img + 0.5 * cm).astype(np.uint8)

    tb.add_image('train/image', img, step, dataformats='HWC')
    tb.add_image('train/gt_overlay', overlay(gt), step, dataformats='HWC')
    tb.add_image('train/pred_overlay', overlay(pred), step,
                 dataformats='HWC')


def main():
    args = parse_args()
    from rmem_ocu_tpu.utils.run_utils import enable_compile_cache
    enable_compile_cache()
    import jax
    if args.multihost:
        jax.distributed.initialize()
    if args.fix_random:
        # determinism harness (reference tools/train.py:20-37 seeds
        # python/numpy/torch per rank at consecutive offsets of
        # 1 << gpu). Only the host-global python/numpy states take the
        # per-rank seed here; args.seed (the JAX init key and the loader
        # permutation seed) MUST be host-invariant: globalize_state marks
        # params as replicated across the mesh without any broadcast (the
        # reference relies on DDP's rank-0 param broadcast instead,
        # trainer.py:107-113), and TrainDataLoader's disjoint-shard
        # property needs the identical permutation on every host before
        # the rank::world stride. Per-rank augmentation diversity still
        # happens via the per-sample seeds (seed + epoch*P + global idx).
        import random
        seed = 1 << jax.process_index()
        print(f'[{jax.process_index()}] fix random seed {seed}')
        os.environ['PYTHONHASHSEED'] = str(seed)
        random.seed(seed + 1)
        import numpy as _np
        _np.random.seed(seed + 2)
        args.seed = 4
    import jax.numpy as jnp
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.data.train_datasets import (TrainDataLoader,
                                                  build_train_dataset)
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.train import Trainer
    from rmem_ocu_tpu.utils import checkpoint as ckpt

    exp = get_config(args.stage, args.exp_name, args.model)
    overrides = {}
    if args.batch_size:
        overrides['train_batch_size'] = args.batch_size
    if args.total_steps:
        overrides['train_total_steps'] = args.total_steps
    if args.lr:
        overrides['train_lr'] = args.lr
    if args.datasets:
        overrides['datasets'] = tuple(args.datasets)
    if args.data_root:
        overrides['dir_data'] = args.data_root
    if args.pretrained_path:
        overrides['pretrain_model'] = args.pretrained_path
    if args.log_step:
        overrides['train_log_step'] = args.log_step
    if args.save_step:
        overrides['train_save_step'] = args.save_step
    if args.crop_size:
        overrides['data_randomcrop'] = (args.crop_size, args.crop_size)
    if args.seq_len:
        overrides['data_seq_len'] = args.seq_len
    if args.mem_gap:
        overrides['train_long_term_mem_gap'] = args.mem_gap
    if args.freeze_at is not None:
        overrides['train_encoder_freeze_at'] = args.freeze_at
    if args.no_freeze_bn:
        exp = replace(exp, model=replace(exp.model, freeze_bn=False))
    if args.mesh:
        dims = tuple(int(d) for d in args.mesh.lower().split('x'))
        if len(dims) == 1:
            overrides['mesh_shape'] = dims
            overrides['mesh_axes'] = ('data',)
        elif len(dims) == 2:
            overrides['mesh_shape'] = dims
            overrides['mesh_axes'] = ('data', 'model')
        else:
            raise SystemExit(f'--mesh {args.mesh!r}: want D or DxM')
    if args.tblog:
        overrides['train_tblog'] = True
    if args.amp:
        overrides['train_amp'] = True
    if args.zero1:
        overrides['train_zero1'] = True
    if args.enc_chunk:
        overrides['train_encoder_chunk'] = args.enc_chunk
    if args.remat:
        overrides['train_remat_policy'] = args.remat
    if overrides:
        exp = replace(exp, **overrides)

    result_dir = exp.dir_result()
    ckpt_dir = os.path.join(result_dir, 'ckpt')
    ema_dir = os.path.join(result_dir, 'ema_ckpt')
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(ema_dir, exist_ok=True)

    import jax as _jax
    if _jax.process_index() == 0:
        # stdout tee + source snapshot (reference tools/train.py:40-41,
        # 78-79 via utils/utils.py Tee/copy_codes)
        from rmem_ocu_tpu.utils.run_utils import Tee, copy_codes
        Tee(os.path.join(result_dir, 'print.log'))
        copy_codes(result_dir)
        # reloadable config snapshot (reference cfg.save_self())
        from rmem_ocu_tpu.config import config_to_dict
        with open(os.path.join(result_dir, 'config.json'), 'w') as f:
            json.dump(config_to_dict(exp), f, indent=2)

    model = build_vos_model(exp.model, exp)
    trainer = Trainer(model, exp)
    n_data = dict(zip(trainer.mesh.axis_names,
                      trainer.mesh.devices.shape))['data']
    per_host_batch = exp.train_batch_size
    # P('data') sharding requires exact divisibility; anything else dies
    # later in XLA with an opaque error, so reject it here
    if per_host_batch % n_data != 0:
        raise SystemExit(
            f'--batch_size {per_host_batch} is not divisible by the '
            f'{n_data}-way data axis; pick a multiple of {n_data}')

    dataset = build_train_dataset(exp)
    loader = TrainDataLoader(dataset, per_host_batch, seed=args.seed,
                             rank=jax.process_index(),
                             world=jax.process_count(),
                             num_workers=exp.data_workers)
    data_iter = iter(loader)

    batch0 = next(data_iter)
    state = trainer.init_state(jax.random.PRNGKey(args.seed),
                               jnp.asarray(batch0['frames']),
                               jnp.asarray(batch0['masks']))
    # lift onto the (possibly multi-host) mesh BEFORE restore so the Orbax
    # target carries global shardings (restore is collective too)
    state = trainer.globalize_state(state)

    # pretrained / resume (reference trainer.py:186-284)
    restored, step0 = (ckpt.restore_checkpoint(ckpt_dir, state)
                       if exp.train_auto_resume else (None, None))
    if restored is not None:
        state = restored
        print(f'resumed from step {step0}')
    else:
        # stage chaining composes BOTH: load the previous stage's weights
        # AND offset the schedule (reference trainer.py:189 sets
        # self.step = TRAIN_START_STEP unconditionally, separately from
        # the PRETRAIN_MODEL load at :266-284)
        if exp.pretrain and exp.pretrain_model:
            params = ckpt.load_torch_pretrained(
                exp.pretrain_model, state.params, exp.model,
                full=exp.pretrain_full)
            state = state.replace(params=params,
                                  ema_params=jax.tree.map(jnp.copy, params))
            print(f'loaded pretrained {exp.pretrain_model}')
        if exp.train_start_step > 0:
            state = state.replace(
                step=jnp.asarray(exp.train_start_step, jnp.int32))
            print(f'starting from step {exp.train_start_step}')
        # the pretrain/start-step branches introduce host-local leaves
        state = trainer.globalize_state(state)

    rng = jax.random.PRNGKey(args.seed + 1)
    log_t0 = time.time()
    metrics_path = os.path.join(result_dir, 'metrics.jsonl')
    tb = None
    if exp.train_tblog and jax.process_index() == 0:
        # reference trainer.py:181-184 (tensorboardX SummaryWriter)
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(os.path.join(result_dir, 'tblogs'))
    batch = batch0
    # trainer.host_step mirrors state.step host-side (reading the device
    # scalar every iteration would cost one ~85 ms sync per step); the one
    # mirror lives on the Trainer so the curriculum switch and this loop
    # can never disagree
    step = int(state.step)
    while step < exp.train_total_steps:
        rng, step_rng = jax.random.split(rng)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = trainer.train_step(state, jb, step_rng)
        batch_used, batch = batch, next(data_iter)
        step = trainer.host_step
        if step % exp.train_log_step == 0:
            dt = time.time() - log_t0
            log_t0 = time.time()
            row = {'step': step,
                   'loss': round(float(metrics['loss']), 5),
                   'aux_loss': round(float(metrics['aux_loss']), 5),
                   'pred_loss': round(float(metrics['pred_loss']), 5),
                   'iou': round(float(metrics['iou']) * 100, 2),
                   'lr': float(metrics['lr']),
                   'grad_norm': round(float(metrics['grad_norm']), 3),
                   # per-frame-position meters (reference
                   # trainer.py:577-595, 619-635)
                   'frame_losses': [round(float(v), 4)
                                    for v in metrics['frame_losses']],
                   'frame_ious': [round(float(v) * 100, 2)
                                  for v in metrics['frame_ious']],
                   'it_per_s': round(exp.train_log_step / max(dt, 1e-9), 3)}
            if 'var_loss' in metrics:
                row['var_loss'] = round(float(metrics['var_loss']), 5)
            print(f'step {step}/{exp.train_total_steps} '
                  f'loss {row["loss"]:.4f} iou {row["iou"]:.1f} '
                  f'lr {row["lr"]:.2e} '
                  f'({row["it_per_s"]:.2f} it/s)', flush=True)
            if jax.process_index() == 0:
                with open(metrics_path, 'a') as f:
                    f.write(json.dumps(row) + '\n')
            if tb is not None:
                # scalar logging (reference trainer.py:763-775)
                for k in ('loss', 'aux_loss', 'pred_loss', 'iou', 'lr',
                          'grad_norm'):
                    tb.add_scalar(f'train/{k}', row[k], step)
                for i, v in enumerate(row['frame_ious']):
                    tb.add_scalar(f'train/iou_frame_{i}', v, step)
        if tb is not None and step % exp.train_img_log_step == 0:
            _tb_log_images(tb, step, batch_used, metrics)
        if step % exp.train_save_step == 0:
            # collective save: every process participates (see
            # save_checkpoint docstring); print on rank 0 only
            ckpt.save_checkpoint(ckpt_dir, step, state,
                                 exp.train_max_keep_ckpt)
            # EMA weights in a parallel dir (reference trainer.py:659-676)
            ckpt.save_checkpoint(ema_dir, step, state.ema_params,
                                 exp.train_max_keep_ckpt)
            if jax.process_index() == 0:
                print(f'saved step {step}')


if __name__ == '__main__':
    main()
