"""Evaluation CLI.

Reference: aot_plus/tools/eval.py (mp.spawn + queue work-stealing). Here one
process per host; sequences are statically sharded by host index.

Example:
    python -m rmem_ocu_tpu.tools.eval --stage pre_vost_2 --model r50_deaotl \
        --dataset vost --data_root ./datasets/VOST --ckpt_path model.pth
"""
from __future__ import annotations

import argparse
import os
from dataclasses import replace


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate VOS (TPU-native)')
    p.add_argument('--exp_name', type=str, default='default')
    p.add_argument('--stage', type=str, default='pre_vost_2')
    p.add_argument('--model', type=str, default='r50_deaotl')
    p.add_argument('--dataset', type=str, default=None,
                   choices=['davis2016', 'davis2017', 'youtubevos', 'vost',
                            'long_videos', 'test'],
                   help='defaults to exp.test_dataset')
    p.add_argument('--split', type=str, default=None,
                   help='defaults to exp.test_dataset_split')
    p.add_argument('--data_root', type=str, default=None)
    p.add_argument('--ckpt_path', type=str, default=None,
                   help='orbax ckpt dir or reference .pth; defaults to the '
                        'experiment result dir (latest step, EMA weights — '
                        'reference evaluator.py:59-110)')
    p.add_argument('--ckpt_step', type=int, default=None,
                   help='explicit step to restore (reference '
                        'TEST_CKPT_STEP); defaults to the latest')
    p.add_argument('--no_ema', action='store_true',
                   help='load raw train params instead of EMA weights '
                        '(reference TEST_EMA=False)')
    p.add_argument('--aggregation', type=str, default=None,
                   choices=['soft', 'min'],
                   help='multi-group logit merge (reference soft/min '
                        'aggregation, aot_engine.py:630-673); defaults to '
                        'exp.test_aggregation')
    p.add_argument('--output', type=str, default=None)
    p.add_argument('--max_size', type=float, default=None,
                   help='defaults to exp.test_max_size')
    p.add_argument('--flip', action='store_true',
                   help='also exp.test_flip enables it')
    p.add_argument('--ms', nargs='+', type=float, default=None,
                   help='defaults to exp.test_multiscale')
    p.add_argument('--former_mem_len', type=int, default=None)
    p.add_argument('--latter_mem_len', type=int, default=None)
    p.add_argument('--vanilla', action='store_true',
                   help='RMem-off configuration (no temporal memory PE); '
                        'for evaluating the reference-published vanilla '
                        'checkpoints (tools/accept.py)')
    p.add_argument('--gap', type=int, default=None,
                   help='pin the long-term write gap; default is the '
                        "reference's per-sequence adaptive "
                        'max(round(frames/30), 5) (evaluator.py:331-335)')
    p.add_argument('--full_resolution', action='store_true',
                   help='DAVIS Full-Resolution image root instead of 480p '
                        '(reference TEST_DATASET_FULL_RESOLUTION, '
                        'evaluator.py:171-197); also '
                        'exp.test_dataset_full_resolution enables it')
    p.add_argument('--frame_log', action='store_true',
                   help='print per-frame latency (reference TEST_FRAME_LOG)')
    p.add_argument('--probe', action='store_true',
                   help='print first-7-channel logits at a fixed pixel each '
                        'frame for run-to-run determinism comparison '
                        '(reference --debug_fix_random, evaluator.py:424). '
                        'Values are sampled AFTER aggregation/flip merging, '
                        'so they compare run-to-run within this framework '
                        'only — not against reference debug prints, which '
                        'sample the raw per-engine logits')
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 activations + params (TPU serving path)')
    p.add_argument('--oracle', action='store_true',
                   help='VOST oracle mode: GT label per frame conditions '
                        'the mask encoder (reference ORACLE flag, '
                        'eval_datasets.py:306-307)')
    p.add_argument('--no_config_reload', action='store_true',
                   help='ignore the training config.json snapshot '
                        '(reference eval.py:97-102 prefers the snapshot)')
    p.add_argument('--mesh', type=int, default=0,
                   help='model-parallel serving over N local devices: '
                        'params are committed with tensor-parallel '
                        'PartitionSpecs (parallel/tp.py shard_params) and '
                        'the unchanged engine runs SPMD; 0/1 = single '
                        'device (the reference has no model parallelism)')
    return p.parse_args()


def main():
    args = parse_args()
    from rmem_ocu_tpu.utils.run_utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.data import eval_datasets as ds
    from rmem_ocu_tpu.eval.evaluator import Evaluator
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.utils import checkpoint as ckpt

    exp = get_config(args.stage, args.exp_name, args.model)
    # prefer the training run's saved config snapshot, like the reference
    # (tools/eval.py:97-102 re-imports result_path/config.py)
    snap = os.path.join(exp.dir_result(), 'config.json')
    if not args.no_config_reload and os.path.isfile(snap):
        import json
        from rmem_ocu_tpu.config import config_from_dict
        with open(snap) as f:
            exp = config_from_dict(json.load(f))
        print(f'reloaded config snapshot {snap}')
    if args.bf16:
        exp = replace(exp, compute_dtype='bfloat16')
    model_overrides = {}
    if args.oracle:
        model_overrides['oracle'] = True
    if args.vanilla:
        model_overrides['use_temporal_pe'] = False
    if args.former_mem_len is not None:
        model_overrides['former_mem_len'] = args.former_mem_len
    if args.latter_mem_len is not None:
        model_overrides['latter_mem_len'] = args.latter_mem_len
    if model_overrides:
        exp = replace(exp, model=replace(exp.model, **model_overrides))
    if args.gap is not None:
        # explicit --gap pins the write gap (the default is the
        # reference's per-sequence adaptive max(round(frames/30), 5))
        exp = replace(exp, test_long_term_mem_gap=args.gap,
                      test_fixed_mem_gap=True)
    if args.no_ema:
        exp = replace(exp, test_ema=False)
    if args.aggregation is not None:
        exp = replace(exp, test_aggregation=args.aggregation)

    if args.dataset is None:
        args.dataset = exp.test_dataset
    if args.split is None:
        args.split = exp.test_dataset_split

    cfg = exp.model
    model = build_vos_model(cfg)
    size = 65
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)),
                        jnp.zeros((1, size, size, cfg.id_dim)))
    # checkpoint selection (reference evaluator.py:59-110): explicit path
    # wins; otherwise pick the experiment's ckpt/ema_ckpt dir and take the
    # requested (or latest) step.
    ckpt_path = args.ckpt_path or exp.test_ckpt_path
    if not ckpt_path:
        sub = 'ema_ckpt' if exp.test_ema else 'ckpt'
        candidate = os.path.join(exp.dir_result(), sub)
        if ckpt.list_checkpoint_steps(candidate):
            ckpt_path = candidate
    if ckpt_path:
        if ckpt_path.endswith('.pth'):
            params = ckpt.load_torch_pretrained(ckpt_path, params, cfg)
        else:
            step = (args.ckpt_step if args.ckpt_step is not None
                    else exp.test_ckpt_step)
            state, step = ckpt.restore_checkpoint(ckpt_path, None, step=step)
            if state is None:
                raise SystemExit(f'no step_<N> checkpoints in {ckpt_path}')
            # the dir may hold full TrainStates (tools/train.py ckpt/) or
            # bare param trees (ema_ckpt/); duck-type both, loudly
            if isinstance(state, dict) and 'ema_params' in state:
                which = 'params' if not exp.test_ema else 'ema_params'
                params = state[which]
                print(f'loaded {which} from step {step} ({ckpt_path})')
            elif isinstance(state, dict) and 'params' in state:
                params = state          # bare {'params': ...} tree
                print(f'loaded params from step {step} ({ckpt_path})')
            else:
                keys = (list(state.keys()) if isinstance(state, dict)
                        else type(state).__name__)
                raise SystemExit(
                    f'{ckpt_path} step {step} is not a TrainState or '
                    f'param tree (found {keys}); point --ckpt_path at a '
                    f'train ckpt/ or ema_ckpt/ directory')
    else:
        print('warning: no checkpoint found; evaluating random init')

    if args.bf16:
        from rmem_ocu_tpu.utils.precision import cast_floating
        params = cast_floating(params, jnp.bfloat16)

    if args.mesh and args.mesh > 1:
        import numpy as np
        from jax.sharding import Mesh
        from rmem_ocu_tpu.parallel import shard_params
        devs = jax.devices()
        if len(devs) < args.mesh:
            raise SystemExit(f'--mesh {args.mesh}: only {len(devs)} '
                             f'devices visible')
        mesh = Mesh(np.asarray(devs[:args.mesh]), ('model',))
        params = shard_params(params, mesh)
        print(f'model-parallel serving over {args.mesh} devices')

    output = args.output or os.path.join(exp.dir_result(), 'eval',
                                         args.dataset)
    if args.output is None and args.dataset in ('davis2016', 'davis2017'):
        # keep 480p and Full-Resolution results separate, like the
        # reference's 'Annotations/<resolution>' result_root segment
        # (reference tools/eval.py result layout) — otherwise the two
        # resolutions' masks and auto-seeded annotations silently mix
        output = os.path.join(
            output, 'Full-Resolution'
            if (args.full_resolution or exp.test_dataset_full_resolution)
            else '480p')
    os.makedirs(output, exist_ok=True)
    if jax.process_index() == 0:
        from rmem_ocu_tpu.utils.run_utils import Tee
        Tee(os.path.join(output, 'print.log'))

    # CLI overrides win; otherwise the config's TEST_* fields apply
    # (reference tools/eval.py:108-135 mutates cfg from args the same way)
    seq_kw = dict(
        max_size=(args.max_size if args.max_size is not None
                  else exp.test_max_size),
        min_size=exp.test_min_size,
        align_corners=cfg.align_corners,
        multi_scale=(tuple(args.ms) if args.ms is not None
                     else tuple(exp.test_multiscale)),
        flip=args.flip or exp.test_flip)
    root = args.data_root or exp.dir_data
    if args.dataset in ('davis2016', 'davis2017'):
        year = 2016 if args.dataset == 'davis2016' else 2017
        full_res = (args.full_resolution
                    or exp.test_dataset_full_resolution)
        dataset = ds.build_davis_dataset(root, args.split, year,
                                         full_res=full_res,
                                         result_root=output, **seq_kw)
    elif args.dataset == 'vost':
        dataset = ds.build_vost_dataset(root, args.split, oracle=args.oracle,
                                        result_root=output, **seq_kw)
    elif args.dataset == 'youtubevos':
        # the reference selects the dense every-frame split by the
        # '_all_frames' suffix in TEST_DATASET_SPLIT (evaluator.py:145-147)
        split = args.split
        all_frames = '_all_frames' in split
        if all_frames:
            split = split.replace('_all_frames', '')
        dataset = ds.build_youtubevos_dataset(root, split=split,
                                              all_frames=all_frames,
                                              result_root=output, **seq_kw)
    elif args.dataset == 'long_videos':
        dataset = ds.build_long_videos_dataset(root, result_root=output,
                                               **seq_kw)
    else:
        dataset = ds.build_synthetic_dataset(num_seqs=2)

    ev = Evaluator(model, params, exp, output,
                   rank=jax.process_index(), world=jax.process_count(),
                   frame_log=args.frame_log, probe=args.probe)
    stats = ev.evaluate(dataset)
    print(f'done: {stats.total_frames} frames, '
          f'p50 {stats.p50_latency_ms:.1f}ms, '
          f'max mem {stats.max_mem_mb:.0f}MB, results in {output}')


if __name__ == '__main__':
    main()
