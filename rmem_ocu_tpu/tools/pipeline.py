"""One-command train -> eval -> score pipeline.

Reference: aot_plus/train_vost.sh:18-79 chains tools/train.py,
tools/eval.py, and evaluation/evaluation_method.py as one shell script.
Here the three stages run in-process, forwarding the shared flags.

Example:
    python -m rmem_ocu_tpu.tools.pipeline --stage pre_vost_2 \
        --model r50_deaotl --dataset vost --data_root ./datasets/VOST \
        --total_steps 20000 --batch_size 8
"""
from __future__ import annotations

import argparse
import os
import sys


def parse_args():
    p = argparse.ArgumentParser(description='train -> eval -> score')
    p.add_argument('--exp_name', type=str, default='default')
    p.add_argument('--stage', type=str, default='pre_vost_2')
    p.add_argument('--model', type=str, default='r50_deaotl')
    p.add_argument('--dataset', type=str, default='vost')
    p.add_argument('--split', type=str, default='val')
    p.add_argument('--data_root', type=str, default=None,
                   help='train + eval dataset root (VOST layout)')
    p.add_argument('--batch_size', type=int, default=None)
    p.add_argument('--total_steps', type=int, default=None)
    p.add_argument('--pretrained_path', type=str, default=None)
    p.add_argument('--crop_size', type=int, default=None)
    p.add_argument('--save_step', type=int, default=None)
    p.add_argument('--max_size', type=float, default=None)
    p.add_argument('--flip', action='store_true')
    p.add_argument('--ms', nargs='+', type=float, default=[1.0])
    p.add_argument('--skip_train', action='store_true')
    p.add_argument('--skip_eval', action='store_true')
    return p.parse_args()


def _run(module_main, argv):
    """Run a tool's main() under a substitute sys.argv."""
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def main():
    args = parse_args()
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.tools import eval as eval_tool
    from rmem_ocu_tpu.tools import train as train_tool

    exp = get_config(args.stage, args.exp_name, args.model)
    result_dir = exp.dir_result()
    output = os.path.join(result_dir, 'eval', args.dataset)

    if not args.skip_train:
        argv = ['train', '--exp_name', args.exp_name, '--stage', args.stage,
                '--model', args.model]
        if args.data_root:
            argv += ['--data_root', args.data_root]
        if args.batch_size:
            argv += ['--batch_size', str(args.batch_size)]
        if args.total_steps:
            argv += ['--total_steps', str(args.total_steps)]
        if args.pretrained_path:
            argv += ['--pretrained_path', args.pretrained_path]
        if args.crop_size:
            argv += ['--crop_size', str(args.crop_size)]
        if args.save_step:
            argv += ['--save_step', str(args.save_step)]
        if args.dataset == 'vost':
            argv += ['--datasets', 'vost']
        elif args.dataset == 'test':
            argv += ['--datasets', 'test']
        _run(train_tool.main, argv)

    if not args.skip_eval:
        argv = ['eval', '--exp_name', args.exp_name, '--stage', args.stage,
                '--model', args.model, '--dataset', args.dataset,
                '--split', args.split, '--output', output,
                '--ckpt_path', os.path.join(result_dir, 'ckpt'),
                '--ms'] + [str(m) for m in args.ms]
        if args.data_root:
            argv += ['--data_root', args.data_root]
        if args.flip:
            argv += ['--flip']
        if args.max_size:
            argv += ['--max_size', str(args.max_size)]
        _run(eval_tool.main, argv)

    # score (reference train_vost.sh:77-79 -> evaluation_method.py)
    if args.dataset in ('vost', 'long_videos', 'davis2017', 'davis2016'):
        from rmem_ocu_tpu.eval import scorer
        csv = scorer.score_results(
            results_path=output,
            dataset_root=args.data_root or exp.dir_data,
            split=args.split)
        print(f'pipeline done: scores in {csv}')
    else:
        print(f'pipeline done: results in {output} (no scorer for '
              f'{args.dataset})')


if __name__ == '__main__':
    main()
