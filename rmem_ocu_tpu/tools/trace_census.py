"""Aggregate a jax.profiler chrome trace into a per-kernel time census.

`python bench.py --profile DIR` (or `--train --profile DIR`) writes a
trace under DIR/plugins/profile/<run>/*.trace.json.gz; this tool sums the
device-lane complete events by kernel name and prints the top offenders —
the TPU-native replacement for nvprof-style kernel tables (the reference
has no profiler integration at all, SURVEY.md §5).

Usage:
    python -m rmem_ocu_tpu.tools.trace_census DIR [--top 40] [--steps N]

With --steps N, totals are divided by N (e.g. the 2 traced warm steps of
`bench.py --train --profile`).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace_events(profile_dir: str):
    pats = [os.path.join(profile_dir, '**', '*.trace.json.gz'),
            os.path.join(profile_dir, '**', '*.trace.json')]
    paths = sorted(p for pat in pats for p in glob.glob(pat, recursive=True))
    if not paths:
        raise SystemExit(f'no *.trace.json[.gz] under {profile_dir}')
    path = paths[-1]                       # newest run
    opener = gzip.open if path.endswith('.gz') else open
    with opener(path, 'rt') as f:
        data = json.load(f)
    return path, data


def device_pids(data) -> dict:
    """pid -> process name for device (TPU/accelerator) lanes only."""
    names = {}
    for ev in data.get('traceEvents', []):
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            names[ev['pid']] = ev.get('args', {}).get('name', '')
    out = {}
    for pid, name in names.items():
        low = name.lower()
        if ('tpu' in low or 'device' in low or 'xla' in low) and \
                'host' not in low and 'python' not in low:
            out[pid] = name
    return out or names                    # fall back to everything


_CLASS_RULES = [
    ('matmul', re.compile(r'dot|conv|einsum|gemm', re.I)),
    ('softmax/elementwise', re.compile(r'softmax|exp|divide|add|mult|sub|'
                                       r'max|tanh|logistic|silu|rsqrt', re.I)),
    ('layout/copy', re.compile(r'copy|transpose|reshape|bitcast|concat|'
                               r'slice|pad|gather|scatter|broadcast|'
                               r'dynamic-update', re.I)),
    ('reduce', re.compile(r'reduce|all-reduce|all-gather', re.I)),
]


def classify(name: str) -> str:
    for label, pat in _CLASS_RULES:
        if pat.search(name):
            return label
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('profile_dir')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--steps', type=int, default=1,
                    help='divide totals by N traced steps')
    args = ap.parse_args()

    path, data = load_trace_events(args.profile_dir)
    pids = device_pids(data)
    by_name = collections.Counter()
    n_calls = collections.Counter()
    for ev in data.get('traceEvents', []):
        if ev.get('ph') != 'X' or ev.get('pid') not in pids:
            continue
        name = ev.get('name', '?')
        by_name[name] += ev.get('dur', 0)          # microseconds
        n_calls[name] += 1

    total = sum(by_name.values())
    print(f'# {path}')
    print(f'# device lanes: {sorted(set(pids.values()))}')
    print(f'# total device time: {total / 1e3 / args.steps:.3f} ms'
          f'{f" per step (/{args.steps})" if args.steps > 1 else ""}\n')
    by_class = collections.Counter()
    for name, dur in by_name.items():
        by_class[classify(name)] += dur
    for label, dur in by_class.most_common():
        print(f'{dur / max(total, 1) * 100:5.1f}%  {dur / 1e3 / args.steps:9.3f} ms  [{label}]')
    print()
    for name, dur in by_name.most_common(args.top):
        print(f'{dur / max(total, 1) * 100:5.1f}%  {dur / 1e3 / args.steps:9.3f} ms '
              f'x{n_calls[name]:<5d} {name[:110]}')


if __name__ == '__main__':
    main()
