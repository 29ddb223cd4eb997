"""Per-component time census of the TRAIN step: trace x optimized-HLO join.

`bench.py --train --profile DIR` records per-kernel device times but the
kernel names (fusion.8688, ...) are opaque; this tool recompiles the exact
train-step program (hits the persistent compile cache), reads each
kernel's `metadata={op_name=...}` module path from the optimized HLO, and
joins the module components back onto the traced kernel times — the
automated version of the round-4 manual census that attributed 241
ms/step to short-term windowed attention.

Usage:
    python -m rmem_ocu_tpu.tools.train_census PROFILE_DIR \
        [--steps 2] [--batch 8] [--seq 15] [--size 465] [--top 25]
"""
from __future__ import annotations

import argparse
import collections
import re


def build_train_step_hlo(batch, seq, size, model_name='r50_deaotl',
                         remat='full', amp=True):
    """Optimized-HLO text of the exact bench.py --train step (compile
    cache makes this cheap after any bench/profile run)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.train.trainer import Trainer
    from rmem_ocu_tpu.utils.run_utils import enable_compile_cache
    enable_compile_cache()

    exp = get_config('pre_vost', model=model_name, datasets=('test',),
                     train_batch_size=batch, data_seq_len=seq,
                     data_randomcrop=(size, size),
                     train_remat_policy=remat, train_amp=amp)
    model = build_vos_model(exp.model, exp)
    trainer = Trainer(model, exp)
    rs = np.random.RandomState(0)
    b = {'frames': jnp.asarray(rs.randn(batch, seq, size, size, 3),
                               jnp.float32),
         'masks': jnp.asarray((rs.rand(batch, seq, size, size) * 3)
                              .astype(np.int32)),
         'obj_nums': jnp.full((batch,), 3, jnp.int32)}
    state = trainer.init_state(jax.random.PRNGKey(0), b['frames'],
                               b['masks'])
    state = trainer.globalize_state(state)
    rng = jax.random.PRNGKey(1)
    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(
        x.shape, x.dtype, sharding=getattr(x, 'sharding', None)), state)
    # fill the jit cache (executes one step; cheap on a warm compile
    # cache), then lower the SAME executable-producing program for text
    trainer.train_step(state, b, rng)
    fn = next(iter(trainer._train_step_cache.values()))
    lowered = fn.lower(spec, b['frames'], b['masks'], b['obj_nums'], rng)
    return lowered.compile().as_text()


def build_frame_step_hlo(model_name='r50_deaotl', streams=1):
    """Optimized-HLO text of the exact bench.py eval frame step
    (propagate -> predict_mask -> update_memory), for joining an eval
    profile (`bench.py --model X --profile DIR`, whose hot loop is this
    program under a lax.scan — kernel names inside the scan body match)."""
    import functools
    import sys
    sys.path.insert(0, '.')
    import bench
    import jax
    bench._enable_compile_cache()
    engine, params, state, frames, out_size = bench._build(
        streams, model_name)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run_clip(params, state, clip):
        def body(st, frame):
            logits, st = engine._propagate(params, st, frame)
            pred = engine.predict_mask(logits, out_size)
            st = engine._update_memory(params, st, pred)
            return st, pred[:, ::64, ::64]
        state, preds = jax.lax.scan(body, state, clip)
        return state, preds

    import jax.numpy as jnp
    clip = jnp.stack([frames[i % len(frames)] for i in range(60)])
    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        (params, state, clip))
    lowered = run_clip.lower(*spec)
    return lowered.compile().as_text()


_DEF_RE = re.compile(r'^\s*%?([\w\.\-]+)\s*=\s*\S+\s+(\S+?)\(')
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')

# module-path substring -> component label, first match wins
_COMPONENTS = [
    ('short_term_attn', 'short_term_attn'),
    ('long_term_attn', 'long_term_attn'),
    ('self_attn', 'self_attn'),
    ('lstt', 'lstt_other'),
    ('encoder', 'encoder'),
    ('decoder', 'decode'),
    ('patch_wise_id_bank', 'id_embed'),
    ('fuse_memory', 'memory_update'),
    ('update_memory', 'memory_update'),
    ('loss', 'loss'),
    ('cross_entropy', 'loss'),
    ('interpolate', 'resize'),
    ('adam', 'optimizer'),
    ('ema', 'optimizer'),
    ('transpose(jvp', None),        # generic autodiff wrapper: keep going
]


def kernel_opnames(hlo: str):
    """kernel name -> op_name metadata for every instruction that has one
    (first definition wins; HLO names are unique per module)."""
    out = {}
    for ln in hlo.splitlines():
        m = _DEF_RE.match(ln)
        if not m:
            continue
        name = m.group(1)
        if name in out:
            continue
        om = _OPNAME_RE.search(ln)
        if om:
            out[name] = om.group(1)
    return out


def classify(op_name: str) -> str:
    low = op_name.lower()
    for needle, label in _COMPONENTS:
        if label and needle in low:
            return label
    # fall back to the innermost flax module scope, e.g.
    # jit(..)/while/body/../VOSModel.lstt_forward/... -> lstt_forward
    mods = re.findall(r'VOSModel\.(\w+)', op_name)
    if mods:
        return mods[-1]
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('profile_dir')
    ap.add_argument('--steps', type=int, default=2)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--seq', type=int, default=15)
    ap.add_argument('--size', type=int, default=465)
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--remat', type=str, default='full')
    ap.add_argument('--hlo', type=str, default=None,
                    help='use a pre-dumped HLO text file instead of '
                         'recompiling')
    ap.add_argument('--eval', action='store_true',
                    help='join an EVAL frame profile (bench.py --model X '
                         '--profile DIR) instead of the train step')
    ap.add_argument('--model', type=str, default='r50_deaotl')
    args = ap.parse_args()

    from rmem_ocu_tpu.tools.trace_census import (load_trace_events,
                                                 device_pids)
    path, data = load_trace_events(args.profile_dir)
    pids = device_pids(data)
    by_name = collections.Counter()
    n_calls = collections.Counter()
    for ev in data.get('traceEvents', []):
        if ev.get('ph') != 'X' or ev.get('pid') not in pids:
            continue
        by_name[ev.get('name', '?')] += ev.get('dur', 0)
        n_calls[ev.get('name', '?')] += 1

    if args.hlo:
        hlo = open(args.hlo).read()
    elif args.eval:
        hlo = build_frame_step_hlo(args.model)
    else:
        hlo = build_train_step_hlo(args.batch, args.seq, args.size,
                                   model_name=args.model, remat=args.remat)
    opnames = kernel_opnames(hlo)

    # drop container events (the whole-step jit event and while loops
    # contain their children's time — counting both double-counts)
    containers = re.compile(r'^jit_|^while|^\d+$|^body|^condition')
    by_class = collections.Counter()
    rows = []
    matched = 0
    for name, dur in by_name.items():
        if containers.match(name):
            continue
        op = opnames.get(name)
        if op is None:
            label = 'unmatched'
        else:
            matched += dur
            label = classify(op)
        by_class[label] += dur
        rows.append((dur, name, label,
                     (op or '')[-70:]))

    total = sum(by_class.values())
    print(f'# {path}')
    print(f'# kernel time (containers excluded): '
          f'{total / 1e3 / args.steps:.1f} ms/step; '
          f'HLO-matched {matched / max(total, 1) * 100:.0f}%\n')
    for label, dur in by_class.most_common():
        print(f'{dur / max(total, 1) * 100:5.1f}%  '
              f'{dur / 1e3 / args.steps:9.2f} ms  {label}')
    print()
    rows.sort(reverse=True)
    for dur, name, label, op in rows[:args.top]:
        print(f'{dur / 1e3 / args.steps:9.2f} ms x{n_calls[name]:<4d} '
              f'[{label:16s}] {name[:28]:28s} ...{op}')


if __name__ == '__main__':
    main()
