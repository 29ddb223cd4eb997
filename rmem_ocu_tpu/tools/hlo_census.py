"""Kernel census of the streaming frame step.

The 480p frame step on this environment's tunneled chip spends ~0.74 ms
of its 2.78 ms on MXU work (26.8% MFU — see README roofline notes); most
of the remainder is per-kernel overhead on the *sequential* instruction
stream, so the optimization currency for the non-compute share is
sequential kernel count. This tool compiles the exact frame-step program
the benchmark runs (propagate -> predict_mask -> update_memory) and
prints the top-level instruction census of the optimized HLO entry
computation. Async pairs (copy-start/copy-done, async-start/async-done —
mostly HBM->VMEM parameter prefetches into the S(1) scoped space) are
DMAs overlapped with compute and are tallied separately from the
sequential kernels; parameters/tuples are free.

Usage:
    python -m rmem_ocu_tpu.tools.hlo_census [--model r50_deaotl] [--cpu]
(run from the repo root: it imports bench.py to reuse the benchmark's
exact model/engine/program construction)
"""
from __future__ import annotations

import argparse
import collections
import functools
import re


FREE_OPS = {
    'parameter', 'constant', 'tuple', 'get-tuple-element', 'bitcast',
    'after-all', 'iota',
}

# overlapped DMA pairs — not part of the sequential dispatch stream
ASYNC_OPS = {'copy-start', 'copy-done', 'async-start', 'async-done'}


def census(hlo_text: str):
    """Count top-level instructions of the ENTRY computation by opcode.

    Returns (counts Counter, names list[(opcode, result_shape, name)]).
    """
    lines = hlo_text.splitlines()
    in_entry = False
    counts = collections.Counter()
    rows = []
    depth = 0
    for ln in lines:
        if ln.startswith('ENTRY '):
            in_entry = True
            depth = 0
            continue
        if not in_entry:
            continue
        depth += ln.count('{') - ln.count('}')
        if ln.strip() == '}' and depth < 0:
            break
        s = ln.strip()
        # result shape may be a tuple `(bf16[...], s32[])` (multi-output
        # fusions, while, conditional) — match it non-greedily so those
        # instructions are counted too
        m = re.match(r'(?:ROOT )?([%\w.\-]+) = (\([^=]*?\)|\S+) '
                     r'([a-z\-]+)\(', s)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in FREE_OPS:
            continue
        counts[op] += 1
        rows.append((op, shape, name))
    return counts, rows


def fusion_kinds(hlo_text: str):
    """Counter of fusion kinds (kLoop/kInput/kOutput/custom)."""
    kinds = collections.Counter()
    for m in re.finditer(r'fusion\([^)]*\), kind=(\w+)', hlo_text):
        kinds[m.group(1)] += 1
    return kinds


def _build(model_name: str):
    """Exactly the benchmark's model/engine/state (bench._build), so the
    census describes the very program `python bench.py` times — a separate
    construction here would silently desynchronize from the benchmark."""
    import bench
    engine, params, state, frames, out_size = bench._build(1, model_name)
    return engine, params, state, frames[0], out_size


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', default='r50_deaotl')
    p.add_argument('--cpu', action='store_true',
                   help='compile for CPU instead of the device backend '
                        '(fusion boundaries differ, counts are indicative)')
    p.add_argument('--stage_by_stage', action='store_true',
                   help='also census propagate / predict / update separately')
    p.add_argument('--dump', type=str, default=None,
                   help='write the optimized HLO text here')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from rmem_ocu_tpu.utils.run_utils import enable_compile_cache
    enable_compile_cache()
    import jax

    engine, params, state, img, out_size = _build(args.model)

    # identical body to bench.py's one_frame (the program whose cost
    # analysis backs the README roofline numbers)
    def frame_step(params, state, frame):
        logits, state = engine._propagate(params, state, frame)
        pred = engine.predict_mask(logits, out_size)
        state = engine._update_memory(params, state, pred)
        return state, pred[:, ::64, ::64]

    def report(name, fn, *fargs, donate=()):
        # donate_argnums matches bench.py's jits so the persistent compile
        # cache (and therefore the census) reflects the benchmarked program
        compiled = jax.jit(fn, donate_argnums=donate).lower(*fargs).compile()
        text = compiled.as_text()
        counts, rows = census(text)
        n_async = sum(c for op, c in counts.items() if op in ASYNC_OPS)
        total = sum(counts.values()) - n_async
        print(f'\n== {name}: {total} sequential kernels '
              f'(+{n_async} overlapped DMA halves) ==')
        for op, c in counts.most_common():
            if op in ASYNC_OPS:
                continue
            print(f'  {op:28s} {c}')
        kinds = fusion_kinds(text)
        if kinds:
            print('  fusion kinds: '
                  + ', '.join(f'{k}={v}' for k, v in kinds.most_common()))
        if args.dump and name == 'FULL FRAME':
            with open(args.dump, 'w') as f:
                f.write(text)
        return total, rows

    report('FULL FRAME', frame_step, params, state, img, donate=(1,))

    if args.stage_by_stage:
        report('propagate', lambda p_, s, im: engine._propagate(p_, s, im),
               params, state, img, donate=(1,))
        logits, state2 = jax.jit(engine._propagate)(params, state, img)
        report('predict_mask',
               lambda lg: engine.predict_mask(lg, out_size), logits)
        pred = jax.jit(functools.partial(
            engine.predict_mask, output_size=out_size))(logits)
        report('update_memory',
               lambda p_, s, pr: engine._update_memory(p_, s, pr),
               params, state2, pred, donate=(1,))


if __name__ == '__main__':
    main()
