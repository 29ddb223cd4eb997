"""Per-stage frame-time breakdown for the streaming engine.

Chained-scan timing: each stage runs as ONE `lax.scan` dispatch whose carry
threads a data dependency through every iteration, and the per-iteration
cost is the slope between a short and a long scan — this cancels dispatch
latency, tunnel RTT, and the final readback, and is the only honest timing
on hardware where `block_until_ready` returns before execution completes.
(The reference's equivalent is per-frame CUDA events,
managers/evaluator.py:400-404; this is the TPU-native replacement.)

Usage:
    python -m rmem_ocu_tpu.tools.bench_breakdown [--model r50_deaotl]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def timed_scan(name, body, carry0, n_short=10, n_long=40):
    """body(carry, _) -> (carry, scalar). Prints and returns per-iter ms."""
    import jax
    ts = {}
    for n in (n_short, n_long):
        @jax.jit
        def run(c, n=n):
            c, outs = jax.lax.scan(body, c, None, length=n)
            return outs[-1]
        for _ in range(3):              # compile + warm: the first ~3
            _ = float(run(carry0))      # executions of an executable run
        t0 = time.perf_counter()        # cold on the axon tunnel
        _ = float(run(carry0))          # readback forces completion
        ts[n] = time.perf_counter() - t0
    per_iter = (ts[n_long] - ts[n_short]) / (n_long - n_short) * 1e3
    print(f'{name:40s} {per_iter:8.2f} ms/iter '
          f'(short {ts[n_short]*1e3:.0f}ms long {ts[n_long]*1e3:.0f}ms)',
          flush=True)
    return per_iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', default='r50_deaotl')
    p.add_argument('--stage', default='pre_vost_2')
    p.add_argument('--height', type=int, default=353)
    p.add_argument('--width', type=int, default=625)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.engine import InferEngine
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.utils.precision import cast_floating

    H, W = args.height, args.width
    exp = get_config(args.stage, model=args.model,
                     compute_dtype='bfloat16')
    cfg = exp.model
    model = build_vos_model(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(1, H, W) * 4).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), img,
                        jnp.zeros((1, H, W, cfg.id_dim)))
    params = cast_floating(params, jnp.bfloat16)
    engine = InferEngine(model, exp, long_term_mem_gap=5)
    h16, w16 = (H - 1) // 16 + 1, (W - 1) // 16 + 1
    state = engine.init_state(1, (h16, w16))
    state = engine.add_reference_frame(params, state, img, mask,
                                       jnp.full((1,), 3, jnp.int32))
    pred0 = jnp.asarray((rng.rand(1, H, W) * 4).astype(np.int32))
    for _ in range(12):                 # fill the bank to steady state
        state = engine.update_memory(params, state, pred0)
    _ = float(jnp.sum(state.bank.length))

    def enc_body(carry, _):
        im = carry
        xs = engine._encode(params, im)
        s = jnp.mean(xs[-1].astype(jnp.float32))
        return im + (s * 1e-12).astype(im.dtype), s

    timed_scan('encode (backbone + projector)', enc_body,
               img.astype(engine.dtype))

    def prop_body(carry, _):
        st, im = carry
        logits, st = engine._propagate(params, st, im)
        s = jnp.mean(logits.astype(jnp.float32))
        return (st, im + (s * 1e-12).astype(im.dtype)), s

    timed_scan('propagate (enc+lstt+decode @4x)', prop_body, (state, img))

    def upd_body(carry, _):
        st = carry
        st = engine._update_memory(params, st, pred0)
        return st, jnp.sum(st.bank.length).astype(jnp.float32)

    timed_scan('update_memory', upd_body, state)

    def pred_body(carry, _):
        lg = carry
        pred = engine.predict_mask(lg, (H, W))
        s = jnp.sum(pred[:, ::64, ::64]).astype(jnp.float32)
        return lg + (s * 1e-12).astype(lg.dtype), s

    timed_scan('predict_mask (upsample+argmax)', pred_body,
               state.pred_logits_4x)

    def frame_body(carry, _):
        st, im = carry
        logits, st = engine._propagate(params, st, im)
        pred = engine.predict_mask(logits, (H, W))
        st = engine._update_memory(params, st, pred)
        s = jnp.mean(logits.astype(jnp.float32))
        return (st, im + (s * 1e-12).astype(im.dtype)), s

    timed_scan('FULL FRAME', frame_body, (state, img))


if __name__ == '__main__':
    main()
