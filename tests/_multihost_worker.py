"""Subprocess worker for test_multihost.py — NOT collected by pytest.

Runs 2 real Trainer steps over a data mesh that may span processes
(jax.distributed on CPU with virtual devices), saves/restores an Orbax
checkpoint collectively, and dumps a parameter digest for the parent test
to compare across world sizes. This executes the code path the reference
exercises with mp.spawn + gloo DDP (trainer.py:94-113).

argv: <process_id> <num_processes> <port> <out_dir> <ckpt_dir>
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]
    ckdir = sys.argv[5]

    import jax
    jax.config.update('jax_platforms', 'cpu')
    print(f'[{pid}] initializing jax.distributed', flush=True)
    if nprocs > 1:
        jax.distributed.initialize(f'127.0.0.1:{port}',
                                   num_processes=nprocs, process_id=pid)
    print(f'[{pid}] devices up', flush=True)
    import numpy as np
    import jax.numpy as jnp
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.train.trainer import Trainer
    from rmem_ocu_tpu.utils import checkpoint as ckpt

    assert len(jax.devices()) == 4, jax.devices()

    exp = get_config('default', 'mh', 'aott', data_seq_len=3,
                     train_batch_size=4, datasets=('test',),
                     data_randomcrop=(49, 49))
    model = build_vos_model(exp.model, exp)
    trainer = Trainer(model, exp)

    # deterministic global batch; host r owns rows [r*Bh, (r+1)*Bh) — the
    # DistributedSampler contract (reference trainer.py:314-323)
    b_global, t, s = 4, 3, 49
    rs = np.random.RandomState(0)
    frames = rs.randn(b_global, t, s, s, 3).astype(np.float32)
    masks = (rs.rand(b_global, t, s, s) * 3).astype(np.int32)
    obj_nums = np.full((b_global,), 2, np.int32)
    bh = b_global // nprocs
    lo = pid * bh
    batch = {'frames': frames[lo:lo + bh], 'masks': masks[lo:lo + bh],
             'obj_nums': obj_nums[lo:lo + bh]}

    print(f'[{pid}] init_state', flush=True)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               jnp.asarray(batch['frames']),
                               jnp.asarray(batch['masks']))
    state = trainer.globalize_state(state)

    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(2):
        print(f'[{pid}] train step {i}', flush=True)
        rng, k = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, k)
        losses.append(float(metrics['loss']))
    print(f'[{pid}] saving checkpoint', flush=True)

    # collective Orbax save (every process calls) + restore roundtrip
    ckpt.save_checkpoint(ckdir, 2, state, max_keep=2)
    restored, step = ckpt.restore_checkpoint(ckdir, state)
    assert step == 2, step
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(state.params)])
    np.savez(os.path.join(outdir, f'digest_{nprocs}p_{pid}.npz'),
             flat=flat, losses=np.asarray(losses))
    print(f'WORKER OK pid={pid} nprocs={nprocs} losses={losses}',
          flush=True)


if __name__ == '__main__':
    main()
