"""Data-parallel trainer.

Reference: aot_plus/networks/managers/trainer.py — DDP over gloo with
mp.spawn, SyncBN, GradScaler, EMA, poly LR (trainer.py:94-113, 420-681).
TPU-native replacement: one `jax.sharding.Mesh` with a `data` axis; the
batch is sharded over it and XLA inserts the gradient all-reduce (psum)
automatically from the sharding annotations — no process groups, no DDP
wrapper, no SyncBN (the reference freezes BN anyway), no GradScaler
(bfloat16 needs no loss scaling).

Beyond the reference: an optional `model` mesh axis tensor-parallelizes
the LSTT/GPM projections (parallel/tp.py) — same train_step, different
PartitionSpecs.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rmem_ocu_tpu.config import ExpConfig
from rmem_ocu_tpu.engine.train_engine import TrainEngine
from rmem_ocu_tpu.models.vos_model import VOSModel
from rmem_ocu_tpu.parallel import tp
from rmem_ocu_tpu.train import optim


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray          # scalar int32
    ema_updates: jnp.ndarray   # scalar int32


class Trainer:
    def __init__(self, model: VOSModel, exp: ExpConfig,
                 mesh: Optional[Mesh] = None):
        self.model = model
        self.exp = exp
        self.engine = TrainEngine(model, exp)
        # built lazily in init_state: the sgd variant needs the params tree
        # to derive its per-leaf L2 coefficients
        self.tx = (optim.make_optimizer(exp)
                   if exp.train_opt != 'sgd' else None)
        if mesh is None:
            # exp.mesh_shape/mesh_axes describe the ICI mesh; the default
            # (1,)/('data',) means "all devices on one data axis"
            devs = np.asarray(jax.devices())
            shape = tuple(exp.mesh_shape)
            if int(np.prod(shape)) in (1, 0) or int(np.prod(shape)) == devs.size:
                shape = (-1,) if len(shape) <= 1 else shape[:-1] + (-1,)
            mesh = Mesh(devs.reshape(shape), tuple(exp.mesh_axes) or ('data',))
        self.mesh = mesh
        self.ema_decay = 1.0 - 1.0 / (exp.train_total_steps *
                                      exp.train_ema_ratio)
        self._train_step_cache = {}
        # host-side mirror of state.step: the curriculum switch must not
        # read the device scalar every step (one device->host sync per step
        # costs ~85 ms on a tunneled TPU). Synced once lazily (resume), then
        # tracked by counting train_step calls.
        self._host_step: Optional[int] = None

    @property
    def host_step(self) -> int:
        """Host-side mirror of state.step (no device sync); valid after the
        first train_step / resume. The CLIs must use this rather than keep
        their own counter, so there is exactly one mirror to desync."""
        return self._host_step or 0

    # -------------------------------------------------------------- #
    def globalize_state(self, state: TrainState) -> TrainState:
        """Lift host-local state arrays onto the (possibly multi-host)
        mesh — fully replicated on a pure-`data` mesh, tensor-parallel
        over a `model` axis when the mesh has one (parallel/tp.py).

        Single-host this is a device_put; multi-host it is required: jit
        over a process-spanning mesh only accepts global jax.Arrays, so
        the host-local trees produced by init_state / checkpoint restore
        must be converted once after construction (replaces the
        reference's DDP module broadcast, trainer.py:107-113)."""
        shardings = tp.state_shardings(state, self.mesh,
                                       zero1=self.exp.train_zero1)
        if jax.process_count() == 1:
            # one batched transfer for the whole tree — per-leaf
            # device_put compiles one tiny reshard program per leaf
            # (hundreds), which dominates dryrun cold time on a 1-core
            # host; the batched form issues them in one dispatch
            return jax.device_put(state, shardings)
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                s, np.asarray(x)), state, shardings)

    def _globalize_batch(self, batch: dict) -> dict:
        """Per-host batch shard [B_host, ...] -> global array
        [B_host * world, ...] laid out so host r's rows land on its own
        local devices (the DistributedSampler contract,
        reference trainer.py:314-323)."""
        data = NamedSharding(self.mesh, P('data'))
        if jax.process_count() == 1:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        return {k: jax.make_array_from_process_local_data(
                    data, np.asarray(v)) for k, v in batch.items()}

    # -------------------------------------------------------------- #
    def init_state(self, rng, sample_frames, sample_masks,
                   jit_init: bool = False) -> TrainState:
        b, t, h, w, _ = sample_frames.shape
        img = sample_frames[:1, 0]
        oh = jnp.zeros((1, h, w, self.model.cfg.id_dim))
        # jit_init compiles the whole init as ONE cacheable XLA program
        # instead of hundreds of op-by-op dispatches — on the 1-core CPU
        # dryrun host that's 28 s cold / ~1 s from the persistent cache vs
        # 41 s eager every time (values are identical either way).
        init_fn = jax.jit(self.model.init) if jit_init else self.model.init
        params = init_fn(rng, img, oh)
        if self.tx is None:
            self.tx = optim.make_optimizer(self.exp, params)
        opt_state = self.tx.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          ema_params=jax.tree.map(jnp.copy, params),
                          step=jnp.zeros((), jnp.int32),
                          ema_updates=jnp.zeros((), jnp.int32))

    def _masks(self, params, extra_frozen=()):
        return optim.make_masks(params, self.exp, extra_frozen)

    # -------------------------------------------------------------- #
    def _train_step(self, state: TrainState, frames, masks, obj_nums, rng,
                    use_prev_pred: bool, extra_frozen: Tuple[str, ...]):
        exp = self.exp
        if exp.train_spatial_sharding and 'model' in self.mesh.axis_names:
            # sequence/spatial parallelism over the tp axis (the Megatron
            # SP trick): episodes enter sharded on H, so the encoder/decoder
            # convs run spatially partitioned — GSPMD inserts the halo
            # exchanges — and GSPMD reshards once where the LSTT's
            # tensor-parallel weight specs take over.
            frames = jax.lax.with_sharding_constraint(
                frames, NamedSharding(self.mesh,
                                      P('data', None, 'model')))
            masks = jax.lax.with_sharding_constraint(
                masks, NamedSharding(self.mesh, P('data', None, 'model')))

        def loss_fn(params):
            loss, aux = self.engine.episode_loss(
                params, frames, masks, obj_nums, state.step, rng,
                use_prev_pred=use_prev_pred)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)

        now_lr = optim.schedule_lr(state.step, exp)
        param_masks = self._masks(state.params, extra_frozen)
        # zero frozen grads before the chain so the global-norm clip and the
        # Adam moments see only trainable params, like requires_grad=False
        # (reference trainer.py:552: clip over params with grads)
        grads = jax.tree.map(
            lambda g, fz: jnp.zeros_like(g) if fz else g,
            grads, param_masks[2])
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optim.apply_updates(state.params, updates, param_masks,
                                         now_lr, exp)
        if 'batch_stats' in aux:
            # trainable-BN running stats: overwrite with the episode's
            # updated values (their grads are zero and lr-0-masked, so the
            # optimizer left them untouched); the EMA below then tracks
            # buffers too, like the reference's get_param_buffer_for_ema
            # (utils/ema.py:96-103). Under train_amp the episode computed
            # them in bf16 — store back at the float32 master dtype.
            new_params = dict(new_params)
            new_params['batch_stats'] = jax.tree.map(
                lambda old, new: new.astype(old.dtype),
                state.params['batch_stats'], aux.pop('batch_stats'))
        new_ema = optim.ema_update(state.ema_params, new_params,
                                   state.ema_updates + 1, self.ema_decay)
        metrics = {
            'loss': loss,
            'aux_loss': aux['aux_loss'],
            'pred_loss': aux['pred_loss'],
            'iou': aux['iou'],
            'frame_losses': aux['frame_losses'],
            'frame_ious': aux['frame_ious'],
            'lr': now_lr,
            'grad_norm': optax_global_norm(grads),
        }
        if 'var_loss' in aux:
            metrics['var_loss'] = aux['var_loss']
        # final-frame predicted mask for image logging (reference
        # trainer.py:712-761 logs pred/GT overlays); stays on device until
        # the host actually reads it at a log step
        metrics['pred_mask'] = aux['final_pred_mask']
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               ema_params=new_ema, step=state.step + 1,
                               ema_updates=state.ema_updates + 1)
        return new_state, metrics

    def train_step(self, state: TrainState, batch, rng):
        """batch: dict(frames [B,T,H,W,3], masks [B,T,H,W], obj_nums [B]).
        The seq-training phase switch (reference trainer.py:469-474) flips
        use_prev_pred and freezes the id bank at 50% of training."""
        if self._host_step is None:
            self._host_step = int(state.step)   # one-time sync (resume)
        use_prev_pred = bool(
            self._host_step >=
            self.exp.train_seq_training_start_ratio *
            self.exp.train_total_steps)
        extra_frozen = (tuple(self.exp.train_seq_training_freeze_params)
                        if use_prev_pred else ())
        key = (use_prev_pred, extra_frozen, batch['frames'].shape)
        if key not in self._train_step_cache:
            data_sharding = NamedSharding(self.mesh, P('data'))
            repl = NamedSharding(self.mesh, P())
            # TP specs where the mesh has a model axis, replicated
            # otherwise (then this is exactly the old P() everywhere);
            # zero1 additionally shards the optimizer moments over `data`
            state_sh = tp.state_shardings(state, self.mesh,
                                          zero1=self.exp.train_zero1)
            fn = functools.partial(self._train_step,
                                   use_prev_pred=use_prev_pred,
                                   extra_frozen=extra_frozen)
            self._train_step_cache[key] = jax.jit(
                fn,
                in_shardings=(state_sh, data_sharding, data_sharding,
                              data_sharding, repl),
                out_shardings=(state_sh, repl),
                donate_argnums=(0,))
        batch = self._globalize_batch(batch)
        if jax.process_count() > 1:
            # the PRNG key must also be a global (replicated) array; all
            # hosts derive the same key chain from the same seed
            rng = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P()), np.asarray(rng))
        out = self._train_step_cache[key](
            state, batch['frames'], batch['masks'], batch['obj_nums'], rng)
        self._host_step += 1
        return out


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x))
                        for x in jax.tree.leaves(tree)))
