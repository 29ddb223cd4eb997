"""Tensor-parallel parameter shardings (Megatron-style) for the LSTT/GPM
memory transformer over a `model` mesh axis.

The reference's only parallelism is data-parallel DDP
(aot_plus/networks/managers/trainer.py:94-113); this module goes beyond it
the TPU-native way: instead of hand-written collectives, each transformer
weight gets a `PartitionSpec` over the (`data`, `model`) mesh and GSPMD
derives the activation shardings and inserts the all-reduces on ICI.

Layout follows the classic column→row pairing so each block needs one
all-reduce per attention and one per FFN:

- column-parallel (output features split): every input projection —
  linear_Q/K/V (+ QMem/VMem), the gated-propagation QK/V1/V2/U1/U2, the
  GPM QV/U/ID_V/ID_U, and the FFN up-projection `linear1`. Bias shards
  with the features.
- row-parallel (input features split): the attention output `projection`
  and the FFN down-projection `linear2`. Bias stays replicated (it adds
  after the reduce).
- everything else (encoders, decoder, id bank, norms, convs, GRU) is
  replicated: the encoder is the FLOPs-heavy but memory-light part and
  data-parallelism already covers it; the transformer holds the weights
  that grow with model scale.

A spec is only applied when the sharded dimension divides the `model`
axis size — otherwise that leaf silently stays replicated (correct, just
not distributed), so odd head counts never break compilation.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# output-features-sharded projections (column-parallel)
_COL = frozenset({
    'linear_Q', 'linear_K', 'linear_V', 'linear_QMem', 'linear_VMem',
    'linear_QK', 'linear_V1', 'linear_V2', 'linear_U1', 'linear_U2',
    'linear_QV', 'linear_U', 'linear_ID_V', 'linear_ID_U', 'linear1',
})
# input-features-sharded projections (row-parallel)
_ROW = frozenset({'projection', 'linear2'})


def _path_names(path) -> list:
    out = []
    for k in path:
        if hasattr(k, 'key'):
            out.append(str(k.key))
        elif hasattr(k, 'name'):
            out.append(str(k.name))
        elif hasattr(k, 'idx'):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def tp_param_spec(path, leaf, tp: int) -> P:
    """PartitionSpec for one (possibly optimizer-wrapped) param leaf.

    Works for params, EMA copies and Adam moments alike because optax
    moment trees embed the param dict path as a suffix."""
    names = _path_names(path)
    if 'lstt' not in names or len(names) < 2:
        return P()
    parent, last = names[-2], names[-1]
    shape = np.shape(leaf)
    if parent in _COL:
        if last == 'kernel' and len(shape) == 2 and shape[1] % tp == 0:
            return P(None, 'model')
        if last == 'bias' and len(shape) == 1 and shape[0] % tp == 0:
            return P('model')
    elif parent in _ROW:
        if last == 'kernel' and len(shape) == 2 and shape[0] % tp == 0:
            return P('model', None)
        # row-parallel bias adds after the reduction: replicated
    return P()


def shard_params(params: Any, mesh: Mesh):
    """Commit a (model or train) param tree onto the mesh with TP specs.

    For serving this is the whole integration: the InferEngine's jits
    infer shardings from their committed arguments, so
    `params = shard_params(params, mesh)` turns every subsequent
    propagate/update_memory into an SPMD program whose LSTT matmuls are
    model-parallel — no engine changes, GSPMD inserts the collectives."""
    return jax.tree.map(jax.device_put, params, state_shardings(params, mesh))


# optax state fields holding per-parameter moments: Adam's mu/nu
# (scale_by_adam) and SGD's momentum buffer (trace)
_OPT_MOMENTS = frozenset({'mu', 'nu', 'trace'})


def _zero1_spec(spec: P, shape, dp: int) -> P:
    """Additionally shard one free dimension over `data` (ZeRO-1).

    Picks the largest dim divisible by the data-axis size that the TP
    spec left unsharded; leaves the spec unchanged (replicated moment)
    when no dim qualifies — correct, just not distributed."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for d, n in enumerate(shape):
        if entries[d] is None and n % dp == 0 and n > best_size:
            best, best_size = d, n
    if best is None:
        return spec
    entries[best] = 'data'
    return P(*entries)


def state_shardings(state: Any, mesh: Mesh, zero1: bool = False):
    """A `state`-shaped tree of NamedShardings: TP specs where the mesh
    has a non-trivial `model` axis, fully-replicated otherwise.

    zero1=True additionally shards the optimizer moment trees (mu/nu/
    trace) over the `data` axis — ZeRO stage 1, the TPU-native analogue
    of optimizer-state sharding: the moments and their elementwise update
    live 1/dp per device and GSPMD all-gathers the parameter updates
    (the reference's DDP replicates optimizer state on every rank)."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = axes.get('model', 1)
    dp = axes.get('data', 1)
    zero1 = zero1 and dp > 1
    if tp <= 1 and not zero1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, state)

    def spec_for(path, leaf):
        spec = tp_param_spec(path, leaf, tp) if tp > 1 else P()
        if zero1 and any(n in _OPT_MOMENTS for n in _path_names(path)):
            spec = _zero1_spec(spec, np.shape(leaf), dp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, state)
