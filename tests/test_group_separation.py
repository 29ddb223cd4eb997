"""Object-group separation / aggregation (reference aot_engine.py:604-673)."""
import numpy as np

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.eval.evaluator import (min_aggregate_group_logits,
                                         separate_mask_groups,
                                         soft_aggregate_group_logits)


def test_separate_mask_groups():
    mask = np.zeros((4, 4), np.int32)
    mask[0, 0] = 3
    mask[1, 1] = 10
    mask[2, 2] = 11
    mask[3, 3] = 15
    groups = separate_mask_groups(mask, n_groups=2, group_size=10)
    # group 0: ids 1..10 stay as-is
    assert groups[0][0, 0] == 3 and groups[0][1, 1] == 10
    assert groups[0][2, 2] == 0 and groups[0][3, 3] == 0
    # group 1: ids 11..20 -> 1..10
    assert groups[1][2, 2] == 1 and groups[1][3, 3] == 5
    assert groups[1][0, 0] == 0


def test_soft_aggregation_matches_reference_formula():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 3, 11).astype(np.float32))
    merged = soft_aggregate_group_logits(logits, obj_num=15, group_size=10)
    assert merged.shape == (1, 3, 3, 21)
    # bg prob of the merged logit equals the product of per-group bg probs
    probs = jax.nn.softmax(logits, axis=-1)
    want_bg = np.asarray(jnp.prod(probs[..., 0], axis=0))
    got = jax.nn.sigmoid(merged[0, ..., 0])  # logit() inverse of clamped p
    np.testing.assert_allclose(np.asarray(got),
                               np.clip(want_bg, 1e-5, 1 - 1e-5), atol=1e-5)


def test_min_aggregation():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 2, 2, 11).astype(np.float32))
    merged = min_aggregate_group_logits(logits, obj_num=12, group_size=10)
    assert merged.shape == (1, 2, 2, 21)
    np.testing.assert_allclose(
        np.asarray(merged[0, ..., 0]),
        np.asarray(jnp.min(logits[..., 0], axis=0)))
