"""Position-indirection invariants of the memory bank.

The bank stores physically-unordered slots with a logical-position array
(memory/bank.py): evictions move no data, appends reuse freed physical
slots, and the ordered views reconstruct the reference's oldest-first
ring semantics. Behavior vs the torch reference is pinned by the
streaming parity suites; this file pins the indirection mechanics
directly (slot reuse, predication no-ops, logical/physical mapping).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rmem_ocu_tpu.memory import bank as mb


def _new(batch=1, cap=4, hw=2, c=3):
    return mb.init_bank(num_layers=1, batch=batch, capacity=cap, hw=hw,
                        ck=c, cv=c, with_id=False)


def _frame(val, batch=1, hw=2, c=3):
    return (jnp.full((batch, hw, c), float(val)),)


def test_append_fills_lowest_free_slot_in_order():
    bank = _new()
    for i in range(3):
        bank = mb.append_frame(bank, _frame(i), _frame(10 + i), None, i)
    # no eviction yet -> physical == logical order
    np.testing.assert_array_equal(np.asarray(bank.pos[0]), [0, 1, 2, -1])
    np.testing.assert_array_equal(np.asarray(bank.frame_ids[0]),
                                  [0, 1, 2, -1])
    np.testing.assert_array_equal(np.asarray(bank.ordered_frame_ids[0]),
                                  [0, 1, 2, -1])


def test_evict_moves_no_data_and_keeps_logical_order():
    bank = _new()
    for i in range(4):
        bank = mb.append_frame(bank, _frame(i), _frame(10 + i), None, i)
    k_before = np.asarray(bank.k[0]).copy()
    # drop logical position 1 (frame 1)
    bank = mb.evict_frame(bank, jnp.array([1], jnp.int32))
    # the K buffer bytes are untouched — eviction is index arithmetic
    np.testing.assert_array_equal(np.asarray(bank.k[0]), k_before)
    assert int(bank.length[0]) == 3
    np.testing.assert_array_equal(np.asarray(bank.pos[0]), [0, -1, 1, 2])
    np.testing.assert_array_equal(np.asarray(bank.ordered_frame_ids[0]),
                                  [0, 2, 3, -1])
    # ordered() gathers the physical rows into oldest-first order
    ordered_k = np.asarray(bank.ordered(bank.k[0])[0, :3, 0, 0])
    np.testing.assert_array_equal(ordered_k, [0.0, 2.0, 3.0])


def test_freed_physical_slot_is_reused_as_newest():
    bank = _new()
    for i in range(4):
        bank = mb.append_frame(bank, _frame(i), _frame(10 + i), None, i)
    bank = mb.evict_frame(bank, jnp.array([2], jnp.int32))
    bank = mb.append_frame(bank, _frame(9), _frame(19), None, 9)
    # physical slot 2 (freed) now holds the NEWEST frame (logical 3)
    np.testing.assert_array_equal(np.asarray(bank.pos[0]), [0, 1, 3, 2])
    np.testing.assert_array_equal(np.asarray(bank.frame_ids[0]),
                                  [0, 1, 9, 3])
    np.testing.assert_array_equal(np.asarray(bank.ordered_frame_ids[0]),
                                  [0, 1, 3, 9])
    assert float(bank.k[0][0, 2, 0, 0]) == 9.0
    # slot_valid has no prefix structure anymore; all 4 live here
    assert bool(bank.slot_valid.all())
    # logical->physical round trip
    np.testing.assert_array_equal(
        np.asarray(bank.logical_to_phys()[0]), [0, 1, 3, 2])
    assert int(bank.phys_of(jnp.array([3], jnp.int32))[0]) == 2


def test_predicated_append_and_evict_are_noops():
    bank = _new(batch=2)
    for i in range(3):
        bank = mb.append_frame(bank, _frame(i, batch=2),
                               _frame(10 + i, batch=2), None, i)
    before = jax.tree.map(np.asarray, bank)
    # enabled only for batch 0
    en = jnp.array([True, False])
    bank = mb.append_frame(bank, _frame(7, batch=2), _frame(17, batch=2),
                           None, 7, enabled=en)
    assert int(bank.length[0]) == 4 and int(bank.length[1]) == 3
    np.testing.assert_array_equal(np.asarray(bank.k[0])[1],
                                  before.k[0][1])  # batch 1 untouched
    bank = mb.evict_frame(bank, jnp.array([1, 1], jnp.int32),
                          enabled=jnp.array([False, False]))
    assert int(bank.length[0]) == 4 and int(bank.length[1]) == 3
    np.testing.assert_array_equal(np.asarray(bank.ordered_frame_ids[0]),
                                  [0, 1, 2, 7])


def test_scoring_protects_logical_former_after_reshuffle():
    """After evictions scramble the physical order, the eviction scoring
    still protects LOGICAL position 0 (the former frame) and excludes the
    newest frame, whatever physical slots they occupy."""
    bank = _new(cap=5)
    for i in range(5):
        bank = mb.append_frame(bank, _frame(i), _frame(10 + i), None, i)
    bank = mb.evict_frame(bank, jnp.array([2], jnp.int32))
    bank = mb.append_frame(bank, _frame(5), _frame(15), None, 5)
    # physical order now [0,1,5(new),3,4]; logical [0,1,4,2,3]
    hw = 2
    # uniform mass over all physical slots
    mass = jnp.ones((1, hw, 5), jnp.float32)
    drop, bank2 = mb.eviction_scores_and_update(bank, mass, former_len=1)
    d = int(drop[0])
    assert 1 <= d < int(bank.length[0]) - 1  # never former, never newest
    # and the newest (logical length-1) frame id survives an evict at d
    bank3 = mb.evict_frame(bank2, drop)
    ids = list(np.asarray(bank3.ordered_frame_ids[0]))
    assert ids[0] == 0 and 5 in ids


def test_full_bank_append_overwrites_newest_not_anchor():
    """Degraded mode (capacity invariant broken, no free slot): the append
    must overwrite the NEWEST logical slot, never physical slot 0 — after
    an eviction reshuffle, physical slot 0 holds the protected former/
    reference frame (round-4 advisor finding)."""
    bank = _new(cap=4)
    for i in range(4):
        bank = mb.append_frame(bank, _frame(i), _frame(10 + i), None, i)
    # reshuffle: evict logical 1, append -> freed physical slot 1 is newest
    bank = mb.evict_frame(bank, jnp.array([1], jnp.int32))
    bank = mb.append_frame(bank, _frame(4), _frame(14), None, 4)
    assert int(bank.length[0]) == 4          # full again
    np.testing.assert_array_equal(np.asarray(bank.frame_ids[0]),
                                  [0, 4, 2, 3])
    # capacity-violating append: must land on the newest logical slot
    bank = mb.append_frame(bank, _frame(9), _frame(19), None, 9)
    ids = np.asarray(bank.frame_ids[0])
    assert ids[0] == 0, 'anchor frame overwritten in degraded mode'
    np.testing.assert_array_equal(ids, [0, 9, 2, 3])
    # pos stays a permutation of [0, cap)
    np.testing.assert_array_equal(np.sort(np.asarray(bank.pos[0])),
                                  [0, 1, 2, 3])
    assert float(bank.k[0][0, 1, 0, 0]) == 9.0
