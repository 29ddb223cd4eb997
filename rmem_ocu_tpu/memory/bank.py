"""Static-capacity long-term memory bank + RMem eviction scoring.

The reference grows python lists of [T, HW, B, C] tensors with torch.cat and
drops frames by slicing (aot_plus/networks/layers/transformer.py:306-436).
XLA needs static shapes, so the bank here is a fixed-capacity slot store
with a LOGICAL-POSITION INDIRECTION:

- the K/V/id_V buffers are *unordered physical slots*; `pos[b, t]` is the
  logical position of physical slot t (0 = oldest live frame, -1 = free),
- append writes ONE slot (`dynamic_update_slice` at the first free
  physical slot) and sets its pos to the current length,
- evict(d) touches NO data at all: positions > d decrement, the dropped
  slot's pos becomes -1. (Round-3 kept the slots physically ordered and
  evicted with a shift-select over the whole bank — a full bank
  read+write per eviction, ~190 MB at DeAOT eval shapes — and routed the
  bank through a `lax.cond` whose branch join copied it every frame,
  0.75 ms/frame at 8-stream serving. The indirection removes both.)
- attention reads the bank in physical order, which is sound because
  softmax attention is permutation-invariant given per-slot masking
  (`bank_key_bias` masks pos < 0) and the temporal PE / former-latter
  semantics are functions of `pos` (the engine gathers the interpolated
  PE by pos; scoring protects pos==0, the former frame),
- the eviction score state (attention-usage moving mean + UCB visit
  counts, reference transformer.py:339-411) lives in per-PHYSICAL-slot
  arrays; logical relations are expressed through `pos`. The reference
  keys these by frame index in python dicts; since a frame index never
  re-enters the bank after eviction, per-slot arrays are equivalent.
- Until the first eviction, physical == logical order exactly (append
  fills the lowest free physical slot), so a growing bank is laid out
  identically to the round-3 ordered ring.

Ordered *views* for tests/debugging: `ordered_frame_ids` and
`ordered(arr)` gather by logical position.

K/V/id_V are stored as a TUPLE of per-layer arrays [B, T_cap, HW, C] (one
buffer per LSTT/GPM layer) rather than one stacked [L, ...] array: each
layer reads and writes its own slot buffer, so XLA never emits the
per-layer slice/stack copies a stacked layout forces (measured ~150 us per
480p frame on v5e), and while carries alias layer buffers in place.
The batch axis stays inside each buffer for batched multi-stream serving.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

# per-layer tuple of [B, T, HW, C] arrays
LayerArrays = Tuple[jnp.ndarray, ...]


def _map(fn, *tuples):
    """Map fn over parallel per-layer tuples."""
    return tuple(fn(*xs) for xs in zip(*tuples))


@flax.struct.dataclass
class MemoryBank:
    k: LayerArrays                      # L x [B, T_cap, HW, Ck]
    v: LayerArrays                      # L x [B, T_cap, HW, Cv]
    id_v: Optional[LayerArrays]         # L x [B, T_cap, HW, Cv] (DeAOT)|None
    length: jnp.ndarray                 # [B] int32 live length
    pos: jnp.ndarray                    # [B, T_cap] int32 logical position
                                        #   of each physical slot; -1 = free
    frame_ids: jnp.ndarray              # [B, T_cap] int32 (-1 = empty),
                                        #   per PHYSICAL slot
    attn_ema: jnp.ndarray               # [B, T_cap] f32 usage moving-mean
    ema_present: jnp.ndarray            # [B, T_cap] bool (slot has an EMA yet)
    visits: jnp.ndarray                 # [B, T_cap] f32 UCB visit counts

    @property
    def capacity(self) -> int:
        return self.k[0].shape[1]

    @property
    def slot_valid(self) -> jnp.ndarray:
        """[B, T_cap] bool — physical slot holds a live frame."""
        return self.pos >= 0

    def logical_to_phys(self) -> jnp.ndarray:
        """[B, T_cap] int32: perm[b, j] = physical slot of logical
        position j (0 for j >= length — mask with `length`)."""
        cap = self.capacity
        t = jnp.arange(cap, dtype=jnp.int32)

        def per_batch(p):
            tgt = jnp.where(p >= 0, p, cap)     # free slots scatter off-end
            return jnp.zeros((cap,), jnp.int32).at[tgt].set(t, mode='drop')
        return jax.vmap(per_batch)(self.pos)

    def ordered(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Gather a [B, T_cap, ...] per-physical-slot array into logical
        order (row j = j-th oldest; rows >= length are slot-0 copies —
        mask with `length`)."""
        perm = self.logical_to_phys()
        return jax.vmap(lambda a, p: a[p])(arr, perm)

    @property
    def ordered_frame_ids(self) -> jnp.ndarray:
        """[B, T_cap] int32 frame ids in logical order, -1 past length."""
        ids = self.ordered(self.frame_ids)
        j = jnp.arange(self.capacity)[None]
        return jnp.where(j < self.length[:, None], ids, -1)

    def phys_of(self, logical_idx: jnp.ndarray) -> jnp.ndarray:
        """[B] physical slot currently holding logical position
        `logical_idx` ([B] int32). Undefined (0) if not live."""
        return jnp.argmax(self.pos == logical_idx[:, None],
                          axis=-1).astype(jnp.int32)


@flax.struct.dataclass
class ShortTermMemory:
    """Sliding window of the last `skip` frames' K/V; the *oldest* entry in
    the window is what attention reads (reference transformer.py:293-299)."""
    k: LayerArrays                      # L x [B, S, HW, Ck]
    v: LayerArrays                      # L x [B, S, HW, Cv]
    id_v: Optional[LayerArrays]
    count: jnp.ndarray                  # [B] int32, frames pushed so far

    def read(self):
        """Oldest live entry = slot 0 once the window is full; before that
        the list is shorter than `skip`, and slot 0 is still the oldest."""
        return (tuple(k[:, 0] for k in self.k),
                tuple(v[:, 0] for v in self.v),
                None if self.id_v is None
                else tuple(i[:, 0] for i in self.id_v))


def init_bank(num_layers: int, batch: int, capacity: int, hw: int,
              ck: int, cv: int, with_id: bool,
              dtype=jnp.float32) -> MemoryBank:
    zeros = lambda c: tuple(jnp.zeros((batch, capacity, hw, c), dtype)
                            for _ in range(num_layers))
    return MemoryBank(
        k=zeros(ck), v=zeros(cv), id_v=zeros(cv) if with_id else None,
        length=jnp.zeros((batch,), jnp.int32),
        pos=jnp.full((batch, capacity), -1, jnp.int32),
        frame_ids=jnp.full((batch, capacity), -1, jnp.int32),
        attn_ema=jnp.zeros((batch, capacity), jnp.float32),
        ema_present=jnp.zeros((batch, capacity), jnp.bool_),
        visits=jnp.zeros((batch, capacity), jnp.float32),
    )


def reset_bank(bank: MemoryBank) -> MemoryBank:
    """Empty the bank in place (length 0, no frame ids, no eviction state).

    Reference: re-adding a reference frame calls init_LSTT_memory
    (aot_engine.py:321-323) which *replaces* the long-term memory with just
    the new reference frame and clears stored_attn_weight_dict /
    stored_frame_times (transformer.py:438-453).
    """
    new_fields = dict(
        k=_map(jnp.zeros_like, bank.k), v=_map(jnp.zeros_like, bank.v),
        length=jnp.zeros_like(bank.length),
        pos=jnp.full_like(bank.pos, -1),
        frame_ids=jnp.full_like(bank.frame_ids, -1),
        attn_ema=jnp.zeros_like(bank.attn_ema),
        ema_present=jnp.zeros_like(bank.ema_present),
        visits=jnp.zeros_like(bank.visits),
    )
    if bank.id_v is not None:
        new_fields['id_v'] = _map(jnp.zeros_like, bank.id_v)
    return bank.replace(**new_fields)


def reset_short_term(short: ShortTermMemory) -> ShortTermMemory:
    """Empty the short-term window (reference transformer.py:439-441 resets
    short_term_memories_list to just the new reference frame)."""
    new_fields = dict(k=_map(jnp.zeros_like, short.k),
                      v=_map(jnp.zeros_like, short.v),
                      count=jnp.zeros_like(short.count))
    if short.id_v is not None:
        new_fields['id_v'] = _map(jnp.zeros_like, short.id_v)
    return short.replace(**new_fields)


def _write_slot(bank_arr, new, idx, enabled=None):
    """bank_arr: [B, T, HW, C]; new: [B, HW, C]; idx: [B]; enabled: [B]
    bool or None. A predicated ONE-SLOT write: where not enabled the slot
    is written back with its existing content (a slot-sized read, never a
    bank-sized one — this is what lets the caller skip `lax.cond` around
    the whole bank)."""
    new = new.astype(bank_arr.dtype)

    def per_batch(arr_b, new_b, i, en_b):
        if en_b is not None:
            old = jax.lax.dynamic_slice_in_dim(arr_b, i, 1, axis=0)
            new_row = jnp.where(en_b, new_b[None], old)
        else:
            new_row = new_b[None]
        return jax.lax.dynamic_update_slice_in_dim(arr_b, new_row, i,
                                                   axis=0)
    if enabled is None:
        return jax.vmap(lambda a, n, i: per_batch(a, n, i, None))(
            bank_arr, new, idx)
    return jax.vmap(per_batch)(bank_arr, new, idx, enabled)


def append_frame(bank: MemoryBank, new_k, new_v, new_id_v,
                 frame_idx, enabled=None) -> MemoryBank:
    """Write the new frame into the first FREE physical slot, bump length.

    new_k/new_v/new_id_v: per-layer tuples of [B, HW, C]; frame_idx: scalar
    or [B] int32; enabled: optional [B] bool — where False the bank is
    unchanged (slot-granular predication; no bank-sized conditional).
    Reference: transformer.py:306-322 (torch.cat on dim 0).

    Capacity invariant: callers must keep length < capacity before an
    enabled append. The two append sites guarantee it — the long-term
    write path evicts back to former+latter (= capacity-1) right after
    appending, and add_reference_frame resets the bank to empty first
    (the reference's init_LSTT_memory). The free-slot argmin below
    degrades to overwriting slot 0 if it ever failed, unlike the
    reference's unbounded torch.cat.
    """
    cap = bank.capacity
    frame_idx = jnp.broadcast_to(jnp.asarray(frame_idx, jnp.int32),
                                 bank.length.shape)
    if enabled is None:
        enabled = jnp.ones_like(bank.length, dtype=bool)
    t = jnp.arange(cap, dtype=jnp.int32)[None]
    # first free physical slot; == length while no eviction has happened,
    # so a growing bank stays physically ordered
    free_rank = jnp.where(bank.pos < 0, t, cap)
    idx = jnp.min(free_rank, axis=-1).astype(jnp.int32)
    # degraded mode (capacity invariant broken, no free slot): overwrite
    # the NEWEST logical slot — after any eviction history physical slot 0
    # typically holds the protected former/reference frame, so falling
    # back there would silently corrupt the anchor (round-4 advisor)
    newest = bank.phys_of(jnp.maximum(bank.length - 1, 0))
    idx = jnp.where(idx >= cap, newest, idx)
    write = lambda arr, new: _write_slot(arr, new, idx, enabled)
    at_idx = t == idx[:, None]                          # [B, T] one-hot
    en = enabled[:, None]
    new_fields = dict(
        k=_map(write, bank.k, new_k),
        v=_map(write, bank.v, new_v),
        length=jnp.where(enabled,
                         jnp.minimum(bank.length + 1, cap), bank.length),
        # pos = length in the normal free-slot case; clamped so the
        # degraded overwrite keeps pos in [0, cap)
        pos=jnp.where(at_idx & en,
                      jnp.minimum(bank.length, cap - 1)[:, None], bank.pos),
        frame_ids=jnp.where(at_idx & en, frame_idx[:, None],
                            bank.frame_ids),
        attn_ema=jnp.where(at_idx & en, 0.0, bank.attn_ema),
        ema_present=jnp.where(at_idx & en, False, bank.ema_present),
        visits=jnp.where(at_idx & en, 0.0, bank.visits),
    )
    if bank.id_v is not None:
        new_fields['id_v'] = _map(write, bank.id_v, new_id_v)
    return bank.replace(**new_fields)


def evict_frame(bank: MemoryBank, drop_idx, enabled=None,
                compressed_kv=None) -> MemoryBank:
    """Drop the frame at LOGICAL position drop_idx ([B] int32); per-batch
    no-op where `enabled` ([B] bool) is False.

    Zero data movement: the dropped physical slot's pos becomes -1 (free)
    and every logical position above drop_idx decrements, preserving the
    logical order. The K/V buffers are untouched.

    compressed_kv: optional (k1, v1, id_v1) per-layer tuples of [B, HW, C]
    written into LOGICAL slot 1 after the drop (ConvGRU compression,
    reference transformer.py:420-430 writes the GRU output over slot 1;
    the scoring protects logical slots 0 and 1 in that mode, so slot 1's
    physical slot is unaffected by the drop).
    Reference: transformer.py:432-434 (torch.cat of the two halves).
    """
    if enabled is None:
        enabled = jnp.ones_like(drop_idx, dtype=bool)
    en = enabled[:, None]
    dropped = (bank.pos == drop_idx[:, None]) & en       # [B, T] one-hot
    shift = (bank.pos > drop_idx[:, None]) & en
    new_pos = jnp.where(shift, bank.pos - 1, bank.pos)
    new_pos = jnp.where(dropped, -1, new_pos)
    bank = bank.replace(
        pos=new_pos,
        length=jnp.where(enabled, jnp.maximum(bank.length - 1, 0),
                         bank.length),
        frame_ids=jnp.where(dropped, -1, bank.frame_ids),
    )
    if compressed_kv is not None:
        k1, v1, idv1 = compressed_kv
        phys1 = bank.phys_of(jnp.ones_like(drop_idx))
        put = lambda arr, new: _write_slot(arr, new, phys1, enabled)
        bank = bank.replace(k=_map(put, bank.k, k1),
                            v=_map(put, bank.v, v1))
    return bank


def default_drop_index(bank: MemoryBank, former_len: int,
                       gru_memory: bool = False):
    """Training-time drop slot (no attention scoring), as a LOGICAL
    position: reference transformer.py:335-337."""
    d = former_len + (1 if gru_memory else 0)
    return jnp.full_like(bank.length, d)


def eviction_scores_and_update(bank: MemoryBank, frame_mass,
                               fg_proba=None, gru_memory: bool = False,
                               enabled=None, former_len: int = 1,
                               moving_mean_factor: float = 0.8,
                               ucb_add: float = 8.0, ucb_mul: float = 1.5):
    """RMem attention-usage + UCB eviction (reference transformer.py:339-411).

    frame_mass: [B, HWq, T_cap] — per-query attention mass each PHYSICAL
    memory slot received at the *last propagation* (so the just-appended
    newest frame, and free slots, have zero mass and are excluded).
    fg_proba: optional [B, HWq] foreground probability weighting.

    Returns (drop_idx [B] int32 LOGICAL position, bank with updated
    ema/visit state). The caller decides whether to actually evict
    (budget exceeded). Where `enabled` ([B] bool) is False the state is
    untouched and the default drop index is returned.
    """
    if enabled is None:
        enabled = jnp.ones_like(bank.length, dtype=bool)
    pos = bank.pos
    # slots that had attention mass = live at the last propagation =
    # logical positions [0, length-1) (the newest frame was appended
    # after the propagation and received no mass)
    n_scored = jnp.maximum(bank.length - 1, 0)           # [B]
    scored = (pos >= 0) & (pos < n_scored[:, None])      # [B, T]
    live = pos >= 0

    w = frame_mass
    if fg_proba is not None:
        w = w * fg_proba[..., None]
    w = jnp.sum(w, axis=1)                               # [B, T]
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)

    # moving mean keyed by slot (reference: dict keyed by frame idx)
    ema = jnp.where(bank.ema_present & scored,
                    (1 - moving_mean_factor) * bank.attn_ema
                    + moving_mean_factor * w,
                    w)
    ema = jnp.where(scored, ema, bank.attn_ema)
    ema_present = bank.ema_present | scored

    # UCB visit counts: +1 for every live slot (reference :378-388)
    visits = jnp.where(live, bank.visits + 1.0, bank.visits)

    # bonus over logical positions [0, length-1) — newest excluded
    # (reference builds frame_times over long_memories_indexes[:-1], :389-392)
    n = visits
    # the former slot's count is pinned to the candidate count (:394-396)
    pinned = n_scored.astype(jnp.float32)[:, None]
    n = jnp.where(pos == 0, pinned, n)
    if gru_memory:
        n = jnp.where((pos == 1) & (n_scored[:, None] > 1), pinned, n)
    n_sum = jnp.sum(jnp.where(scored, n, 0.0), axis=-1, keepdims=True)
    bonus = ucb_mul * jnp.sqrt(jnp.log(jnp.maximum(n_sum, 1.0))
                               / (n + ucb_add))
    score = ema + bonus

    # argmin over candidate slots: former (and GRU slot 1) protected,
    # newest (no mass) excluded via `scored`
    ignore_former = 2 if gru_memory else 1
    candidate = scored & (pos >= ignore_former)
    masked = jnp.where(candidate, score, jnp.inf)
    phys_min = jnp.argmin(masked, axis=-1)
    drop_idx = jnp.take_along_axis(pos, phys_min[:, None],
                                   axis=-1)[:, 0].astype(jnp.int32)
    # if there are no candidates (or scoring disabled) fall back to the
    # default drop slot former_len (+1 with gru) — reference
    # transformer.py:335-337 sets to_drop_idx before the scoring branch,
    # while the candidate protection above stays 1 (+1 gru), :406-409.
    fallback = former_len + (1 if gru_memory else 0)
    has_candidate = jnp.any(candidate, axis=-1) & enabled
    drop_idx = jnp.where(has_candidate, drop_idx,
                         fallback * jnp.ones_like(drop_idx))

    en = enabled[:, None]
    return drop_idx, bank.replace(
        attn_ema=jnp.where(en, ema, bank.attn_ema),
        ema_present=jnp.where(en, ema_present, bank.ema_present),
        visits=jnp.where(en, visits, bank.visits))


def push_short_term(short: ShortTermMemory, new_k, new_v,
                    new_id_v) -> ShortTermMemory:
    """Append to the sliding window, dropping the oldest if full.

    new_k/new_v/new_id_v: per-layer tuples of [B, HW, C].
    Reference: transformer.py:293-299 (python list slicing [-skip:]).
    """
    s = short.k[0].shape[1]
    cast = lambda a, n: n.astype(a.dtype)
    new_k = _map(cast, short.k, new_k)
    new_v = _map(cast, short.v, new_v)
    if new_id_v is not None and short.id_v is not None:
        new_id_v = _map(cast, short.id_v, new_id_v)
    if s == 1:
        new_fields = dict(k=_map(lambda n: n[:, None], new_k),
                          v=_map(lambda n: n[:, None], new_v),
                          count=short.count + 1)
        if short.id_v is not None:
            new_fields['id_v'] = _map(lambda n: n[:, None], new_id_v)
        return short.replace(**new_fields)

    def push(arr, new):
        # while count < s the window grows: write at `count`;
        # afterwards shift left and write at the end.
        def per_batch(a, n, c):
            shifted = jnp.concatenate([a[1:], n[None]], axis=0)
            grown = jax.lax.dynamic_update_slice_in_dim(
                a, n[None], jnp.minimum(c, s - 1), axis=0)
            return jnp.where(c >= s, shifted, grown)
        return jax.vmap(per_batch, in_axes=(0, 0, 0))(arr, new, short.count)

    new_fields = dict(k=_map(push, short.k, new_k),
                      v=_map(push, short.v, new_v),
                      count=short.count + 1)
    if short.id_v is not None:
        new_fields['id_v'] = _map(push, short.id_v, new_id_v)
    return short.replace(**new_fields)


def init_short_term(num_layers: int, batch: int, skip: int, hw: int,
                    ck: int, cv: int, with_id: bool,
                    dtype=jnp.float32) -> ShortTermMemory:
    zeros = lambda c: tuple(jnp.zeros((batch, skip, hw, c), dtype)
                            for _ in range(num_layers))
    return ShortTermMemory(k=zeros(ck), v=zeros(cv),
                           id_v=zeros(cv) if with_id else None,
                           count=jnp.zeros((batch,), jnp.int32))
