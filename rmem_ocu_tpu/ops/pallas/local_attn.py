"""Fused local-window attention kernel (Pallas/TPU) — eval forward.

The DeAOT short-term attention (reference attention.py:220-413) is a
15x15 windowed attention whose dense XLA form materializes [HW, Hp*Wp]
logits/probs plus an f32 scattered bias (~8.6x the true window). The
round-5 banded-XLA rewrite failed because XLA must COPY the value tensor
per band (README round-5 forensics); this kernel is the designed fix: the
padded key/value grids stay VMEM-RESIDENT across all query row-blocks
(their block index never changes with the row-block axis, so Pallas
fetches them once per batch element), each grid step slices its
CONTIGUOUS key band rows with `pl.ds`, and the band logits/probs live
only in VMEM — nothing probs-sized ever touches HBM.

The relative-position bias (+ window/in-image mask as -1e8) is computed
OUTSIDE in the band layout — 4x smaller than the dense padded-grid
scatter — and streamed per block. Softmax over the band is numerically
identical to the dense form: every query's full window is inside its
band and out-of-window keys underflow to probability 0.0 exactly.

Eval-only (no VJP), single attention head (the DeAOT/GPM configuration,
d_att = C/2); values are channel-blocked over a third grid axis (probs
held in VMEM scratch across the channel blocks) to bound VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e8


@functools.lru_cache(maxsize=32)
def _band_mask_np(h: int, w: int, max_dis: int, br: int):
    """Additive mask [nby, br*w, band_rows*wp] over the row-band layout:
    0.0 where key (band row by, padded col kxp) is inside query (r, qx)'s
    window AND in-image, NEG_INF elsewhere (incl. padded query rows)."""
    ws = 2 * max_dis + 1
    wp = w + 2 * max_dis
    band = br + 2 * max_dis
    nby = -(-h // br)
    out = np.full((nby, br * w, band * wp), NEG_INF, np.float32)
    qx = np.arange(w)
    for qb in range(nby):
        for r in range(br):
            qy = qb * br + r
            if qy >= h:
                continue
            for by in range(band):
                dy = by - r
                ky = qb * br + by - max_dis          # image row of the key
                if not (0 <= dy < ws and 0 <= ky < h):
                    continue
                for dx in range(ws):
                    kx = qx + dx - max_dis           # [w] image cols
                    ok = (kx >= 0) & (kx < w)
                    rows = r * w + qx[ok]
                    cols = by * wp + qx[ok] + dx
                    out[qb, rows, cols] = 0.0
    return out


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, p_scr, *,
            band_elems: int, stride: int, mm_dtype):
    qb = pl.program_id(1)
    ke = pl.program_id(2)

    @pl.when(ke == 0)
    def _probs():
        q = q_ref[0, 0].astype(mm_dtype)              # [bq, D]
        k = k_ref[0, pl.ds(qb * stride, band_elems), :].astype(mm_dtype)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [bq, band]
        logits = logits + bias_ref[0, 0]              # bias + mask, f32
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p_scr[:] = p / jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0, pl.ds(qb * stride, band_elems), :].astype(mm_dtype)
    out = jax.lax.dot_general(
        p_scr[:].astype(mm_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def local_window_attention(q, kp, vp, bias_band, h: int, w: int,
                           max_dis: int, br: int = 8, block_e: int = 512,
                           interpret: bool = None, precise: bool = False):
    """q: [B, nby*br*w, D] (pre-scaled; padded query rows arbitrary);
    kp: [B, hp2*wp, D], vp: [B, hp2*wp, E] — padded grids flattened
    row-major with hp2 = nby*br + 2*max_dis rows;
    bias_band: [B, nby, br*w, band*wp] f32 — relative bias with the
    window/in-image mask already folded in (NEG_INF outside the window).

    Returns [B, nby*br*w, E] in vp.dtype (padded query rows are garbage —
    the caller crops them).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, _, d = q.shape
    e = vp.shape[-1]
    wp = w + 2 * max_dis
    band = br + 2 * max_dis
    nby = bias_band.shape[1]
    bq = br * w
    band_elems = band * wp
    stride = br * wp
    be = min(block_e, e)
    if e % be != 0:
        be = e
    ne = e // be

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nby, ne),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda i, qb, ke: (i, qb, 0, 0)),
            # full padded grids: their block indices never change along
            # the row-block/channel axes, so Pallas keeps them resident
            # instead of re-fetching per step
            pl.BlockSpec((1, kp.shape[1], d), lambda i, qb, ke: (i, 0, 0)),
            pl.BlockSpec((1, vp.shape[1], be),
                         lambda i, qb, ke: (i, 0, ke)),
            pl.BlockSpec((1, 1, bq, band_elems),
                         lambda i, qb, ke: (i, qb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, be), lambda i, qb, ke: (i, qb, ke)),
        scratch_shapes=[pltpu.VMEM((bq, band_elems), jnp.float32)],
    )
    kernel = functools.partial(
        _kernel, band_elems=band_elems, stride=stride,
        mm_dtype=jnp.float32 if precise else jnp.bfloat16)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nby * bq, e), vp.dtype),
        interpret=interpret,
    )(q.reshape(b, nby, bq, d), kp, vp, bias_band)
