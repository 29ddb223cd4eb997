"""Streaming evaluator: per-sequence semi-supervised VOS inference.

Reference: aot_plus/networks/managers/evaluator.py:30-631. Differences by
design:

- sequences are statically partitioned by host index (seq_idx % world)
  instead of an mp.Queue work-stealing farm (:276-295),
- >max_obj_num object groups fold into the engine's batch axis — one batched
  pass instead of a python list of engines (aot_engine.py:675-700),
- multi-scale / flip augmentations keep one engine state each (different
  spatial shapes), their softmax is averaged like the reference (:436-441),
- per-frame timing uses host timers around block_until_ready instead of
  CUDA events (:400-404).
"""
from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rmem_ocu_tpu.config import ExpConfig
from rmem_ocu_tpu.data.eval_datasets import EvalDataset, FrameSample
from rmem_ocu_tpu.engine.infer_engine import InferEngine
from rmem_ocu_tpu.models.vos_model import VOSModel
from rmem_ocu_tpu.ops.masks import save_mask_png
from rmem_ocu_tpu.ops.resize import interpolate_bilinear


def _device_peak_mem_mb() -> float:
    """Peak device memory (the reference reports
    torch.cuda.max_memory_allocated, evaluator.py:584-586)."""
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        return ms.get('peak_bytes_in_use', 0) / 2.0 ** 20
    except Exception:
        return 0.0


def adaptive_mem_gap(num_frames: int, base_gap: int,
                     no_memory_gap: bool = False) -> int:
    """gap = max(round(frames / 30), 5), quartered under NO_MEMORY_GAP
    (reference evaluator.py:328-335)."""
    gap = max(int(round(num_frames / 30.0)), 5)
    if no_memory_gap:
        gap = int(round(gap / 4.0))
    return gap


def sequence_mem_gap(exp, cfg, num_frames: int) -> int:
    """Per-sequence write gap: the reference's adaptive value always wins
    (evaluator.py:356 overwrites the engine's configured gap) unless
    test_fixed_mem_gap pins test_long_term_mem_gap (--gap)."""
    if exp.test_fixed_mem_gap:
        return exp.test_long_term_mem_gap
    return adaptive_mem_gap(num_frames, exp.test_long_term_mem_gap,
                            cfg.no_memory_gap)


def separate_mask_groups(mask: np.ndarray, n_groups: int,
                         group_size: int) -> np.ndarray:
    """Split a label map into per-group masks with ids 1..group_size
    (reference aot_engine.py:604-628). mask [H, W] -> [n_groups, H, W]."""
    out = np.zeros((n_groups,) + mask.shape, mask.dtype)
    for g in range(n_groups):
        start = g * group_size + 1
        end = (g + 1) * group_size
        fg = (mask >= start) & (mask <= end)
        out[g] = np.where(fg, mask - start + 1, 0)
    return out


def soft_aggregate_group_logits(logits: jnp.ndarray, obj_num: int,
                                group_size: int) -> jnp.ndarray:
    """Merge per-group logits [G, H, W, group_size+1] into one
    [1, H, W, obj_num+1] map: bg = prod of per-group bg probs
    (reference aot_engine.py:650-673)."""
    g = logits.shape[0]
    if g == 1:
        return logits
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    bg = jnp.prod(prob[..., 0], axis=0)[None, ..., None]
    fgs = [prob[i:i + 1, ..., 1:1 + group_size] for i in range(g)]
    merged = jnp.concatenate([bg] + fgs, axis=-1)
    merged = jnp.clip(merged, 1e-5, 1 - 1e-5)
    return jnp.log(merged) - jnp.log1p(-merged)


def min_aggregate_group_logits(logits: jnp.ndarray, obj_num: int,
                               group_size: int) -> jnp.ndarray:
    """Alternative bg = min over groups (reference aot_engine.py:630-648)."""
    g = logits.shape[0]
    if g == 1:
        return logits
    bg = jnp.min(logits[..., 0], axis=0)[None, ..., None]
    fgs = [logits[i:i + 1, ..., 1:1 + group_size] for i in range(g)]
    return jnp.concatenate([bg] + fgs, axis=-1)


@dataclass
class EvalStats:
    total_time: float = 0.0
    total_frames: int = 0
    seq_fps: List[float] = field(default_factory=list)
    frame_times: List[float] = field(default_factory=list)
    max_mem_mb: float = 0.0

    @property
    def p50_latency_ms(self) -> float:
        if not self.frame_times:
            return 0.0
        return float(np.median(self.frame_times) * 1e3)


@dataclass
class _AugState:
    state: object
    flip: bool
    in_size: tuple
    grid: tuple


class Evaluator:
    """Runs a full dataset; saves palette PNG masks under result_root."""

    def __init__(self, model: VOSModel, params, exp: ExpConfig,
                 result_root: str, rank: int = 0, world: int = 1,
                 frame_log: bool = False, probe: bool = False):
        self.model = model
        self.params = params
        self.exp = exp
        self.cfg = model.cfg
        self.result_root = result_root
        self.rank = rank
        self.world = world
        # per-frame timing prints (reference TEST_FRAME_LOG,
        # evaluator.py:530-536)
        self.frame_log = frame_log
        # per-frame fixed-pixel logit probe (reference DEBUG_FIX_RANDOM
        # determinism harness, evaluator.py:424-425)
        self.probe = probe
        # one engine for the whole dataset: the adaptive per-sequence gap is
        # dynamic state (EngineState.mem_gap), so sequences at the same
        # resolution share compilations
        self.engine = InferEngine(model, exp)
        # multi-group merge (reference soft vs min aggregation,
        # aot_engine.py:630-673), selected by exp.test_aggregation
        self.aggregate = (min_aggregate_group_logits
                          if getattr(exp, 'test_aggregation', 'soft') ==
                          'min' else soft_aggregate_group_logits)
        # one PNG-writer pool for the Evaluator's lifetime: a per-sequence
        # pool leaked its threads (and swallowed queued write failures)
        # whenever an exception interrupted the frame loop before the
        # drain; the shared pool is bounded and the per-sequence drain
        # below still surfaces write errors on the success path
        self._io_pool = ThreadPoolExecutor(max_workers=4)

    def evaluate(self, dataset: EvalDataset, verbose: bool = True
                 ) -> EvalStats:
        stats = EvalStats()
        for seq_idx, (seq_name, seq) in enumerate(dataset.items()):
            if seq_idx % self.world != self.rank:
                continue
            t = self._eval_sequence(seq_name, seq, verbose)
            stats.total_time += t[0]
            stats.total_frames += t[1]
            stats.frame_times.extend(t[2])
            if t[1]:
                stats.seq_fps.append(t[1] / max(t[0], 1e-9))
        stats.max_mem_mb = _device_peak_mem_mb()
        if verbose and stats.total_frames:
            # FPS + max-mem summary (reference evaluator.py:584-587)
            print(f'[rank {self.rank}] all-frame FPS: '
                  f'{stats.total_frames / stats.total_time:.2f}, '
                  f'p50 latency: {stats.p50_latency_ms:.1f}ms, '
                  f'max mem: {stats.max_mem_mb:.0f}MB')
        return stats

    # -------------------------------------------------------------- #
    def _grid(self, in_size):
        if self.cfg.align_corners:
            return ((in_size[0] - 1) // 16 + 1, (in_size[1] - 1) // 16 + 1)
        return (in_size[0] // 16, in_size[1] // 16)

    def _add_ref_all(self, engine, augs, samples, label_ori, n_groups,
                     obj_nums):
        """(Re-)add a reference label (original resolution) to every aug."""
        for aug, sample in zip(augs, samples):
            lbl = label_ori[:, ::-1] if aug.flip else label_ori
            label_in = self._label_at(lbl, aug.in_size)
            groups = separate_mask_groups(label_in, n_groups,
                                          self.cfg.max_obj_num)
            imgs = jnp.repeat(jnp.asarray(sample.image[None]), n_groups, 0)
            aug.state = engine.add_reference_frame(
                self.params, aug.state, imgs,
                jnp.asarray(groups.astype(np.int32)), obj_nums)

    def _eval_sequence(self, seq_name: str, seq, verbose: bool):
        exp, cfg = self.exp, self.cfg
        gap = sequence_mem_gap(exp, cfg, len(seq))
        engine = self.engine
        group_size = cfg.max_obj_num

        os.makedirs(os.path.join(self.result_root, seq_name), exist_ok=True)

        augs: Optional[List[_AugState]] = None
        n_groups = 1
        obj_idx = None
        total_time, timed_frames = 0.0, 0
        frame_times = []
        # PNG writes overlap the next frame's compute (reference saves
        # masks on background threads, utils/image.py:103-105); submission
        # happens outside the timed region and the futures are drained
        # before the sequence returns so failures surface here
        io_pool = self._io_pool
        io_futures = []

        for frame_idx in range(len(seq)):
            samples = seq.frame(frame_idx)
            base: FrameSample = samples[0]
            obj_idx = base.obj_idx
            ori_size = (base.height, base.width)

            if frame_idx == 0:
                assert base.label is not None
                obj_num = base.obj_num
                n_groups = max(int(np.ceil(obj_num / group_size)), 1)
                # the reference always passes obj_nums=[max_aot_obj_num] to
                # every inner engine (aot_engine.py:694-698), so ids above
                # the live object count are never masked at eval
                obj_nums = jnp.full((n_groups,), group_size, jnp.int32)
                augs = []
                for s in samples:
                    in_size = s.image.shape[:2]
                    augs.append(_AugState(
                        state=engine.init_state(n_groups,
                                                self._grid(in_size),
                                                mem_gap=gap),
                        flip=s.flip, in_size=in_size,
                        grid=self._grid(in_size)))
                self._add_ref_all(engine, augs, samples, base.label,
                                  n_groups, obj_nums)
                continue

            # VOST oracle: every frame's GT label conditions the encoder
            # (reference evaluator.py:407-417 + ORACLE flag); the label is
            # consumed here and must NOT re-reference (evaluator.py:417
            # sets current_label = None)
            oracle = cfg.oracle and base.label is not None

            t0 = time.perf_counter()
            prob_sum = None
            for aug, sample in zip(augs, samples):
                img = jnp.repeat(jnp.asarray(sample.image[None]), n_groups,
                                 0)
                mask_in = None
                if oracle:
                    lbl = base.label[:, ::-1] if aug.flip else base.label
                    lbl = self._label_at(lbl, aug.in_size)
                    # int label map: encode_image ignore-clears + binarizes
                    # it like the reference (evaluator.py:411-415 feeds
                    # current_label.int(); aot.py:118-121 binarizes)
                    mask_in = jnp.repeat(
                        jnp.asarray(lbl[None, ..., None], jnp.int32),
                        n_groups, 0)
                logits, aug.state = engine.propagate(self.params, aug.state,
                                                     img, mask_in)
                # upsample per-group logits BEFORE the nonlinear soft
                # aggregation, like the reference (match_propogate returns
                # per-engine logits at output_size, aot_engine.py:704-712)
                logits_up = interpolate_bilinear(logits, ori_size,
                                                 cfg.align_corners)
                logits_ori = self.aggregate(
                    logits_up, base.obj_num, group_size)
                if self.probe:
                    # determinism probe: first 7 channels at a fixed pixel
                    # (reference DEBUG_FIX_RANDOM, evaluator.py:424-425)
                    py, px = (min(100, ori_size[0] - 1),
                              min(100, ori_size[1] - 1))
                    vals = np.asarray(logits_ori[0, py, px, :7])
                    print(f'\n [{self.rank}] : {seq_name} {base.name} '
                          f'logits[{py},{px},:7] = {vals}')
                if aug.flip:
                    logits_ori = logits_ori[:, :, ::-1]
                prob = jax.nn.softmax(logits_ori.astype(jnp.float32), -1)
                prob_sum = prob if prob_sum is None else prob_sum + prob
            pred_ori = np.asarray(jnp.argmax(prob_sum, -1)[0]).astype(
                np.uint8)

            # mid-video new objects (YouTube-VOS): overwrite with GT where
            # labeled, then re-add as reference (reference :484-508); the
            # engine resets its memory on re-add, matching init_LSTT_memory
            if base.label is not None and not oracle:
                new_label = self._label_at(base.label, ori_size)
                keep = new_label == 0
                pred_ori = np.where(keep, pred_ori, new_label).astype(
                    np.uint8)
                new_obj_num = int(pred_ori.max())
                n_groups_new = max(int(np.ceil(new_obj_num / group_size)), 1)
                if n_groups_new != n_groups:
                    n_groups = n_groups_new
                    for aug in augs:
                        aug.state = engine.init_state(n_groups, aug.grid,
                                                      mem_gap=gap)
                obj_nums = jnp.full((n_groups,), group_size, jnp.int32)
                self._add_ref_all(engine, augs, samples, pred_ori, n_groups,
                                  obj_nums)
            else:
                for aug, sample in zip(augs, samples):
                    lbl = pred_ori[:, ::-1] if aug.flip else pred_ori
                    label_in = self._label_at(lbl, aug.in_size)
                    groups = separate_mask_groups(label_in, n_groups,
                                                  group_size)
                    aug.state = engine.update_memory(
                        self.params, aug.state,
                        jnp.asarray(groups.astype(np.int32)))

            jax.block_until_ready(augs[0].state.bank.length)
            frame_time = time.perf_counter() - t0
            total_time += frame_time
            timed_frames += 1
            frame_times.append(frame_time)
            if self.frame_log:
                print(f'[rank {self.rank}] {seq_name} frame '
                      f'{base.name.split(".")[0]} - Obj Num: '
                      f'{base.obj_num}, Time: {int(frame_time * 1e3)}ms')

            out_path = os.path.join(
                self.result_root, seq_name,
                os.path.splitext(base.name)[0] + '.png')
            io_futures.append(io_pool.submit(
                save_mask_png, pred_ori, out_path, squeeze_idx=list(obj_idx)))
            # all-frames split: also save the annotated (sparse) subset
            # (reference evaluator.py:548-560)
            sparse = getattr(seq, 'images_sparse', None)
            if sparse is not None and base.name in sparse:
                sp = os.path.join(self.result_root + '_sparse', seq_name)
                os.makedirs(sp, exist_ok=True)
                io_futures.append(io_pool.submit(
                    save_mask_png, pred_ori, os.path.join(
                        sp, os.path.splitext(base.name)[0] + '.png'),
                    squeeze_idx=list(obj_idx)))

        for fut in io_futures:
            fut.result()

        if verbose and timed_frames:
            print(f'[rank {self.rank}] {seq_name}: '
                  f'{timed_frames / total_time:.2f} fps '
                  f'({len(seq)} frames, gap {gap})')
        return total_time, timed_frames, frame_times

    @staticmethod
    def _label_at(label: np.ndarray, size):
        """Bit-faithful torch F.interpolate(mode='nearest') on labels
        (reference evaluator.py:498-503): src = floor(dst * float32(in/out))
        — torch computes the scale in float32, so exact integer floor
        (dst * in // out) diverges by one row/col at some size ratios
        (e.g. 500 -> 480); cv2.INTER_NEAREST rounds differently still."""
        label = np.ascontiguousarray(label).astype(np.uint8)
        if label.shape[:2] == tuple(size):
            return label
        h, w = label.shape[:2]
        oh, ow = int(size[0]), int(size[1])
        rows = np.floor(np.arange(oh, dtype=np.float32)
                        * (np.float32(h) / np.float32(oh))).astype(np.int64)
        cols = np.floor(np.arange(ow, dtype=np.float32)
                        * (np.float32(w) / np.float32(ow))).astype(np.int64)
        return label[np.minimum(rows, h - 1)][:, np.minimum(cols, w - 1)]
