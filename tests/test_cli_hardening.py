"""CLI hardening: batch divisibility, --fix_random determinism, eval
checkpoint selection (latest / EMA / non-EMA / explicit step), and the
--aggregation flag (round-3 VERDICT items Weak#1, Weak#4, Missing#5/#6)."""
import json
import os
import shutil
import sys

import pytest


TRAIN_ARGV = ['train', '--stage', 'default', '--model', 'aott',
              '--datasets', 'test', '--total_steps', '1',
              '--batch_size', '8', '--log_step', '1', '--save_step', '1',
              '--crop_size', '65', '--exp_name', 'hard']


def _first_loss(res_dir):
    with open(os.path.join(res_dir, 'metrics.jsonl')) as f:
        return json.loads(f.readline())['loss']


def test_batch_divisibility_rejected(tmp_path, monkeypatch):
    """batch 3 on an 8-device mesh must fail fast with a clear message,
    not an opaque XLA sharding error (VERDICT Weak#1)."""
    monkeypatch.chdir(tmp_path)
    from rmem_ocu_tpu.tools import train
    monkeypatch.setattr(sys, 'argv', [
        'train', '--stage', 'default', '--model', 'aott',
        '--datasets', 'test', '--batch_size', '3'])
    with pytest.raises(SystemExit, match='not divisible'):
        train.main()


def test_fix_random_and_eval_ckpt_selection(tmp_path, monkeypatch):
    """--fix_random overrides --seed with the per-rank deterministic seed
    (reference tools/train.py:20-37), so two runs with different --seed
    bit-match. The produced result dir then drives eval's checkpoint
    selection paths: default EMA-dir discovery, --no_ema TrainState
    restore, and --aggregation min."""
    monkeypatch.chdir(tmp_path)
    from rmem_ocu_tpu.tools import train

    losses = []
    for seed in ('123', '999'):
        monkeypatch.setattr(sys, 'argv',
                            TRAIN_ARGV + ['--seed', seed, '--fix_random'])
        train.main()
        res = tmp_path / 'results' / 'hard_aott' / 'default'
        losses.append(_first_loss(res))
        if seed == '123':
            shutil.rmtree(res)
    assert losses[0] == losses[1], \
        'fix_random runs with different --seed must bit-match'

    res = tmp_path / 'results' / 'hard_aott' / 'default'
    assert (res / 'ckpt').is_dir() and (res / 'ema_ckpt').is_dir()

    # eval: no --ckpt_path -> discovers latest step in ema_ckpt/ (bare
    # param tree); --aggregation min exercises the min-merge flag
    from rmem_ocu_tpu.tools import eval as eval_cli
    out1 = tmp_path / 'ev_ema'
    monkeypatch.setattr(sys, 'argv', [
        'eval', '--exp_name', 'hard', '--stage', 'default', '--model',
        'aott', '--dataset', 'test', '--output', str(out1),
        '--aggregation', 'min'])
    eval_cli.main()
    seqs = [d for d in os.listdir(out1) if (out1 / d).is_dir()]
    assert seqs and any(f.endswith('.png')
                        for f in os.listdir(out1 / seqs[0]))

    # --no_ema -> restores the full TrainState from ckpt/ and takes params
    out2 = tmp_path / 'ev_raw'
    monkeypatch.setattr(sys, 'argv', [
        'eval', '--exp_name', 'hard', '--stage', 'default', '--model',
        'aott', '--dataset', 'test', '--output', str(out2), '--no_ema',
        '--ckpt_step', '1'])
    eval_cli.main()
    seqs = [d for d in os.listdir(out2) if (out2 / d).is_dir()]
    assert seqs and any(f.endswith('.png')
                        for f in os.listdir(out2 / seqs[0]))
