"""TRAIN_LR_RESTART cycles and the TOP_DOWN_FREEZE_ENCODER coupling.

Reference: utils/learning.py:4-46 (adjust_learning_rate with restart>1:
each cycle is ceil(total/restart) steps, warmup shrunk by 1/restart) called
from trainer.py:476-489, and configs/default.py:121
(TRAIN_ENCODER_FREEZE_AT forced to 4 when TOP_DOWN_FREEZE_ENCODER).
"""
import math

import numpy as np
from dataclasses import replace

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.train import optim


def _reference_lr(itr, base_lr, p, max_itr, restart, warm_up_steps,
                  is_cosine_decay, min_lr):
    # transliteration of reference utils/learning.py:4-34 (the lr value
    # only; group handling is covered by test_optim_sgd)
    if restart > 1:
        each_max_itr = int(math.ceil(float(max_itr) / restart))
        itr = itr % each_max_itr
        warm_up_steps /= restart
        max_itr = each_max_itr
    if itr < warm_up_steps:
        return min_lr + (base_lr - min_lr) * itr / warm_up_steps
    itr = itr - warm_up_steps
    max_itr = max_itr - warm_up_steps
    if is_cosine_decay:
        return min_lr + (base_lr - min_lr) * (
            math.cos(math.pi * itr / (max_itr + 1)) + 1.0) * 0.5
    return min_lr + (base_lr - min_lr) * (1 - itr / (max_itr + 1)) ** p


def test_lr_restart_matches_reference_formula():
    for restart in (1, 2, 3):
        for cosine in (False, True):
            exp = get_config('pre_vost', model='aott')
            exp = replace(exp, train_total_steps=1000,
                          train_lr_restart=restart,
                          train_lr_cosine_decay=cosine)
            warm = exp.train_lr_warm_up_ratio * exp.train_total_steps
            for step in (0, 7, 49, 50, 51, 333, 334, 335, 500, 667, 999):
                got = float(optim.schedule_lr(step, exp))
                want = _reference_lr(step, exp.train_lr, exp.train_lr_power,
                                     exp.train_total_steps, restart, warm,
                                     cosine, exp.train_lr_min)
                np.testing.assert_allclose(got, want, rtol=1e-6,
                                           err_msg=f'{restart=} {cosine=} '
                                                   f'{step=}')


def test_lr_restart_cycles_back_to_warmup():
    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, train_total_steps=1000, train_lr_restart=2)
    # step 500 begins cycle 2: back at the bottom of the (shrunk) warmup
    assert float(optim.schedule_lr(500, exp)) < float(
        optim.schedule_lr(499, exp))
    assert float(optim.schedule_lr(500, exp)) == float(
        optim.schedule_lr(0, exp))


def test_top_down_freeze_encoder_forces_freeze_at_4():
    exp = get_config('pre_vost', model='r50_topdown_aotl',
                     top_down_freeze_encoder=True)
    assert exp.train_encoder_freeze_at == 4
    # explicit override still wins (reference CLI setattr order)
    exp = get_config('pre_vost', model='r50_topdown_aotl',
                     top_down_freeze_encoder=True,
                     train_encoder_freeze_at=2)
    assert exp.train_encoder_freeze_at == 2
    # flag off: stage default untouched
    exp = get_config('pre_vost', model='r50_topdown_aotl')
    assert exp.train_encoder_freeze_at == 2
