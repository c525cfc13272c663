"""Unit tests: beta annealing, LR schedules, early stopping (reference
semantics, RFN/trainer.py:18-44,190-204,239)."""

import numpy as np

from recurrent_flows_tpu.training.schedules import (
    BetaSchedule,
    EarlyStopping,
    PlateauScheduler,
    linear_lr,
)


def test_beta_schedule_linear_warmup():
    bs = BetaSchedule(beta_max=1.0, beta_min=1e-7, steps=100)
    assert bs(0) == 1e-7
    assert abs(bs(50) - (1e-7 + 50 * (1.0 - 1e-7) / 100)) < 1e-9
    assert bs(100) == 1.0
    assert bs(10_000) == 1.0  # clamped


def test_linear_lr_decay_to_zero():
    lr, stop = linear_lr(1e-4, 50, start_step=100, num_steps=200)
    assert lr == 1e-4 and not stop
    lr, stop = linear_lr(1e-4, 200, start_step=100, num_steps=200)
    assert abs(lr - 5e-5) < 1e-12 and not stop
    lr, stop = linear_lr(1e-4, 100 + 200 - 5, start_step=100, num_steps=200)
    assert stop
    lr, _ = linear_lr(1e-4, 10_000, start_step=100, num_steps=200)
    assert lr == 0.0


def test_plateau_scheduler():
    p = PlateauScheduler(base_lr=1.0, patience=2, factor=0.5, min_lr=0.1)
    assert p.step(10.0) == 1.0  # improvement
    p.step(11.0)
    p.step(11.0)
    lr = p.step(11.0)  # 3rd bad epoch > patience=2 -> decay
    assert lr == 0.5
    for _ in range(20):
        p.step(11.0)
    assert p.lr >= 0.1  # floor


def test_early_stopping_patience():
    es = EarlyStopping(patience=3)
    assert not es.step(5.0)
    for _ in range(2):
        assert not es.step(6.0)
    assert es.step(6.0)  # wait reached patience -> stop
    # improvement resets
    es2 = EarlyStopping(patience=2)
    es2.step(5.0)
    es2.step(6.0)
    assert not es2.step(4.0)
    assert not es2.step(5.0)
