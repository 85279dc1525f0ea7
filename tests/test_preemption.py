"""Preemption guard: SIGTERM sets the flag; trainers stop at epoch boundary."""
import os
import signal

from ubpl_tpu.utils.preemption import PreemptionGuard


def test_guard_flag():
    guard = PreemptionGuard.get()
    assert guard.requested is False
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.requested is True
    guard.requested = False
    guard.uninstall()
    PreemptionGuard._installed = None


def test_trainer_checks_flag():
    from ubpl_tpu.train.base_trainer import BaseTrainer
    t = BaseTrainer.__new__(BaseTrainer)
    assert t._preemption_requested() is False  # no guard installed
    guard = PreemptionGuard.get()
    guard.requested = True
    assert t._preemption_requested() is True
    guard.uninstall()
    PreemptionGuard._installed = None
