"""Optuna Bayesian lr search in the Panesar baseline CLI (reference
`further_scripts/Panesar_Recreation/panesar_model_baseline_train.py:203-341`).

optuna is not installed in this environment, so the default test drives
the search through a minimal API-compatible stub (create_study/optimize/
suggest_float/report/should_prune/TrialPruned) — validating the CLI's
integration code path; a second test runs against the real package when
present (pytest.importorskip)."""

import math
import random
import sys
import types

import pytest


def _optuna_stub():
    mod = types.ModuleType("optuna")
    exceptions = types.ModuleType("optuna.exceptions")

    class TrialPruned(Exception):
        pass

    exceptions.TrialPruned = TrialPruned

    class Trial:
        def __init__(self, number, rng):
            self.number = number
            self._rng = rng
            self.params = {}

        def suggest_float(self, name, lo, hi, log=False):
            u = self._rng.random()
            v = lo * math.exp(u * math.log(hi / lo)) if log else lo + u * (hi - lo)
            self.params[name] = v
            return v

        def report(self, value, step):
            pass

        def should_prune(self):
            return False

    class Study:
        def __init__(self, direction):
            self.direction = direction
            self.best_params = None
            self.best_value = None

        def optimize(self, fn, n_trials):
            rng = random.Random(0)
            for i in range(n_trials):
                t = Trial(i, rng)
                try:
                    v = fn(t)
                except TrialPruned:
                    continue
                if self.best_value is None or v < self.best_value:
                    self.best_value, self.best_params = v, dict(t.params)

    mod.create_study = lambda direction="minimize": Study(direction)
    mod.exceptions = exceptions
    return mod, exceptions


def _run_search(tmp_path, capsys):
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli import (
        panesar_baseline,
    )

    panesar_baseline.main([
        "train", "--synthetic_data", "--cpu", "--epochs", "1",
        "--max_items", "3", "--batch_size", "3", "--optuna_trials", "2",
        "--img_size", "64",  # VGG16 trunk is size-agnostic; 64px cuts the
        # conv FLOPs ~12x so the search-loop test stays CI-sized
        "--vocab_dir", str(tmp_path / "vocab"),
        "--ckpt", str(tmp_path / "ckpt"),
    ])
    out = capsys.readouterr().out
    assert "Starting Bayesian Optimization with 2 trials" in out
    assert "optuna best lr:" in out
    assert "panesar training complete" in out
    assert (tmp_path / "ckpt").exists()


@pytest.mark.slow
def test_optuna_lr_search_with_stub(tmp_path, capsys, monkeypatch):
    if "optuna" in sys.modules or _has_optuna():
        pytest.skip("real optuna installed; covered by the other test")
    mod, exceptions = _optuna_stub()
    monkeypatch.setitem(sys.modules, "optuna", mod)
    monkeypatch.setitem(sys.modules, "optuna.exceptions", exceptions)
    _run_search(tmp_path, capsys)


@pytest.mark.slow
def test_optuna_lr_search_real(tmp_path, capsys):
    pytest.importorskip("optuna")
    _run_search(tmp_path, capsys)


def _has_optuna() -> bool:
    import importlib.util

    return importlib.util.find_spec("optuna") is not None
