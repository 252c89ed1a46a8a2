"""Hyperopt search driver tests (train/hyperopt.py)."""

import dataclasses

import numpy as np

from distributedconvrl_pde_control_tpu.train.hyperopt import (
    SEARCH_SPACE,
    sample_trial,
    search,
)


def test_sample_trial_respects_space_and_seed():
    rng = np.random.default_rng(7)
    t1 = sample_trial(rng)
    rng = np.random.default_rng(7)
    t2 = sample_trial(rng)
    assert t1 == t2  # seeded determinism
    assert set(t1) == set(SEARCH_SPACE)
    assert 1.0 <= t1["nna_scale"] <= 12.0
    assert t1["batch_size"] in (3, 8, 16, 32)
    assert isinstance(t1["drop_middle_layer"], bool)


def test_search_tracks_best_and_survives_bad_trials(monkeypatch):
    """The loop scores trials with hyperopt_objective, keeps the argmin, and
    treats a crashing config as a bad trial rather than aborting."""
    import distributedconvrl_pde_control_tpu.train.hyperopt as H

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        nna_scale: float = 1.0
        nna_scale_critic: float = 10.0
        drop_middle_layer: bool = True
        gamma: float = 0.99
        polyak: float = 0.995
        batch_size: int = 3
        update_freq: int = 1
        capacity: int = 1000
        learning_rate: float = 1e-3
        act_noise: float = 1.0

    calls = {"n": 0}

    def fake_objective(setup, n_episodes):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("diverged")
        return float(10 - calls["n"])  # trial 3 (cost 7) is best

    monkeypatch.setattr(
        "distributedconvrl_pde_control_tpu.train.drivers.hyperopt_objective",
        fake_objective,
    )
    best, trials = search(Cfg(), build_fn=lambda cfg: cfg, n_trials=3,
                          seed=0, n_episodes=1, verbose=False)
    assert calls["n"] == 3
    assert len(trials) == 3
    assert trials[1]["cost"] is None and "error" in trials[1]
    assert best["trial"] == 2 and best["cost"] == 7.0

    # an explicit objective callable overrides the default scorer
    # (the CLI's --hyperopt-robust path)
    seen = []

    def custom(setup, n_episodes):
        seen.append(n_episodes)
        return float(len(seen))

    best, trials = search(Cfg(), build_fn=lambda cfg: cfg, n_trials=2,
                          seed=0, n_episodes=5, verbose=False,
                          objective=custom)
    assert seen == [5, 5]
    assert best["trial"] == 0 and best["cost"] == 1.0
