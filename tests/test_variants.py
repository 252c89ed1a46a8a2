"""Mono/global agent, action-memory, and profiling-utility coverage."""

import dataclasses

import jax
import numpy as np

from distributedconvrl_pde_control_tpu.configs import KS22, KS22_GLOBAL
from distributedconvrl_pde_control_tpu.configs.ks import build_ks, build_ks_global
from distributedconvrl_pde_control_tpu.train.drivers import train


def test_mono_agent_trains():
    """Global-agent ablation (KSglobalSetup.jl): scalar reward, one big MLP,
    flat action vector; shrunk nets for test speed."""
    cfg = dataclasses.replace(KS22_GLOBAL, nna_scale=1.0, nna_scale_critic=2.0,
                              capacity=20_000)
    setup = build_ks_global(cfg)
    assert setup.agent.cfg.mono
    ts, hook = train(setup, loops=2, no_steps=150, verbose=False)
    assert len(hook.rewards) >= 4
    assert all(np.isfinite(hook.rewards))
    # mono reward is a scalar mean: episode sums land in the per-episode range
    assert all(r < 0 for r in hook.rewards)


def test_action_memory_variant_trains():
    """memory_size > 0: the actor emits extra rows that are fed back as
    state and excluded from exploration noise (KSSetup.jl:39, PDEagent.jl:201)."""
    cfg = dataclasses.replace(KS22, memory_size=2, capacity=20_000)
    setup = build_ks(cfg)
    assert setup.agent.cfg.na_rows == 3
    assert setup.agent.cfg.ns == 1 + 2  # window + memory rows
    ts, hook = train(setup, loops=1, no_steps=120, verbose=False)
    assert all(np.isfinite(hook.rewards))


def test_step_timer_and_trace(tmp_path):
    from distributedconvrl_pde_control_tpu.utils.profiling import StepTimer, trace

    t = StepTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()

    import jax.numpy as jnp

    with trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # a profile directory appears
    import os

    assert any(os.scandir(tmp_path))
