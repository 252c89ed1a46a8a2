"""Integration test: tiny KS training run reaches a stabilization threshold.

This is the rebuild's version of the reference's empirical QA (SURVEY.md §4):
train the KS22 controller on a reduced budget and assert (a) the best episode
reward crosses a learning threshold and (b) the plot_heat-protocol evaluation
stabilizes the chaotic field.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.train.drivers import train
from distributedconvrl_pde_control_tpu.train.loop import make_episode_fn


@pytest.fixture(scope="module")
def trained():
    setup = build_ks(KS22)
    ts, hook = train(setup, loops=4, no_steps=400, verbose=False)
    return setup, ts, hook


def test_learning_curve_improves(trained):
    setup, ts, hook = trained
    assert hook.bestreward > -2.0, hook.rewards
    # late episodes better than early on average
    assert np.mean(hook.rewards[-8:]) > np.mean(hook.rewards[:8])


def test_stabilization_eval(trained):
    setup, ts, hook = trained
    env_eval = dataclasses.replace(setup.env, te=100.0)
    eval_fn = make_episode_fn(env_eval, setup.agent, learning=False, record=True,
                              max_steps=1000, t_action_steps=500)
    ts_eval = ts.replace(agent=ts.agent.replace(actor=jax.tree.map(jnp.asarray, hook.best_actor)))
    _, res = eval_fn(ts_eval, jnp.asarray(setup.env.y0))
    y = np.asarray(res.y_trace)
    pre = np.abs(y[400:500]).mean()
    post = np.abs(y[900:1000]).mean()
    assert post < 0.3 * pre, (pre, post)


def test_episode_counting_and_completion(trained):
    setup, ts, hook = trained
    # all KS episodes are full-length (blow-ups are rare at these settings)
    assert hook.ep - 1 == len(hook.rewards)
    assert hook.bestepisode > 0
    assert hook.best_actor is not None
