"""Evaluate a Keller-Segel population's members on the unseen-init protocol.

The r03/r04 quality protocol (RESULTS.md Keller-Segel tables): rollout
te=12 with actuation from t=4 on random perturbed inits the training never
saw (seeds 7/8/9/10), report post-control mean |u-1| over the last 10% of
steps (the control target is the homogeneous u=1 state,
KellerSegelSetup.jl:241-263; uncontrolled holds |u-1| ~= 0.50).

Usage:
    python eval_kss_pop.py [pop_dir] [n_members] [seeds...]
defaults: artifacts/KellerSegel_popsearch_pop8 8 7 8 9 10

Per-member reproduction via the CLI:
    run.py KellerSegel10_16_fast --eval --load-from <pop>/member_XX \
        --random-init --seed S
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.configs.keller_segel import (
    KELLER_SEGEL_10_16_FAST,
    build_keller_segel,
)
from distributedconvrl_pde_control_tpu.train import checkpoint
from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
from distributedconvrl_pde_control_tpu.train.loop import init_train_state


def main():
    pop_dir = (sys.argv[1] if len(sys.argv) > 1
               else "artifacts/KellerSegel_popsearch_pop8")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seeds = [int(s) for s in sys.argv[3:]] or [7, 8, 9, 10]
    setup = build_keller_segel(KELLER_SEGEL_10_16_FAST)
    env = setup.env
    tmpl = init_train_state(env, setup.agent, jax.random.PRNGKey(0))
    act_start = int(round(4.0 / env.dt))
    for i in range(n):
        ts, hook = checkpoint.load(f"{pop_dir}/member_{i:02d}", tmpl)
        actor = hook.best_actor if hook.best_actor is not None else ts.agent.actor
        pol = actor_policy(setup.agent, jax.tree.map(jnp.asarray, actor))
        row = {"member": i}
        for s in seeds:
            y0 = setup.random_init(jax.random.PRNGKey(s))
            tr = rollout(env, pol, y0=y0, te=12.0, t_action=4.0)
            dev = np.abs(np.asarray(tr["y"])[:, 0] - 1.0)
            pre = float(dev[max(0, act_start - 100):act_start].mean())
            post = float(dev[-len(dev) // 10:].mean())
            row[f"seed{s}"] = round(post, 4)
            row[f"seed{s}_supp"] = round(post / pre, 4) if pre else None
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
