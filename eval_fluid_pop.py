"""Evaluate a fluid population's members on the standard energy protocol.

One te=6 rollout per member on the STANDARD adaptive env (the preset the
recommended artifacts are scored on, RESULTS.md fluid tables), reporting
mean energy over the te=2 / te=3 / te=6 prefixes (the reference's testrun
energy metric sum|omega|/(nx*ny), FluidSetup.jl:497-500) plus the
corrected-opposition and no-action baselines from the same ICs.

Usage:
    python eval_fluid_pop.py [pop_dir] [preset] [n_members]
defaults: artifacts/Fluid_8_tp_pop8 Fluid_8 8

Per-member reproduction via the CLI:
    run.py <preset> --eval --load-from <pop_dir>/member_XX --p-te 3
"""

import json
import sys

import jax
import numpy as np

from distributedconvrl_pde_control_tpu.experiments.run import build_setup
from distributedconvrl_pde_control_tpu.agents.policies import (
    NegatePolicy,
    ZeroPolicy,
    negate_center_row,
)
from distributedconvrl_pde_control_tpu.train import checkpoint
from distributedconvrl_pde_control_tpu.train.eval import (
    actor_policy,
    energy_eval,
)
from distributedconvrl_pde_control_tpu.train.loop import init_train_state


def prefix_means(traces, env, tes=(2.0, 3.0, 6.0)):
    e = np.asarray(traces["energy"])
    m = np.asarray(traces["active"])
    out = {}
    for te in tes:
        n = min(int(round(te / env.dt)), len(e))
        ei, mi = e[:n], m[:n]
        out[f"te{te:g}"] = round(float(ei[mi].mean()), 3) if mi.any() else None
    return out


def main():
    pop_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/Fluid_8_tp_pop8"
    preset = sys.argv[2] if len(sys.argv) > 2 else "Fluid_8"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    setup = build_setup(preset)
    env = setup.env
    tmpl = init_train_state(env, setup.agent, jax.random.PRNGKey(0))
    import jax.numpy as jnp

    for i in range(n):
        ts, hook = checkpoint.load(f"{pop_dir}/member_{i:02d}", tmpl)
        actor = hook.best_actor if hook.best_actor is not None else ts.agent.actor
        pol = actor_policy(setup.agent, jax.tree.map(jnp.asarray, actor))
        tr = energy_eval(env, pol, te=6.0)
        print(json.dumps({"member": i, **prefix_means(tr, env),
                          "mean_step_reward": round(
                              float(np.asarray(tr["reward"])[
                                  np.asarray(tr["active"])].mean()), 5)}),
              flush=True)
    neg = NegatePolicy(env.action_shape,
                       center_row=negate_center_row(env.featurize))
    for name, polb in (("negate", neg), ("no_action", ZeroPolicy(env.action_shape))):
        tr = energy_eval(env, polb, te=6.0)
        print(json.dumps({"baseline": name, **prefix_means(tr, env)}), flush=True)


if __name__ == "__main__":
    main()
