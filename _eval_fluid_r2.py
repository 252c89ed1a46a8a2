import json
import os

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu import configs as C
from distributedconvrl_pde_control_tpu.agents.policies import NegatePolicy, ZeroPolicy
from distributedconvrl_pde_control_tpu.train import checkpoint
from distributedconvrl_pde_control_tpu.train.eval import actor_policy, energy_eval
from distributedconvrl_pde_control_tpu.train.loop import init_train_state


def best_actor(setup, d):
    tmpl = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(d, tmpl)
    a = hook.best_actor if hook.best_actor is not None else ts.agent.actor
    return jax.tree.map(jnp.asarray, a)


JOBS = [
    ("Fluid_8", C.FLUID_8, [("adaptive", "runs/Fluid_8_adaptive")], [3.0]),
    ("Fluid_16", C.FLUID_16,
     [("adaptive", "runs/Fluid_16_adaptive"), ("fixed_r1", "artifacts/Fluid_16")],
     [2.0, 6.0]),
    ("Fluid_32", C.FLUID_32,
     [("adaptive", "runs/Fluid_32_adaptive"), ("fixed_r1", "artifacts/Fluid_32")],
     [2.0, 6.0]),
]

for name, cfg, artifacts, tes in JOBS:
    setup = C.build_fluid(cfg)
    env = setup.env
    for te in tes:
        rows = {}
        for label, d in artifacts:
            a = best_actor(setup, d)
            tr = energy_eval(env, actor_policy(setup.agent, a), te=te)
            r, act = tr["reward"], tr["active"]
            rows[label] = (tr["mean_energy"], float(r[act].mean()))
        neg = NegatePolicy(env.action_shape, center_row=setup.agent.cfg.ns // 2)
        tr = energy_eval(env, neg, te=te)
        rows["negate_corrected"] = (tr["mean_energy"],
                                    float(tr["reward"][tr["active"]].mean()))
        tr = energy_eval(env, ZeroPolicy(env.action_shape), te=te)
        rows["no_action"] = (tr["mean_energy"],
                             float(tr["reward"][tr["active"]].mean()))
        print(json.dumps({"preset": name, "te": te,
                          **{k: [round(v[0], 3), round(v[1], 5)]
                             for k, v in rows.items()}}), flush=True)
