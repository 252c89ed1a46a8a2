"""Round-2 8x8 opposition-gap experiments (VERDICT #5): the reference's own
observation extensions — temporal stacking and action memory
(KSSetup.jl:209-228) — applied to the fluid task. Trains each variant with
the full reference budget (adaptive recipe) and evaluates the te=3 energy
protocol. Temporary driver script; results land in RESULTS.md."""

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from distributedconvrl_pde_control_tpu import configs as C
from distributedconvrl_pde_control_tpu.train import checkpoint
from distributedconvrl_pde_control_tpu.train.drivers import train
from distributedconvrl_pde_control_tpu.train.eval import actor_policy, energy_eval

VARIANTS = [
    ("Fluid_8_temporal2", dict(temporal_steps=2)),
    ("Fluid_8_memory1", dict(memory_size=1)),
    ("Fluid_8_temporal2_mem1", dict(temporal_steps=2, memory_size=1)),
]

for name, over in VARIANTS:
    cfg = dataclasses.replace(C.FLUID_8, name=name, **over)
    setup = C.build_fluid(cfg)
    t0 = time.time()
    ts, hook = train(setup, verbose=False)
    wall = time.time() - t0
    out = os.path.join("runs", name)
    checkpoint.save(out, ts, hook, include_replay=False)
    actor = (jax.tree.map(jnp.asarray, hook.best_actor)
             if hook.best_actor is not None else ts.agent.actor)
    tr = energy_eval(setup.env, actor_policy(setup.agent, actor), te=3.0)
    r, act = tr["reward"], tr["active"]
    print(json.dumps({
        "variant": name, "best_train_reward": round(hook.bestreward, 4),
        "mean_energy_te3": round(tr["mean_energy"], 3),
        "mean_step_reward": round(float(r[act].mean()), 5),
        "train_seconds": round(wall, 1),
    }), flush=True)
