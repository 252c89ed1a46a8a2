"""Control-loop serving probe: deploy a trained controller and measure
closed-loop latency.

The deployment story for a PDE controller is a real-time loop: sensors in ->
actuator commands out, every dt (0.1 s for KS, 20 ms for the fluid rig).
This module loads a checkpoint, compiles the minimal `obs -> action` program
(featurize + shared-MLP actor, no exploration machinery), and reports
per-step latency and headroom against the control interval.

    python -m distributedconvrl_pde_control_tpu.experiments.serve KS22 \
        --load-from artifacts/KS22
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    ap.add_argument("--load-from", required=True)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from distributedconvrl_pde_control_tpu.experiments.run import build_setup
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    setup = build_setup(args.preset)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(args.load_from, template)
    actor = jax.tree.map(jnp.asarray, hook.best_actor or ts.agent.actor)
    env = setup.env

    @jax.jit
    def control_step(y, obs):
        """sensor field -> clamped actuator commands (+ next obs)."""
        action = jnp.clip(setup.agent.actor_apply(actor, obs), -1.0, 1.0)
        return action, env.featurize(y, obs, action)

    estate = env.reset()
    action, obs = control_step(estate.y, estate.obs)  # compile
    jax.block_until_ready(action)

    lat = []
    y, obs_ = estate.y, estate.obs
    for _ in range(args.steps):
        t0 = time.perf_counter()
        action, obs_ = control_step(y, obs_)
        jax.block_until_ready(action)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3
    print(json.dumps({
        "preset": args.preset,
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 3),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 3),
        "control_interval_ms": env.dt * 1e3,
        "headroom_x": round(env.dt * 1e3 / float(np.percentile(lat, 99)), 1),
    }))


if __name__ == "__main__":
    main()
