"""Control-loop serving probe: deploy a trained controller and measure
closed-loop latency.

The deployment story for a PDE controller is a real-time loop: sensors in ->
actuator commands out, every dt (0.1 s for KS, 20 ms for the fluid rig).
This module loads a checkpoint, compiles the minimal `obs -> action` program
(featurize + shared-MLP actor, no exploration machinery), and reports
per-step latency and headroom against the control interval.

    python -m distributedconvrl_pde_control_tpu.experiments.serve KS22 \
        --load-from artifacts/KS22
    python -m distributedconvrl_pde_control_tpu.experiments.serve KS22 \
        --from-export /tmp/ks22_ctrl   # AOT artifact, framework-free

With `--from-export` the probe times the serialized StableHLO controller
(experiments/export_controller.py) instead of compiling from the
checkpoint — the deployment configuration.
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
    ap.add_argument("--load-from")
    ap.add_argument("--from-export", metavar="DIR",
                    help="serve a jax.export artifact (export_controller.py) "
                         "— framework-free: only the blob + manifest are read")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if not (args.load_from or args.from_export):
        ap.error("one of --load-from / --from-export is required")

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.from_export:
        # deployment path: the exported StableHLO program is the controller;
        # no setup build, no checkpoint parsing. Zero inputs give the right
        # shapes/dtypes for the latency probe (manifest carries them).
        from distributedconvrl_pde_control_tpu.experiments.export_controller import (
            load_exported,
        )

        exp, manifest = load_exported(args.from_export)
        y0, obs0 = (jnp.zeros(a["shape"], a["dtype"]) for a in manifest["args"])
        control_step, dt = exp.call, manifest["control_interval_s"]
        estate_y, estate_obs = y0, obs0
    else:
        from distributedconvrl_pde_control_tpu.experiments.export_controller import (
            build_control_step,
        )
        from distributedconvrl_pde_control_tpu.experiments.run import build_setup
        from distributedconvrl_pde_control_tpu.train import checkpoint
        from distributedconvrl_pde_control_tpu.train.loop import init_train_state

        setup = build_setup(args.preset)
        template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
        ts, hook = checkpoint.load(args.load_from, template)
        actor = jax.tree.map(jnp.asarray, hook.best_actor or ts.agent.actor)
        control_step = jax.jit(build_control_step(setup, actor))
        dt = setup.env.dt
        estate = setup.env.reset()
        estate_y, estate_obs = estate.y, estate.obs

    action, obs = control_step(estate_y, estate_obs)  # compile
    jax.block_until_ready(action)

    lat = []
    y, obs_ = estate_y, estate_obs
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
        "control_interval_ms": dt * 1e3,
        "headroom_x": round(dt * 1e3 / float(np.percentile(lat, 99)), 1),
    }))


if __name__ == "__main__":
    main()
