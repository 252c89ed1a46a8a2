"""AOT controller export — the deployment format of a trained policy.

The reference's only deployment story is loading the JLD2 agent back into a
full Julia research stack (`scripts/KS/setup/KSSetup.jl:378-388`); the
controller cannot leave it. Here the deployed program (sensor field +
previous observation -> clamped actuator commands + next observation, the
same `control_step` the closed-loop serving probe times,
`experiments/serve.py`) is a pure jitted function, so `jax.export` lowers
it ONCE to StableHLO with the trained weights baked in as constants. The
serialized artifact runs in any process with a bare JAX runtime — no
framework code, no checkpoint parsing, no model classes — and a single
artifact can carry lowerings for several platforms (cpu + tpu), so the
controller trained on TPU deploys unchanged to a CPU edge box next to the
plant.

    python -m distributedconvrl_pde_control_tpu.experiments.run KS22 \
        --export-controller /tmp/ks22_ctrl --load-from artifacts/KS22
    python -m distributedconvrl_pde_control_tpu.experiments.serve KS22 \
        --from-export /tmp/ks22_ctrl         # framework-free latency probe
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

ARTIFACT = "controller.stablehlo"
MANIFEST = "manifest.json"


def build_control_step(setup, actor):
    """The minimal deployed program: featurize + shared-MLP actor + clamp
    (no exploration machinery). Shared by the serving probe and the
    exporter so the exported artifact is the program serve.py times."""
    env, agent = setup.env, setup.agent
    lim = agent.cfg.act_limit

    def control_step(y, obs):
        action = jnp.clip(agent.actor_apply(actor, obs), -lim, lim)
        return action, env.featurize(y, obs, action)

    return control_step


def export_controller(setup, actor, out_dir, preset="",
                      platforms=("cpu", "tpu")):
    """Serialize `control_step` for `platforms` into `out_dir`.

    Writes `controller.stablehlo` (the jax.export blob) and a
    `manifest.json` with the calling convention: argument/result shapes and
    dtypes, the control interval, and the clamp. Returns the manifest.
    """
    from jax import export as jexport

    step = build_control_step(setup, actor)
    est = setup.env.reset()
    spec = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)  # noqa: E731
    exp = jexport.export(jax.jit(step), platforms=list(platforms))(
        spec(est.y), spec(est.obs))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as f:
        f.write(exp.serialize())
    manifest = {
        "format": "jax.export/stablehlo",
        "preset": preset,
        "platforms": list(platforms),
        "args": [{"name": "y", "shape": list(est.y.shape),
                  "dtype": str(est.y.dtype)},
                 {"name": "obs", "shape": list(est.obs.shape),
                  "dtype": str(est.obs.dtype)}],
        "results": ["action (na_rows, n_actuators)", "next_obs"],
        "act_limit": float(setup.agent.cfg.act_limit),
        "control_interval_s": float(setup.env.dt),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_exported(out_dir):
    """Deserialize an exported controller. Returns (exported, manifest);
    call it as `exported.call(y, obs)`. Needs only `jax` — none of this
    framework's modules, configs, or checkpoints."""
    from jax import export as jexport

    with open(os.path.join(out_dir, ARTIFACT), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    return exp, manifest
