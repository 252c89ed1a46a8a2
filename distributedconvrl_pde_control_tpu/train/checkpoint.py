"""Checkpoint/resume of agent + hook.

Rebuild of the reference's JLD2 `save()/load()` (KSSetup.jl:378-402): the
whole agent (networks + optimizer state + replay buffer + schedule counters)
and the hook (reward history, best-actor params, best trajectory) round-trip
to disk, with optional numbering for `train_multi`'s per-experiment saves
(KSSetup.jl:354-356).

Format: flax msgpack for the TrainState pytree, npz+json for the hook.
Complex arrays are split to real/imag on save (some TPU runtimes cannot
transfer complex device buffers to host).

An Orbax backend (SURVEY §5.4's planned ecosystem format) is available via
`save(..., backend="orbax")`: the TrainState pytree goes through
`orbax.checkpoint.StandardCheckpointer` (a `saves/agent_orbax*` directory)
while the hook keeps the shared npz format. `load()` auto-detects which
backend wrote a checkpoint, so the two are interchangeable on disk.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
from distributedconvrl_pde_control_tpu.train.loop import TrainState
from distributedconvrl_pde_control_tpu.utils.hostarray import to_numpy


def _paths(dirpath: str, number: Optional[int], light: bool = False):
    os.makedirs(os.path.join(dirpath, "saves"), exist_ok=True)
    suffix = "" if number is None else str(number)
    name = "agent_light" if light else "agent"
    return (
        os.path.join(dirpath, "saves", f"{name}{suffix}.msgpack"),
        os.path.join(dirpath, "saves", f"hook{suffix}.npz"),
    )


def _orbax_path(dirpath: str, number: Optional[int], light: bool = False) -> str:
    suffix = "" if number is None else str(number)
    name = "agent_orbax_light" if light else "agent_orbax"
    # orbax requires absolute paths
    return os.path.abspath(os.path.join(dirpath, "saves", f"{name}{suffix}"))


def save(dirpath: str, ts: TrainState, hook: PDEHook, number: Optional[int] = None,
         include_replay: bool = True,
         config_overrides: Optional[dict] = None,
         backend: str = "msgpack") -> None:
    """include_replay=False writes a "light" checkpoint (networks, optimizer
    state, counters — no replay buffer): loading resumes with a fresh buffer,
    which is what shipping pretrained policies needs (the reference's JLD2
    blobs embed the buffer and several exceed its repo's LFS limits,
    .MISSING_LARGE_BLOBS).

    `config_overrides`: for artifacts trained OFF-preset (hyperopt winners),
    the dict of config-dataclass fields that were replaced on the preset
    config. Written as `config_overrides.json` in `dirpath`; the CLI's
    --load-from applies it before building the load template, so off-preset
    artifacts stay loadable (the reference has no such problem — JLD2
    serializes the whole Flux network, KSSetup.jl:378-402).

    `backend`: "msgpack" (default) or "orbax" for the TrainState pytree;
    the hook always uses the shared npz format and `load()` auto-detects."""
    if config_overrides:
        save_config_overrides(dirpath, config_overrides)
    agent_path, hook_path = _paths(dirpath, number, light=not include_replay)
    if include_replay:
        host_ts = jax.tree.map(to_numpy, ts)
    else:
        host_ts = jax.tree.map(to_numpy, {"agent": ts.agent, "key": ts.key})
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        path = _orbax_path(dirpath, number, light=not include_replay)
        if os.path.exists(path):
            shutil.rmtree(path)
        ck = ocp.StandardCheckpointer()
        ck.save(path, host_ts)
        ck.wait_until_finished()
    elif backend == "msgpack":
        with open(agent_path, "wb") as f:
            f.write(serialization.to_bytes(host_ts))
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")

    payload = {
        "rewards": np.asarray(hook.rewards, np.float64),
        "rewards_compare": np.asarray(hook.rewards_compare, np.float64),
        "errored_episodes": np.asarray(hook.errored_episodes, np.int64),
        "meta": np.frombuffer(
            json.dumps({
                "bestreward": hook.bestreward,
                "bestepisode": hook.bestepisode,
                "ep": hook.ep,
                "min_best_episode": hook.min_best_episode,
            }).encode(),
            dtype=np.uint8,
        ),
    }
    if hook.best_actor is not None:
        for i, layer in enumerate(hook.best_actor):
            payload[f"best_actor_w{i}"] = to_numpy(layer["w"])
            payload[f"best_actor_b{i}"] = to_numpy(layer["b"])
    if hook.best_trace is not None:
        for k, v in hook.best_trace.items():
            payload[f"best_trace_{k}"] = np.asarray(v)
    np.savez_compressed(hook_path, **payload)


def save_config_overrides(dirpath: str, config_overrides: dict) -> None:
    """Write the off-preset config deltas next to a checkpoint (see save())."""
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "config_overrides.json"), "w") as f:
        json.dump(config_overrides, f, indent=1, sort_keys=True)


def load_config_overrides(dirpath: str) -> Optional[dict]:
    """The config-dataclass overrides an off-preset artifact was trained
    with (see save()'s `config_overrides`), or None when the artifact was
    trained at the preset config."""
    path = os.path.join(dirpath, "config_overrides.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_ppo(dirpath: str, pstate, info: dict) -> None:
    """Checkpoint a PPO run: PPOState pytree (msgpack) + reward history and
    best params (npz). The PPO analogue of save() for the alternative agent
    family (create_agent_ppo, PDEagent.jl:462-512)."""
    os.makedirs(os.path.join(dirpath, "saves"), exist_ok=True)
    host = jax.tree.map(to_numpy, pstate)
    with open(os.path.join(dirpath, "saves", "ppo.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host))
    payload = {
        "rewards": np.asarray(info["rewards"], np.float64),
        "meta": np.frombuffer(json.dumps({
            "best_reward": float(info["best_reward"]),
            "best_iter": int(info["best_iter"]),
            # eval-driven selection trail (train_ppo eval_every>0): which
            # metric picked best_params, and the (iter, eval reward) curve
            "selection": info.get("selection", "rollout"),
            "evals": [[int(i), float(r)] for i, r in info.get("evals", [])],
        }).encode(), dtype=np.uint8),
    }
    if info.get("best_params") is not None:
        flat, _ = jax.tree_util.tree_flatten_with_path(info["best_params"])
        for path, leaf in flat:
            payload["best_" + jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez_compressed(os.path.join(dirpath, "saves", "ppo_info.npz"), **payload)


def load_ppo(dirpath: str, pstate_template):
    """Returns (PPOState, info dict incl. best_params when stored)."""
    with open(os.path.join(dirpath, "saves", "ppo.msgpack"), "rb") as f:
        pstate = serialization.from_bytes(pstate_template, f.read())
    pstate = jax.tree.map(jax.numpy.asarray, pstate)
    data = np.load(os.path.join(dirpath, "saves", "ppo_info.npz"), allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    info = {"rewards": data["rewards"], **meta}
    best_keys = [k for k in data.files if k.startswith("best_")]
    if best_keys:
        # rebuild the params dict against the template's structure
        params_tmpl = {"trunk": pstate.trunk, "mu": pstate.mu,
                       "logsig": pstate.logsig, "critic": pstate.critic}
        flat, treedef = jax.tree_util.tree_flatten_with_path(params_tmpl)
        leaves = [jax.numpy.asarray(data["best_" + jax.tree_util.keystr(p)])
                  for p, _ in flat]
        info["best_params"] = jax.tree_util.tree_unflatten(treedef, leaves)
    return pstate, info


def load(dirpath: str, ts_template: TrainState, number: Optional[int] = None):
    """Returns (TrainState, PDEHook). `ts_template` supplies the pytree
    structure/shapes (build it with `init_train_state` on the same setup).
    Accepts full and light checkpoints (light: fresh replay buffer) from
    either backend (msgpack file or orbax directory), auto-detected."""
    agent_path, hook_path = _paths(dirpath, number)
    light_path, _ = _paths(dirpath, number, light=True)
    orbax_path = _orbax_path(dirpath, number)
    orbax_light_path = _orbax_path(dirpath, number, light=True)
    if os.path.isdir(orbax_path) or os.path.isdir(orbax_light_path):
        import orbax.checkpoint as ocp

        ck = ocp.StandardCheckpointer()
        if os.path.isdir(orbax_path):
            tmpl = jax.tree.map(to_numpy, ts_template)
            ts = ck.restore(orbax_path, tmpl)
        else:
            tmpl = jax.tree.map(
                to_numpy, {"agent": ts_template.agent, "key": ts_template.key})
            part = ck.restore(orbax_light_path, tmpl)
            ts = ts_template.replace(agent=part["agent"], key=part["key"])
    elif os.path.exists(agent_path):
        with open(agent_path, "rb") as f:
            ts = serialization.from_bytes(ts_template, f.read())
        # Older full checkpoints stored replay state/action arrays row-major
        # (capacity, dim); the buffer is (dim, capacity) since the TPU
        # layout change (agents/replay.py LAYOUT note). Transpose on load.
        tmpl_rb = ts_template.replay
        rb = ts.replay
        if rb.s.ndim == 2 and rb.s.shape != tmpl_rb.s.shape:
            if rb.s.shape == tmpl_rb.s.shape[::-1]:
                ts = ts.replace(replay=rb.replace(s=rb.s.T, a=rb.a.T, sn=rb.sn.T))
            else:
                # neither the current layout nor the exact row-major reverse:
                # passing it through silently corrupts replay semantics on
                # resume (e.g. a capacity change since the save)
                raise ValueError(
                    f"checkpoint replay state shape {rb.s.shape} matches "
                    f"neither the template's {tmpl_rb.s.shape} nor its "
                    f"row-major transpose; rebuild the template with the "
                    f"checkpoint's capacity to resume from it")
    else:
        template = {"agent": ts_template.agent, "key": ts_template.key}
        with open(light_path, "rb") as f:
            part = serialization.from_bytes(template, f.read())
        ts = ts_template.replace(agent=part["agent"], key=part["key"])
    ts = jax.tree.map(jax.numpy.asarray, ts)

    data = np.load(hook_path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    hook = PDEHook(min_best_episode=meta["min_best_episode"])
    hook.rewards = list(data["rewards"])
    hook.rewards_compare = list(data["rewards_compare"])
    hook.errored_episodes = list(data["errored_episodes"])
    hook.bestreward = meta["bestreward"]
    hook.bestepisode = meta["bestepisode"]
    hook.ep = meta["ep"]

    n_layers = len([k for k in data.files if k.startswith("best_actor_w")])
    if n_layers:
        hook.best_actor = [
            {"w": data[f"best_actor_w{i}"], "b": data[f"best_actor_b{i}"]}
            for i in range(n_layers)
        ]
    trace_keys = [k for k in data.files if k.startswith("best_trace_")]
    if trace_keys:
        hook.best_trace = {k[len("best_trace_"):]: data[k] for k in trace_keys}
        if "steps" in hook.best_trace:
            hook.best_trace["steps"] = int(hook.best_trace["steps"])
    return ts, hook
