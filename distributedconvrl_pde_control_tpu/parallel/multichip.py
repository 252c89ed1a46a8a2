"""Full multi-chip DDPG training step: DP env batch x SP spatial sharding.

This is the scale-out centerpiece (BASELINE.json config "512^2 2D grid
spatially sharded across a v5e-8"): a `shard_map` over a ('dp', 'sp') mesh
where

  * the env batch is sharded over `dp` (each dp group trains on its own
    envs; DDPG gradients are `pmean`'d over dp — synchronous data-parallel);
  * each environment's 2D vorticity field is sharded over `sp`
    (x-pencil spectra / y-pencil real blocks, transpose-FFT solver from
    `parallel.ns_sharded`, sensor readouts as partial matmuls + `psum`);
  * network parameters, optimizer state, and the policy-noise stream are
    replicated (keys are folded with the dp index ONLY, so every sp member
    of a dp group applies identical actions to its slice of the field).

Everything — solver substeps, featurization, policy, replay pushes, gradient
steps, episode auto-reset — is one jitted SPMD program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig, DDPGState
from distributedconvrl_pde_control_tpu.agents.replay import (
    Replay,
    replay_init,
    replay_sample,
)
from distributedconvrl_pde_control_tpu.envs.features import _window_stack_2d, taylor_kernels_2d
from distributedconvrl_pde_control_tpu.ops.navier_stokes import initial_condition
from distributedconvrl_pde_control_tpu.parallel.ns_sharded import (
    NSShardedSolverRI,
    ShardedOps,
    make_sharded_ops,
)


@struct.dataclass
class MCState:
    """Global (pre-shard_map) training state."""

    w: jnp.ndarray  # (B, ny, nx) float32 — REAL vorticity, y-pencil sharded
    obs: jnp.ndarray  # (B, ns, n_act)
    action: jnp.ndarray  # (B, na_rows, n_act)
    steps: jnp.ndarray  # (B,) int32
    agent: DDPGState  # replicated
    replay: Replay  # arrays lead with the dp dimension
    key: jnp.ndarray  # replicated
    mean_reward: jnp.ndarray  # scalar diagnostics


@dataclasses.dataclass(frozen=True)
class MultichipFluidConfig:
    nx: int = 128
    lx: float = 1.0
    nu: float = 5e-5
    sensors_per_axis: int = 8
    variance: float = 0.08
    te: float = 6.0
    dt: float = 0.02
    oversampling: int = 8
    max_reward: float = 3.0
    agent_power: float = 70.0
    action_punish: float = 0.002
    delta_action_punish: float = 0.002
    sensor_scale: float = 1.0 / 70.0
    reward_norm: float = 320.0
    reward_pow: float = 1.1
    window_size: int = 3
    n_envs: int = 8
    batch_size: int = 32
    update_loops: int = 1
    capacity_per_dp: int = 50_000

    @property
    def n_act(self) -> int:
        return self.sensors_per_axis**2

    @property
    def ns(self) -> int:
        return self.window_size**2

    @property
    def max_steps(self) -> int:
        return int(round(self.te / self.dt))


class MultichipFluidTrainer:
    """Builds the sharded arrays and the jitted SPMD train-step program."""

    def __init__(self, cfg: MultichipFluidConfig, mesh: Mesh,
                 agent_cfg: DDPGConfig | None = None):
        assert "dp" in mesh.axis_names and "sp" in mesh.axis_names
        self.cfg = cfg
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        self.n_sp = mesh.shape["sp"]
        assert cfg.nx % self.n_sp == 0, "grid must divide over sp"
        assert cfg.n_envs % self.n_dp == 0, "env batch must divide over dp"
        self.solver = NSShardedSolverRI(nu=cfg.nu, sp_axis="sp")
        self.ops = make_sharded_ops(cfg.nx, cfg.nx, cfg.lx, cfg.lx)

        n = cfg.nx
        positions = [
            (i, j)
            for i in range(1, n + 1, n // cfg.sensors_per_axis)
            for j in range(1, n + 1, n // cfg.sensors_per_axis)
        ]
        sens = taylor_kernels_2d(positions, n, n, cfg.lx, cfg.lx, cfg.variance, norm_mode=1)
        acts = taylor_kernels_2d(positions, n, n, cfg.lx, cfg.lx, cfg.variance, norm_mode=2)
        self.sensor_kernels = jnp.asarray(sens, jnp.float32)  # (n_act, ny, nx)
        self.actuator_kernels = jnp.asarray(acts, jnp.float32)

        self.agent = DDPGAgent(agent_cfg or DDPGConfig(
            ns=cfg.ns, na_rows=1, n_actuators=cfg.n_act,
            nna_scale=1.8, nna_scale_critic=17.0, drop_middle_layer=True,
            start_steps=2, update_after=2, capacity=cfg.capacity_per_dp,
        ))

        self._specs = dict(
            w=P("dp", "sp", None),  # y-pencil: rows sharded over sp
            obs=P("dp"),
            action=P("dp"),
            steps=P("dp"),
            agent=P(),
            replay=P("dp"),
            key=P(),
            mean_reward=P(),
        )
        self._ops_spec = P(None, "sp")  # x-pencil operator slices
        self._kern_spec = P(None, "sp", None)  # y-pencil kernel slices

    # -------------------------------------------------------------- helpers
    def _sensor_dots(self, w_local, sens_local):
        """Per-env sensor inner products with psum over sp.

        w_local: (Bl, ny/S, nx) real y-pencil blocks -> (Bl, n_act) dots."""
        flat = w_local.reshape(w_local.shape[0], -1)
        partial_dots = flat @ sens_local.reshape(self.cfg.n_act, -1).T
        return jax.lax.psum(partial_dots, "sp")

    def _featurize(self, dots):
        """(Bl, n_act) sensor dots -> (Bl, ns, n_act) windowed observations."""
        spa = self.cfg.sensors_per_axis
        sensors = (dots * self.cfg.sensor_scale).reshape(-1, spa, spa)
        return jax.vmap(lambda s: _window_stack_2d(s, self.cfg.window_size))(sensors)

    # ------------------------------------------------------------------ init
    def init(self, key, seed: int = 0) -> MCState:
        cfg = self.cfg
        rng = np.random.default_rng(seed)
        w0 = np.stack([
            np.fft.ifft2(initial_condition(3, cfg.nx, cfg.nx, cfg.lx, cfg.lx, rng)).real
            for _ in range(cfg.n_envs)
        ]).astype(np.float32)
        k_agent, k_run = jax.random.split(key)
        astate = self.agent.init_state(k_agent)
        replay1 = replay_init(cfg.capacity_per_dp, cfg.ns, 1)
        replay = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n_dp,) + x.shape), replay1
        )
        # initial observations from the initial fields (computed unsharded —
        # init is host-side one-off)
        y0r = w0.reshape(cfg.n_envs, -1)
        dots = y0r @ np.asarray(self.sensor_kernels).reshape(cfg.n_act, -1).T
        obs0 = np.stack([
            np.asarray(_window_stack_2d(jnp.asarray(
                (d * cfg.sensor_scale).reshape(cfg.sensors_per_axis, cfg.sensors_per_axis)
            ), cfg.window_size))
            for d in dots
        ])
        return MCState(
            w=jnp.asarray(w0),
            obs=jnp.asarray(obs0, jnp.float32),
            action=jnp.zeros((cfg.n_envs, 1, cfg.n_act), jnp.float32),
            steps=jnp.zeros((cfg.n_envs,), jnp.int32),
            agent=astate,
            replay=replay,
            key=k_run,
            mean_reward=jnp.asarray(0.0, jnp.float32),
        )

    # ------------------------------------------------------------- the step
    def make_train_step(self):
        cfg = self.cfg
        agent = self.agent
        acfg = agent.cfg
        solver = self.solver
        n_act = cfg.n_act

        def local_step(state: MCState, ops: ShardedOps, sens, akern, w0_local):
            dp_idx = jax.lax.axis_index("dp")
            key, k_act, k_learn = jax.random.split(state.key, 3)
            k_act_dp = jax.random.fold_in(k_act, dp_idx)
            k_learn_dp = jax.random.fold_in(k_learn, dp_idx)

            bl = state.obs.shape[0]
            astate = state.agent.replace(update_step=state.agent.update_step + 1)

            # ---- policy over all local actuator columns
            obs_flat = jnp.moveaxis(state.obs, 0, 1).reshape(acfg.ns, bl * n_act)
            actions_flat = agent.act(astate, obs_flat, k_act_dp, learning=True)
            actions = jnp.moveaxis(actions_flat.reshape(1, bl, n_act), 1, 0)
            delta = actions - state.action

            # ---- forcing: real-space smear on the local y-pencil rows
            f_real = cfg.agent_power * jnp.einsum(
                "bn,nyx->byx", actions[:, 0, :], akern
            )

            # ---- solver (split-component transpose-FFT RK4)
            w_new = solver.step_real(state.w, f_real, ops, cfg.dt, cfg.oversampling)

            # ---- sensors, obs, reward
            dots = self._sensor_dots(w_new, sens)  # (Bl, n_act)
            obs_new = self._featurize(dots)
            rdots = jnp.abs(dots) ** cfg.reward_pow / cfg.reward_norm
            reward = (
                -jnp.abs(rdots)
                - cfg.action_punish * actions[:, 0, :] ** 2
                - cfg.delta_action_punish * delta[:, 0, :] ** 2
            )
            steps = state.steps + 1
            done = jnp.logical_or(
                steps >= cfg.max_steps,
                jnp.max(jnp.abs(reward), axis=-1) > cfg.max_reward,
            )

            # ---- replay push (local, per dp shard; identical across sp)
            rb = jax.tree.map(lambda x: x[0], state.replay)
            n_push = bl * n_act
            capacity = rb.s.shape[0]
            idx = (rb.ptr + jnp.arange(n_push, dtype=jnp.int32)) % capacity
            t_flat = jnp.repeat(done.astype(jnp.float32), n_act)
            rb = rb.replace(
                s=rb.s.at[idx].set(obs_flat.T),
                a=rb.a.at[idx].set(actions_flat.T),
                r=rb.r.at[idx].set(reward.reshape(-1)),
                t=rb.t.at[idx].set(t_flat),
                sn=rb.sn.at[idx].set(jnp.moveaxis(obs_new, 0, 1).reshape(acfg.ns, -1).T),
                ptr=(rb.ptr + n_push) % capacity,
                size=jnp.minimum(rb.size + n_push, capacity),
            )

            # ---- learning: local sample, dp-pmean'd gradients
            can = rb.size > acfg.update_after * n_act

            def do_learn(a):
                def one(a, k):
                    batch = replay_sample(rb, k, cfg.batch_size, 0)
                    return agent.learn_batch(a, batch, axis_name="dp"), None

                a, _ = jax.lax.scan(
                    one, a, jax.random.split(k_learn_dp, cfg.update_loops)
                )
                return a

            # NOTE: both branches run pmean-compatible code on every dp
            # member because `can` is replicated (same replay schedule).
            astate = jax.lax.cond(can, do_learn, lambda a: a, astate)

            # ---- auto-reset finished envs to the initial condition
            donec = done.reshape(bl, 1, 1)
            w_out = jnp.where(donec, w0_local, w_new)
            obs0 = self._featurize(self._sensor_dots(w0_local, sens))
            obs_out = jnp.where(donec, obs0, obs_new)
            action_out = jnp.where(donec, jnp.zeros_like(actions), actions)
            steps_out = jnp.where(done, 0, steps)

            mean_r = jax.lax.pmean(jnp.mean(reward), "dp")
            return MCState(
                w=w_out,
                obs=obs_out,
                action=action_out,
                steps=steps_out,
                agent=astate,
                replay=jax.tree.map(lambda x: x[None], rb),
                key=key,
                mean_reward=mean_r,
            )

        state_specs = MCState(
            w=self._specs["w"], obs=self._specs["obs"], action=self._specs["action"],
            steps=self._specs["steps"], agent=self._specs["agent"],
            replay=self._specs["replay"], key=self._specs["key"],
            mean_reward=self._specs["mean_reward"],
        )
        ops_specs = jax.tree.map(lambda _: self._ops_spec, self.ops)

        sharded = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(state_specs, ops_specs, self._kern_spec, self._kern_spec,
                      P("dp", "sp", None)),
            out_specs=state_specs,
            check_vma=False,
        )

        def train_step(state: MCState, w0):
            return sharded(state, self.ops, self.sensor_kernels, self.actuator_kernels, w0)

        return jax.jit(train_step)
