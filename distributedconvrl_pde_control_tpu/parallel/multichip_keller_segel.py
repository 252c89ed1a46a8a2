"""Preset-driven multi-chip training for the Keller-Segel family.

Same DP x SP architecture as the fluid trainer (`parallel.multichip`,
whose docstring is the architecture reference): the env batch shards over
`dp`, each environment's (2, nx) field shards over `sp` along the grid
axis, and the solver communicates through `ppermute` halo exchange
(`parallel.keller_segel_sharded`) instead of the fluid's transpose-FFT —
the stencil counterpart of the spectral pattern. Reuses the full generic
training machinery of `ShardedFluidTrainer` (replay invariant, dp-pmean
learning, episode accounting, on-device best tracking, checkpoints) and
overrides only the physics surface:

  * solver step: batched halo-exchange RK4 (KellerSegelSetup.jl:213-239,
    fixed-substep oversampling as the env installs);
  * sensors: per-field rectangle dots <y_f, rect_i> as partial matmuls +
    psum over sp (prepare_rectangles, KellerSegelSetup.jl:112-128);
  * featurization: `TwoFieldFeaturizer.from_dots` (windows over both
    fields, temporal stacking — KellerSegelSetup.jl:265-316);
  * reward: -(<u-1, rect>^2 / 800) on the actuator-mapped kernels
    (KellerSegelSetup.jl:241-263), with <u-1, rect> = <u, rect> - sum(rect)
    so it works directly from the raw dots;
  * forcing: enters the v (chemoattractant) equation only
    (KellerSegelSetup.jl:228);
  * eval diagnostic: mean |u - 1| (the u -> 1 regulation target).

At the reference's nx=100 this exists for completeness-at-scale (ROADMAP
gap #3): sharding a 100-point grid buys nothing, but the same program
scales the grid across a mesh unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig
from distributedconvrl_pde_control_tpu.configs.keller_segel import KellerSegelConfig
from distributedconvrl_pde_control_tpu.envs.features import (
    TwoFieldFeaturizer,
    rectangle_kernels_1d,
)
from distributedconvrl_pde_control_tpu.parallel.keller_segel_sharded import (
    KellerSegelShardedSolver,
)
from distributedconvrl_pde_control_tpu.parallel.multichip import (
    MCState,
    ShardedFluidTrainer,
    ShardedTrainConfig,
)


class ShardedKellerSegelTrainer(ShardedFluidTrainer):
    """Keller-Segel twin of the fluid sharded trainer (module docstring)."""

    def __init__(self, cfg: KellerSegelConfig, mesh: Mesh,
                 tcfg: ShardedTrainConfig = ShardedTrainConfig()):
        import math

        assert "dp" in mesh.axis_names and "sp" in mesh.axis_names
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        self.n_sp = mesh.shape["sp"]
        n = cfg.nx
        self.n = n
        assert n % self.n_sp == 0, "grid must divide over sp"
        assert tcfg.n_envs % self.n_dp == 0, "env batch must divide over dp"
        self.solver = KellerSegelShardedSolver(nx=n, lx=cfg.lx, sp_axis="sp")
        self.ops = ()  # stencil solver: no precomputed operator arrays

        sens = rectangle_kernels_1d(cfg.sensor_positions, n, cfg.half_window)
        a2s = cfg.actuators_to_sensors
        n_act = len(a2s)
        self.n_act = n_act
        self.sensor_kernels = jnp.asarray(sens, jnp.float32)  # (n_sens, nx)
        self.actuator_kernels = jnp.asarray(sens[a2s], jnp.float32)  # (n_act, nx)
        # <u-1, rect> = <u, rect> - sum(rect), per actuator-mapped kernel
        self._rect_sums = jnp.asarray(sens[a2s].sum(axis=1), jnp.float32)
        self._a2s = np.asarray(a2s)
        self.featurizer = TwoFieldFeaturizer(
            sensor_matrix=jnp.asarray(sens, jnp.float32),
            actuators_to_sensors=a2s,
            scale=cfg.sensor_scale,
            window_size=cfg.window_size,
            temporal_steps=cfg.temporal_steps,
            memory_size=cfg.memory_size,
            sees_action=cfg.sees_action,
            action_rows=1 + cfg.memory_size,
        )
        # push-rounded, stored on self: the inherited init() builds the
        # replay at this size (see ShardedFluidTrainer.__init__)
        push = (tcfg.n_envs // self.n_dp) * n_act
        self.capacity_per_dp = ((tcfg.capacity_per_dp + push - 1) // push) * push
        capacity = self.capacity_per_dp
        self.agent = DDPGAgent(DDPGConfig(
            ns=self.featurizer.obs_dim,
            na_rows=1 + cfg.memory_size,
            n_actuators=n_act,
            gamma=cfg.gamma,
            polyak=cfg.polyak,
            batch_size=tcfg.batch_size,
            start_steps=cfg.start_steps,
            start_policy=cfg.start_policy,
            update_after=cfg.update_after,
            update_freq=cfg.update_freq,
            update_loops=tcfg.update_loops,
            act_limit=cfg.act_limit,
            act_noise=cfg.act_noise,
            memory_size=cfg.memory_size,
            nna_scale=cfg.nna_scale,
            nna_scale_critic=cfg.nna_scale_critic,
            drop_middle_layer=cfg.drop_middle_layer,
            learning_rate=cfg.learning_rate,
            learning_rate_critic=cfg.learning_rate_critic,
            capacity=capacity,
        ))
        self.max_steps = int(math.ceil((cfg.te - cfg.t0) / cfg.dt - 1e-9))

        acfg = self.agent.cfg
        self._w_spec = P("dp", None, "sp")  # (B, 2, nx): grid axis sharded
        self._state_specs = MCState(
            w=self._w_spec,
            obs=P("dp"),
            action=P("dp"),
            steps=P("dp"),
            ep_reward=P("dp"),
            agent=P(),
            replay=P("dp"),
            key=P(),
            global_step=P(),
            ep_count=P(),
            best_reward=P(),
            best_episode=P(),
            best_actor=P(),
            mean_reward=P(),
        )
        self._ops_spec = ()
        self._kern_spec = P(None, "sp")  # (n_kernels, nx) grid-axis slices
        self._pool_spec = P(None, None, "sp")
        self._acfg = acfg

    # ------------------------------------------------------- physics surface
    def _solver_step(self, w_local, f_local, ops):
        cfg = self.cfg
        return jax.vmap(
            lambda y, f: self.solver.step(y, f, cfg.dt, cfg.oversampling)
        )(w_local, f_local)

    def _forcing(self, actions, akern_local):
        """Forcing field for the v equation (prepare_action,
        KellerSegelSetup.jl: agent_power * a @ rects)."""
        return self.cfg.agent_power * jnp.einsum(
            "bn,nx->bx", actions[:, 0, :], akern_local)

    def _sensor_dots(self, w_local, sens_local):
        """(Bl, 2, nx/S) blocks -> (Bl, 2, n_sens) raw dots, psum'd over sp."""
        partial_dots = jnp.einsum("bfx,sx->bfs", w_local, sens_local)
        return jax.lax.psum(partial_dots, "sp")

    def _sensor_dots_host(self, w0: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(np.einsum(
            "bfx,sx->bfs", w0, np.asarray(self.sensor_kernels)))

    def _reward(self, dots, actions, delta):
        """KellerSegelSetup.jl:241-263 from raw dots (see module docstring)."""
        cfg = self.cfg
        du = dots[:, 0, self._a2s] - self._rect_sums[None, :]
        return (
            -jnp.abs(du**2 / cfg.reward_norm)
            - cfg.action_punish * actions[:, 0, :] ** 2
            - cfg.delta_action_punish * delta[:, 0, :] ** 2
        )

    def _error_flags(self, w_local):
        """No corrupted-field detector for this family: the reference's
        error_detection exists only in the fluid setup (FluidSetup.jl:263-273);
        KellerSegelSetup.jl installs none, so diverged episodes are never
        flagged as corrupted here (parity)."""
        return jnp.zeros((w_local.shape[0],), bool)

    def _eval_metric(self, w_local):
        """Mean |u - 1| — the chemotaxis regulation diagnostic (RESULTS.md)."""
        bl = w_local.shape[0]
        return jax.lax.psum(
            jnp.sum(jnp.abs(w_local[:, 0, :] - 1.0), axis=-1), "sp") / self.n

    def _make_pool(self, seed: int) -> np.ndarray:
        """Fresh-IC pool: generate_random_init (KellerSegelSetup.jl:373-384),
        NumPy twin of configs.keller_segel.build_keller_segel.random_init."""
        cfg = self.cfg
        rng = np.random.default_rng(seed)
        n_sin = int(np.ceil(cfg.lx / 3.0))
        dx = cfg.lx / cfg.nx
        x = np.arange(1, cfg.nx + 1, dtype=np.float32) * dx
        scale = 2.0 * np.pi * (cfg.lx / 22.0)
        harmonics = np.stack([np.sin(i * x / scale) for i in range(1, n_sin + 1)])
        pool = []
        for _ in range(self.tcfg.y0_pool_size):
            a = rng.uniform(-1.0, 1.0, 2 * n_sin).astype(np.float32)
            a = a / np.linalg.norm(a)
            pool.append(np.stack([1.0 + a[:n_sin] @ harmonics,
                                  1.0 + a[n_sin:] @ harmonics]))
        return np.stack(pool).astype(np.float32)

    def eval_w0(self, n_envs: int | None = None) -> jnp.ndarray:
        """Evaluation initial fields: seeded random perturbed inits (the
        RESULTS.md Keller-Segel protocol)."""
        from jax.sharding import NamedSharding

        n_envs = n_envs or self.tcfg.n_envs
        pool = self._make_pool(self.cfg.seed)
        w0 = pool[np.arange(n_envs) % pool.shape[0]]
        return jax.device_put(jnp.asarray(w0),
                              NamedSharding(self.mesh, self._w_spec))
