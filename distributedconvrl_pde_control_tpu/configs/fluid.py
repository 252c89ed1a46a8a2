"""2D Navier–Stokes vorticity-control presets (scripts/Fluid/*).

The reference keeps the env state as *spectral* vorticity (complex) with
featurize/reward iffting to real space and prepare_action ffting the forcing
(FluidSetup.jl:188-261). On TPU, complex dtypes are emulated (and
untransferable on some runtimes), so this build keeps the REAL vorticity
field as the env state and the solver carries (re, im) float32 spectra
internally (`NSSolver.step_real`) — numerically identical, one extra
transform pair per env step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig
from distributedconvrl_pde_control_tpu.envs.features import (
    AbsConv2DFeaturizer,
    Conv2DFeaturizer,
    taylor_kernels_2d,
)
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv
from distributedconvrl_pde_control_tpu.ops.navier_stokes import NSSolver, initial_condition
from distributedconvrl_pde_control_tpu.train.drivers import Setup


@dataclasses.dataclass(frozen=True)
class FluidConfig:
    """Constants of a fluid experiment (Fluid_8/16/32 scripts + FluidSetup.jl)."""

    name: str = "Fluid_8"
    seed: int = 531
    sensors_per_axis: int = 8
    variance: float = 0.08
    evaluation: bool = False  # eval: nx=256, seed=76 (FluidSetup.jl:33-36)
    nx: int = 128
    lx: float = 1.0
    nu: float = 5e-5
    dealias: bool = True
    # transform precision tier (ops.fourier): "auto" = f32/HIGHEST matmul-DFT
    # on TPU; "matmul_hi" (3-pass bf16) / "matmul_fast" (1-pass) are
    # measured opt-ins — the adaptive stepper's tol-1e0 floor dwarfs both
    # tiers' error (PERFORMANCE.md precision study)
    fft_mode: str = "auto"
    # transform tier for the ADVECTION evaluations inside the RK stages
    # only (error enters scaled by dt_os; ops/navier_stokes.py
    # nl_fft_mode note). None = fft_mode everywhere.
    nl_fft_mode: str | None = None
    adaptive: bool = False  # do_step2 semantics: adaptive RK4, tol 1e0
    adaptive_tol: float = 1.0  # FluidSetup.jl:179
    # fixed-step scheme when adaptive=False: "rk4" = the reference's do_step
    # (FluidSetup.jl:163-172, oversampling = 16*nx*dt substeps); "ifrk4" =
    # the integrating-factor fast tier (NSSolver.step_real_if) at
    # `fast_oversampling` substeps — validated against a fine-step oracle at
    # the accuracy the reference's own installed tol-1e0 stepper accepts
    # (PERFORMANCE.md accuracy ladder)
    stepper: str = "rk4"
    # substeps for the ifrk4 tier; None = oversampling/4 (a 4x-relaxed CFL
    # safety factor: measured stable through the saturated-action regime
    # |u|max ~ 2.8 at 128^2 — where the ~1.4x-margin os=8 tier NaNs — and
    # scales with nx*dt like the reference's heuristic)
    fast_oversampling: int | None = None
    # env (FluidSetup.jl:44-57)
    te: float = 6.0
    t0: float = 0.0
    dt: float = 0.02
    max_value: float = 3.0
    check_max_value: str = "reward"
    # featurization (FluidSetup.jl:65-77, 188-261)
    window_size: int = 3
    temporal_steps: int = 1
    memory_size: int = 0
    agent_power: float = 70.0
    action_punish: float = 0.002
    delta_action_punish: float = 0.002
    sensor_scale: float = 1.0 / 70.0
    reward_norm: float = 320.0
    reward_pow: float = 1.1
    # EXTENSION (not in the reference): optional local-enstrophy penalty
    # -w * <|omega|, g_i>. The reference reward only sees the SIGNED local
    # average <omega, g_i> (FluidSetup.jl:197), which is blind to
    # zero-circulation vortex pairs inside a kernel; this term directly
    # optimizes the energy diagnostic sum|omega| used by its evaluation.
    energy_reward_weight: float = 0.0
    # EXTENSION: add an |omega| observation channel (envs.features.
    # AbsConv2DFeaturizer) so energy objectives become observable.
    abs_sensor_channel: bool = False
    # agent (FluidSetup.jl:79-95)
    nna_scale: float = 1.8
    nna_scale_critic: float = 17.0
    drop_middle_layer: bool = True
    gamma: float = 0.99
    polyak: float = 0.995
    batch_size: int = 3
    start_steps: int = 10
    update_after: int = 10
    update_freq: int = 1
    update_loops: int = 20
    learning_rate: float = 5e-4
    learning_rate_critic: float = 1e-3
    act_limit: float = 1.0
    act_noise: float = 1.2
    capacity: int = 1_800_000
    # training protocol (FluidSetup.jl:541-556, Fluid_8.jl:27)
    loops: int = 10
    no_steps: int = 580
    noise_decay: float = 0.6
    min_best_episode: int = 1

    @property
    def grid_nx(self) -> int:
        return 256 if self.evaluation else self.nx

    @property
    def grid_seed(self) -> int:
        return 76 if self.evaluation else self.seed

    @property
    def oversampling(self) -> int:
        # oversampling = floor(16 * nx * dt) (FluidSetup.jl:47)
        return int(np.floor(16 * self.grid_nx * self.dt))

    @property
    def fast_oversampling_eff(self) -> int:
        if self.fast_oversampling is not None:
            return self.fast_oversampling
        return max(1, int(np.ceil(self.oversampling / 4)))

    @property
    def positions(self):
        """Sensor/actuator lattice (FluidSetup.jl:61-63), 1-based (i, j)."""
        n = self.grid_nx
        step = n // self.sensors_per_axis
        return [(i, j) for i in range(1, n + 1, step) for j in range(1, n + 1, step)]


# adaptive=True is the DEFAULT recipe for the shipped presets: the reference
# installs do_step2 (adaptive RK4 at tol 1e0) as the env stepper for all
# fluid experiments (FluidSetup.jl:333, def :178-186). Measured head-to-head
# (RESULTS.md round 2): the adaptive-trained controller evaluates slightly
# better AND trains ~1.5x faster than the fixed 40-substep path; pass
# adaptive=False for the do_step fixed-step variant (FluidSetup.jl:163-172).
FLUID_8 = FluidConfig(name="Fluid_8", seed=531, sensors_per_axis=8, variance=0.08,
                      adaptive=True)
FLUID_16 = FluidConfig(name="Fluid_16", seed=436, sensors_per_axis=16, variance=0.04,
                       adaptive=True)
FLUID_32 = FluidConfig(name="Fluid_32", seed=886, sensors_per_axis=32, variance=0.022,
                       adaptive=True)
# The scale-out preset: TRAIN at the reference's evaluation resolution
# (FluidSetup.jl:32-36 only evaluates at 256^2 because a single GPU trains
# at 128^2); the sharded trainer (parallel.multichip) lifts training itself
# to the big grid across a chip mesh.
FLUID_8_256 = FluidConfig(name="Fluid_8_256", seed=531, sensors_per_axis=8,
                          variance=0.08, nx=256)  # sharded path: fixed-step
                          # oversampled solver (see parallel.multichip)
# The dense-lattice scale-out preset: Fluid_16's 16x16 actuation trained
# NATIVELY at the 256^2 evaluation grid (the lattice where native-resolution
# training can win — its 128^2 artifact already beats corrected opposition,
# RESULTS.md "Denser actuator lattices").
FLUID_16_256 = FluidConfig(name="Fluid_16_256", seed=436, sensors_per_axis=16,
                           variance=0.04, nx=256)


def fluid_error_detection(y: np.ndarray) -> bool:
    """Corrupted-field detector: neighbor jumps > 10 in real space
    (FluidSetup.jl:263-273)."""
    return bool(
        np.abs(np.roll(y, 1, 0) - y).max() > 10.0 or np.abs(np.roll(y, 1, 1) - y).max() > 10.0
    )


def fluid_kernels(cfg: FluidConfig):
    """Sensor/actuator Taylor-vortex kernels for a preset, shape
    (n_act, n, n) each (FluidSetup.jl:139-161)."""
    n = cfg.grid_nx
    positions = cfg.positions
    sensors = taylor_kernels_2d(positions, n, n, cfg.lx, cfg.lx, cfg.variance, norm_mode=1)
    actuators = taylor_kernels_2d(positions, n, n, cfg.lx, cfg.lx, cfg.variance, norm_mode=2)
    return sensors, actuators


def fluid_featurizer(cfg: FluidConfig, sensor_matrix) -> Conv2DFeaturizer:
    """The preset's real featurizer (FluidSetup.jl:204-245), incl.
    actuators_to_sensors mapping and temporal/memory rows. Shared by the
    single-chip env builder and the sharded trainer (parallel.multichip)."""
    return Conv2DFeaturizer(
        sensor_matrix=sensor_matrix,
        actuators_to_sensors=np.arange(cfg.sensors_per_axis**2),
        sensors_per_axis=cfg.sensors_per_axis,
        scale=cfg.sensor_scale,
        window_size=cfg.window_size,
        temporal_steps=cfg.temporal_steps,
        memory_size=cfg.memory_size,
    )


def fluid_agent_config(cfg: FluidConfig, obs_dim: int, capacity: int | None = None) -> DDPGConfig:
    """The preset's DDPG hyperparameters (FluidSetup.jl:79-95)."""
    return DDPGConfig(
        ns=obs_dim,
        na_rows=1 + cfg.memory_size,
        n_actuators=cfg.sensors_per_axis**2,
        gamma=cfg.gamma,
        polyak=cfg.polyak,
        batch_size=cfg.batch_size,
        start_steps=cfg.start_steps,
        update_after=cfg.update_after,
        update_freq=cfg.update_freq,
        update_loops=cfg.update_loops,
        act_limit=cfg.act_limit,
        act_noise=cfg.act_noise,
        memory_size=cfg.memory_size,
        nna_scale=cfg.nna_scale,
        nna_scale_critic=cfg.nna_scale_critic,
        drop_middle_layer=cfg.drop_middle_layer,
        learning_rate=cfg.learning_rate,
        learning_rate_critic=cfg.learning_rate_critic,
        capacity=capacity if capacity is not None else cfg.capacity,
    )


def build_fluid(cfg: FluidConfig = FLUID_8) -> Setup:
    n = cfg.grid_nx
    solver = NSSolver(nx=n, ny=n, lx=cfg.lx, ly=cfg.lx, nu=cfg.nu, dealias=cfg.dealias,
                      fft_mode=cfg.fft_mode, nl_fft_mode=cfg.nl_fft_mode)
    n_act = cfg.sensors_per_axis**2
    sensors, actuators = fluid_kernels(cfg)
    sensor_matrix = jnp.asarray(sensors.reshape(n_act, -1), jnp.float32)
    actuator_stack = jnp.asarray(actuators.reshape(n_act, -1), jnp.float32)
    a2s = np.arange(n_act)

    if cfg.abs_sensor_channel:
        featurizer = AbsConv2DFeaturizer(
            sensor_matrix=sensor_matrix,
            actuators_to_sensors=a2s,
            sensors_per_axis=cfg.sensors_per_axis,
            scale=cfg.sensor_scale,
            window_size=cfg.window_size,
        )
    else:
        featurizer = fluid_featurizer(cfg, sensor_matrix)

    def reward_fn(y, action, delta_action):
        """FluidSetup.jl:188-202 (state already real-space)."""
        flat = y.reshape(-1)
        dots = jnp.abs(sensor_matrix @ flat) ** cfg.reward_pow / cfg.reward_norm
        r = (
            -jnp.abs(dots)
            - cfg.action_punish * action[0] ** 2
            - cfg.delta_action_punish * delta_action[0] ** 2
        )
        if cfg.energy_reward_weight > 0.0:
            r = r - cfg.energy_reward_weight * (sensor_matrix @ jnp.abs(flat))
        return r

    def prepare_action(action):
        """FluidSetup.jl:247-261 — real forcing field; the solver transforms
        it once per env step."""
        p = cfg.agent_power * (action[0] @ actuator_stack)
        return p.reshape(n, n)

    if cfg.adaptive:
        # the reference's do_step2 (FluidSetup.jl:181-186): adaptive RK4 at
        # the loose tol 1e0, here as a jit-safe while_loop (ops.integrators)
        from distributedconvrl_pde_control_tpu.ops import fourier as _fourier
        from distributedconvrl_pde_control_tpu.ops.integrators import rk4_adaptive

        def step_fn(y, forcing):
            fr, fi = _fourier.fft2_ri(forcing, None, mode=solver.fft_mode)

            def rhs(y_pair, _):
                wr, wi = y_pair
                return jnp.stack(solver._rhs_ri(wr, wi, fr, fi))

            wr, wi = _fourier.fft2_ri(y, None, mode=solver.fft_mode)
            out = rk4_adaptive(lambda z, f_: rhs((z[0], z[1]), f_), jnp.stack([wr, wi]),
                               None, cfg.dt, rtol=cfg.adaptive_tol, atol=cfg.adaptive_tol,
                               max_steps=256)
            return _fourier.ifft2_ri_real(out[0], out[1], mode=solver.fft_mode)
    elif cfg.stepper == "ifrk4":
        def step_fn(y, forcing):
            return solver.step_real_if(y, forcing, cfg.dt, cfg.fast_oversampling_eff)
    else:
        def step_fn(y, forcing):
            return solver.step_real(y, forcing, cfg.dt, cfg.oversampling)

    rng0 = np.random.default_rng(cfg.grid_seed)
    y0 = np.fft.ifft2(initial_condition(4, n, n, cfg.lx, cfg.lx, rng0)).real.astype(np.float32)

    env = PDEEnv(
        step_fn=step_fn,
        featurize=featurizer,
        prepare_action=prepare_action,
        reward_fn=reward_fn,
        y0=y0,
        action_shape=(1 + cfg.memory_size, n_act),
        n_rewards=n_act,
        te=cfg.te,
        t0=cfg.t0,
        dt=cfg.dt,
        max_value=cfg.max_value,
        check_max_value=cfg.check_max_value,
    )

    agent = DDPGAgent(fluid_agent_config(cfg, featurizer.obs_dim))

    def random_init(key):
        """generate_random_init (FluidSetup.jl:386-394): random-vortex IC,
        case 3 in training / case 4 in evaluation."""
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        rng = np.random.default_rng(seed)
        case = 4 if cfg.evaluation else 3
        w = initial_condition(case, n, n, cfg.lx, cfg.lx, rng)
        return jnp.asarray(np.fft.ifft2(w).real, jnp.float32)

    return Setup(
        name=cfg.name,
        env=env,
        agent=agent,
        seed=cfg.seed,
        random_init=random_init,
        loops=cfg.loops,
        no_steps=cfg.no_steps,
        noise_decay=cfg.noise_decay,
        min_best_episode=cfg.min_best_episode,
        record=False,  # collect_bestDF=false for fluid (FluidSetup.jl:373-377)
        error_detection=fluid_error_detection,
        reward_clamp=-3000.0,
    )
