"""Kuramoto–Sivashinsky experiment presets.

Replicates the constants of `scripts/KS/setup/KSSetup.jl` (distributed
agents) and `scripts/KS/setup/KSglobalSetup.jl` (mono/global ablation), and
the per-experiment scripts KS22 / KS200 / KS500 / KS200_disturbed /
KS22_global-agent.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig
from distributedconvrl_pde_control_tpu.envs.features import (
    Conv1DFeaturizer,
    GlobalFeaturizer,
    gaussian_kernels_1d,
)
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv
from distributedconvrl_pde_control_tpu.ops.ks import KSSolver, KSSolverETDRK4
from distributedconvrl_pde_control_tpu.train.drivers import Setup


@dataclasses.dataclass(frozen=True)
class KSConfig:
    """Constants of a KS experiment (entry script + KSSetup.jl:20-77)."""

    name: str = "KS22"
    seed: int = 609
    lx: float = 22.0
    nx: int = 192
    sensor_step: int = 24  # sensor_positions = 1:step:nx (1-based)
    n_actuators: int = 8
    sigma_sensors: float = 0.7
    sigma_actuators: float = 0.7
    mu: float = 0.0  # inhomogeneous disturbance amplitude
    # env
    te: float = 5.0
    t0: float = 0.0
    dt: float = 0.1
    oversampling: int = 30
    # transform backend/precision ("auto" = matmul-DFT at f32/HIGHEST on
    # TPU; "matmul_hi" = 3-pass bf16, measured 2.6e-5 rel/step and 1.29x
    # throughput — the batched bench configuration, PERFORMANCE.md)
    fft_mode: str = "auto"
    # integrator: "cnab2" = the reference's do_step (30 substeps,
    # KSSetup.jl:130-160) — the fidelity default; "etdrk4" = exact linear
    # part, ONE step per env step at equal accuracy on attractor states
    # (ops/ks.py::KSSolverETDRK4; 7.5x fewer transforms, PERFORMANCE.md)
    stepper: str = "cnab2"
    # etdrk4-only: transform tier for the nonlinear evaluations (error
    # enters scaled by the O(h) phi-weights; ops/ks.py nl_fft_mode note).
    # None = fft_mode everywhere.
    nl_fft_mode: str | None = None
    # etdrk4-only: carry the field as its half-spectrum (re, im) pair across
    # env steps and feed the solver spectral forcing computed directly from
    # the actions (exact — the forcing is a fixed-kernel linear combination,
    # KSSetup.jl:231-245). Drops 2 of the 3 per-env-step boundary transforms
    # (the remaining synthesis still hands featurize/reward/termination the
    # real field); numerically it REMOVES the per-step rfft∘irfft round-trip,
    # so the trajectory is slightly MORE accurate than the real-carry path
    # (equivalence bounded in tests/test_ks_solver.py).
    spectral_carry: bool = False
    # etdrk4+carry-only TRAINER tier: featurize/reward/blow-up guard consume
    # the carried half-spectrum directly, deleting the LAST per-step
    # synthesis transform too — sensor readouts are linear in y
    # (KSSetup.jl:190-229), so ⟨y, g_i⟩ = an exact Parseval dot against
    # host-precomputed rfft'd kernels, and the reward's ⟨y*6, g⟩ likewise.
    # The max|y| guard becomes the sound rms(y) > max_value surrogate
    # (Parseval energy — never spurious, fires a step or two later into an
    # exponential blow-up; the non-finite guard backstops). CONTRACT:
    # EnvState.y then holds the episode's RESET field, so this is for the
    # fused trainers/bench only (they never read y); plotting/eval rollouts
    # use the standard presets. Measured A/B + quality gate: PERFORMANCE.md
    # spectral-featurize note.
    spectral_featurize: bool = False
    max_value: float = 30.0
    check_max_value: str = "y"
    # featurization
    window_size: int = 1
    temporal_steps: int = 1
    memory_size: int = 0
    agent_power: float = 7.5
    action_punish: float = 0.002
    delta_action_punish: float = 0.002
    # agent (KSSetup.jl:39-77)
    nna_scale: float = 0.6
    nna_scale_critic: float = 7.0
    drop_middle_layer: bool = True
    gamma: float = 0.99
    polyak: float = 0.995
    batch_size: int = 3
    start_steps: int = 6
    update_after: int = 10
    update_freq: int = 1
    update_loops: int = 20
    learning_rate: float = 5e-4
    learning_rate_critic: float = 1e-3
    act_limit: float = 1.0
    act_noise: float = 1.2
    capacity: int = 150_000
    # training protocol (KSSetup.jl:304-319 + entry script loops)
    loops: int = 8
    no_steps: int = 800
    noise_decay: float = 0.2
    min_best_episode: int = 1

    @property
    def sensor_positions(self) -> np.ndarray:
        return np.arange(1, self.nx + 1, self.sensor_step)  # 1-based like the reference

    @property
    def actuators_to_sensors(self) -> np.ndarray:
        return np.arange(self.n_actuators)  # collect(1:n), 0-based here


# Shipped experiment constants (scripts/KS/*/*.jl).
KS22 = KSConfig(name="KS22", seed=609, lx=22.0, nx=192, sensor_step=24, n_actuators=8,
                sigma_sensors=0.7, sigma_actuators=0.7, loops=8)
KS200 = KSConfig(name="KS200", seed=59, lx=200.0, nx=240, sensor_step=3, n_actuators=80,
                 sigma_sensors=1.0, sigma_actuators=1.0, loops=6)
# KS500: zero-shot transfer target — eval-only, agent trained on KS200
# (scripts/KS/KS500/KS500.jl:21-24).
KS500 = KSConfig(name="KS500", seed=914, lx=500.0, nx=600, sensor_step=3, n_actuators=200,
                 sigma_sensors=1.0, sigma_actuators=1.0)
# Disturbed dynamics, eval-only with the mu=0 agent (KS200_disturbed.jl:16-24).
KS200_DISTURBED = dataclasses.replace(KS200, name="KS200_disturbed", seed=914, mu=0.02)
# Coarse-grid training tier (round 3): the reference's nx=192 for Lx=22
# (KS22.jl:10-11) is ~4x past the resolution the physics needs — the KS
# attractor's spectrum at Lx=22 is fully resolved at nx=64 (33 rfft modes,
# alpha_max 9.1 vs the last linearly unstable mode at alpha=1). Measured:
# sensor observations after 10 forced env steps from a spectrally
# restricted attractor state match the 192-grid reference to 3.8e-5
# relative — the same f32 floor as the ETDRK4-vs-CNAB2 validation
# (tests/test_ks_solver.py::test_coarse_grid_sensor_convergence). Sensor/
# actuator kernels are physical-width Gaussians with sum/max norms
# (KSSetup.jl:82-113), so the observation/actuation interface is
# grid-independent and an actor trained here evaluates unchanged on the
# 192-grid fidelity env (train-coarse -> eval-fine resolution transfer,
# the same move the reference makes for fluid 128^2 -> 256^2).
KS22_64 = dataclasses.replace(KS22, name="KS22_64", nx=64, sensor_step=8)


def ks_standard_y0(nx: int) -> np.ndarray:
    """y0_1D_standard: a 0.5-amplitude block over grid cells 4..44
    (KSSetup.jl:53)."""
    return np.asarray([0.5 if 4 <= i <= 44 else 0.0 for i in range(1, nx + 1)], np.float32)


def ks_random_init(cfg: KSConfig):
    """`generate_random_init` (KSSetup.jl:288-298): 8 random sines with unit-
    normalized coefficients, rescaled to ||y0|| = 30."""
    dx = cfg.lx / cfg.nx
    x = jnp.arange(1, cfg.nx + 1, dtype=jnp.float32) * dx
    n_sin = 8
    harmonics = jnp.stack([jnp.sin(i * x / (2.0 * jnp.pi)) for i in range(1, n_sin + 1)])

    def init(key):
        a = jax.random.uniform(key, (n_sin,), jnp.float32, -1.0, 1.0)
        a = a / jnp.linalg.norm(a)
        y0 = a @ harmonics
        return y0 * 30.0 / jnp.linalg.norm(y0)

    return init


def build_ks(cfg: KSConfig = KS22) -> Setup:
    """Assemble the distributed-agent KS setup (KSSetup.jl:249-300)."""
    if cfg.stepper == "etdrk4":
        solver = KSSolverETDRK4(nx=cfg.nx, lx=cfg.lx, dt=cfg.dt, oversampling=1,
                                mu=cfg.mu, fft_mode=cfg.fft_mode,
                                nl_fft_mode=cfg.nl_fft_mode)
    else:
        solver = KSSolver(nx=cfg.nx, lx=cfg.lx, dt=cfg.dt, oversampling=cfg.oversampling,
                          mu=cfg.mu, fft_mode=cfg.fft_mode)
    sensors = gaussian_kernels_1d(cfg.sensor_positions, cfg.nx, cfg.lx, cfg.sigma_sensors,
                                  norm_mode=1)
    actuators = gaussian_kernels_1d(cfg.sensor_positions, cfg.nx, cfg.lx, cfg.sigma_actuators,
                                    norm_mode=2)[cfg.actuators_to_sensors]
    sensor_matrix = jnp.asarray(sensors, jnp.float32)
    actuator_matrix = jnp.asarray(actuators, jnp.float32)
    a2s = cfg.actuators_to_sensors

    featurizer = Conv1DFeaturizer(
        sensor_matrix=sensor_matrix,
        actuators_to_sensors=a2s,
        scale=1.0 / cfg.max_value,
        window_size=cfg.window_size,
        temporal_steps=cfg.temporal_steps,
        memory_size=cfg.memory_size,
    )
    reward_sel = sensor_matrix[a2s]  # sensor kernels at actuator sites

    def reward_fn(y, action, delta_action):
        """KSSetup.jl:162-184."""
        dots = jnp.abs(reward_sel @ (y * 6.0)) ** 1.3 / (cfg.max_value * 3.0)
        return (
            -jnp.abs(dots)
            - cfg.action_punish * action[0] ** 2
            - cfg.delta_action_punish * delta_action[0] ** 2
        )

    def prepare_action(action):
        """KSSetup.jl:231-245: forcing = sum_i agent_power * a_i * g_i."""
        return cfg.agent_power * (action[0] @ actuator_matrix)

    init_carry = step_carry_fn = None
    step_carry_only = featurize_carry = reward_carry_fn = carry_guard = None
    if cfg.spectral_featurize and not cfg.spectral_carry:
        raise ValueError("spectral_featurize requires spectral_carry")
    if cfg.spectral_carry:
        if cfg.stepper != "etdrk4":
            raise ValueError("spectral_carry requires stepper='etdrk4'")
        # pre-transform the actuator kernels (float64 host FFT, cast f32):
        # F(forcing) = agent_power * sum_i a_i * F(g_i) — exact, no per-step
        # forcing analysis transform
        ghat = np.fft.rfft(np.asarray(actuators, np.float64), axis=1)
        g_re = jnp.asarray(cfg.agent_power * ghat.real, jnp.float32)
        g_im = jnp.asarray(cfg.agent_power * ghat.imag, jnp.float32)

        def step_carry_fn(carry, action):
            return solver.step_spectral(carry, action[0] @ g_re,
                                        action[0] @ g_im)

        init_carry = solver.init_carry

    if cfg.spectral_featurize:
        # Parseval rows: sum_j g_j y_j = sum_k w_k (g_re_k y_re_k +
        # g_im_k y_im_k) with w = [1, 2, ..., 2, 1]/nx on the rfft
        # half-spectrum (the Nyquist weight 1 requires even nx — every
        # shipped grid). Kernels rfft'd host-side in float64, weights
        # folded in, cast f32 — the sensor readout becomes one
        # (n_sensors, nxh) x (nxh,) contraction pair on the carry.
        nxh = cfg.nx // 2 + 1
        w = np.full(nxh, 2.0 / cfg.nx)
        w[0] = 1.0 / cfg.nx
        if cfg.nx % 2 == 0:
            w[-1] = 1.0 / cfg.nx
        shat = np.fft.rfft(np.asarray(sensors, np.float64), axis=1)
        s_re = jnp.asarray(shat.real * w, jnp.float32)
        s_im = jnp.asarray(shat.imag * w, jnp.float32)
        # reward uses reward_sel @ (y * 6.0): fold the 6 into the rows
        r_re, r_im = s_re[a2s] * 6.0, s_im[a2s] * 6.0
        w_j = jnp.asarray(w, jnp.float32)
        inv_nx = 1.0 / cfg.nx

        def step_carry_only(carry, action):
            return solver.step_spectral_only(carry, action[0] @ g_re,
                                             action[0] @ g_im)

        def featurize_carry(carry, prev_obs=None, action=None):
            cr, ci = carry
            return featurizer.from_dots(s_re @ cr + s_im @ ci,
                                        prev_obs, action)

        def reward_carry_fn(carry, action, delta_action):
            cr, ci = carry
            dots = jnp.abs(r_re @ cr + r_im @ ci) ** 1.3 / (cfg.max_value * 3.0)
            return (
                -jnp.abs(dots)
                - cfg.action_punish * action[0] ** 2
                - cfg.delta_action_punish * delta_action[0] ** 2
            )

        def carry_guard(carry):
            cr, ci = carry
            mean_sq = (w_j @ (cr * cr + ci * ci)) * inv_nx
            return jnp.sqrt(mean_sq) > cfg.max_value

    env = PDEEnv(
        step_fn=solver.step,
        featurize=featurizer,
        prepare_action=prepare_action,
        reward_fn=reward_fn,
        y0=ks_standard_y0(cfg.nx),
        action_shape=(1 + cfg.memory_size, cfg.n_actuators),
        n_rewards=cfg.n_actuators,
        te=cfg.te,
        t0=cfg.t0,
        dt=cfg.dt,
        max_value=cfg.max_value,
        check_max_value=cfg.check_max_value,
        init_carry=init_carry,
        step_carry_fn=step_carry_fn,
        step_carry_only=step_carry_only,
        featurize_carry=featurize_carry,
        reward_carry_fn=reward_carry_fn,
        carry_guard=carry_guard,
    )

    agent = DDPGAgent(DDPGConfig(
        ns=featurizer.obs_dim,
        na_rows=1 + cfg.memory_size,
        n_actuators=cfg.n_actuators,
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
        capacity=cfg.capacity,
    ))

    return Setup(
        name=cfg.name,
        env=env,
        agent=agent,
        seed=cfg.seed,
        random_init=ks_random_init(cfg),
        loops=cfg.loops,
        no_steps=cfg.no_steps,
        noise_decay=cfg.noise_decay,
        min_best_episode=cfg.min_best_episode,
    )


# --------------------------------------------------------- global (mono) KS
KS22_GLOBAL = dataclasses.replace(
    KS22,
    name="KS22_global",
    seed=390,
    nna_scale=4.8,
    nna_scale_critic=56.0,
    capacity=700_000,
    no_steps=8000,
)


def ks_global_fixed_y0() -> np.ndarray:
    """The stored fixed random init the reference's mono setup uses as its
    env default (KSglobalSetup.jl:62 loads y0.jld2 — an 8-random-sine field
    normalized to ||y0||=30, per generate_random_init at :314-323). The exact
    field values are shipped as data (data_ks_global_y0.npy, extracted from
    the reference's y0.jld2) so the ablation protocol matches bit-for-bit."""
    import os

    return np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "data_ks_global_y0.npy"))


def build_ks_global(cfg: KSConfig = KS22_GLOBAL) -> Setup:
    """Mono/global-agent ablation (KSglobalSetup.jl): one big MLP sees the
    whole sensor vector, emits all actuator commands, scalar mean reward.

    Per-episode training inits stay random (the reference trains with
    use_random_init=true, KSglobalSetup.jl:326,330); the FIXED stored y0 is
    the env reset default, used by evaluation protocols with
    use_random_init=false (KSglobalSetup.jl:400)."""
    solver = KSSolver(nx=cfg.nx, lx=cfg.lx, dt=cfg.dt, oversampling=cfg.oversampling, mu=cfg.mu,
                      fft_mode=cfg.fft_mode)
    sensors = gaussian_kernels_1d(cfg.sensor_positions, cfg.nx, cfg.lx, cfg.sigma_sensors,
                                  norm_mode=1)
    actuators = gaussian_kernels_1d(cfg.sensor_positions, cfg.nx, cfg.lx, cfg.sigma_actuators,
                                    norm_mode=2)
    sensor_matrix = jnp.asarray(sensors, jnp.float32)
    actuator_matrix = jnp.asarray(actuators, jnp.float32)
    a2s = cfg.actuators_to_sensors
    reward_sel = sensor_matrix[a2s]

    featurizer = GlobalFeaturizer(
        sensor_matrix=sensor_matrix,
        scale=1.0 / cfg.max_value,
        temporal_steps=cfg.temporal_steps,
        memory_size=cfg.memory_size,
    )

    def reward_fn(y, action, delta_action):
        """KSglobalSetup.jl:174-205: scalar mean of the per-actuator terms."""
        dots = jnp.abs(reward_sel @ (y * 6.0)) ** 1.3 / (cfg.max_value * 3.0)
        per = (
            -jnp.abs(dots)
            - cfg.action_punish * action[:, 0] ** 2
            - cfg.delta_action_punish * delta_action[:, 0] ** 2
        )
        return jnp.mean(per).reshape(1)

    def prepare_action(action):
        return cfg.agent_power * (action[:, 0] @ actuator_matrix)

    env = PDEEnv(
        step_fn=solver.step,
        featurize=featurizer,
        prepare_action=prepare_action,
        reward_fn=reward_fn,
        y0=ks_global_fixed_y0() if cfg.nx == 192 else ks_standard_y0(cfg.nx),
        action_shape=(cfg.n_actuators, 1),  # flat action vector as one column
        n_rewards=1,
        te=cfg.te,
        t0=cfg.t0,
        dt=cfg.dt,
        max_value=cfg.max_value,
        check_max_value=cfg.check_max_value,
    )

    agent = DDPGAgent(DDPGConfig(
        ns=featurizer.obs_dim,
        na_rows=cfg.n_actuators,
        n_actuators=1,
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
        drop_middle_layer_critic=cfg.drop_middle_layer,
        learning_rate=cfg.learning_rate,
        learning_rate_critic=cfg.learning_rate_critic,
        capacity=cfg.capacity,
        mono=True,
    ))

    return Setup(
        name=cfg.name,
        env=env,
        agent=agent,
        seed=cfg.seed,
        random_init=ks_random_init(cfg),
        loops=cfg.loops,
        no_steps=cfg.no_steps,
        noise_decay=cfg.noise_decay,
        min_best_episode=cfg.min_best_episode,
    )
