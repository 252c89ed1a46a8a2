"""Sensor/actuator kernels and featurization.

The reference computes per-sensor inner products in Python-level loops
(`scripts/KS/setup/KSSetup.jl:190-229`, `scripts/Fluid/setup/FluidSetup.jl:
204-245`, `scripts/Keller-Segel/setup/KellerSegelSetup.jl:265-316`). Here the
kernels are precomputed into dense matrices so the whole sensor readout is a
single matmul (MXU-friendly), the neighbor window is `jnp.roll` stacking, and
action smearing is another matmul.

Kernel constructors mirror the reference's:
  * `gaussian_kernels_1d`  — periodic-wrapped 1D Gaussians (KSSetup.jl:82-109)
  * `rectangle_kernels_1d` — top-hat windows (KellerSegelSetup.jl:112-126)
  * `taylor_kernels_2d`    — sparsified Taylor-vortex bumps
                             (FluidSetup.jl:139-157)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.ops.navier_stokes import meshgrid_xy, taylor_vortex


# ------------------------------------------------------------------ kernels
def gaussian_kernels_1d(
    positions: Sequence[int],
    nx: int,
    lx: float,
    sigma: float,
    norm_mode: int = 1,
    normalized_amplitude: bool = True,
) -> np.ndarray:
    """Periodic-wrapped Gaussian kernels, matrix of shape (n_kernels, nx).

    Mirrors `prepare_gaussians` (KSSetup.jl:82-109): a Gaussian centered at
    `position*dx` evaluated on an extended grid, normalized by sum
    (norm_mode=1, for sensors) or max (norm_mode=2, for actuators), then the
    tails outside [dx, Lx] are wrapped around periodically.

    `normalized_amplitude=False` drops the 1/sqrt(2*pi*sigma) prefactor, as
    the Keller–Segel variant does (KellerSegelSetup.jl:97). Note the
    reference's idiosyncratic width convention `exp(-x^2/2 * sigma^2)` (sigma
    multiplies, not divides) — reproduced faithfully.
    """
    dx = lx / nx
    extra = 50
    t = (np.arange(1 - extra, nx + extra + 1)) * dx  # dx-extra*dx : dx : Lx+extra*dx
    kernels = np.zeros((len(positions), nx))
    for i, pos in enumerate(positions):
        p = np.exp(-((t - pos * dx) ** 2) / 2.0 * sigma**2)
        if normalized_amplitude:
            p = p / np.sqrt(2.0 * np.pi * sigma)
        if norm_mode == 1:
            p = p / p.sum()
        else:
            p = p / p.max()
        left = p[:extra]
        right = p[extra + nx :]
        core = p[extra : extra + nx].copy()
        core[nx - extra :] += left
        core[: len(right)] += right
        kernels[i] = core
    return kernels


def rectangle_kernels_1d(positions: Sequence[int], nx: int, half_window: int = 2) -> np.ndarray:
    """Top-hat kernels of width 2*half_window+1 (KellerSegelSetup.jl:112-126).

    Positions are 1-based grid indices as in the reference; no periodic wrap
    (the reference indexes directly, valid because positions stay interior).
    """
    kernels = np.zeros((len(positions), nx))
    for i, pos in enumerate(positions):
        kernels[i, pos - 1 - half_window : pos + half_window] = 1.0
    return kernels


def taylor_kernels_2d(
    positions: Sequence[tuple],
    nx: int,
    ny: int,
    lx: float,
    ly: float,
    variance: float,
    norm_mode: int = 1,
) -> np.ndarray:
    """Taylor-vortex-shaped 2D kernels, shape (n_kernels, ny, nx).

    Mirrors FluidSetup.jl:139-157: real part of the inverse FFT of a spectral
    Taylor vortex centered at the sensor position, thresholded at 0.1 (the
    sparsification), normalized by sum (sensors) or max (actuators). The
    reference stores these as sparse matrices; on TPU a dense (n, ny*nx)
    matmul is faster than gather-based sparsity at these sizes.
    """
    dx, dy = lx / nx, ly / ny
    xx, yy = meshgrid_xy(nx, ny, lx, ly)
    kernels = np.zeros((len(positions), ny, nx))
    for i, (pi, pj) in enumerate(positions):
        k = taylor_vortex(xx, yy, pi * dx - dx, pj * dy - dy, variance, 1.0, lx, ly)
        k[k < 0.1] = 0.0
        if norm_mode == 1:
            k = k / k.sum()
        else:
            k = k / k.max()
        kernels[i] = k
    return kernels


# ------------------------------------------------------------- featurizers
def _window_stack_1d(sensors: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Stack circularly shifted copies: rows i = -h..h of roll(sensors, i).

    Equivalent to `vcat([circshift(sensors, i)' for i in -h:h]...)`
    (KSSetup.jl:204-205).
    """
    h = window_size // 2
    return jnp.stack([jnp.roll(sensors, i) for i in range(-h, h + 1)], axis=0)


def _window_stack_2d(sensors: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """2D window: rows (i, j) = roll(sensors, (i, j)) flattened row-major.

    Equivalent to FluidSetup.jl:219-223 (the transpose + column-major reshape
    there is a row-major flatten).
    """
    h = window_size // 2
    rows = [
        jnp.roll(sensors, (i, j), axis=(0, 1)).reshape(-1)
        for i in range(-h, h + 1)
        for j in range(-h, h + 1)
    ]
    return jnp.stack(rows, axis=0)


def _temporal_and_memory(
    base: jnp.ndarray,
    prev_obs: Optional[jnp.ndarray],
    action: Optional[jnp.ndarray],
    temporal_steps: int,
    memory_size: int,
    n_cols: int,
) -> jnp.ndarray:
    """Shared temporal-stacking + action-memory tail (KSSetup.jl:209-228).

    On init (prev_obs None): tile the base block `temporal_steps` times and
    zero memory rows. On step: new base block on top, previous obs shifted
    down (its oldest block and memory rows dropped), then the last
    `memory_size` action rows.
    """
    blocks = [base]
    if temporal_steps > 1:
        if prev_obs is None:
            blocks += [base] * (temporal_steps - 1)
        else:
            keep = prev_obs.shape[0] - base.shape[0] - memory_size
            blocks.append(prev_obs[:keep])
    if memory_size > 0:
        if action is None:
            blocks.append(jnp.zeros((memory_size, n_cols), base.dtype))
        else:
            blocks.append(action[-memory_size:])
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else base


@dataclasses.dataclass(frozen=True)
class Conv1DFeaturizer:
    """KS-style local observations: per-sensor Gaussian dot products scaled by
    1/max_value, neighbor window, per-actuator columns (KSSetup.jl:190-229)."""

    sensor_matrix: jnp.ndarray  # (n_sensors, nx)
    actuators_to_sensors: np.ndarray  # (n_actuators,) int indices (0-based)
    scale: float  # 1 / max_value
    window_size: int = 1
    temporal_steps: int = 1
    memory_size: int = 0

    @property
    def n_actuators(self) -> int:
        return len(self.actuators_to_sensors)

    @property
    def obs_dim(self) -> int:
        return self.window_size * self.temporal_steps + self.memory_size

    def from_dots(self, dots, prev_obs=None, action=None):
        """Featurize from precomputed raw sensor dot products <y, g_i>.

        Split out (like Conv2DFeaturizer.from_dots) so the spectral-
        featurize tier can compute the dots as exact Parseval contractions
        against pre-transformed kernels on the carried half-spectrum
        (configs/ks.py `spectral_featurize`)."""
        sensors = dots * self.scale
        base = _window_stack_1d(sensors, self.window_size)
        base = base[:, self.actuators_to_sensors]
        return _temporal_and_memory(
            base, prev_obs, action, self.temporal_steps, self.memory_size, self.n_actuators
        )

    def __call__(self, y, prev_obs=None, action=None):
        return self.from_dots(self.sensor_matrix @ y, prev_obs, action)


@dataclasses.dataclass(frozen=True)
class Conv2DFeaturizer:
    """Fluid-style observations (FluidSetup.jl:204-245): sensor dot products
    against the real-space vorticity field.

    The reference keeps spectral state and iffts here; our fluid env keeps
    the REAL field (complex dtypes are emulated on TPU), so `y` arrives
    already in real space."""

    sensor_matrix: jnp.ndarray  # (n_sensors, ny*nx), row-major sensor order
    actuators_to_sensors: np.ndarray
    sensors_per_axis: int
    scale: float  # 1/70
    window_size: int = 3
    temporal_steps: int = 1
    memory_size: int = 0

    @property
    def n_actuators(self) -> int:
        return len(self.actuators_to_sensors)

    @property
    def obs_dim(self) -> int:
        return self.window_size**2 * self.temporal_steps + self.memory_size

    def from_dots(self, dots, prev_obs=None, action=None):
        """Featurize from precomputed raw sensor dot products <omega, g_i>.

        Split out so spatially sharded solvers can compute the dots as
        partial matmuls + psum over the mesh (parallel.multichip) and reuse
        the window/temporal/memory logic verbatim."""
        vals = dots * self.scale
        spa = self.sensors_per_axis
        sensors = vals.reshape(spa, spa)  # sensor i -> (i // spa, i % spa), FluidSetup.jl:216
        base = _window_stack_2d(sensors, self.window_size)
        base = base[:, self.actuators_to_sensors]
        return _temporal_and_memory(
            base, prev_obs, action, self.temporal_steps, self.memory_size, self.n_actuators
        )

    def __call__(self, y, prev_obs=None, action=None):
        return self.from_dots(self.sensor_matrix @ y.reshape(-1), prev_obs, action)


@dataclasses.dataclass(frozen=True)
class GlobalFeaturizer:
    """Mono/global-agent observations: the whole sensor vector as one column
    (KSglobalSetup.jl:210-249)."""

    sensor_matrix: jnp.ndarray
    scale: float
    temporal_steps: int = 1
    memory_size: int = 0

    @property
    def obs_dim(self) -> int:
        return self.sensor_matrix.shape[0] * self.temporal_steps + self.memory_size

    def __call__(self, y, prev_obs=None, action=None):
        sensors = (self.sensor_matrix @ y) * self.scale
        base = sensors.reshape(-1, 1)
        return _temporal_and_memory(base, prev_obs, action, self.temporal_steps, self.memory_size, 1)


@dataclasses.dataclass(frozen=True)
class TwoFieldFeaturizer:
    """Keller–Segel observations: both fields' rectangle dots (scaled 1/4),
    windows per field, optional action feedback, temporal stacking
    (KellerSegelSetup.jl:265-316)."""

    sensor_matrix: jnp.ndarray  # (n_sensors, nx)
    actuators_to_sensors: np.ndarray
    scale: float = 0.25
    window_size: int = 3
    temporal_steps: int = 2
    memory_size: int = 0
    sees_action: bool = False
    action_rows: int = 1

    @property
    def n_actuators(self) -> int:
        return len(self.actuators_to_sensors)

    @property
    def obs_dim(self) -> int:
        per_field = self.window_size
        base = 2 * per_field + (self.action_rows if self.sees_action else 0)
        return base * self.temporal_steps + self.memory_size

    def from_dots(self, dots, prev_obs=None, action=None):
        """Featurize from precomputed raw per-field sensor dots <y_f, rect_i>
        of shape (2, n_sensors). Split out so spatially sharded solvers can
        compute the dots as partial matmuls + psum over the mesh
        (parallel.multichip_keller_segel) and reuse the window/temporal/
        memory logic verbatim."""
        blocks = []
        for f in range(2):
            w = _window_stack_1d(dots[f] * self.scale, self.window_size)
            blocks.append(w[:, self.actuators_to_sensors])
        base = jnp.concatenate(blocks, axis=0)
        if self.sees_action:
            if action is None:
                base = jnp.concatenate(
                    [base, jnp.zeros((self.action_rows, self.n_actuators), base.dtype)], axis=0
                )
            else:
                base = jnp.concatenate([base, action], axis=0)
        return _temporal_and_memory(
            base, prev_obs, action, self.temporal_steps, self.memory_size, self.n_actuators
        )

    def __call__(self, y, prev_obs=None, action=None):
        dots = jnp.stack([self.sensor_matrix @ y[0], self.sensor_matrix @ y[1]])
        return self.from_dots(dots, prev_obs, action)


@dataclasses.dataclass(frozen=True)
class AbsConv2DFeaturizer:
    """EXTENSION (not in the reference): fluid observations with a second
    channel of |field| sensor readings.

    The reference's observations are SIGNED local vorticity averages
    (FluidSetup.jl:216) — blind to zero-circulation structures, which makes
    total-energy objectives unlearnable (see ROADMAP.md). This featurizer
    stacks windowed <|omega|, g_i> rows under the standard windowed
    <omega, g_i> rows, doubling obs_dim.
    """

    sensor_matrix: jnp.ndarray  # (n_sensors, ny*nx)
    actuators_to_sensors: np.ndarray
    sensors_per_axis: int
    scale: float
    window_size: int = 3

    @property
    def n_actuators(self) -> int:
        return len(self.actuators_to_sensors)

    @property
    def obs_dim(self) -> int:
        return 2 * self.window_size**2

    def __call__(self, y, prev_obs=None, action=None):
        flat = y.reshape(-1)
        spa = self.sensors_per_axis
        vals = ((self.sensor_matrix @ flat) * self.scale).reshape(spa, spa)
        avals = ((self.sensor_matrix @ jnp.abs(flat)) * self.scale).reshape(spa, spa)
        base = jnp.concatenate(
            [_window_stack_2d(vals, self.window_size),
             _window_stack_2d(avals, self.window_size)], axis=0
        )
        return base[:, self.actuators_to_sensors]
