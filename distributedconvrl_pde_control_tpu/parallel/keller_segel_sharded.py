"""Spatially sharded Keller–Segel solver: halo-exchange stencils.

The FD stencils of `ops.keller_segel` need one ghost cell per side; under a
mesh axis the grid splits into contiguous blocks and the ghosts come from
ring neighbors via `ppermute` (`parallel.halo`). The reference's clamped
(edge-replicated) boundary (KellerSegelSetup.jl:221-224) maps to
`periodic=False`: the first/last blocks replicate their own edge instead of
wrapping.

This is the 1D stencil counterpart of the transpose-FFT spectral sharding —
the two communication patterns (halo exchange for local operators, all_to_all
for global transforms) cover every solver family in the framework.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.parallel.halo import halo_exchange_1d


@dataclasses.dataclass(frozen=True)
class KellerSegelShardedSolver:
    """Semantics of ops.keller_segel.KellerSegelSolver on local grid blocks.

    All methods run inside a `shard_map` over `sp_axis`; `nx` is the GLOBAL
    grid size (dx = lx/nx as in the unsharded solver).
    """

    nx: int
    lx: float
    sp_axis: str
    chi: float = 5.6

    @property
    def dx(self) -> float:
        return self.lx / self.nx

    def rhs(self, y_local: jnp.ndarray, forcing_local: jnp.ndarray) -> jnp.ndarray:
        """y_local: (2, nx/S) block -> dy/dt block. One halo exchange per
        field per evaluation (KellerSegelSetup.jl:213-232 semantics)."""
        dx = self.dx
        u, v = y_local[0], y_local[1]
        ug = halo_exchange_1d(u, self.sp_axis, halo=1, periodic=False)
        vg = halo_exchange_1d(v, self.sp_axis, halo=1, periodic=False)
        um, up = ug[:-2], ug[2:]
        vm, vp = vg[:-2], vg[2:]
        du1 = (up - um) / (2.0 * dx)
        du2 = (um - 2.0 * u + up) / (dx * dx)
        dv1 = (vp - vm) / (2.0 * dx)
        dv2 = (vm - 2.0 * v + vp) / (dx * dx)
        dv = dv2 - v + u + forcing_local
        du = du2 + u - self.chi * du1 * dv1 - self.chi * u * dv2 - u * u
        return jnp.stack([du, dv])

    def step(self, y_local, forcing_local, dt, oversampling: int):
        dt_os = dt / oversampling

        def sub(y, _):
            k1 = self.rhs(y, forcing_local)
            k2 = self.rhs(y + 0.5 * dt_os * k1, forcing_local)
            k3 = self.rhs(y + 0.5 * dt_os * k2, forcing_local)
            k4 = self.rhs(y + dt_os * k3, forcing_local)
            return y + dt_os / 6.0 * (k1 + 2.0 * (k2 + k3) + k4), None

        y_local, _ = jax.lax.scan(sub, y_local, None, length=oversampling)
        return y_local
