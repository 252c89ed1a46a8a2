"""Fused Pallas kernel for the 2D NS advection pipeline (round-2 study).

The advection term (fluid_rk4.jl:145-190 semantics, split-(re,im) form of
`ops.navier_stokes`) is the hot core of every RK4 substep: 4 inverse 2D
transforms (u, v, dw/dx, dw/dy), the real-space product, one forward 2D
transform, and the 2/3-rule mask. On the axon runtime all transforms are
matmul-DFTs, so one advection evaluation is ~38 (B*n, n) x (n, n) MXU
matmuls plus elementwise glue.

This kernel fuses the WHOLE pipeline into one `pallas_call`: the DFT
matrices and spectral operator arrays are VMEM-resident across the batch
grid, every intermediate lives in registers/VMEM, and nothing round-trips
to HBM between stages — the maximal-fusion counterpart of the XLA path, to
settle ROADMAP #3 ("re-evaluate Pallas at 2D scale") with a measurement.

Verdict (measured on the real v5e chip, best-of-3 x 50-100 reps; see
PERFORMANCE.md "Pallas at 2D"): validates to ~2.5e-7 relative and runs at
PARITY within noise — 0.89x..1.21x vs XLA across (n, B) in {128, 256} x
{16..128}. Both paths are MXU-compute-bound at f32/HIGHEST (round-1
roofline: ~17 TFLOPS sustained on the same DFT matmuls), so the manual
VMEM residency and fusion have no HBM traffic left to save. Per the
round-2 decision gate ("keep only if it beats XLA"), the production
solvers stay on XLA; this kernel is retained as the validated 2D Pallas
template (grid/BlockSpec layout, transpose handling, VMEM budgeting:
tile_b * n^2 * 4B x ~20 live intermediates must fit 16 MB — tile_b 8 at
128^2, 1-2 at 256^2).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class PallasAdvection2D:
    """Fused advection evaluator for square (n x n) grids, batched over a
    leading env axis; numerics match NSShardedSolverRI._advection_ri /
    NSSolver's ri path with the 2/3 mask."""

    n: int
    lx: float = 1.0
    tile_b: int = 8
    interpret: bool = False  # CPU-testable interpreter mode

    def _consts(self):
        n = self.n
        j = np.arange(n)
        ang = 2.0 * np.pi * np.outer(j, j) / n
        c = np.cos(ang).astype(np.float32)
        s = np.sin(ang).astype(np.float32)
        k = (2.0 * np.pi * np.fft.fftfreq(n, d=self.lx / n)).astype(np.float32)
        kx = np.broadcast_to(k[None, :], (n, n)).astype(np.float32)
        ky = np.broadcast_to(k[:, None], (n, n)).astype(np.float32)
        k2 = kx**2 + ky**2
        ik2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2)).astype(np.float32)
        ii = np.abs(np.fft.fftfreq(n) * n)
        m23 = ((ii[:, None] <= n // 3) & (ii[None, :] <= n // 3)).astype(np.float32)
        return c, s, kx, ky, ik2, m23

    # ------------------------------------------------------------- kernel
    def _kernel(self, wr_ref, wi_ref, c_ref, s_ref, kx_ref, ky_ref, ik2_ref,
                m23_ref, ar_ref, ai_ref):
        n, tb = self.n, self.tile_b
        C, S = c_ref[...], s_ref[...]
        kx, ky = kx_ref[...], ky_ref[...]
        ik2, m23 = ik2_ref[...], m23_ref[...]
        wr, wi = wr_ref[...], wi_ref[...]

        mm = partial(jnp.matmul, precision=_P)

        def right(x, M):
            """(tb, n, n) x (n, n) contracting the LAST axis."""
            return mm(x.reshape(tb * n, n), M).reshape(tb, n, n)

        def fwd_last(xr, xi):
            # (xr + i xi)(C - i S)
            return right(xr, C) + right(xi, S), right(xi, C) - right(xr, S)

        def inv_last(xr, xi):
            return ((right(xr, C) - right(xi, S)) / n,
                    (right(xi, C) + right(xr, S)) / n)

        def tr(x):
            return jnp.swapaxes(x, -1, -2)

        def inv2_real(xr, xi):
            # inverse along axis -2 (via transpose; C/S symmetric), then -1
            zr, zi = inv_last(tr(xr), tr(xi))
            zr, zi = tr(zr), tr(zi)
            zr, _ = inv_last(zr, zi)
            return zr

        def fwd2(x):
            zr, zi = fwd_last(x, jnp.zeros_like(x))
            zr, zi = fwd_last(tr(zr), tr(zi))
            return tr(zr), tr(zi)

        pr, pi = ik2 * wr, ik2 * wi
        u = inv2_real(-ky * pi, ky * pr)
        v = inv2_real(kx * pi, -kx * pr)
        dwdx = inv2_real(-kx * wi, kx * wr)
        dwdy = inv2_real(-ky * wi, ky * wr)
        nr, ni = fwd2(-u * dwdx - v * dwdy)
        ar_ref[...] = nr * m23
        ai_ref[...] = ni * m23

    # --------------------------------------------------------------- call
    def __call__(self, wr: jnp.ndarray, wi: jnp.ndarray):
        """(B, n, n) spectra (re, im) -> advection spectra (re, im)."""
        n, tb = self.n, self.tile_b
        b = wr.shape[0]
        assert b % tb == 0, (b, tb)
        c, s, kx, ky, ik2, m23 = self._consts()
        consts = [jnp.asarray(x) for x in (c, s, kx, ky, ik2, m23)]

        field_spec = pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        const_spec = pl.BlockSpec((n, n), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((b, n, n), jnp.float32)
        return pl.pallas_call(
            self._kernel,
            grid=(b // tb,),
            in_specs=[field_spec, field_spec] + [const_spec] * 6,
            out_specs=[field_spec, field_spec],
            out_shape=[out, out],
            interpret=self.interpret,
        )(wr, wi, *consts)


def xla_advection_ri(n: int, lx: float = 1.0):
    """The XLA comparator: identical math through ops.fourier matmul-DFTs
    (what the production solver runs), jitted over the same batch."""
    from distributedconvrl_pde_control_tpu.ops import fourier

    k = (2.0 * np.pi * np.fft.fftfreq(n, d=lx / n)).astype(np.float32)
    kx = jnp.asarray(np.broadcast_to(k[None, :], (n, n)))
    ky = jnp.asarray(np.broadcast_to(k[:, None], (n, n)))
    k2 = kx**2 + ky**2
    ik2 = jnp.where(k2 == 0.0, 0.0, 1.0 / jnp.where(k2 == 0.0, 1.0, k2))
    ii = np.abs(np.fft.fftfreq(n) * n)
    m23 = jnp.asarray(((ii[:, None] <= n // 3) & (ii[None, :] <= n // 3))
                      .astype(np.float32))

    @jax.jit
    def advection(wr, wi):
        pr, pi = ik2 * wr, ik2 * wi
        u = fourier.ifft2_ri_real(-ky * pi, ky * pr, mode="matmul")
        v = fourier.ifft2_ri_real(kx * pi, -kx * pr, mode="matmul")
        dwdx = fourier.ifft2_ri_real(-kx * wi, kx * wr, mode="matmul")
        dwdy = fourier.ifft2_ri_real(-ky * wi, ky * wr, mode="matmul")
        nr, ni = fourier.fft2_ri(-u * dwdx - v * dwdy, None, mode="matmul")
        return nr * m23, ni * m23

    return advection
