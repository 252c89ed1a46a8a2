"""Numerics layer: PDE solvers and integrators as pure jittable functions.

TPU-native equivalents of the reference's L1 layer (solver hot loops):
  * `ks`            — Kuramoto–Sivashinsky spectral CNAB2 stepper
  * `navier_stokes` — 2D vorticity pseudo-spectral RK4 with 3/2 de-aliasing
  * `keller_segel`  — Keller–Segel chemotaxis finite-difference RHS
  * `integrators`   — generic fixed-step midpoint/RK4 and adaptive RK4
"""
