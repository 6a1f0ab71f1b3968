"""Physics diagnostics: kinetic/potential energy, momentum, extent.

The reference exposes only frame timing (SURVEY.md §5 observability); a
simulation framework also needs physics observables — both for users
(collapse virial ratios, drift monitoring) and as regression anchors
(momentum conservation, bounded energy drift in tests).

All functions are jitted reducers over the SoA planes; one scalar (or a
handful) crosses to the host per call. Potential energy uses the direct
pairwise sum at small N and the PM spectral solve at large N (the mesh
potential is a few FFTs — the same cached kernels as the force solve).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import params as P
from . import pm


@dataclasses.dataclass(frozen=True)
class Diagnostics:
    kinetic: float            # 1/2 sum |v|^2 (unit masses)
    potential: Optional[float]  # pairwise softened potential * G (None: off)
    momentum: tuple           # sum v (3,)
    mean_radius: float        # mean |x| over live particles
    max_speed: float

    def as_dict(self) -> dict:
        return {
            "kinetic": self.kinetic,
            "potential": self.potential,
            "total_energy": (None if self.potential is None
                             else self.kinetic + self.potential),
            "momentum": list(self.momentum),
            "mean_radius": self.mean_radius,
            "max_speed": self.max_speed,
        }


@jax.jit
def _base_reductions(pos, vel, n_active, masses=None):
    flat_p = pos.reshape(3, -1)
    flat_v = vel.reshape(3, -1)
    n = flat_p.shape[1]
    live = (jnp.arange(n, dtype=jnp.int32) < n_active).astype(jnp.float32)
    m = live if masses is None else live * masses
    count = jnp.maximum(n_active.astype(jnp.float32), 1.0)
    kinetic = 0.5 * jnp.sum((flat_v * flat_v).sum(0) * m)
    momentum = (flat_v * m[None]).sum(1)
    radius = jnp.sqrt((flat_p * flat_p).sum(0))
    mean_radius = jnp.sum(radius * live) / count
    speed = jnp.sqrt((flat_v * flat_v).sum(0))
    max_speed = jnp.max(speed * live)
    return kinetic, momentum, mean_radius, max_speed


def _potential_direct(pos_flat, n_active, g_const, softening, masses=None):
    """Exact softened pairwise potential:
    G * sum_{i<j} -m_i m_j / sqrt(r^2+eps^2). O(N^2) memory — small N."""
    n = pos_flat.shape[1]
    live = (jnp.arange(n, dtype=jnp.int32) < n_active).astype(jnp.float32)
    m = live if masses is None else live * masses
    diff = pos_flat[:, None, :] - pos_flat[:, :, None]
    r2 = (diff ** 2).sum(0) + softening * softening
    inv = jax.lax.rsqrt(r2)
    w = inv * m[None, :] * m[:, None]
    # the diagonal contributes one m_i^2/eps self-pair per live particle
    total = w.sum() - (m * m).sum() / softening
    return -0.5 * g_const * total


_potential_direct_jit = jax.jit(_potential_direct)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _potential_pm(pos_flat, n_active, g_const, cfg: "P.PMConfig",
                  masses=None):
    """Mesh potential: E = G/2 * sum_i m_i phi(x_i), phi from the spectral
    solve's 'fd' kernel (one forward + one inverse FFT).

    Honors ``cfg.auto_box`` (solve in cell units on the traced box, eps in
    cells, rescale by 1/h — phi ~ 1/r)."""
    fd_cfg = dataclasses.replace(cfg, gradient="fd")
    coords = None
    scale = 1.0
    if fd_cfg.auto_box:
        box_min, cell = pm.auto_box(pos_flat, n_active, fd_cfg.grid)
        coords = pm.cell_coords_dyn(pos_flat, box_min, cell, fd_cfg.grid)
        scale = 1.0 / cell
    rho = pm.cic_deposit_ref(pos_flat, n_active, fd_cfg, coords=coords,
                             masses=masses)
    g = fd_cfg.grid
    h = 1.0 if fd_cfg.auto_box else fd_cfg.cell_size
    eps = float(fd_cfg.softening)
    if fd_cfg.boundary == "isolated":
        kern = pm._isolated_kernels_host(g, h, eps, "fd")[0]
        rho_p = jnp.pad(rho, ((0, g), (0, g), (0, g)))
        phi = pm._irfftn_octant(jnp.fft.rfftn(rho_p) * jnp.asarray(kern), g)
    else:
        kern = pm._periodic_kernels_host(g, h, eps, "fd")[0]
        phi = jnp.fft.irfftn(jnp.fft.rfftn(rho) * jnp.asarray(kern),
                             s=rho.shape)
    phi_i = pm.cic_gather_ref(phi.astype(jnp.float32)[None], pos_flat,
                              fd_cfg, coords=coords)[0]
    live = (jnp.arange(pos_flat.shape[1], dtype=jnp.int32)
            < n_active).astype(jnp.float32)
    m = live if masses is None else live * masses
    # subtract each particle's self-energy (its own CIC cloud's potential
    # is NOT just -m/eps on the mesh; the dominant constant term is the
    # kernel's r=0 value spread over the particle's own cells)
    self_phi = -1.0 / eps
    return (0.5 * g_const * scale
            * ((phi_i * m).sum() - self_phi * (m * m).sum()))


def measure(pos, vel, n_active, *, g_const: float = 0.0,
            softening: float = 2.0, pm_cfg: Optional["P.PMConfig"] = None,
            potential: bool = False, masses=None) -> Diagnostics:
    """Compute diagnostics from (3, R, LANE) planes; host scalars out.

    ``potential=True`` adds gravitational potential energy: the exact
    pairwise sum when n_active <= 12288 (O(N^2) memory), the mesh
    estimate otherwise (requires ``pm_cfg``; the mesh self-energy
    correction makes it an ESTIMATE — good for drift tracking, not an
    absolute reference). When neither applies, ``potential`` stays None.
    With an auto-box pm_cfg, ``softening``/pm softening are in CELL
    units; both paths convert via the current traced cell size.
    """
    kinetic, momentum, mean_radius, max_speed = _base_reductions(
        pos, vel, n_active, masses)
    pot = None
    if potential and g_const != 0.0:
        flat = pos.reshape(3, -1)
        n = int(n_active)
        if n <= 12288:
            eps = softening
            if pm_cfg is not None and pm_cfg.auto_box:
                # pm softening is in cell units under auto_box
                _, cell = pm.auto_box(flat, n_active, pm_cfg.grid)
                eps = pm_cfg.softening * float(cell)
            k = min(flat.shape[1], -(-max(n, 1) // 1024) * 1024)
            pot = float(_potential_direct_jit(
                flat[:, :k], jnp.minimum(n_active, k), g_const, eps,
                None if masses is None else masses[:k]))
        elif pm_cfg is not None:
            pot = float(_potential_pm(flat, n_active, g_const, pm_cfg,
                                      masses))
    return Diagnostics(
        kinetic=float(kinetic),
        potential=pot,
        momentum=tuple(np.asarray(momentum).tolist()),
        mean_radius=float(mean_radius),
        max_speed=float(max_speed),
    )
