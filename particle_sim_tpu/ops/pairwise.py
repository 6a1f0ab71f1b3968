"""All-pairs O(N^2) interaction — jax.numpy oracle.

Capability extension beyond the reference (BASELINE.json config 3): the
reference's only force field is the 1-body mouse attractor
(``/root/reference/src/shaders/compute.wgsl:56-66``); this generalizes it to
softened pairwise monopole attraction with unit masses:

    a_i = G * sum_j m_j * (x_j - x_i) / (|x_j - x_i|^2 + eps^2)^(3/2)

The softening eps makes the self-pair contribute exactly zero, so no
self-interaction mask is needed. Inactive (padded) particles ARE masked on
the j side — unlike the independent-particle attractor step, padding would
otherwise exert phantom forces.

The full pairwise step keeps the reference's integrator contract
(gravity/forces accumulate into velocity, then ``p += v*dt``, then
``v *= damping`` — compute.wgsl:52-72); the pairwise acceleration is just one
more force term.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import params as P
from . import physics


def pairwise_accel(
    pos_flat: jax.Array,   # f32[3, N] component rows
    n_active: jax.Array,   # i32 scalar
    g_const,               # scalar
    softening,             # scalar
    masses=None,           # f32[N] source masses (None = unit)
) -> jax.Array:
    """f32[3, N] accelerations; O(N^2) memory — oracle/small-N path.

    Gravity is an acceleration field: only SOURCE masses enter (the
    receiver's mass cancels), so ``masses`` scales the j side only."""
    n = pos_flat.shape[1]
    diff = pos_flat[:, None, :] - pos_flat[:, :, None]   # [3, i=N, j=N]
    r2 = (diff ** 2).sum(axis=0) + softening * softening
    inv = jax.lax.rsqrt(r2)
    w = g_const * inv * inv * inv                         # [N, N]
    j_idx = jnp.arange(n, dtype=jnp.int32)
    src_w = (j_idx < n_active).astype(jnp.float32)
    if masses is not None:
        src_w = src_w * masses
    w = w * src_w[None, :]
    return jnp.einsum("ij,cij->ci", w, diff)


def step_pairwise(
    pos: jax.Array, vel: jax.Array, param_vec: jax.Array,
    pair_vec: jax.Array,   # f32[2]: (G, softening) — PairwiseParams.pack()
    n_active: jax.Array,
    masses=None,
) -> Tuple[jax.Array, jax.Array]:
    """One step with all-pairs + attractor + gravity on (3, R, LANE) planes."""
    flat = pos.reshape(3, -1)
    acc = pairwise_accel(flat, n_active, pair_vec[0], pair_vec[1],
                         masses=masses)
    return physics.kick_and_step_planes(pos, vel, acc.reshape(pos.shape),
                                        param_vec)
