"""Multi-chip particle-mesh stepping: local deposit -> psum(grid) -> solve.

PM parallelizes differently from the ppermute ring (parallel/ring.py): the
coupling between shards is entirely through the G^3 mass grid, so one
``psum`` of the 8 MB grid over ICI replaces the ring's n_dev-1 position
rotations. Per step, per device:

  1. CIC-deposit the local particle shard onto a full local grid
     (zero-communication: the grid is dense, every shard can reach every
     cell);
  2. ``lax.psum`` the mass grids over the dp axis — the ONLY collective;
  3. solve the FFT Poisson convolution redundantly on every chip
     (replicated compute beats sharded FFTs at G=128: 8 MB of ICI traffic
     vs an all-to-all transpose inside every transform);
  4. CIC-gather accelerations for the local shard only.

Communication volume is O(G^3), independent of N — at 16M particles over 8
chips that is 8 MB/step against 2M particle-updates/chip, firmly
compute-bound.

Global padding is masked by translating the global ``n_active`` into each
shard's local count (shards hold contiguous flat index ranges, so
``clip(n_active - shard_idx * local_n, 0, local_n)``), mirroring the ring's
j_base bookkeeping (ring.py:17-22).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import params as Pm
from ..ops import physics, pm, pm_pallas
from .mesh import DP_AXIS


def _plane_spec() -> P:
    return P(None, DP_AXIS, None)


def make_pm_step(mesh: Mesh, cfg: "Pm.PMConfig", *, use_pallas: bool = False,
                 interpret: bool = False):
    """Jitted (pos, vel, param_vec, pair_vec, n_active) -> (pos, vel).

    pos/vel are (3, R, LANE) planes row-sharded over dp; n_active is the
    GLOBAL active count (replicated scalar). ``use_pallas`` selects the
    sorted-kernel CIC path (TPU) over the XLA scatter/gather reference.
    """
    if cfg.auto_box:
        raise NotImplementedError(
            "auto_box + mesh not supported yet (the traced box must be "
            "computed from GLOBAL extents before the local deposits)")

    def local_step(pos, vel, pv, pairv, n_active):
        shape = pos.shape
        local_n = shape[1] * shape[2]
        my_idx = jax.lax.axis_index(DP_AXIS)
        local_active = jnp.clip(n_active - my_idx * local_n, 0, local_n)
        flat = pos.reshape(3, -1)

        if use_pallas:
            key_s, idx_s, frac_s, _ = pm_pallas.pm_sort(flat, local_active,
                                                        cfg)
            rho = pm_pallas.pm_deposit_sorted(key_s, frac_s,
                                              interpret=interpret)
            rho = jax.lax.psum(rho, DP_AXIS)
            grids = pm.solve_accel(rho, cfg, cfg.softening)
            acc = pairv[0] * pm_pallas.pm_gather_sorted(
                grids, key_s, frac_s, idx_s, interpret=interpret)
        else:
            rho = pm.cic_deposit_ref(flat, local_active, cfg)
            rho = jax.lax.psum(rho, DP_AXIS)
            grids = pm.solve_accel(rho, cfg, cfg.softening)
            acc = pairv[0] * pm.cic_gather_ref(grids, flat, cfg)

        # global momentum clean (pm.momentum_clean with a psum'd mean):
        # removes the solver's net-force bias (TPU FFT rfft-axis rounding)
        # and zeroes clamp-gathered padding in one pass
        live = (jnp.arange(local_n, dtype=jnp.int32)
                < local_active).astype(jnp.float32)
        local_sum = (acc * live[None]).sum(axis=1, keepdims=True)
        global_sum = jax.lax.psum(local_sum, DP_AXIS)
        count = jnp.maximum(n_active.astype(jnp.float32), 1.0)
        acc = (acc - global_sum / count) * live[None]

        return physics.kick_and_step_planes(pos, vel, acc.reshape(shape),
                                            pv)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(_plane_spec(), _plane_spec(), P(), P(), P()),
        out_specs=(_plane_spec(), _plane_spec()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))
