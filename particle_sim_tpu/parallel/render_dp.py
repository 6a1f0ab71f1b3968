"""Multi-chip rendering: per-shard rasterization + ONE framebuffer psum.

The additive premultiplied blend was CHOSEN commutative (render/raster.py
docstring — the reference's own non-premultiplied alpha blend is draw-
order-dependent, i.e. undefined for unsorted points) precisely so partial
framebuffers compose by summation: each shard rasterizes ITS rows of the
row-sharded state (render/raster_compact.py, whose visibility compaction
and segmented sort run shard-locally), and one psum of the f32[H, W, 3]
framebuffer composites the frame. Communication is resolution-bound
(24 MB at 1080p), independent of N — the multi-chip analog of the wire
mode-2 design (app/server.py), and the fix for round-2 verdict item 5
(mesh rendering used to gather every particle to one device).

Clip-to-[0, 1] happens AFTER the psum: clipping per shard first would
darken any pixel whose brightness is split across shards.

Active-count masking: state rows are sharded contiguously (both the
identity order and the per-shard persistent slot order keep each shard's
live particles a storage prefix — parallel/pm_persist_dp.py), so shard k
holds live prefix ``clip(n_active - k*local_n, 0, local_n)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.state import LANE
from ..render import raster_compact
from .mesh import DP_AXIS


def make_render_dp(mesh: Mesh, *, width: int, height: int,
                   interpret: bool = False, flat: bool = False):
    """Jitted (pos, vel, col, param_vec, view_proj, n_active) ->
    f32[height, width, 3] (replicated). ``flat=False`` takes (3, R, LANE)
    component planes row-sharded over dp (the identity-order state
    layout); ``flat=True`` takes (3, N) flat planes sharded over axis 1
    (the persistent carry layout), so the persist fast-render path works
    multi-chip without rebuilding identity order."""
    def local(pos, vel, col, pv, vp, n_active):
        p = pos if not flat else pos.reshape(3, -1, LANE)
        v = vel if not flat else vel.reshape(3, -1, LANE)
        c = col if not flat else col.reshape(3, -1, LANE)
        local_n = p.shape[1] * p.shape[2]
        base = jax.lax.axis_index(DP_AXIS) * local_n
        n_loc = jnp.clip(n_active - base, 0, local_n)
        fb = raster_compact.render(p, v, c, pv, vp, n_loc,
                                   width=width, height=height,
                                   interpret=interpret, clip=False)
        return jnp.clip(jax.lax.psum(fb, DP_AXIS), 0.0, 1.0)

    spec = P(None, DP_AXIS) if flat else P(None, DP_AXIS, None)
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # Pallas kernel bodies (see parallel/dp.py)
    ))
