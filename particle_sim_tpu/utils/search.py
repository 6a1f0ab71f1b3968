"""Vectorized binary search via gathers.

``jnp.searchsorted`` lowers poorly on TPU (per-probe while loops); this
fixed-iteration bisection is a handful of fused gathers. Shared by the
sorted-deposit rasterizer (render/raster_sorted.py) and the particle-mesh
chunk tables (ops/pm_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bin_search(sorted_arr: jax.Array, probes: jax.Array, side_right: bool,
               n_iters: int) -> jax.Array:
    """First index i with sorted_arr[i] >= probe (side_right=False,
    numpy side='left') or > probe (side_right=True, side='right').

    Runs a FIXED iteration count, so it must stay stable after
    convergence: when lo == hi == n (probe beyond every element) the
    clipped read sees sorted_arr[n-1] < probe and a naive update would
    push lo past n on every extra iteration — out-of-range results that
    double chunk-table entries downstream. ``mid < n`` gates the
    right-move (an out-of-range mid acts as +inf).
    """
    n = sorted_arr.shape[0]
    lo = jnp.zeros_like(probes)
    hi = jnp.full_like(probes, n)
    for _ in range(n_iters):
        mid = (lo + hi) // 2
        v = sorted_arr[jnp.clip(mid, 0, n - 1)]
        go_right = ((mid < n)
                    & jnp.where(side_right, v <= probes, v < probes))
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def rank_right_iota(base: jax.Array, c_max: int) -> jax.Array:
    """i32[c_max] with out[kk] = searchsorted(base, kk, side='right') - 1
    for the IMPLICIT probes kk = 0..c_max-1 — the pair-table expansion's
    inner rank. For iota probes the bisection is beatable: ONE
    scatter-add of len(base) marks plus ONE cumsum replaces ~10-17
    gather rounds over c_max entries (the dominant cost of the table
    build at 16M). ``base`` must be non-negative; entries >= c_max are
    dropped (they can never be <= any probe)."""
    marks = jnp.zeros((c_max,), jnp.int32).at[base].add(
        1, mode="drop", indices_are_sorted=True)
    return jnp.cumsum(marks) - 1
