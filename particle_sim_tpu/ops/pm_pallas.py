"""Particle-mesh fast path — sorted-deposit / sorted-gather Pallas kernels.

XLA's TPU scatter (ops/pm.cic_deposit_ref) is serial; at 1M particles the
deposit alone costs hundreds of ms. This module replaces both CIC transfer
steps with the sorted one-hot-matmul machinery proven by the rasterizer
(render/raster_sorted.py), generalized to 3D and to a separable CIC stencil:

  1. cell id = (z*G + y)*G + x with G = 128 maps the flattened mass grid to
     TPU-native (row = z*128 + y, lane = x) tiles; one ``lax.sort`` groups
     particles by cell (payloads: fractional offsets + original index).
  2. CIC is separable: the 8-corner deposit factorizes into a row one-hot
     R[r,p] (4 corner terms: y/z weights) and a lane one-hot L[l,p]
     (2 terms: x weights), so a chunk's full 8-corner deposit is ONE MXU
     matmul  D = R @ L^T  into a (T_ROWS, 128) grid tile. Corner spill
     across tile boundaries is handled raster-style: a chunk-table pairs
     each grid tile with every CHUNK-aligned slice whose corner rows can
     touch it; non-matching rows simply miss the one-hot.
  3. The gather is the transpose: per chunk, C = A . R contracts the tile's
     acceleration block with the same row one-hot, then a lane-weighted
     reduction applies L — trilinear interpolation of all 8 corners in one
     matmul (bf16 inputs, f32 accumulation).
  4. Un-sort is a second ``lax.sort`` keyed on the carried original index
     (cheaper than a random-access take).

The spectral solve between the two kernels is shared with ops/pm.py.
Requires grid == 128 (the lane decomposition); any-grid falls back to the
jnp reference path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import params as P
from . import physics, pm

GRID = 128
LANE = 128
ROWS_TOTAL = GRID * GRID * GRID // LANE     # 16384 (row = z*128 + y)
T_ROWS = 64                                  # grid-tile rows per kernel block
N_TILES = ROWS_TOTAL // T_ROWS               # 256
CHUNK = 512
SPREAD = GRID + 1                            # max corner row offset (z+1,y+1)
SENTINEL = GRID * GRID * GRID                # id past the last cell


def _bin_search(sorted_arr: jax.Array, probes: jax.Array, side_right: bool,
                n_iters: int) -> jax.Array:
    """Vectorized binary search via gathers (raster_sorted.py:45)."""
    n = sorted_arr.shape[0]
    lo = jnp.zeros_like(probes)
    hi = jnp.full_like(probes, n)
    for _ in range(n_iters):
        mid = (lo + hi) // 2
        v = sorted_arr[jnp.clip(mid, 0, n - 1)]
        go_right = jnp.where(side_right, v <= probes, v < probes)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _corner_onehots(key, fx, fy, fz, dtype):
    """(R (T_ROWS, CHUNK), L (LANE, CHUNK)) separable CIC one-hots.

    ``key`` here is the tile-local row (may be negative / out of range —
    non-matching rows contribute nothing, which IS the spill masking).
    Built in f32 (i1 masks relayout from the i32 compares' (8,128) tiling;
    Mosaic can't relayout them straight to bf16's (16,128)) and cast after.
    """
    lrow = key
    riota = jax.lax.broadcasted_iota(jnp.int32, (T_ROWS, CHUNK), 0)
    wy0, wy1 = 1.0 - fy, fy
    wz0, wz1 = 1.0 - fz, fz
    zero = jnp.zeros((T_ROWS, CHUNK), jnp.float32)
    R = (jnp.where(riota == lrow, wy0 * wz0, zero)
         + jnp.where(riota == lrow + 1, wy1 * wz0, zero)
         + jnp.where(riota == lrow + GRID, wy0 * wz1, zero)
         + jnp.where(riota == lrow + GRID + 1, wy1 * wz1, zero))
    liota = jax.lax.broadcasted_iota(jnp.int32, (LANE, CHUNK), 0)
    return R.astype(dtype), liota


def _deposit_kernel(t_ref, s_ref, f_ref, key_ref, frac_ref, out_ref):
    i = pl.program_id(0)
    t = t_ref[i]
    key = key_ref[...]                        # (1, CHUNK) i32 cell ids
    row = key >> 7
    x = key & (LANE - 1)
    fx, fy, fz = frac_ref[0:1], frac_ref[1:2], frac_ref[2:3]
    # bf16 one-hots, f32 accumulation: 4x MXU rate; the CIC weights round
    # identically here and in the gather (same f32 fracs, same cast), so
    # deposit/gather stay symmetric (momentum conservation holds)
    R, liota = _corner_onehots(row - t * T_ROWS, fx, fy, fz, jnp.bfloat16)
    wx0, wx1 = 1.0 - fx, fx
    zero = jnp.zeros((LANE, CHUNK), jnp.float32)
    L = (jnp.where(liota == x, wx0, zero)
         + jnp.where(liota == x + 1, wx1, zero))
    dep = jax.lax.dot_general(
        R, L.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # (T_ROWS, LANE)

    @pl.when(f_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += dep[None]


def _gather_kernel(s_ref, t_ref, f_ref, key_ref, frac_ref, a_ref, out_ref):
    i = pl.program_id(0)
    t = t_ref[i]
    key = key_ref[...]
    row = key >> 7
    x = key & (LANE - 1)
    fx, fy, fz = frac_ref[0:1], frac_ref[1:2], frac_ref[2:3]
    R, liota = _corner_onehots(row - t * T_ROWS, fx, fy, fz, jnp.bfloat16)
    # C[c, l, p] = sum_r A[c, r, l] R[r, p]
    C = jax.lax.dot_general(
        a_ref[...], R, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (3, LANE, CHUNK)
    wx0, wx1 = (1.0 - fx).astype(jnp.float32), fx.astype(jnp.float32)
    zero = jnp.zeros((LANE, CHUNK), jnp.float32)
    L = (jnp.where(liota == x, wx0, zero)
         + jnp.where(liota == x + 1, wx1, zero))
    g = (C * L[None]).sum(axis=1)             # (3, CHUNK)

    @pl.when(f_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += g


@functools.lru_cache(maxsize=None)
def _build_deposit(c_max: int, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # tile_of_pair, slice_of_pair, first_flag
        grid=(c_max,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, t, s, f: (0, s[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, CHUNK), lambda i, t, s, f: (0, s[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T_ROWS, LANE), lambda i, t, s, f: (t[i], 0, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _deposit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_TILES + 1, T_ROWS, LANE),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_max * 2 * T_ROWS * CHUNK * LANE,
            bytes_accessed=c_max * CHUNK * 16 + N_TILES * T_ROWS * LANE * 4,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=None)
def _build_gather(n_pad: int, c_max: int, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # slice_of_pair, tile_of_pair, first_flag
        grid=(c_max,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, s, t, f: (0, s[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, CHUNK), lambda i, s, t, f: (0, s[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T_ROWS, LANE), lambda i, s, t, f: (0, t[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, CHUNK), lambda i, s, t, f: (0, s[i]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, n_pad + CHUNK), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_max * (2 * 3 * T_ROWS * CHUNK * LANE
                           + 3 * CHUNK * LANE),
            bytes_accessed=c_max * (CHUNK * 16 + 3 * T_ROWS * LANE * 2),
            transcendentals=0,
        ),
    )


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

def _deposit_table(key_s: jax.Array, n_pad: int):
    """Tile-major pair table: (t_k, s_k, first_k, c_max).

    Tile t's output rows [t*T_ROWS, (t+1)*T_ROWS) receive corners from
    particles with base row in [t*T_ROWS - SPREAD, (t+1)*T_ROWS), i.e. base
    cell id in [lo*LANE, hi*LANE).
    """
    n_chunks = n_pad // CHUNK
    n_iters = max(n_pad, 2).bit_length() + 1
    t_idx = jnp.arange(N_TILES + 1, dtype=jnp.int32)
    lo = jnp.maximum(t_idx * T_ROWS - SPREAD, 0) * LANE
    hi = jnp.minimum((t_idx + 1) * T_ROWS, ROWS_TOTAL) * LANE
    o = _bin_search(key_s, lo, side_right=False, n_iters=n_iters)[:-1]
    end = _bin_search(key_s, hi, side_right=False, n_iters=n_iters)[:-1]
    a_blk = (o // CHUNK).astype(jnp.int32)
    c_t = jnp.maximum(-(-(end - a_blk * CHUNK) // CHUNK), 1).astype(jnp.int32)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(c_t).astype(jnp.int32)])
    # static bound: each particle's lookback window spans <= 3 extra tiles
    c_max = 4 * n_chunks + 2 * N_TILES + 2
    kk = jnp.arange(c_max, dtype=jnp.int32)
    t_k = (_bin_search(base, kk, side_right=True,
                       n_iters=(N_TILES + 2).bit_length() + 1)
           .astype(jnp.int32) - 1)
    t_k = jnp.clip(t_k, 0, N_TILES)           # N_TILES == trash tile
    real = t_k < N_TILES
    t_safe = jnp.minimum(t_k, N_TILES - 1)
    s_k = jnp.where(real, a_blk[t_safe] + (kk - base[t_safe]), 0)
    s_k = jnp.clip(s_k, 0, n_chunks - 1).astype(jnp.int32)
    first_k = jnp.where(real, kk == base[t_safe], True).astype(jnp.int32)
    return t_k, s_k, first_k, c_max


def _gather_table(key_s: jax.Array, n_pad: int):
    """Chunk-major pair table: (s_k, t_k, first_k, c_max).

    For each CHUNK-aligned slice, the contiguous range of grid tiles its
    particles' corner rows touch. Slice-major order keeps the output block
    index non-decreasing (required for revisit accumulation)."""
    n_chunks = n_pad // CHUNK
    row_first = key_s[0::CHUNK] >> 7                       # (n_chunks,)
    row_last = key_s[CHUNK - 1::CHUNK] >> 7
    t_lo = jnp.clip(row_first // T_ROWS, 0, N_TILES - 1).astype(jnp.int32)
    t_hi = jnp.clip((row_last + SPREAD) // T_ROWS, 0,
                    N_TILES - 1).astype(jnp.int32)
    t_hi = jnp.maximum(t_hi, t_lo)
    counts = (t_hi - t_lo + 1).astype(jnp.int32)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    total = base[-1]
    # counts_s <= [tile(row_last) - tile(row_first)] + 1 + ceil(SPREAD/T_ROWS)
    # and the spans telescope (keys sorted: first(s+1) >= last(s)), so
    # sum <= N_TILES + n_chunks + 3*n_chunks
    c_max = 4 * n_chunks + N_TILES + 2
    kk = jnp.arange(c_max, dtype=jnp.int32)
    s_k = (_bin_search(base, kk, side_right=True,
                       n_iters=max(n_chunks + 2, 2).bit_length() + 1)
           .astype(jnp.int32) - 1)
    s_k = jnp.clip(s_k, 0, n_chunks)          # n_chunks == trash block
    real = kk < total
    s_safe = jnp.minimum(s_k, n_chunks - 1)
    t_k = jnp.where(real, t_lo[s_safe] + (kk - base[s_safe]), 0)
    t_k = jnp.clip(t_k, 0, N_TILES - 1).astype(jnp.int32)
    s_k = jnp.where(real, s_k, n_chunks).astype(jnp.int32)
    first_k = jnp.where(real, kk == base[s_safe],
                        kk == total).astype(jnp.int32)
    return s_k, t_k, first_k, c_max


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def pm_sort(pos_flat: jax.Array, n_active: jax.Array,
            cfg: "P.PMConfig") -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(key_s, idx_s, frac_s): particles grouped by cell id.

    key_s i32[N] sorted cell ids (inactive -> SENTINEL, at the end);
    idx_s i32[N] carried original indices; frac_s f32[3, N] CIC fractions.
    """
    if cfg.grid != GRID:
        raise ValueError(f"fast path requires grid={GRID}, got {cfg.grid}")
    n = pos_flat.shape[1]
    if n % CHUNK:
        raise ValueError(f"particle capacity {n} not a multiple of {CHUNK}")
    c = pm.cell_coords(pos_flat, cfg)
    i0 = jnp.floor(c)
    f = c - i0
    i0 = i0.astype(jnp.int32)
    key = (i0[2] * GRID + i0[1]) * GRID + i0[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(idx < n_active, key, SENTINEL)
    key_s, idx_s, fx_s, fy_s, fz_s = jax.lax.sort(
        (key, idx, f[0], f[1], f[2]), num_keys=1)
    return key_s, idx_s, jnp.stack([fx_s, fy_s, fz_s])


def pm_deposit_sorted(key_s: jax.Array, frac_s: jax.Array,
                      *, interpret: bool = False) -> jax.Array:
    """f32[G, G, G] mass grid from cell-sorted particles."""
    n = key_s.shape[0]
    t_k, s_k, first_k, c_max_d = _deposit_table(key_s, n)
    dep = _build_deposit(c_max_d, interpret)
    tiles = dep(t_k, s_k, first_k, key_s.reshape(1, -1), frac_s)
    return tiles[:N_TILES].reshape(GRID, GRID, GRID)


def pm_gather_sorted(grids: jax.Array, key_s: jax.Array, frac_s: jax.Array,
                     idx_s: jax.Array, *, interpret: bool = False
                     ) -> jax.Array:
    """f32[3, N] accelerations in ORIGINAL particle order, interpolated
    from grids f32[3, G, G, G] at the cell-sorted particles."""
    n = key_s.shape[0]
    a_tiles = grids.reshape(3, ROWS_TOTAL, LANE).astype(jnp.bfloat16)
    sg_k, tg_k, firstg_k, c_max_g = _gather_table(key_s, n)
    gat = _build_gather(n, c_max_g, interpret)
    acc_sorted = gat(sg_k, tg_k, firstg_k, key_s.reshape(1, -1), frac_s,
                     a_tiles)[:, :n]
    # un-sort via a second key sort on the carried original index
    _, ax, ay, az = jax.lax.sort(
        (idx_s, acc_sorted[0], acc_sorted[1], acc_sorted[2]), num_keys=1)
    return jnp.stack([ax, ay, az])


def pm_accel(pos_flat: jax.Array, n_active: jax.Array, g_const,
             cfg: "P.PMConfig", *, interpret: bool = False) -> jax.Array:
    """f32[3, N] PM acceleration — sorted-kernel fast path (grid must be
    128, N a multiple of 512). Traceable."""
    key_s, idx_s, frac_s = pm_sort(pos_flat, n_active, cfg)
    rho = pm_deposit_sorted(key_s, frac_s, interpret=interpret)
    grids = pm.solve_accel(rho, cfg, cfg.softening)      # (3, G, G, G)
    acc = pm_gather_sorted(grids, key_s, frac_s, idx_s, interpret=interpret)
    return g_const * acc


def step_pm(pos: jax.Array, vel: jax.Array, param_vec: jax.Array,
            pair_vec: jax.Array, n_active: jax.Array, cfg: "P.PMConfig",
            *, interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One frame: PM self-gravity (fast path) + attractor step, on
    (3, R, LANE) planes — same contract as pm.step_pm_ref."""
    shape = pos.shape
    flat = pos.reshape(3, -1)
    acc = pm_accel(flat, n_active, pair_vec[0], cfg, interpret=interpret)
    dt = param_vec[P.P_DT]
    vel = vel + acc.reshape(shape) * dt
    px, py, pz, vx, vy, vz = physics.attractor_step(
        pos[0], pos[1], pos[2], vel[0], vel[1], vel[2],
        dt=dt, gravity=param_vec[P.P_GRAVITY],
        mouse_force=param_vec[P.P_MOUSE_FORCE],
        mouse_radius=param_vec[P.P_MOUSE_RADIUS],
        damping=param_vec[P.P_DAMPING],
        mouse_x=param_vec[P.P_MOUSE_X], mouse_y=param_vec[P.P_MOUSE_Y],
        mouse_z=param_vec[P.P_MOUSE_Z], dragging=param_vec[P.P_DRAGGING],
    )
    return jnp.stack([px, py, pz]), jnp.stack([vx, vy, vz])


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def step_pm_jit(pos, vel, param_vec, pair_vec, n_active, cfg,
                interpret: bool = False):
    return step_pm(pos, vel, param_vec, pair_vec, n_active, cfg,
                   interpret=interpret)
