"""Sorted-deposit Pallas rasterizer — the fast path for big point counts.

XLA's TPU scatter is serial (~90 ms for 1M updates into 1080p), which makes
the straightforward ``fb.at[py, px].add`` rasterizer (raster.py) the
slowest kernel in the engine. This module replaces the scatter with a
TPU-native pipeline (3.0 ms total for 1M points @1080p on v5e):

  1. project + color + premultiply weight (raster.py code)
  2. key = tile*1024 + local_pixel; invalid -> sentinel; one
     ``lax.sort`` of (key, r, g, b) groups points by 8x128 framebuffer
     tile (~1.4 ms — TPU sort is fast, scatter is not)
  3. a chunk table maps each grid step to a CHUNK-aligned slice of the
     sorted arrays and its framebuffer tile (vectorized binary searches;
     jnp.searchsorted lowers poorly so we roll a gather-based one)
  4. a Pallas kernel deposits each chunk into its (3, 8, 128) VMEM tile
     accumulator with a SEPARABLE one-hot MXU matmul (see _kernel): the
     one-hot IS the validity mask — entries spilling in from neighboring
     tiles or the sentinel match no row, so the kernel has zero
     length/edge logic. Auto-pipelined input blocks (prefetch-scalar
     index maps), accumulated over revisited output tiles.

The deposit is bit-commutative additive blending, same semantics as
raster.render (which remains the small-N/reference oracle).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import params as P
from ..utils.search import bin_search as _bin_search
from ..utils.search import rank_right_iota as _rank_right_iota
from ..ops import physics
from . import raster

TILE_H, TILE_W = 8, 128
PX_PER_TILE = TILE_H * TILE_W   # 1024
CHUNK = 512


def _kernel(t_ref, s_ref, f_ref, key_ref, rgb_ref, out_ref):
    """Separable one-hot deposit: the 1024-px tile one-hot factorizes into
    a row factor (8, CHUNK) carrying the rgb payload and a lane factor
    (128, CHUNK), so the deposit is one (24, CHUNK) @ (CHUNK, 128) bf16
    MXU matmul — ~7x less VPU one-hot construction than the full
    (1024, CHUNK) compare, same MAC count, 4x MXU rate from bf16."""
    i = pl.program_id(0)
    tile = t_ref[i]
    local = key_ref[...] - tile * PX_PER_TILE            # (1, CHUNK) i32
    r_loc = local >> 7                                   # local // TILE_W
    l_loc = local & (TILE_W - 1)
    riota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, CHUNK), 0)
    # f32 build then cast: Mosaic can't relayout the i32-compare masks
    # straight to bf16 tiling (see ops/pm_pallas._family_onehot)
    rmask = jnp.where(riota == r_loc, 1.0,
                      jnp.zeros((TILE_H, CHUNK), jnp.float32))
    # spilled/sentinel particles: r_loc out of [0,8) -> rmask row zero,
    # so a coincidental l_loc & 127 match contributes nothing
    R3 = (rgb_ref[...][:, None, :] * rmask[None]).astype(jnp.bfloat16)
    liota = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, CHUNK), 0)
    L = jnp.where(liota == l_loc, 1.0,
                  jnp.zeros((TILE_W, CHUNK), jnp.float32))
    dep = jax.lax.dot_general(
        R3.reshape(3 * TILE_H, CHUNK), L.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(3, TILE_H, TILE_W)

    @pl.when(f_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += dep[None]


@functools.lru_cache(maxsize=None)
def _build(n_pad: int, n_tiles: int, c_max: int, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # tile_of_chunk, block_of_chunk, first_flag
        grid=(c_max,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, t, s, f: (0, s[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, CHUNK), lambda i, t, s, f: (0, s[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_H, TILE_W), lambda i, t, s, f: (t[i], 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles + 1, 3, TILE_H, TILE_W),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_max * ((TILE_H + TILE_W) * CHUNK
                           + 2 * 3 * PX_PER_TILE * CHUNK),
            bytes_accessed=c_max * CHUNK * 16 + (n_tiles + 1) * 3 * 4096,
            transcendentals=0,
        ),
    )


def render(
    pos: jax.Array, vel: jax.Array, init_color: jax.Array,
    param_vec: jax.Array, view_proj: jax.Array, n_active: jax.Array,
    *, width: int = 1920, height: int = 1080, interpret: bool = False,
) -> jax.Array:
    """f32[height, width, 3] framebuffer in [0, 1]. Traceable.

    Same semantics as raster.render; width/height must be multiples of
    128/8 (framebuffer tile size).
    """
    if width % TILE_W or height % TILE_H:
        raise ValueError(f"({height},{width}) not a multiple of "
                         f"({TILE_H},{TILE_W}); use raster.render")
    tiles_x, tiles_y = width // TILE_W, height // TILE_H
    n_tiles = tiles_x * tiles_y
    sentinel = n_tiles * PX_PER_TILE

    flat_pos = pos.reshape(3, -1)
    flat_vel = vel.reshape(3, -1)
    flat_col = init_color.reshape(3, -1)
    n = flat_pos.shape[1]
    if n % CHUNK:
        raise ValueError(f"point count {n} not a multiple of {CHUNK}")

    r, g, b, bright = raster.shaded_rgb(flat_pos, flat_vel, flat_col,
                                        param_vec)
    px, py, valid = raster.project_to_pixels(flat_pos, view_proj,
                                             width, height)
    active = (jnp.arange(n, dtype=jnp.int32) < n_active).astype(jnp.float32)
    w = valid * active * bright

    tile = (py // TILE_H) * tiles_x + (px // TILE_W)
    local = (py % TILE_H) * TILE_W + (px % TILE_W)
    key = jnp.where(w > 0.0, tile * PX_PER_TILE + local, sentinel)

    key_s, r_s, g_s, b_s = jax.lax.sort(
        (key.astype(jnp.int32), r * w, g * w, b * w), num_keys=1)

    # pad so every CHUNK-aligned block slice is in bounds
    key_p = jnp.concatenate(
        [key_s, jnp.full((CHUNK,), sentinel, jnp.int32)]).reshape(1, -1)
    rgb_p = jnp.stack([
        jnp.concatenate([c_, jnp.zeros((CHUNK,), jnp.float32)])
        for c_ in (r_s, g_s, b_s)])                       # (3, n+CHUNK)
    n_pad = n + CHUNK

    # ---- chunk table (vectorized) ----
    n_iters = max(n, 2).bit_length() + 1  # static python math (jit-safe)
    probes = jnp.arange(n_tiles + 1, dtype=jnp.int32) * PX_PER_TILE
    o = _bin_search(key_s, probes, side_right=False,
                    n_iters=n_iters).astype(jnp.int32)    # (n_tiles+1,)
    a_blk = o[:-1] // CHUNK                               # aligned start block
    end = o[1:]
    c_t = jnp.maximum(-(-(end - a_blk * CHUNK) // CHUNK), 1)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(c_t).astype(jnp.int32)])
    c_max = n // CHUNK + n_tiles + 1                      # static bound

    kk = jnp.arange(c_max, dtype=jnp.int32)
    t_k = _rank_right_iota(base, c_max)
    t_k = jnp.clip(t_k, 0, n_tiles)                       # n_tiles == trash
    real = t_k < n_tiles
    t_safe = jnp.minimum(t_k, n_tiles - 1)
    s_k = jnp.where(real, a_blk[t_safe] + (kk - base[t_safe]), 0)
    s_k = jnp.clip(s_k, 0, n_pad // CHUNK - 1).astype(jnp.int32)
    first_k = jnp.where(real, (kk == base[t_safe]), True).astype(jnp.int32)

    call = _build(n_pad, n_tiles, c_max, interpret)
    tiles = call(t_k, s_k, first_k, key_p, rgb_p)         # (n_tiles+1, 3, 1024)

    fb = tiles[:n_tiles].reshape(tiles_y, tiles_x, 3, TILE_H, TILE_W)
    fb = fb.transpose(0, 3, 1, 4, 2).reshape(height, width, 3)
    return jnp.clip(fb, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret"))
def render_jit(pos, vel, init_color, param_vec, view_proj, n_active,
               width: int = 1920, height: int = 1080,
               interpret: bool = False):
    return render(pos, vel, init_color, param_vec, view_proj, n_active,
                  width=width, height=height, interpret=interpret)
