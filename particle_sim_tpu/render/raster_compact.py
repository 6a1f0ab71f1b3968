"""Compaction + segmented-sort rasterizer — the big-N interactive path.

raster_sorted.py pays one GLOBAL 4-operand ``lax.sort`` over every point
every frame — measured 119 ms of its 130 ms total at 16M points (the
sort comparator network is ~41 ms at 16M plus ~13.5 ms per 32-bit
operand). This module rebuilds the same sorted-deposit pipeline around
three measured facts (tools/r3_measure.py, round 3):

  1. **Most points are off-screen.** At the default camera only ~27% of
     a 16M hollow sphere passes the clip test. Points are grouped in
     CHUNK-sized blocks, and on a spatially coherent order (the
     persistent cell-sorted PM state, or the golden-spiral generation
     order) whole chunks are invisible together — so a chunk-granular
     VISIBILITY COMPACTION (one Pallas copy kernel steered by a
     prefetched kept-chunk list) shrinks the sort input by the invisible
     fraction before anything expensive runs. Bucketed static sizes keep
     shapes compile-stable; a ``lax.switch`` picks the smallest bucket
     that fits (every branch returns the same framebuffer shape, so the
     choice is traced — no host round trip).
  2. **Segmented sorts are cheaper than global ones.** ``lax.sort`` over
     (S, m/S) sorts rows independently with an O(log^2 row) comparator
     network: S=16 segments cut the 16M comparator depth by ~43%. The
     deposit does not need a globally sorted array — only that each
     OUTPUT tile's visits are consecutive — and that is restored by
     ordering the (tile, chunk) PAIR TABLE tile-major instead (one tiny
     ~tens-of-k-element sort), while chunk payloads stay segment-sorted.
  3. **Payload operands dominate sort cost.** r, g, b ride as TWO
     bf16-packed i32 words instead of three f32 operands (3-operand
     sort = 82 ms vs 119 ms at 16M, full size — and the sort runs on
     the compacted fraction). bf16 keeps RELATIVE precision, so deep
     pixel stacks of dim points accumulate to ~0.2% — a fixed-point
     pack (tried first) zeroes contributions below its step and fails
     the hotspot test.

Pair-table construction needs no searches at all: within a sorted
segment, consecutive chunks have non-decreasing tile ids, so each
chunk's tile range is [first tile, last tile] and the per-segment total
TELESCOPES to <= segment_chunks + n_tiles — a hard static capacity of
b/CHUNK + S*n_tiles + n_tiles pairs, visited only up to the traced real
total (Mosaic dynamic grid). Every tile gets one PAD first-visit pair
(zeroing), so empty tiles render black instead of garbage.

Same blend semantics as raster.render (the commutative additive
premultiplied blend, see raster.py for the reference-semantics
discussion); raster.render remains the small-N oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.search import rank_right_iota as _rank_right_iota
from . import raster

TILE_H, TILE_W = 8, 128
PX_PER_TILE = TILE_H * TILE_W   # 1024
CHUNK = 512
SEGMENTS = 16                   # sort rows; divisor of every bucket's chunks

_S_BITS = 17                    # chunk-slice field (supports 64M points)
_S_MASK = (1 << _S_BITS) - 1
_F_BIT = 1 << _S_BITS           # first-visit (PAD) flag
_T_SHIFT = _S_BITS + 1          # tile field (13 bits: up to 4K frames)


def _pack_rgb_bf16(r, g, b):
    """(rg i32[N], b i32[N]): r,g as bf16 bit-halves of one word, b as
    bf16 in the low half of the second (bf16 = the top 16 bits of f32,
    so pack/unpack are shifts + bitcasts, no float conversion ops)."""
    def bits16(v):
        # round-to-nearest bf16 (+0x8000 then truncate): plain truncation
        # biases every point DOWN up to 1 ulp, which stacks coherently in
        # deep pixels (measured 0.6% pixel error on a 4k cloud)
        raw = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
        return jax.lax.shift_right_logical(raw + 0x8000, 16)

    return bits16(r) | jax.lax.shift_left(bits16(g), 16), bits16(b)


def _deposit_kernel(tab_ref, key_ref, rg_ref, b_ref, out_ref):
    """One (tile, chunk) pair: unpack the bf16 payload, build the
    separable row/lane one-hots (raster_sorted._kernel's factorization —
    spilled points and SENTINELs miss every row, so there is zero edge
    logic), deposit via one bf16 MXU matmul."""
    i = pl.program_id(0)
    w = tab_ref[i]
    tile = (w >> _T_SHIFT) & 0x1FFF
    local = key_ref[...] - tile * PX_PER_TILE            # (1, CHUNK) i32
    r_loc = local >> 7
    l_loc = local & (TILE_W - 1)
    rg = rg_ref[...]
    bw = b_ref[...]
    as_f32 = lambda hi16: jax.lax.bitcast_convert_type(hi16, jnp.float32)
    rgb = jnp.concatenate(
        [as_f32(jax.lax.shift_left(rg, 16)),
         as_f32(rg & jnp.int32(-65536)),
         as_f32(jax.lax.shift_left(bw, 16))], axis=0)    # (3, CHUNK)
    riota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, CHUNK), 0)
    rmask = jnp.where(riota == r_loc, 1.0,
                      jnp.zeros((TILE_H, CHUNK), jnp.float32))
    R3 = (rgb[:, None, :] * rmask[None]).astype(jnp.bfloat16)
    liota = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, CHUNK), 0)
    L = jnp.where(liota == l_loc, 1.0,
                  jnp.zeros((TILE_W, CHUNK), jnp.float32))
    dep = jax.lax.dot_general(
        R3.reshape(3 * TILE_H, CHUNK), L.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(3, TILE_H, TILE_W)

    @pl.when((w & _F_BIT) != 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += dep[None]


def _make_deposit(n_pad: int, n_tiles: int, c_max: int, interpret: bool,
                  grid_n):
    """Deposit with a TRACED grid size (pm_pallas._build_deposit_dyn
    pattern): only the packed prefix of the pair table is visited; the
    static capacity's trash slots cost nothing."""
    s_last = n_pad // CHUNK - 1

    def in_s(i, p):
        return (0, jnp.minimum(p[i] & _S_MASK, s_last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), in_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), in_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), in_s, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_H, TILE_W),
            lambda i, p: ((p[i] >> _T_SHIFT) & 0x1FFF, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _deposit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, TILE_H, TILE_W),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_max * ((TILE_H + TILE_W) * CHUNK
                           + 2 * 3 * PX_PER_TILE * CHUNK),
            bytes_accessed=c_max * CHUNK * 12 + n_tiles * 3 * 4096,
            transcendentals=0,
        ),
    )


def _make_compact(b: int, sentinel: int, interpret: bool):
    def in_map(i, kl, kn):
        return (0, kl[i])

    def kernel(kl_ref, kn_ref, key_ref, rg_ref, b_ref,
               okey_ref, org_ref, ob_ref):
        i = pl.program_id(0)
        live = i < kn_ref[0]
        okey_ref[...] = jnp.where(live, key_ref[...], sentinel)
        org_ref[...] = jnp.where(live, rg_ref[...], 0)
        ob_ref[...] = jnp.where(live, b_ref[...], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), in_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, kl, kn: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda i, kl, kn: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda i, kl, kn: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, b), jnp.int32),
                   jax.ShapeDtypeStruct((1, b), jnp.int32),
                   jax.ShapeDtypeStruct((1, b), jnp.int32)],
        interpret=interpret,
    )


def _segments_for(b: int) -> int:
    s = SEGMENTS
    while s > 1 and (b % (s * CHUNK) or b // CHUNK < 2 * s):
        s //= 2
    return s


def _buckets(n: int) -> list:
    """Ascending static compaction sizes. The largest is always n (the
    correct-for-anything bucket); smaller ones are SEGMENTS*CHUNK-aligned
    halvings down to n/8."""
    out = [n]
    step = SEGMENTS * CHUNK
    b = n // 2
    while b >= max(step, n // 8):
        out.append(-(-b // step) * step)
        b //= 2
    return sorted(set(out))


def _render_bucket(key_full, rg_full, b_full, kept_list, kept_n, *,
                   b: int, n_tiles: int, sentinel: int, interpret: bool):
    """One static-size branch: compact -> segment-sort -> pair table ->
    deposit. Returns f32[n_tiles, 3, TILE_H, TILE_W] tile planes."""
    n_chunks = b // CHUNK
    seg = _segments_for(b)

    compact = _make_compact(b, sentinel, interpret)
    key_c, rg_c, b_c = compact(kept_list, kept_n, key_full, rg_full, b_full)

    key_s, rg_s, b_s = jax.lax.sort(
        (key_c.reshape(seg, b // seg), rg_c.reshape(seg, b // seg),
         b_c.reshape(seg, b // seg)),
        num_keys=1)
    key_s = key_s.reshape(-1)
    rg_s = rg_s.reshape(-1)
    b_s = b_s.reshape(-1)

    # per-chunk tile range over LIVE keys (chunks are slices of a sorted
    # segment, so keys are sorted within each chunk; sentinels sit at
    # the end of each segment and are masked out of the range)
    kc = key_s.reshape(n_chunks, CHUNK)
    live = kc < sentinel
    t_first = jnp.where(live, kc >> 10, n_tiles).min(axis=1)
    t_last = jnp.where(live, kc >> 10, -1).max(axis=1)
    cnt = jnp.maximum(t_last - t_first + 1, 0)            # 0 = empty chunk
    total_real = cnt.sum()

    # candidate pairs, chunk-major: chunk s x tiles [t_first_s, t_last_s]
    # (a strictly interior tile with no points in chunk s has no points
    # anywhere in the segment or they'd be in this chunk — sortedness —
    # so the only wasted visits are segment-globally-empty tiles)
    c_real = n_chunks + seg * n_tiles       # telescoping bound per segment
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt).astype(jnp.int32)])
    kk = jnp.arange(c_real, dtype=jnp.int32)
    s_k = _rank_right_iota(base, c_real)
    s_k = jnp.clip(s_k, 0, n_chunks - 1)
    real = kk < total_real
    t_k = jnp.clip(t_first[s_k] + (kk - base[s_k]), 0, n_tiles - 1)
    word_r = jnp.where(real, s_k | (t_k << _T_SHIFT), jnp.int32(0x7FFFFFFF))
    sort_r = jnp.where(real, t_k * 2 + 1, jnp.int32(0x7FFFFFFF))

    # PAD pairs: every tile's zeroing first visit, pointing at the
    # all-SENTINEL PAD chunk appended below; sorts BEFORE the tile's
    # real pairs (key parity bit)
    t_pad = jnp.arange(n_tiles, dtype=jnp.int32)
    word_p = n_chunks | _F_BIT | (t_pad << _T_SHIFT)
    sort_p = t_pad * 2

    _, table = jax.lax.sort(
        (jnp.concatenate([sort_p, sort_r]),
         jnp.concatenate([word_p, word_r])), num_keys=1)
    total = total_real + n_tiles

    key_p = jnp.concatenate(
        [key_s, jnp.full((CHUNK,), sentinel, jnp.int32)]).reshape(1, -1)
    rg_p = jnp.concatenate(
        [rg_s, jnp.zeros((CHUNK,), jnp.int32)]).reshape(1, -1)
    b_p = jnp.concatenate(
        [b_s, jnp.zeros((CHUNK,), jnp.int32)]).reshape(1, -1)
    dep = _make_deposit(b + CHUNK, n_tiles, c_real + n_tiles, interpret,
                        jnp.minimum(total, c_real + n_tiles)
                        .astype(jnp.int32))
    return dep(table, key_p, rg_p, b_p)


def render(
    pos: jax.Array, vel: jax.Array, init_color: jax.Array,
    param_vec: jax.Array, view_proj: jax.Array, n_active: jax.Array,
    *, width: int = 1920, height: int = 1080, interpret: bool = False,
    clip: bool = True,
) -> jax.Array:
    """f32[height, width, 3] framebuffer in [0, 1]. Traceable.

    Same semantics as raster.render; width/height must be multiples of
    128/8 (framebuffer tile size) and the point capacity a multiple of
    CHUNK. Works on ANY point order; the compaction only wins when the
    order is spatially coherent (persistent PM state, generation order),
    and degrades gracefully to a full-size segmented sort otherwise.
    ``clip=False`` returns the raw accumulated framebuffer — for
    multi-chip composition, where partial framebuffers are psum'd BEFORE
    the final clamp (parallel/render_dp.py).
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
    rg_w, b_w = _pack_rgb_bf16(r * w, g * w, b * w)

    # chunk-granular visibility: kept-chunk list via a stable 2-op sort
    # (visible chunks first, original order preserved)
    vis = (key.reshape(-1, CHUNK).min(axis=1) < sentinel).astype(jnp.int32)
    kept_n = vis.sum().astype(jnp.int32)
    _, kept_list = jax.lax.sort(
        (1 - vis, jnp.arange(n // CHUNK, dtype=jnp.int32)), num_keys=1)

    buckets = _buckets(n)
    idx = sum((kept_n * CHUNK > bb).astype(jnp.int32) for bb in buckets[:-1])
    tiles = jax.lax.switch(
        idx,
        [functools.partial(_render_bucket, b=bb, n_tiles=n_tiles,
                           sentinel=sentinel, interpret=interpret)
         for bb in buckets],
        key.reshape(1, -1), rg_w.reshape(1, -1), b_w.reshape(1, -1),
        kept_list, kept_n[None])

    fb = tiles.reshape(tiles_y, tiles_x, 3, TILE_H, TILE_W)
    fb = fb.transpose(0, 3, 1, 4, 2).reshape(height, width, 3)
    return jnp.clip(fb, 0.0, 1.0) if clip else fb


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret"))
def render_jit(pos, vel, init_color, param_vec, view_proj, n_active,
               width: int = 1920, height: int = 1080,
               interpret: bool = False):
    return render(pos, vel, init_color, param_vec, view_proj, n_active,
                  width=width, height=height, interpret=interpret)
