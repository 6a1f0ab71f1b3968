"""Particle-mesh fast path — sorted-deposit / sorted-gather Pallas kernels.

XLA's TPU scatter (ops/pm.cic_deposit_ref) is serial; at 1M particles the
deposit alone costs hundreds of ms. This module replaces both CIC transfer
steps with the sorted one-hot-matmul machinery proven by the rasterizer
(render/raster_sorted.py), generalized to 3D and to a separable CIC stencil:

  1. cell id = (z*G + y)*G + x with G = 128 maps the flattened mass grid to
     TPU-native (row = z*128 + y, lane = x) tiles; one ``lax.sort`` groups
     particles by cell (payloads: fractional offsets + original index).
  2. CIC is separable: the 8-corner deposit factorizes into a row one-hot
     R[r,p] (y/z weights) and a lane one-hot L[l,p] (2 terms: x weights),
     so a chunk's deposit is ONE MXU matmul  D = R @ L^T  into a
     (T_ROWS, 128) grid tile. The z-offset between a particle's lower and
     upper corner rows is exactly GRID rows (a whole number of tiles), so
     the row one-hot is split into two FAMILIES — lower-z corners (rows
     r, r+1, weight 1-fz) and upper-z corners (rows r+128, r+129, weight
     fz) — each a 2-term one-hot. Pairing tiles with chunk slices per
     family (two (T_ROWS+1)-row windows instead of one contiguous
     (GRID+T_ROWS+1)-row window spanning both)
     skips the ~1-tile dead zone between the corner pairs (~25-30% fewer
     MXU matmuls at realistic densities) and halves the one-hot
     construction cost. Corner spill across tile boundaries is handled
     raster-style: non-matching rows simply miss the one-hot.
  3. The gather is the transpose: per chunk, C = A . R contracts the tile's
     acceleration block with the same row one-hot, then a lane-weighted
     reduction applies L — trilinear interpolation of all 8 corners in one
     matmul (bf16 inputs, f32 accumulation).
  4. Un-sort is a second ``lax.sort`` keyed on the carried original index
     (cheaper than a random-access take). Sort cost is ~41 ms for the
     16M comparator network + ~13.5 ms per 32-bit operand (measured), so
     the three f32 accelerations ride in TWO words instead of four: a
     shared-exponent pack (exponent of the largest |component| + three
     11-bit signed mantissas = 40 bits) split between the sort key's low
     8 bits — the key is idx << 8, so low bits never disturb the order —
     and one i32 payload. Dominant-component precision is 2^-10 (finer
     than the bf16 grids the gather reads); smaller components quantize
     to the same absolute step, which is exactly the error scale bf16
     already set; magnitudes outside [2^-63, 2^64] flush to zero /
     saturate. Non-finite accelerations saturate the shared exponent,
     whose reserved top value decodes with an INFINITE scale — blowups
     propagate out as +-Inf/NaN rather than as plausible finite values.

The spectral solve between the two kernels is shared with ops/pm.py.

Grid sizes: any power of two in SUPPORTED_GRIDS (32..256). The layout is
parameterized by a small geometry record (_geom): lane = x, row = z*G + y.
For G < 128 the physical lane width stays one register tile (128) and
lanes >= G are simply dead — they miss every one-hot and are sliced off
the reshaped grid (the one-hot/MXU cost is the same as G = 128, but
G < 128 grids are small enough that the solve, not the transfer, rules).
For G = 256 the tiles are two lane-registers wide (256); row = z*G + y
keeps both CIC corner-row families G rows apart for EVERY G, so the
window/table machinery is unchanged. The default module constants
(GRID = 128 etc.) remain the persistent-sorted mode's baked layout
(ops/pm_persist.py). Other grids fall back to the jnp reference path via
the engine's gate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import params as P
from ..utils.search import bin_search as _bin_search
from ..utils.search import rank_right_iota as _rank_right_iota
from . import physics, pm

GRID = 128
LANE = 128
ROWS_TOTAL = GRID * GRID * GRID // LANE     # 16384 (row = z*128 + y)
# Deposit and gather block the grid on their own row-tile sizes. A
# chunk's row span (~8-16 rows at 16M) sits well under either tile, so
# per-chunk tile visits barely grow as tiles shrink while the per-visit
# streamed rows / one-hot / MXU work scales with the tile: total work
# goes ~(span + rows) per chunk and family — smaller tiles win until
# the visit overhead (input re-streaming, revisit flushes) catches up
# (measured best: deposit 32, gather 16; see docs/DESIGN.md).
T_ROWS = 32                                  # deposit-tile rows per block
N_TILES = ROWS_TOTAL // T_ROWS               # 512
T_ROWS_G = 16                                # gather-tile rows per block
N_TILES_G = ROWS_TOTAL // T_ROWS_G           # 1024
MIN_CHUNK = 512                              # smallest supported block
SPREAD = GRID + 1                            # max corner row offset (z+1,y+1)
SENTINEL = GRID * GRID * GRID                # id past the last cell

SUPPORTED_GRIDS = (32, 64, 128, 256)


class _Geom(NamedTuple):
    """Per-grid-size layout of the sorted kernels (module docstring)."""
    g: int            # cells per axis; cell id = (z*g + y)*g + x
    shift: int        # log2(g): row = key >> shift, lane = key & (g-1)
    plane: int        # physical lane width of grid tiles (>= g, >= 128)
    rows_total: int   # g*g rows of g cells each
    n_tiles: int      # deposit grid tiles (T_ROWS rows each)
    n_tiles_g: int    # gather grid tiles (T_ROWS_G rows each)
    sentinel: int     # g^3: cell id past the last (dead particles)


@functools.lru_cache(maxsize=None)
def _geom(g: int) -> _Geom:
    if g not in SUPPORTED_GRIDS:
        raise ValueError(f"sorted PM kernels support grids "
                         f"{SUPPORTED_GRIDS}, got {g}")
    rows = g * g
    return _Geom(g, g.bit_length() - 1, max(g, 128), rows,
                 rows // T_ROWS, rows // T_ROWS_G, g * g * g)


_GEOM128 = _geom(GRID)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
#
# Pair tables are packed into ONE i32 scalar-prefetch word per grid step —
# bits [0,17) slice block, bit 17 corner family, [18,31) grid tile, bit 31
# first-visit — because scalar prefetch arrays live in SMEM (~1 MB): three
# separate i32[c_max] arrays blow it at 16M particles. CHUNK adapts to N
# for the same reason (pick_chunk), keeping c_max*4B comfortably inside
# SMEM. (Family+tile are one 14-bit window id w = 2*tile + fam at bit 17,
# so the tile is still a single shift+mask: (word >> 18) & 0x1FFF. The
# 13-bit tile field holds every supported grid's tile count incl. the
# trash id — G = 256 gathers over 4096 tiles — and 17 slice bits allow
# 2^17 chunks; the SMEM budget in pick_chunk forces n_chunks far below
# that long before the field overflows.)

_FQ_BITS = 10
_FQ_MAX = 1023
_FQ_MASK = (1 << _FQ_BITS) - 1

_S_BITS = 17
_S_MASK = (1 << _S_BITS) - 1
_T_SHIFT = 18
_T_MASK = 0x1FFF


def _pack_pairs(t, fam, s, first):
    return (s.astype(jnp.int32)
            | (fam.astype(jnp.int32) << _S_BITS)
            | (t.astype(jnp.int32) << _T_SHIFT)
            | (first.astype(jnp.int32) << 31))


def pick_chunk(n_pad: int, n_tiles: int = N_TILES) -> int:
    """Particles per kernel block: smallest supported chunk whose pair
    table fits the SMEM budget (c_max <= 64Ki words). ``4 * n_tiles``
    covers both tables' tile terms (the gather's 2 * n_tiles_g equals
    the deposit's 4 * n_tiles for every geometry)."""
    for c in (512, 1024, 2048, 4096, 8192):
        if n_pad % c == 0 and 4 * (n_pad // c) + 4 * n_tiles + 2 <= 65536:
            return c
    for c in (8192, 4096, 2048, 1024, 512):
        if n_pad % c == 0:
            # no chunk keeps the pair table inside the 64Ki-word SMEM
            # budget (reachable at ~117M particles/chip with G=256);
            # fail loudly here instead of at Mosaic compile time
            c_max = 4 * (n_pad // c) + 4 * n_tiles + 2
            if c_max > 65536:
                raise ValueError(
                    f"pair table for capacity {n_pad} needs c_max={c_max} "
                    f"i32 words > the 64Ki SMEM budget at every supported "
                    f"chunk size; shard over more chips or reduce N")
            return c
    raise ValueError(f"capacity {n_pad} not a multiple of 512")


def _family_onehot(lrow, fy, wz, dtype, rows=T_ROWS, plane=LANE):
    """(R (rows, chunk), liota (plane, chunk)) one CIC corner family.

    A particle's 8 CIC corners split into two row families exactly G
    rows apart (rows r,r+1 weight 1-fz; rows r+G,r+G+1 weight fz);
    the caller passes the family's tile-local base row ``lrow`` and its
    z-weight ``wz``, so each pair builds only the 2-term one-hot whose
    rows can hit its tile. Out-of-range rows contribute nothing, which
    IS the spill masking. Built in f32 (i1 masks relayout from the i32
    compares' (8,128) tiling; Mosaic can't relayout them straight to
    bf16's (16,128)) and cast after.
    """
    chunk = lrow.shape[1]
    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 0)
    zero = jnp.zeros((rows, chunk), jnp.float32)
    R = (jnp.where(riota == lrow, (1.0 - fy) * wz, zero)
         + jnp.where(riota == lrow + 1, fy * wz, zero))
    liota = jax.lax.broadcasted_iota(jnp.int32, (plane, chunk), 0)
    return R.astype(dtype), liota


def _lane_onehot(liota, x, fx, dtype):
    zero = jnp.zeros(liota.shape, jnp.float32)
    L = (jnp.where(liota == x, 1.0 - fx, zero)
         + jnp.where(liota == x + 1, fx, zero))
    return L.astype(dtype)


def _unpack_fracs(fq):
    """CIC fractions from the 10-bit-per-axis packed word (pm_sort)."""
    scale = jnp.float32(1.0 / _FQ_MAX)
    fx = (fq & _FQ_MASK).astype(jnp.float32) * scale
    fy = ((fq >> _FQ_BITS) & _FQ_MASK).astype(jnp.float32) * scale
    fz = ((fq >> (2 * _FQ_BITS)) & _FQ_MASK).astype(jnp.float32) * scale
    return fx, fy, fz


def _deposit_body(word, key, frac, out_ref, mass=None, geom=_GEOM128):
    t = (word >> _T_SHIFT) & _T_MASK

    # trash pairs (grid-padding entries past the real pair table) target
    # the extra trash tile; skip their one-hot/MXU work entirely — the
    # trash tile's contents are discarded by the caller. Their input
    # index maps all land on block 0, so no extra DMA traffic either.
    @pl.when(t < geom.n_tiles)
    def _():
        fam = (word >> _S_BITS) & 1
        row = key >> geom.shift
        x = key & (geom.g - 1)
        fx, fy, fz = _unpack_fracs(frac)
        wz = jnp.where(fam == 1, fz, 1.0 - fz)
        # bf16 one-hots, f32 accumulation: 4x MXU rate; the CIC weights
        # round identically here and in the gather (same f32 fracs, same
        # cast), so deposit/gather stay symmetric (momentum conservation)
        R, liota = _family_onehot(row + fam * geom.g - t * T_ROWS, fy, wz,
                                  jnp.bfloat16, plane=geom.plane)
        if mass is not None:
            # per-particle mass scales the row factor (bf16 columns)
            R = R * mass.astype(jnp.bfloat16)
        L = _lane_onehot(liota, x, fx, jnp.bfloat16)
        dep = jax.lax.dot_general(
            R, L, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (T_ROWS, plane)

        @pl.when(word < 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += dep[None]


def _deposit_kernel(geom, p_ref, key_ref, frac_ref, out_ref):
    i = pl.program_id(0)
    _deposit_body(p_ref[i], key_ref[...], frac_ref[...], out_ref,
                  geom=geom)


def _deposit_kernel_mass(geom, p_ref, key_ref, frac_ref, mass_ref, out_ref):
    i = pl.program_id(0)
    _deposit_body(p_ref[i], key_ref[...], frac_ref[...], out_ref,
                  mass=mass_ref[...], geom=geom)


def _gather_kernel(n_chunks, geom, p_ref, key_ref, frac_ref, a_ref, out_ref,
                   l_ref):
    i = pl.program_id(0)
    word = p_ref[i]
    s = word & _S_MASK

    # trash pairs (s == n_chunks) write the discarded trash output block;
    # skip their one-hot/MXU work (inputs are clamped to one block, so
    # consecutive trash pairs cost no DMA either)
    @pl.when(s < n_chunks)
    def _():
        t = (word >> _T_SHIFT) & _T_MASK
        fam = (word >> _S_BITS) & 1
        key = key_ref[...]
        row = key >> geom.shift
        fx, fy, fz = _unpack_fracs(frac_ref[...])
        wz = jnp.where(fam == 1, fz, 1.0 - fz)
        R, liota = _family_onehot(row + fam * geom.g - t * T_ROWS_G, fy,
                                  wz, jnp.bfloat16, rows=T_ROWS_G,
                                  plane=geom.plane)

        # the lane one-hot depends only on the CHUNK, and the table is
        # chunk-major — build L once on each chunk's first entry (the
        # ``first`` bit marks exactly that) and serve its siblings from
        # VMEM scratch
        @pl.when(word < 0)
        def _():
            x = key & (geom.g - 1)
            l_ref[...] = _lane_onehot(liota, x, fx, jnp.bfloat16)

        # contract the LANE axis on the MXU first (K = geom.plane, i.e.
        # >= 128 — at least twice the utilization of K = T_ROWS) and apply the row factor as a
        # half-size VPU reduction: C[c, r, p] = sum_l A[c, r, l] L[l, p]
        C = jax.lax.dot_general(
            a_ref[...], l_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (3, T_ROWS_G, chunk)
        # R and L carry the SAME bf16-rounded weight VALUES as the
        # deposit's one-hots or the kick loses deposit/gather antisymmetry
        # (a 0.4% weight mismatch compounds into a systematic momentum
        # drift); cast back up for the f32 elementwise apply
        g = (C * R.astype(jnp.float32)[None]).sum(axis=1)   # (3, chunk)

        @pl.when(word < 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += g


def _make_deposit(chunk: int, c_max: int, interpret: bool,
                  has_mass: bool, grid, geom: _Geom = _GEOM128):
    in_specs = [
        pl.BlockSpec((1, chunk), lambda i, p: (0, p[i] & _S_MASK),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda i, p: (0, p[i] & _S_MASK),
                     memory_space=pltpu.VMEM),
    ]
    if has_mass:
        in_specs.append(
            pl.BlockSpec((1, chunk), lambda i, p: (0, p[i] & _S_MASK),
                         memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # packed (tile | slice | first) words
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, T_ROWS, geom.plane),
            lambda i, p: ((p[i] >> _T_SHIFT) & _T_MASK, 0, 0),
            memory_space=pltpu.VMEM),
    )
    kern = _deposit_kernel_mass if has_mass else _deposit_kernel
    return pl.pallas_call(
        functools.partial(kern, geom),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((geom.n_tiles + 1, T_ROWS,
                                        geom.plane), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_max * 2 * T_ROWS * chunk * geom.plane,
            bytes_accessed=(c_max * chunk * 16
                            + geom.n_tiles * T_ROWS * geom.plane * 4),
            transcendentals=0,
        ),
    )


def _build_deposit_dyn(chunk: int, c_max: int, interpret: bool,
                       has_mass: bool, grid_n, geom: _Geom = _GEOM128):
    """Deposit with a TRACED grid size ``grid_n`` (i32 scalar <= c_max):
    the kernel visits only the packed prefix — real pairs plus every
    window's first-visit entry (_window_ranges gives empty windows one
    PAD entry, so all n_tiles output tiles are still zeroed) — and the
    static capacity's trailing trash slots cost nothing at all. The
    (discarded) trash tile is left unwritten. Mosaic supports dynamic
    grid bounds; parity vs the static grid is bit-exact (test_pm_persist
    dynamic-grid cases)."""
    return _make_deposit(chunk, c_max, interpret, has_mass, grid_n,
                         geom=geom)


def _make_gather(n_pad: int, chunk: int, c_max: int, interpret: bool,
                 grid, geom: _Geom = _GEOM128):
    # Trash pairs carry s == n_chunks: valid for the OUTPUT (which has an
    # extra trash block) but one past the end of the key/frac inputs — an
    # input index map must clamp it or the block DMA reads out of bounds
    # (which halts the device, not just corrupts data).
    s_last = n_pad // chunk - 1

    def in_s(i, p):
        return (0, jnp.minimum(p[i] & _S_MASK, s_last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, chunk), in_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), in_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T_ROWS_G, geom.plane),
                         lambda i, p: (0, (p[i] >> _T_SHIFT) & _T_MASK, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, chunk), lambda i, p: (0, p[i] & _S_MASK),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((geom.plane, chunk), jnp.bfloat16)],
    )
    # G=256 at 16M runs chunk=16384 over 256-lane planes: the scratch +
    # block + kernel-temporary footprint is ~36 MB, over Mosaic's 16 MB
    # default scoped-vmem ceiling but comfortably inside v5e's physical
    # 128 MB VMEM (measured r5: the compile fails loudly without this).
    # Raised only for the big geometries so the default-grid kernels
    # keep the compiler's standard budget pressure.
    big = chunk * geom.plane > 8192 * 128
    return pl.pallas_call(
        functools.partial(_gather_kernel, n_pad // chunk, geom),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, n_pad + chunk), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if big else None,
        cost_estimate=pl.CostEstimate(
            flops=c_max * (2 * 3 * T_ROWS_G * chunk * geom.plane
                           + 3 * chunk * geom.plane),
            bytes_accessed=c_max * (chunk * 16
                                    + 3 * T_ROWS_G * geom.plane * 2),
            transcendentals=0,
        ),
    )


def _build_gather_dyn(n_pad: int, chunk: int, c_max: int, interpret: bool,
                      grid_n, geom: _Geom = _GEOM128):
    """Gather with a TRACED grid size (see _build_deposit_dyn): every
    chunk's zeroing first-visit lies in the packed prefix, so all real
    output blocks are written; only the trailing trash block (sliced off
    by the caller) is left untouched."""
    return _make_gather(n_pad, chunk, c_max, interpret, grid_n, geom=geom)


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

def _deposit_table(key_s: jax.Array, n_pad: int, chunk: int,
                   geom: _Geom = _GEOM128):
    """Tile-major packed pair table: (pairs i32[c_max], c_max, total).
    ``total`` (traced) is the packed-prefix length — the dynamic grid
    size; entries past it are trash.

    Per tile t, TWO windows (one per corner family), window id w = 2t+fam:
    fam 0 (rows r, r+1) receives particles with base row in
    [t*T_ROWS - 1, (t+1)*T_ROWS); fam 1 (rows r+G, r+G+1) receives
    base rows in [t*T_ROWS - SPREAD, (t+1)*T_ROWS - G) — i.e. the
    fam-0 window shifted down G rows. Splitting skips the dead zone between the two
    corner-row pairs that a single contiguous window would cover. Base
    cell id range = [lo*G, hi*G) (G cells per row). Each window keeps
    >= 1 entry so the fam-0 first-visit always exists to zero the tile.
    """
    g, n_tiles, rows_total = geom.g, geom.n_tiles, geom.rows_total
    n_chunks = n_pad // chunk
    n_iters = max(n_pad, 2).bit_length() + 1
    w_idx = jnp.arange(2 * n_tiles, dtype=jnp.int32)
    t_w = w_idx >> 1
    fam_w = w_idx & 1
    lo_r = t_w * T_ROWS - jnp.where(fam_w == 1, g + 1, 1)
    hi_r = (t_w + 1) * T_ROWS - jnp.where(fam_w == 1, g, 0)
    lo = jnp.clip(lo_r, 0, rows_total) * g
    hi = jnp.maximum(jnp.clip(hi_r, 0, rows_total) * g, lo)
    o = _bin_search(key_s, lo, side_right=False, n_iters=n_iters)
    end = _bin_search(key_s, hi, side_right=False, n_iters=n_iters)
    a_blk = (o // chunk).astype(jnp.int32)
    c_w = jnp.maximum(-(-(end - a_blk * chunk) // chunk), 1).astype(jnp.int32)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(c_w).astype(jnp.int32)])
    # static bound: a particle lands in <= 2 windows per family (the
    # (T_ROWS+1)-row windows overlap 1 row), + ceil/alignment slack of 2
    # per window
    c_max = 4 * n_chunks + 4 * n_tiles + 2
    kk = jnp.arange(c_max, dtype=jnp.int32)
    w_k = _rank_right_iota(base, c_max)
    w_k = jnp.clip(w_k, 0, 2 * n_tiles)       # 2*n_tiles == trash
    real = w_k < 2 * n_tiles
    w_safe = jnp.minimum(w_k, 2 * n_tiles - 1)
    s_k = jnp.where(real, a_blk[w_safe] + (kk - base[w_safe]), 0)
    s_k = jnp.clip(s_k, 0, n_chunks - 1)
    t_k = jnp.where(real, w_k >> 1, n_tiles)  # n_tiles == trash tile
    fam_k = w_k & 1
    # zero the tile on its first entry = first entry of its fam-0 window
    first_k = jnp.where(real, (kk == base[w_safe]) & (fam_k == 0), True)
    return (_pack_pairs(t_k, fam_k, s_k, first_k), c_max,
            jnp.minimum(base[-1], c_max).astype(jnp.int32))


def _gather_table(key_s: jax.Array, n_pad: int, chunk: int,
                  geom: _Geom = _GEOM128):
    """Chunk-major packed pair table: (pairs i32[c_max], c_max, total);
    ``total`` as in _deposit_table.

    For each chunk-aligned slice: the range of grid tiles its fam-0
    corner rows (r, r+1) touch, then the fam-1 range (r+G, r+G+1 —
    the same range shifted +G/T_ROWS_G tiles). Splitting skips the
    dead tiles between the two corner-row pairs of row-compact (dense)
    slices. Slice-major order keeps the output block index non-decreasing
    (required for revisit accumulation)."""
    g, n_tiles_g = geom.g, geom.n_tiles_g
    n_chunks = n_pad // chunk
    row_first = key_s[0::chunk] >> geom.shift              # (n_chunks,)
    row_last = key_s[chunk - 1::chunk] >> geom.shift
    t_lo = jnp.clip(row_first // T_ROWS_G, 0,
                    n_tiles_g - 1).astype(jnp.int32)
    t_hi = jnp.clip((row_last + 1) // T_ROWS_G, 0,
                    n_tiles_g - 1).astype(jnp.int32)
    t_hi = jnp.maximum(t_hi, t_lo)
    c_fam = (t_hi - t_lo + 1).astype(jnp.int32)            # per family
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(2 * c_fam).astype(jnp.int32)])
    total = base[-1]
    # per family: spans telescope (keys sorted: first(s+1) >= last(s), so
    # consecutive spans overlap <= 1 tile) => sum c_fam <= 2*n_chunks +
    # n_tiles_g; two families double it
    c_max = 4 * n_chunks + 2 * n_tiles_g + 2
    kk = jnp.arange(c_max, dtype=jnp.int32)
    s_k = _rank_right_iota(base, c_max)
    s_k = jnp.clip(s_k, 0, n_chunks)          # n_chunks == trash block
    real = kk < total
    s_safe = jnp.minimum(s_k, n_chunks - 1)
    off = kk - base[s_safe]
    fam_k = jnp.where(real & (off >= c_fam[s_safe]), 1, 0)
    t_raw = (t_lo[s_safe] + off
             - fam_k * (c_fam[s_safe] - g // T_ROWS_G))
    # fam-1 tiles (t_lo..t_hi shifted +G/T_ROWS_G) overflow past the
    # last tile for slices
    # whose clipped fam-0 span already ends at n_tiles_g-1 (sentinel rows).
    # Clipping would duplicate tile n_tiles_g-1 and double-count its
    # corners; redirect overflow to (tile 0, fam 1) instead — that window
    # wants base rows in [-G, T_ROWS_G-G), which no particle has,
    # so the pair contributes exactly nothing.
    overflow = t_raw > n_tiles_g - 1
    t_k = jnp.where(real & ~overflow, t_raw, 0)
    fam_k = jnp.where(overflow, 1, fam_k)
    s_k = jnp.where(real, s_k, n_chunks)
    first_k = jnp.where(real, kk == base[s_safe], kk == total)
    return (_pack_pairs(t_k, fam_k, s_k, first_k), c_max,
            jnp.minimum(total, c_max).astype(jnp.int32))


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def cell_key_frac(pos_flat: jax.Array, live: jax.Array,
                  cfg: "P.PMConfig", coords=None) -> tuple:
    """(key i32[N], frac i32[N]) for the sorted kernels, UNsorted.

    key: flattened cell id (z*G + y)*G + x; entries where ``live`` (bool[N])
    is False become SENTINEL (they miss every one-hot). frac: CIC fractions
    quantized to 10 bits/axis packed in ONE i32 (the grouping sort is
    bandwidth-bound, so 3 payload arrays instead of 5 cut its cost ~40%;
    1/1023 weight quantization sits below the bf16 rounding the kernels
    already carry, and deposit/gather stay exactly symmetric).
    ``coords`` overrides the cell coords (auto-box path)."""
    geom = _geom(cfg.grid)
    g = geom.g
    c = pm.cell_coords(pos_flat, cfg) if coords is None else coords
    # the sorted kernels cannot wrap the last cell's upper CIC corner to
    # cell 0 (periodic mode), so clamp into the last cell (particles there
    # shift by up to one cell — a one-cell-wide seam at the box edge)
    c = jnp.minimum(c, jnp.float32(g - 1) - 1e-3)
    i0 = jnp.floor(c)
    f = c - i0
    i0 = i0.astype(jnp.int32)
    key = (i0[2] * g + i0[1]) * g + i0[0]
    fq = jnp.round(f * _FQ_MAX).astype(jnp.int32)
    packed = fq[0] | (fq[1] << _FQ_BITS) | (fq[2] << (2 * _FQ_BITS))
    return jnp.where(live, key, geom.sentinel), packed


def pm_sort(pos_flat: jax.Array, n_active: jax.Array,
            cfg: "P.PMConfig", coords=None, masses=None,
            live=None) -> tuple:
    """(key_s, idx_s, frac_s, mass_s): particles grouped by cell id.

    key_s i32[N] sorted cell ids (inactive -> SENTINEL, at the end);
    idx_s i32[N] carried original indices; frac_s i32[N] packed
    10-bit-per-axis CIC fractions (_unpack_fracs); mass_s f32[N] sorted
    masses (None when ``masses`` is None). ``coords`` overrides the cell
    coords (auto-box path); ``live`` (bool[N]) overrides the default
    ``arange < n_active`` liveness — callers whose slot order is not
    identity order (ops/pm_persist.py) pass ``ids < n_active``. Sorts
    are ``lax.sort`` — measured FASTER than the hand-built Pallas
    merge-path sort (see ops/psort.py for the experiment and the cost
    model).
    """
    n = pos_flat.shape[1]
    if n % 512:
        raise ValueError(f"particle capacity {n} not a multiple of 512")
    idx = jnp.arange(n, dtype=jnp.int32)
    if live is None:
        live = idx < n_active
    key, packed = cell_key_frac(pos_flat, live, cfg, coords=coords)
    if masses is not None:
        key_s, idx_s, fq_s, m_s = jax.lax.sort(
            (key, idx, packed, masses), num_keys=1)
        return key_s, idx_s, fq_s, m_s
    key_s, idx_s, fq_s = jax.lax.sort((key, idx, packed), num_keys=1)
    return key_s, idx_s, fq_s, None


def pm_deposit_sorted(key_s: jax.Array, frac_s: jax.Array,
                      mass_s=None, *, interpret: bool = False,
                      chunk: int = 0, grid: int = GRID) -> jax.Array:
    """f32[G, G, G] mass grid from cell-sorted particles."""
    geom = _geom(grid)
    n = key_s.shape[0]
    chunk = chunk or pick_chunk(n, geom.n_tiles)
    pairs, c_max_d, total_d = _deposit_table(key_s, n, chunk, geom)
    dep = _build_deposit_dyn(chunk, c_max_d, interpret,
                             mass_s is not None, total_d, geom=geom)
    if mass_s is not None:
        tiles = dep(pairs, key_s.reshape(1, -1), frac_s.reshape(1, -1),
                    mass_s.reshape(1, -1))
    else:
        tiles = dep(pairs, key_s.reshape(1, -1), frac_s.reshape(1, -1))
    rows = tiles[:geom.n_tiles].reshape(geom.rows_total, geom.plane)
    if geom.plane != geom.g:   # G < 128: drop the dead lanes
        rows = rows[:, :geom.g]
    return rows.reshape(grid, grid, grid)


def pm_gather_sorted(grids: jax.Array, key_s: jax.Array, frac_s: jax.Array,
                     idx_s: jax.Array, *, interpret: bool = False,
                     chunk: int = 0, grid: int = GRID) -> jax.Array:
    """f32[3, N] accelerations in ORIGINAL particle order, interpolated
    from grids f32[3, G, G, G] at the cell-sorted particles."""
    geom = _geom(grid)
    n = key_s.shape[0]
    chunk = chunk or pick_chunk(n, geom.n_tiles)
    a_rows = grids.reshape(3, geom.rows_total, geom.g)
    if geom.plane != geom.g:   # G < 128: pad dead lanes (never gathered)
        a_rows = jnp.pad(a_rows,
                         ((0, 0), (0, 0), (0, geom.plane - geom.g)))
    a_tiles = a_rows.astype(jnp.bfloat16)
    pairs, c_max_g, total_g = _gather_table(key_s, n, chunk, geom)
    gat = _build_gather_dyn(n, chunk, c_max_g, interpret, total_g,
                            geom=geom)
    acc_sorted = gat(pairs, key_s.reshape(1, -1), frac_s.reshape(1, -1),
                     a_tiles)[:, :n]
    # un-sort via a second key sort on the carried original index; the
    # three accelerations ride as a 40-bit shared-exponent pack split
    # between the key's low 8 bits and ONE i32 payload (docstring item 4):
    #   key  = idx<<8 | e7<<1 | mx bit 10      (uint32; order = idx order)
    #   pay  = mx low 10 | my 11 | mz 11
    # with e7 = clip(max biased exponent - 64, 0, 127) and mantissas
    # m = round(a * 2^(72 - e7)) + 1024 in [1, 2047] (11-bit biased).
    # e7 == 127 is reserved: NaN/Inf inputs (biased exponent 0xFF) and
    # |a| >= ~2^63 blowups saturate it, and the decode maps it to an
    # infinite scale — so a solver blowup comes OUT non-finite instead
    # of as plausible-looking garbage (all three components of an
    # affected particle are poisoned together; fine for diagnostics).
    if n > (1 << 24):
        # idx<<8 needs a 24-bit index; beyond that, plain f32 payloads
        _, ax, ay, az = jax.lax.sort(
            (idx_s, acc_sorted[0], acc_sorted[1], acc_sorted[2]),
            num_keys=1)
        return jnp.stack([ax, ay, az])
    bits = jax.lax.bitcast_convert_type(acc_sorted, jnp.uint32)
    e7 = jnp.clip(((bits >> 23) & 0xFF).max(axis=0).astype(jnp.int32) - 64,
                  0, 127)
    inv = jax.lax.bitcast_convert_type(
        ((199 - e7) << 23).astype(jnp.uint32), jnp.float32)   # 2^(72-e7)
    # NaN mantissas are zeroed BEFORE the int cast (NaN->int32 is
    # implementation-defined and could spill into the key's idx bits,
    # mis-sorting an unrelated particle); e7 == 127 alone carries the
    # poison through to the infinite decode scale.
    m_f = jnp.clip(jnp.round(acc_sorted * inv), -1023, 1023)
    m = (jnp.where(jnp.isnan(m_f), 0.0, m_f)
         .astype(jnp.int32) + 1024).astype(jnp.uint32)        # (3, n)
    key = ((idx_s.astype(jnp.uint32) << 8)
           | (e7.astype(jnp.uint32) << 1) | (m[0] >> 10))
    pay = ((m[0] & 0x3FF) << 22) | (m[1] << 11) | m[2]
    k_s, p_s = jax.lax.sort((key, pay), num_keys=1)
    e7_s = ((k_s >> 1) & 127).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((e7_s + 55) << 23).astype(jnp.uint32), jnp.float32)  # 2^(e7-72)
    scale = jnp.where(e7_s == 127, jnp.float32(jnp.inf), scale)
    mx = ((k_s & 1) << 10) | (p_s >> 22)
    my = (p_s >> 11) & 0x7FF
    mz = p_s & 0x7FF
    q = jnp.stack([mx, my, mz]).astype(jnp.int32) - 1024
    return q.astype(jnp.float32) * scale


def pm_accel(pos_flat: jax.Array, n_active: jax.Array, g_const,
             cfg: "P.PMConfig", *, masses=None,
             interpret: bool = False, base_kernels=None) -> jax.Array:
    """f32[3, N] PM acceleration — sorted-kernel fast path (grid in
    SUPPORTED_GRIDS, N a multiple of 512). Traceable.

    ``cfg.auto_box`` solves in cell units inside a traced cloud-tracking
    box and rescales by 1/h^2 (see pm.pm_accel_ref). ``masses`` f32[N]
    scales the deposit (sources); receivers are mass-free (acceleration
    field).

    ``base_kernels`` (pm.base_kernels_device pairs; static-box only)
    routes the solve kernels in as runtime jit arguments instead of
    baked program constants — mandatory at G=256 under the axon
    compile RPC, smaller programs everywhere (pm.solve_accel).

    Non-finite accelerations (solver blowup) saturate the un-sort pack's
    shared exponent and decode as +-Inf/NaN (see pm_gather_sorted), so a
    blowup propagates OUT of this path as non-finite — at reduced
    component-level fidelity (all three components of an affected
    particle are poisoned together). Use pm.pm_accel_ref or
    ``utils.debug`` checks to localize which component went bad."""
    if cfg.auto_box:
        box_min, cell = pm.auto_box(pos_flat, n_active, cfg.grid)
        c = pm.cell_coords_dyn(pos_flat, box_min, cell, cfg.grid)
        key_s, idx_s, frac_s, mass_s = pm_sort(pos_flat, n_active, cfg,
                                               coords=c, masses=masses)
        rho = pm_deposit_sorted(key_s, frac_s, mass_s, interpret=interpret,
                                grid=cfg.grid)
        grids = pm.solve_accel(rho, cfg, cfg.softening, cell_size=1.0)
        acc = pm_gather_sorted(grids, key_s, frac_s, idx_s,
                               interpret=interpret, grid=cfg.grid)
        acc = pm.momentum_clean(acc, n_active, masses)
        return (g_const / (cell * cell)) * acc
    key_s, idx_s, frac_s, mass_s = pm_sort(pos_flat, n_active, cfg,
                                           masses=masses)
    rho = pm_deposit_sorted(key_s, frac_s, mass_s, interpret=interpret,
                            grid=cfg.grid)
    grids = pm.solve_accel(rho, cfg, cfg.softening,
                           kernels=base_kernels)      # (3, G, G, G)
    acc = pm_gather_sorted(grids, key_s, frac_s, idx_s, interpret=interpret,
                           grid=cfg.grid)
    return g_const * pm.momentum_clean(acc, n_active, masses)


def step_pm(pos: jax.Array, vel: jax.Array, param_vec: jax.Array,
            pair_vec: jax.Array, n_active: jax.Array, cfg: "P.PMConfig",
            *, masses=None, base_kernels=None,
            interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One frame: PM self-gravity (fast path) + attractor step, on
    (3, R, LANE) planes — same contract as pm.step_pm_ref.
    ``base_kernels`` as in pm_accel (runtime kernel args)."""
    flat = pos.reshape(3, -1)
    acc = pm_accel(flat, n_active, pair_vec[0], cfg, masses=masses,
                   interpret=interpret, base_kernels=base_kernels)
    return physics.kick_and_step_planes(pos, vel, acc.reshape(pos.shape),
                                        param_vec)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def step_pm_jit(pos, vel, param_vec, pair_vec, n_active, cfg,
                interpret: bool = False, masses=None, base_kernels=None):
    return step_pm(pos, vel, param_vec, pair_vec, n_active, cfg,
                   masses=masses, interpret=interpret,
                   base_kernels=base_kernels)
