"""Persistent cell-sorted PM state — the no-sort particle-mesh frame.

The sorted fast path (ops/pm_pallas.py) pays two global ``lax.sort``s per
frame — the cell-id grouping sort and the identity un-sort — together
~100 ms of the 146 ms 16M single-chip frame (docs/DESIGN.md "Measured").
This module removes BOTH from the steady-state frame by making the sorted
order part of the simulation state:

  * Particles live permanently in (approximately) cell-sorted order;
    identity rides along as an ``ids`` payload (colors / streaming /
    on-demand un-sort are a gather by ``ids`` at the consumer's expense,
    not the frame's).
  * The deposit/gather kernels never required sorted input — their
    one-hots mask by each particle's ACTUAL row, and sortedness only made
    the pair tables cheap to bound. So between repairs the tables are
    built from per-chunk row SPANS (a reshape min/max over the keys, ~1 ms
    of bandwidth at 16M) instead of bin-searches over sorted keys: a
    window takes every chunk whose [row_min, row_max] intersects it.
    Disorder just widens spans, adding masked-out pairs — results stay
    EXACT, only the pair count grows.
  * When accumulated drift would overflow the static pair budget (the
    traced total is checked against it every frame), a ``lax.cond``
    repairs the order — in TWO TIERS at large N: tier 1 is a
    SEGMENT-LOCAL grouping sort (rows of an (n/seg, seg) reshape sort
    independently — the sort itself is ~4x cheaper than the global one
    at 16M), tier 2 re-derives the totals and falls back to the FULL
    sort (pos, vel, ids[, masses][, col24] — ~7-9 payload operands)
    when the local repair did not tighten the totals under budget (see
    pick_segment / accel_sorted). MEASURED system-level verdict
    (round-5 same-process A/B, tools/resident_bench.py, 16M collapse):
    on violent scenes tier 1 rarely suffices — bulk infall crosses
    segment boundaries — so both tiers usually run and the two-tier
    frames come out ~3-6 ms/frame SLOWER than forcing the full sort
    (190.5 vs 184.6 ms medians); pass ``two_tier=False`` to skip tier 1
    for such scenes. The tier-1 design case (gentle drift whose
    disorder is chunk-local) keeps the default. Between repairs the
    frame runs sort-free: keys + spans + tables + deposit + FFT solve
    + gather + integrate, with the gather's output already in state
    order (no un-sort, ever). ``resorts`` counts repair PASSES (a
    frame that needed both tiers counts 2).

Static-box modes only (periodic / isolated): ``auto_box`` re-keys every
particle every frame (the box tracks the cloud), which defeats span
locality — use the per-frame-sorted path (pm_pallas.pm_accel) there.

Span-table mechanics (vs pm_pallas._deposit_table/_gather_table):
  * chunk row spans [rmin_s, rmax_s] replace sorted first/last keys;
  * deposit window w keeps the contiguous chunk range
    [min{s: rmax_s >= lo_w}, max{s: rmin_s <= hi_w}] — computed exactly
    by binary searches over the running prefix-max of rmax / suffix-min
    of rmin (both monotone). The range may include non-intersecting
    chunks between ragged spans; their one-hots are all-zero (correct,
    just wasted MXU work that repair reclaims);
  * an all-SENTINEL PAD chunk appended to the deposit inputs serves as
    the target of dummy pairs for EMPTY windows, so the fam-0 first-visit
    that zeroes each output tile always exists (pm_pallas kernels are
    reused unmodified).

Two-level mode (``cfg2``, ops/pm2.py) extends the same trick to the
fine level via the SEGMENTED order: the repair sort keys non-window
particles by coarse cell id and the window(+parking band) members by
FINE cell id (the tail segment, boundary ``fine_b`` in the state), with
membership FROZEN between repairs. Fine order is a monotone refinement
of coarse order inside the window, so segment B is coherent for BOTH
levels: fine span tables are as tight as coarse ones (no 20x
chunk-width waste), and the coarse level reads the mixed order through
per-segment hulls (_window_ranges_seg). Leavers just stop depositing
(zero source mask); a true entrant — a frozen-A particle reaching the
source set, which first has to cross the parking band (cfg2.park) —
forces a repair that frame, so results are exact in every regime; a
lax.cond falls back to the per-frame-sorted fine path on any frame
whose totals cannot fit the capacities. (A fully fine-sorted GLOBAL
order was tried first and measured worse — it inflates the coarse
hulls; the segment split is what makes both levels cheap at once.)

Reference parity: same physics contract as ops/pm.step_pm_ref /
reference compute.wgsl integration (see ops/physics.py citations); the
reference app has no self-gravity at all — this path is a capability
extension benchmarked against our own pm_pallas numbers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import params as P
from ..utils.search import bin_search as _bin_search
from ..utils.search import rank_right_iota as _rank_right_iota
from . import physics, pm, pm_pallas
from .pm_pallas import (LANE, T_ROWS, T_ROWS_G, _GEOM128, _geom,
                        _pack_pairs)

# Pair budgets, in window-memberships (deposit) / tile-visits x2 (gather)
# per chunk, PER GRID GEOMETRY (every pm_pallas.SUPPORTED_GRIDS size
# runs this path). Freshly repaired order needs <= 4 + o(1) of either
# (the telescoping bounds in pm_pallas); the headroom above that is how
# much drift a state absorbs before the next forced repair. Sizing: ONE
# particle crossing a z-cell boundary widens its whole chunk's row span
# by G rows (G/T_ROWS extra windows per side per family), so a useful
# budget must absorb at least +-1 z-cell of outlier drift —
# ~2*(G/T_ROWS) extra memberships/chunk deposit-side, ~2*2*(G/T_ROWS_G)
# tile-visits gather-side (the x2 budgets() doubling supplies the
# both-sides worst case) — or dense states repair almost every frame
# (measured at G=128: SLACK 8 repaired 14 of 21 dynamic 16M frames;
# drift per frame is only ~0.04 cells, so a +-1-cell budget pushes
# repairs out by an order of magnitude). Going LOOSER loses (measured,
# 16M collapse, 31 frames, T_ROWS_G=64 era): 28/24 and 31/31 cut
# repairs 8->6 but the extra tolerated span width makes every
# inter-repair frame costlier — 174/164 ms avg vs 132 at 20/16. Early
# repair keeps frames near the steady floor. _slack() anchors the
# formula at that measured G=128 optimum (20 / 24) and scales the
# z-cell-crossing term with the geometry.


def _slack(geom) -> Tuple[int, int]:
    """(deposit, gather) per-chunk pair budgets for ``geom`` — the
    +-1-z-cell sizing (module comment): a fixed base plus the windows /
    tile-visits one cell of drift adds at this grid. G=128 lands on the
    measured optimum (20, 24)."""
    return (12 + 2 * (geom.g // T_ROWS), 8 + 2 * (geom.g // T_ROWS_G))
# Scalar-prefetch table capacity clamp. NOT a hardware ceiling: 100k-word
# tables compile and run (measured, 16M chunk-8192 probe) — 64Ki is the
# measured PERFORMANCE optimum. Raising it to 128Ki costs +0.6 ms of
# steady table build and LOSES on dynamic scenes (16M collapse: 191.6 ms
# avg / 7 repairs vs 180.4 / 10 at 64Ki) for the same reason looser SLACK
# loses: wider tolerated spans make every inter-repair frame costlier
# than the repairs saved.
_SMEM_WORDS = 65536


def pick_segment(n_pad: int, chunk: int) -> int:
    """Slots per LOCAL-repair segment (0 = no local tier, see
    accel_sorted). A segment-local repair sorts rows of an
    (n/seg, seg) reshape independently — comparator depth O(log^2 seg)
    instead of O(log^2 n), measured ~4x cheaper at 16M (65536-slot
    segments, 24^2 -> 16^2 network depth plus better locality) — and
    preserves every invariant the global sort establishes *within* each
    segment (dead slots keep to the global tail: their keys are maximal
    and they already occupy the trailing segments). Segments must hold
    >= 8 chunks (so per-chunk spans re-telescope after the local sort)
    and >= 32768 slots (below that, particles cross segment boundaries
    too readily for the local tier to pay — small-N states skip it)."""
    for s in (65536, 32768):
        if (n_pad % s == 0 and s % chunk == 0 and s // chunk >= 8
                and n_pad // s >= 4):
            return s
    return 0


def pick_chunk(n_pad: int, geom=_GEOM128) -> int:
    """Particles per kernel block: smallest supported chunk whose
    SLACK-scaled pair tables still fit the SMEM budget."""
    sd, sg = _slack(geom)
    for c in (512, 1024, 2048, 4096, 8192, 16384):
        if n_pad % c:
            continue
        nc = n_pad // c
        worst = max(sd * nc + 4 * geom.n_tiles,
                    sg * nc + 2 * geom.n_tiles_g) + 2
        if worst <= _SMEM_WORDS:
            return c
    raise ValueError(f"capacity {n_pad} not a multiple of 512, or too "
                     "large for the persistent-mode SMEM budget")


def budgets(n_chunks: int, geom=_GEOM128) -> Tuple[int, int]:
    """(c_max_dep, c_max_gat) static pair-table capacities: DOUBLE the
    +-1-cell SLACK sizing, clamped to the SMEM word budget. With dynamic
    kernel grids (only the packed prefix is visited), extra capacity
    costs nothing but a longer table build (vector work over c_max
    entries, ~0.5 ms at the 64Ki ceiling) — it is pure drift headroom
    that stretches the repair cadence for dynamic scenes. The repair
    guarantee is untouched: a fresh sort's totals sit at the telescoping
    bound (~SLACK/2 per chunk), far below either capacity."""
    sd, sg = _slack(geom)
    return (min(2 * sd * n_chunks + 4 * geom.n_tiles + 2, _SMEM_WORDS),
            min(2 * sg * n_chunks + 2 * geom.n_tiles_g + 2, _SMEM_WORDS))


# sort-key classes of the SEGMENTED order (two-level mode): live
# non-window particles sort by coarse key (< sentinel = g^3 < seg flag
# = 2 g^3), frozen-window-member particles by 2 g^3 + fine key, dead
# slots last (4 g^3). fine_b = count of class-A slots = the frozen
# segment boundary. Flags scale with the geometry so G=256's 2^24 keys
# still classify (i32 headroom: 4 g^3 <= 2^26).
def _seg_flag(geom) -> int:
    return 2 * geom.sentinel


def _dead_key(geom) -> int:
    return 4 * geom.sentinel


class SortedPMState(NamedTuple):
    """Particle state in (approximately) cell-sorted storage order.

    ``fine_b`` (i32 scalar; i32[k] in the MULTI-level mode, see
    init_sorted_multi / accel_sorted_multi) is the two-level mode's frozen segment
    boundary: slots [0, fine_b) hold non-window particles in coarse
    cell order, slots [fine_b, N) hold the window(+park) members of the
    last repair in FINE cell order (then dead slots). fine_b == N means
    no fine segment (coarse-only states, fresh inits).

    ``col24`` (optional i32 (N,), 8:8:8-packed generation color in slot
    order) lets every DISPLAY consumer — rasterizer, stream packer —
    serve color mode 0 (ORIGINAL, the reference default,
    compute.wgsl:75-77) straight from the sorted planes: without it the
    default-color interactive frame pays a full identity-order rebuild
    per consumed frame (measured 2.7 s scatter / 135 ms sort at 16M —
    vs ~14 ms/repair for carrying one extra sort operand). u8 per
    channel matches the wire format's own color quantization."""
    pos: jax.Array              # f32 (3, N)
    vel: jax.Array              # f32 (3, N)
    ids: jax.Array              # i32 (N,) original identity of each slot
    masses: Optional[jax.Array]  # f32 (N,) source masses in slot order
    resorts: jax.Array          # i32 scalar: cumulative repair count
    fine_b: Optional[jax.Array] = None   # i32 scalar (or [k]) boundary
    col24: Optional[jax.Array] = None    # i32 (N,) packed display color


def _sort_state(key, pos, vel, ids, masses, resorts,
                fine_b=None, col24=None, seg: int = 0) -> SortedPMState:
    """Grouping sort into a SortedPMState. ``seg`` > 0 sorts each
    ``seg``-slot segment INDEPENDENTLY (rows of a reshape — the local
    repair tier, see pick_segment) instead of globally."""
    ops = (key, pos[0], pos[1], pos[2], vel[0], vel[1], vel[2], ids)
    if masses is not None:
        ops += (masses,)
    if col24 is not None:
        ops += (col24,)
    if seg:
        ops = tuple(o.reshape(-1, seg) for o in ops)
    s = jax.lax.sort(ops, num_keys=1)
    if seg:
        s = tuple(o.reshape(-1) for o in s)
    k = 8
    m_s = s[k] if masses is not None else None
    k += masses is not None
    c_s = s[k] if col24 is not None else None
    return SortedPMState(jnp.stack(s[1:4]), jnp.stack(s[4:7]), s[7],
                         m_s, resorts, fine_b, c_s)


def init_sorted(pos_flat: jax.Array, n_active, cfg: "P.PMConfig",
                vel_flat=None, masses=None, col24=None) -> SortedPMState:
    """Full grouping sort of (pos, vel, identity[, masses][, col24])
    into a fresh SortedPMState. ``n_active`` masks trailing padding
    slots (their keys become SENTINEL, so they sort to the tail with
    ids >= n_active). The state starts coarse-only (fine_b == N); the
    two-level mode's first accel_sorted call migrates it into the
    segmented order with one repair (see accel_sorted). ``col24`` is
    the optional packed display color (see SortedPMState)."""
    n = pos_flat.shape[1]
    if n % 512:
        raise ValueError(f"particle capacity {n} not a multiple of 512")
    if cfg.auto_box:
        raise ValueError("persistent sorted mode needs a static box; "
                         "use pm_pallas.pm_accel for auto_box")
    _geom(cfg.grid)   # raises for grids outside SUPPORTED_GRIDS
    ids = jnp.arange(n, dtype=jnp.int32)
    key, _ = pm_pallas.cell_key_frac(pos_flat, ids < n_active, cfg)
    vel_flat = (jnp.zeros_like(pos_flat) if vel_flat is None
                else jnp.asarray(vel_flat))
    return _sort_state(key, pos_flat, vel_flat, ids, masses, jnp.int32(0),
                       jnp.int32(n), col24)


def _chunk_spans(key: jax.Array, chunk: int, geom=_GEOM128):
    """(rmin i32[n_chunks], rmax i32[n_chunks]) grid-row span per chunk
    over the chunk's LIVE keys only: sentinel entries (dead slots, or
    masked-out particles on the fine level) are excluded — rmin falls
    back to rows_total and rmax to -1, so an all-masked chunk reads as
    EMPTY (rmax < rmin) and intersects no window, instead of a sentinel
    rmax inflating the prefix-max hull to every window above it."""
    r = (key >> geom.shift).reshape(-1, chunk)
    dead = key.reshape(-1, chunk) >= geom.sentinel
    rmin = jnp.where(dead, geom.rows_total, r).min(axis=1)
    rmax = jnp.where(dead, -1, r).max(axis=1)
    return rmin, rmax


def _hull(rmin, rmax, n_chunks: int, geom=_GEOM128):
    """(s_lo, s_hi) inclusive chunk hull per deposit window w = 2t + fam
    (s_hi < s_lo = empty).

    Window w accepts base rows [lo_w, hi_w] (pm_pallas._deposit_table's
    ranges, here inclusive). min{s: rmax_s >= lo} equals the first index
    where the running prefix-max of rmax reaches lo, and
    max{s: rmin_s <= hi} the last index where the suffix-min of rmin
    stays <= hi — both monotone, so two binary searches give the EXACT
    contiguous hull of intersecting chunks. lo is clamped to 0 (no
    negative rows exist) so EMPTY chunks (rmax == -1) can never satisfy
    the lo test — required by the segmented tables, where a masked-out
    segment's chunks must not leak into the other segment's hulls."""
    n_iters = max(n_chunks, 2).bit_length() + 1
    m_pre = jax.lax.cummax(rmax)                          # nondecreasing
    m_suf = jax.lax.cummin(rmin, reverse=True)            # nondecreasing
    w_idx = jnp.arange(2 * geom.n_tiles, dtype=jnp.int32)
    t_w = w_idx >> 1
    fam_w = w_idx & 1
    lo_r = jnp.maximum(
        t_w * T_ROWS - jnp.where(fam_w == 1, geom.g + 1, 1), 0)
    hi_r = (t_w + 1) * T_ROWS - jnp.where(fam_w == 1, geom.g, 0) - 1
    s_lo = _bin_search(m_pre, lo_r, side_right=False, n_iters=n_iters)
    s_hi = _bin_search(m_suf, hi_r, side_right=True, n_iters=n_iters) - 1
    return s_lo.astype(jnp.int32), s_hi.astype(jnp.int32)


def _window_ranges(rmin, rmax, n_chunks: int, geom=_GEOM128):
    """Per deposit window: (start chunk, count, empty mask) — the
    single-hull expansion (empty windows get one PAD entry so the fam-0
    first-visit that zeroes each tile always exists)."""
    s_lo, s_hi = _hull(rmin, rmax, n_chunks, geom)
    empty = s_hi < s_lo
    c_w = jnp.where(empty, 1, s_hi - s_lo + 1).astype(jnp.int32)
    start = jnp.where(empty, n_chunks, s_lo).astype(jnp.int32)
    return start, c_w, empty


def _seg_spans(key: jax.Array, chunk: int, fine_b, geom=_GEOM128):
    """Per-segment chunk spans of the SEGMENTED order: slots < fine_b
    (segment A, coarse-ordered) and slots >= fine_b (segment B,
    fine-ordered window members + dead tail), masked per SLOT so the one
    boundary chunk contributes its A-part to A and B-part to B."""
    slot = jnp.arange(key.shape[0], dtype=jnp.int32)
    key_a = jnp.where(slot < fine_b, key, geom.sentinel)
    key_b = jnp.where(slot < fine_b, geom.sentinel, key)
    return (_chunk_spans(key_a, chunk, geom),
            _chunk_spans(key_b, chunk, geom))


def _window_ranges_seg(spans_a, spans_b, n_chunks: int, geom=_GEOM128):
    """Per deposit window: (startA, cA, startB, cB) — TWO hulls, one per
    segment of the segmented order. A single global hull over the mixed
    order would stretch from mid-A to the B tail for every window whose
    rows intersect the physical refinement window, ballooning the pair
    count ~O(n_chunks); per-segment hulls stay tight. The boundary chunk
    can appear in both hulls (its A-part rows and B-part rows both
    matching) — the duplicate is trimmed off B so no pair deposits
    twice. Windows empty in both segments get one PAD entry in A (the
    zeroing first-visit)."""
    lo_a, hi_a = _hull(*spans_a, n_chunks, geom)
    lo_b, hi_b = _hull(*spans_b, n_chunks, geom)
    c_a = jnp.maximum(hi_a - lo_a + 1, 0)
    c_b = jnp.maximum(hi_b - lo_b + 1, 0)
    # overlap is structurally confined to the boundary chunk: hull A
    # cannot extend past it (A spans above it are EMPTY), hull B cannot
    # start before it
    dup = ((c_a > 0) & (c_b > 0) & (hi_a >= lo_b)).astype(jnp.int32)
    lo_b = lo_b + dup
    c_b = c_b - dup
    pad = (c_a + c_b) == 0
    start_a = jnp.where(pad, n_chunks, lo_a).astype(jnp.int32)
    c_a = jnp.where(pad, 1, c_a).astype(jnp.int32)
    return start_a, c_a, lo_b.astype(jnp.int32), c_b.astype(jnp.int32)


def _gather_tiles(rmin, rmax, geom=_GEOM128):
    """(t_lo, t_hi) inclusive fam-0 tile range per chunk (corner rows are
    r and r+1, so the top tile comes from rmax + 1) — in the gather's OWN
    row blocking (T_ROWS_G)."""
    t_lo = jnp.clip(rmin // T_ROWS_G, 0,
                    geom.n_tiles_g - 1).astype(jnp.int32)
    t_hi = jnp.clip((rmax + 1) // T_ROWS_G, 0,
                    geom.n_tiles_g - 1).astype(jnp.int32)
    return t_lo, jnp.maximum(t_hi, t_lo)


def _fine_inputs(pos, live, wmin, cfg: "P.PMConfig", cfg2):
    """(w_src f32[N], key2 i32[N], frac2 i32[N]) for the fine level in
    the caller's slot order, given the window origin ``wmin`` (computed
    ONCE per frame by the caller — it is order-invariant, so it must
    not be re-derived inside per-shard repair branches, where a
    collective would deadlock shards that took the other branch).
    Non-window / dead particles get key SENTINEL (they miss every
    one-hot and every masked span); the window mask w_src rides as the
    deposit mass and masks receivers. Purely local/elementwise."""
    from . import pm2 as _pm2
    h2 = cfg2.window_size / cfg.grid
    coords2 = pm.cell_coords_dyn(pos, wmin, h2, cfg.grid)
    inner = _pm2._in_window(pos, wmin, cfg2.window_size, cfg2.margin) & live
    key2, frac2 = pm_pallas.cell_key_frac(pos, inner, cfg, coords=coords2)
    return inner.astype(jnp.float32), key2, frac2


def _pair_totals(key: jax.Array, chunk: int, geom=_GEOM128):
    """(dep_total, gat_total) the span tables would need — the traced
    numbers checked against the static budgets to trigger a repair."""
    n_chunks = key.shape[0] // chunk
    rmin, rmax = _chunk_spans(key, chunk, geom)
    _, c_w, _ = _window_ranges(rmin, rmax, n_chunks, geom)
    t_lo, t_hi = _gather_tiles(rmin, rmax, geom)
    return c_w.sum(), (2 * (t_hi - t_lo + 1)).sum()


def _deposit_table_spans(rmin, rmax, n_chunks: int, c_max: int,
                         geom=_GEOM128):
    """Tile-major packed deposit pair table from chunk row spans.

    Empty windows and trash entries (kk >= total) point at the PAD chunk
    s == n_chunks — all-SENTINEL keys the caller appends to the kernel
    inputs, whose one-hots miss every row — so the fam-0 first-visit that
    zeroes each tile always exists and contributes nothing."""
    start, c_w, _ = _window_ranges(rmin, rmax, n_chunks, geom)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(c_w).astype(jnp.int32)])
    kk = jnp.arange(c_max, dtype=jnp.int32)
    w_k = _rank_right_iota(base, c_max)
    nt = geom.n_tiles
    w_k = jnp.clip(w_k, 0, 2 * nt)            # 2*n_tiles == trash
    real = w_k < 2 * nt
    w_safe = jnp.minimum(w_k, 2 * nt - 1)
    s_k = jnp.where(real, start[w_safe] + (kk - base[w_safe]), n_chunks)
    s_k = jnp.clip(s_k, 0, n_chunks)
    t_k = jnp.where(real, w_k >> 1, nt)       # n_tiles == trash tile
    fam_k = jnp.where(real, w_k & 1, 0)
    first_k = jnp.where(real, (kk == base[w_safe]) & (fam_k == 0), True)
    return _pack_pairs(t_k, fam_k, s_k, first_k)


def _deposit_table_spans_seg(key: jax.Array, chunk: int, fine_b,
                             n_chunks: int, c_max: int, geom=_GEOM128):
    """Tile-major packed deposit pair table for the SEGMENTED order
    (two-level mode): per window, segment A's hull entries then segment
    B's (see _window_ranges_seg). Trash conventions as in
    _deposit_table_spans."""
    spans_a, spans_b = _seg_spans(key, chunk, fine_b, geom)
    start_a, c_a, lo_b, c_b = _window_ranges_seg(spans_a, spans_b,
                                                 n_chunks, geom)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(c_a + c_b).astype(jnp.int32)])
    kk = jnp.arange(c_max, dtype=jnp.int32)
    w_k = _rank_right_iota(base, c_max)
    nt = geom.n_tiles
    w_k = jnp.clip(w_k, 0, 2 * nt)            # 2*n_tiles == trash
    real = w_k < 2 * nt
    w_safe = jnp.minimum(w_k, 2 * nt - 1)
    off = kk - base[w_safe]
    in_a = off < c_a[w_safe]
    s_k = jnp.where(in_a, start_a[w_safe] + off,
                    lo_b[w_safe] + off - c_a[w_safe])
    s_k = jnp.clip(jnp.where(real, s_k, n_chunks), 0, n_chunks)
    t_k = jnp.where(real, w_k >> 1, nt)       # n_tiles == trash tile
    fam_k = jnp.where(real, w_k & 1, 0)
    first_k = jnp.where(real, (kk == base[w_safe]) & (fam_k == 0), True)
    return _pack_pairs(t_k, fam_k, s_k, first_k)


def _pair_totals_seg(key: jax.Array, chunk: int, fine_b, geom=_GEOM128):
    """(dep_total, gat_total) for the segmented coarse tables — the
    deposit total sums BOTH segments' hulls (matching
    _deposit_table_spans_seg); the gather stays chunk-major over the
    full spans (order-agnostic)."""
    n_chunks = key.shape[0] // chunk
    spans_a, spans_b = _seg_spans(key, chunk, fine_b, geom)
    _, c_a, _, c_b = _window_ranges_seg(spans_a, spans_b, n_chunks, geom)
    rmin, rmax = _chunk_spans(key, chunk, geom)
    t_lo, t_hi = _gather_tiles(rmin, rmax, geom)
    return (c_a + c_b).sum(), (2 * (t_hi - t_lo + 1)).sum()


def _gather_table_spans(rmin, rmax, n_chunks: int, c_max: int,
                        geom=_GEOM128):
    """Chunk-major packed gather pair table from chunk row spans — the
    span generalization of pm_pallas._gather_table (same expansion, same
    fam-1 overflow redirect to the provably-empty (tile 0, fam 1))."""
    t_lo, t_hi = _gather_tiles(rmin, rmax, geom)
    c_fam = (t_hi - t_lo + 1).astype(jnp.int32)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(2 * c_fam).astype(jnp.int32)])
    total = base[-1]
    kk = jnp.arange(c_max, dtype=jnp.int32)
    s_k = _rank_right_iota(base, c_max)
    s_k = jnp.clip(s_k, 0, n_chunks)          # n_chunks == trash block
    real = kk < total
    s_safe = jnp.minimum(s_k, n_chunks - 1)
    off = kk - base[s_safe]
    fam_k = jnp.where(real & (off >= c_fam[s_safe]), 1, 0)
    t_raw = (t_lo[s_safe] + off
             - fam_k * (c_fam[s_safe] - geom.g // T_ROWS_G))
    overflow = t_raw > geom.n_tiles_g - 1
    t_k = jnp.where(real & ~overflow, t_raw, 0)
    fam_k = jnp.where(overflow, 1, fam_k)
    s_k = jnp.where(real, s_k, n_chunks)
    first_k = jnp.where(real, kk == base[s_safe], kk == total)
    return _pack_pairs(t_k, fam_k, s_k, first_k)


def _tiles_to_grid(tiles: jax.Array, geom) -> jax.Array:
    """Deposit output tiles (n_tiles+1, T_ROWS, plane) -> f32[G, G, G]
    (drop the trash tile; G < 128 drops the dead lanes past G)."""
    rows = tiles[:geom.n_tiles].reshape(geom.rows_total, geom.plane)
    if geom.plane != geom.g:
        rows = rows[:, :geom.g]
    return rows.reshape(geom.g, geom.g, geom.g)


def _grids_to_rows(grids: jax.Array, geom) -> jax.Array:
    """f32[3, G, G, G] -> bf16[3, rows_total, plane] gather input
    (G < 128 pads dead lanes, never gathered — the lane one-hot's x is
    always < G)."""
    a_rows = grids.reshape(3, geom.rows_total, geom.g)
    if geom.plane != geom.g:
        a_rows = jnp.pad(a_rows,
                         ((0, 0), (0, 0), (0, geom.plane - geom.g)))
    return a_rows.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# MULTI-segment order (k nested refinement levels, round-4 verdict item 4)
# ---------------------------------------------------------------------------
#
# The two-level segmented order generalizes to k levels with k+1 classes:
# class 0 = live non-members (coarse cell order), class m (1 <= m <= k) =
# frozen members of window m but not window m+1 (level-m cell order),
# dead slots last. ``fine_b`` becomes an i32[k] vector of class-start
# slots: class m occupies [fine_b[m-1], fine_b[m]) (fine_b[k-1] .. N for
# the innermost class + dead tail). The key properties carry over:
#   * classes are CONTIGUOUS and ordered, so per-class hulls are tight
#     and any two hulls overlap only at shared boundary chunks (a class
#     small enough to sit inside one chunk just collapses its hull onto
#     that chunk — the cumulative-max dedup below handles chains);
#   * a chunk deposited once contributes ALL its matching particles
#     (kernel keys are unmasked; one-hots mask by actual row), so the
#     dedup must keep each chunk exactly once per window — correctness
#     does not depend on WHICH class's entry survives;
#   * level-m tables mask keys outside classes >= m (slot < fine_b[m-1]
#     -> sentinel): post-repair every level-m source lives in classes
#     >= m (class = INNERMOST park-shrunk window containing the
#     particle, and sources of level m sit inside window m's
#     margin-shrunk mask which the park band strictly contains), so the
#     mask is exact; a pre-repair entrant forces the repair that frame.


def budgets_multi(n_chunks: int, geom, n_classes: int) -> Tuple[int, int]:
    """budgets() scaled for the k+1-class order: each window's deposit
    entries split across up to n_classes per-class hulls, and a class
    sorted by a FINER level's key has non-telescoping spans at coarser
    levels (a level-m chunk covers its whole window extent in level-l
    coordinates for l < m — measured: 3-class fresh state needs ~1.3x
    the 2-class gather budget), so both the slack and the per-window
    base terms scale with the class count. Clamped to the SMEM word
    budget: past the clamp (deep nesting at very large N) fresh states
    can overflow their own capacity, and the per-level fits-cond then
    runs that level per-frame-sorted every frame — correct, but the
    sort-free benefit degrades; see accel_sorted_multi. For the COARSE
    tables that cond fallback does not exist, and no static predicate
    separates healthy clamped configs (every 16M config clamps; fresh
    totals sit far below the clamp because small classes contribute few
    pairs) from genuinely unfixable ones — so the overflow check is the
    RUNTIME one: accel_sorted_multi compares post-repair totals against
    these capacities every frame and reports loudly (ADVICE r4)."""
    sd, sg = _slack(geom)
    return (min(n_classes * (2 * sd * n_chunks + 4 * geom.n_tiles) + 2,
                _SMEM_WORDS),
            min(n_classes * (2 * sg * n_chunks + 2 * geom.n_tiles_g) + 2,
                _SMEM_WORDS))


def _seg_spans_multi(key: jax.Array, chunk: int, bounds: jax.Array,
                     geom=_GEOM128, first_class: int = 0):
    """Per-CLASS chunk spans of the multi-segment order. ``bounds``
    i32[k] are the class-start slots (see section comment); returns
    k+1 span pairs, masked per SLOT so a boundary chunk contributes
    each part to its own class. ``first_class``: classes below it are
    known all-sentinel in ``key`` (a level-m fine key masks classes
    <= m), so their spans are the EMPTY constant — skipping the O(N)
    masking pass per skipped class (round-5 pmn profile follow-up)."""
    n = key.shape[0]
    slot = jnp.arange(n, dtype=jnp.int32)
    k = bounds.shape[0]
    lo = [jnp.int32(0)] + [bounds[m] for m in range(k)]
    hi = [bounds[m] for m in range(k)] + [jnp.int32(n)]
    out = []
    empty = (jnp.full((n // chunk,), geom.rows_total, jnp.int32),
             jnp.full((n // chunk,), -1, jnp.int32))
    for m in range(k + 1):
        if m < first_class:
            out.append(empty)
            continue
        key_m = jnp.where((slot >= lo[m]) & (slot < hi[m]), key,
                          geom.sentinel)
        out.append(_chunk_spans(key_m, chunk, geom))
    return out


def _window_ranges_multi(spans, n_chunks: int, geom=_GEOM128):
    """Per deposit window: (starts, counts) lists, one entry per class —
    per-class hulls with cumulative boundary-chunk dedup (a chunk
    already covered by an earlier class's hull is trimmed off the next
    hull's start; hull intervals are contiguous and class chunk ranges
    are ordered, so trimmed chunks are exactly the already-covered
    ones). Windows empty in EVERY class get one PAD entry in class 0."""
    starts, counts = [], []
    cum_hi = None
    for sp in spans:
        lo, hi = _hull(*sp, n_chunks, geom)
        if cum_hi is not None:
            lo = jnp.maximum(lo, cum_hi + 1)
        c = jnp.maximum(hi - lo + 1, 0)
        seg_hi = jnp.where(c > 0, hi, -1)
        cum_hi = seg_hi if cum_hi is None else jnp.maximum(cum_hi, seg_hi)
        starts.append(lo.astype(jnp.int32))
        counts.append(c.astype(jnp.int32))
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    pad = total == 0
    starts[0] = jnp.where(pad, n_chunks, starts[0]).astype(jnp.int32)
    counts[0] = jnp.where(pad, 1, counts[0]).astype(jnp.int32)
    return starts, counts


def _deposit_table_spans_multi(key: jax.Array, chunk: int,
                               bounds: jax.Array, n_chunks: int,
                               c_max: int, geom=_GEOM128,
                               first_class: int = 0):
    """Tile-major packed deposit pair table for the MULTI-segment order:
    per window, class 0's hull entries, then class 1's, ... (see
    _window_ranges_multi). Trash conventions as in
    _deposit_table_spans. ``first_class`` as in _seg_spans_multi."""
    spans = _seg_spans_multi(key, chunk, bounds, geom, first_class)
    starts, counts = _window_ranges_multi(spans, n_chunks, geom)
    total_w = counts[0]
    for c in counts[1:]:
        total_w = total_w + c
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(total_w).astype(jnp.int32)])
    kk = jnp.arange(c_max, dtype=jnp.int32)
    w_k = _rank_right_iota(base, c_max)
    nt = geom.n_tiles
    w_k = jnp.clip(w_k, 0, 2 * nt)            # 2*n_tiles == trash
    real = w_k < 2 * nt
    w_safe = jnp.minimum(w_k, 2 * nt - 1)
    off = kk - base[w_safe]
    # walk the classes: entry ``off`` lands in the first class whose
    # cumulative count exceeds it
    s_k = jnp.full((c_max,), n_chunks, jnp.int32)
    cum = jnp.zeros_like(counts[0])
    for st_m, c_m in zip(starts, counts):
        in_m = (off >= cum[w_safe]) & (off < (cum + c_m)[w_safe])
        s_k = jnp.where(in_m, st_m[w_safe] + off - cum[w_safe], s_k)
        cum = cum + c_m
    s_k = jnp.clip(jnp.where(real, s_k, n_chunks), 0, n_chunks)
    t_k = jnp.where(real, w_k >> 1, nt)       # n_tiles == trash tile
    fam_k = jnp.where(real, w_k & 1, 0)
    first_k = jnp.where(real, (kk == base[w_safe]) & (fam_k == 0), True)
    return _pack_pairs(t_k, fam_k, s_k, first_k)


def _pair_totals_multi(key: jax.Array, chunk: int, bounds: jax.Array,
                       geom=_GEOM128, first_class: int = 0):
    """(dep_total, gat_total) for the multi-segment tables — deposit
    sums every class's hulls; the gather stays chunk-major over the
    full spans (order-agnostic). ``first_class`` as in
    _seg_spans_multi."""
    n_chunks = key.shape[0] // chunk
    spans = _seg_spans_multi(key, chunk, bounds, geom, first_class)
    _, counts = _window_ranges_multi(spans, n_chunks, geom)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    rmin, rmax = _chunk_spans(key, chunk, geom)
    t_lo, t_hi = _gather_tiles(rmin, rmax, geom)
    return total.sum(), (2 * (t_hi - t_lo + 1)).sum()


def _momentum_clean_live(acc, live_f, masses, psum_axis=None):
    """pm.momentum_clean with an explicit live mask (slot order is not
    identity order here, so ``arange < n_active`` would mask the wrong
    slots). With ``psum_axis`` the mean is global over the mesh axis
    (multi-chip momentum conservation, parallel/pm_dp.py:101-114)."""
    w = live_f if masses is None else live_f * masses
    s = (acc * w[None]).sum(axis=1, keepdims=True)
    c = w.sum()
    if psum_axis is not None:
        s = jax.lax.psum(s, psum_axis)
        c = jax.lax.psum(c, psum_axis)
    return (acc - s / jnp.maximum(c, 1e-12)) * live_f[None]


def accel_sorted(st: SortedPMState, g_const, cfg: "P.PMConfig", *,
                 n_active=None, interpret: bool = False, chunk: int = 0,
                 psum_axis=None, cfg2=None, kernels=None,
                 base_kernels=None, two_tier: bool = True,
                 _force_fine_fallback: bool = False
                 ) -> Tuple[SortedPMState, jax.Array]:
    """(state', acc f32[3, N]) — PM acceleration in the state's slot
    order, repairing the sort first iff drift would overflow the pair
    budgets. Traceable; the returned state is the one ``acc`` aligns
    with (reordered when a repair fired, ``resorts`` incremented).

    Inside a shard_map, pass ``psum_axis`` (the dp mesh axis): the state
    is then the SHARD's locally-sorted particles (global ids), the local
    mass grid is psum'd before the replicated solve — the only collective,
    O(G^3) like parallel/pm_dp.py — the gather stays local, and repairs
    fire per shard independently (particles never migrate between
    shards).

    ``cfg2`` (a pm2.PM2Config, with ``kernels`` from pm2.fine_kernels)
    adds the two-level refinement window on top, ALSO sort-free in the
    steady state, via the SEGMENTED order: repairs sort by a class key —
    non-window particles by coarse cell id, the window(+park) members of
    THAT moment by FINE cell id (slots [fine_b, N)), dead slots last.
    Window chunks are then fine-coherent, so the fine span tables are as
    tight as the coarse ones (each fine pair's chunk is almost entirely
    inside its window — the dominant 20x VPU waste of a coarse-ordered
    fine table is gone), while segment B stays coarse-coherent too (fine
    order is a monotone refinement of coarse order inside the window),
    so the coarse level reads it through per-segment hulls
    (_window_ranges_seg) at ordinary cost. Membership is FROZEN at
    repair time behind a parking band (cfg2.park): leavers just stop
    depositing (their source mask is zero), band-crossers are outside
    the source set by construction, and a TRUE entrant — a frozen-A
    particle reaching the source set — forces a repair that frame, so
    physics is exact in every regime. A lax.cond additionally falls back
    to the per-frame-sorted fine path (pm2.fine_accel_fast) should the
    totals ever exceed the static capacities. Multi-chip (psum_axis):
    the window origin is global (one 4-scalar psum), the fine grid joins
    the coarse grid's psum coupling, and the fits-cond is decided
    GLOBALLY (an all-shards psum-of-votes) so every shard takes the same
    collective-bearing branch."""
    if cfg.auto_box:
        raise ValueError("persistent sorted mode needs a static box; "
                         "use pm_pallas.pm_accel for auto_box")
    geom = _geom(cfg.grid)   # raises for grids outside SUPPORTED_GRIDS
    n = st.pos.shape[1]
    n_active = jnp.int32(n) if n_active is None else n_active
    chunk = chunk or pick_chunk(n, geom)
    n_chunks = n // chunk
    c_max_dep, c_max_gat = budgets(n_chunks, geom)
    if cfg2 is not None:
        # segmented order: the fine level shares the coarse block size
        # and budget sizing — a freshly segmented order's fine totals
        # telescope like the coarse ones (segment B is fine-sorted)
        c_max_dep2, c_max_gat2 = c_max_dep, c_max_gat
        if st.fine_b is None:
            raise ValueError("two-level persistent mode needs a state "
                             "with fine_b (re-init via init_sorted)")

    # keys / fine inputs / totals are computed ONCE on the incoming
    # order; the repair branch recomputes them post-sort (repairs are
    # rare, so the steady-state frame never pays a duplicate pass). The
    # totals double as the kernels' TRACED grid sizes (dynamic grid):
    # only the packed prefix of each pair table is ever visited, so the
    # static capacities' trash slots cost nothing.
    live0 = st.ids < n_active
    if cfg2 is not None:
        # order-invariant, hence hoisted OUT of the repair cond: inside
        # a shard_map its (auto-window) centroid psum must run on every
        # shard, while repairs fire per shard independently
        from . import pm2 as _pm2
        wmin = _pm2.window_min(st.pos, None, cfg2, st.masses, live=live0,
                               psum_axis=psum_axis)

    def _derive(s, live):
        k, f = pm_pallas.cell_key_frac(s.pos, live, cfg)
        if cfg2 is None:
            d1, g1 = _pair_totals(k, chunk, geom)
            return k, f, d1, g1, ()
        d1, g1 = _pair_totals_seg(k, chunk, s.fine_b, geom)
        w, k2, f2 = _fine_inputs(s.pos, live, wmin, cfg, cfg2)
        # fine keys of frozen-A slots are masked out: post-repair no
        # live A particle is in the source set (w == 0 there), so the
        # mask is exact — it only silences PRE-repair entrants, whose
        # presence sets the entrant flag below and forces the repair
        seg_b = jnp.arange(k.shape[0], dtype=jnp.int32) >= s.fine_b
        k2 = jnp.where(seg_b, k2, geom.sentinel)
        d2, g2 = _pair_totals(k2, chunk, geom)
        entrant = jnp.any(~seg_b & (w > 0.0))
        return k, f, d1, g1, (w, k2, f2, d2, g2, entrant)

    key0, frac0, dep0, gat0, fine0 = _derive(st, live0)
    need = (dep0 > c_max_dep) | (gat0 > c_max_gat)
    if cfg2 is not None:
        need = (need | (fine0[3] > c_max_dep2) | (fine0[4] > c_max_gat2)
                | fine0[5])

    def _repair(s, key_s=None, seg: int = 0):
        key_s = key0 if key_s is None else key_s
        if cfg2 is None:
            s2 = _sort_state(key_s, s.pos, s.vel, s.ids, s.masses,
                             s.resorts + 1, s.fine_b, s.col24, seg=seg)
        else:
            # segmented class key: A = live non-members by coarse id,
            # B = live window(+park) members of THIS moment by fine id,
            # dead last. Membership includes the parking band so the
            # source set cannot gain a frozen-A particle before the
            # next band crossing (which re-triggers this repair).
            from . import pm2 as _pm2w
            h2 = cfg2.window_size / cfg.grid
            coords2 = pm.cell_coords_dyn(s.pos, wmin, h2, cfg.grid)
            class_b = _pm2w._in_window(
                s.pos, wmin, cfg2.window_size,
                cfg2.margin - cfg2.park) & live0
            k2s, _ = pm_pallas.cell_key_frac(s.pos, class_b, cfg,
                                             coords=coords2)
            skey = jnp.where(class_b, _seg_flag(geom) + k2s,
                             jnp.where(live0, key0, _dead_key(geom)))
            fb = jnp.sum(skey < _seg_flag(geom)).astype(jnp.int32)
            s2 = _sort_state(skey, s.pos, s.vel, s.ids, s.masses,
                             s.resorts + 1, fb, s.col24)
        return (s2,) + _derive(s2, s2.ids < n_active)

    # ``two_tier=False`` forces every repair straight to the full sort —
    # the measurement control for the tier-1 claim (same scene, same
    # budgets, only the repair strategy differs; tools/resident_bench.py
    # runs the A/B)
    seg = pick_segment(n, chunk) if (cfg2 is None and two_tier) else 0
    if seg:
        # two-tier repair (the dynamic-scene amortization): tier 1 is a
        # SEGMENT-LOCAL grouping sort — ~4x cheaper than the global one
        # at 16M (pick_segment docstring) and sufficient for ordinary
        # drift, where disorder is local (collapse infall moves
        # particles a fraction of a cell per frame). Tier 2 re-derives
        # the totals from the locally-repaired order and falls back to
        # the FULL sort only if they still overflow (cross-segment
        # migration has accumulated) — so the repair guarantee is
        # unchanged: whatever order reaches the tables below fits the
        # static budgets. Tier 2 keys on tier 1's OUTPUT order (key1),
        # never the stale key0.
        st, key1, frac1, dep1, gat1, fine1 = jax.lax.cond(
            need, functools.partial(_repair, seg=seg),
            lambda s: (s, key0, frac0, dep0, gat0, fine0), st)
        need_full = (dep1 > c_max_dep) | (gat1 > c_max_gat)
        st, key, frac, dep_total, gat_total, fine = jax.lax.cond(
            need_full, lambda s: _repair(s, key_s=key1),
            lambda s: (s, key1, frac1, dep1, gat1, fine1), st)
    else:
        st, key, frac, dep_total, gat_total, fine = jax.lax.cond(
            need, _repair, lambda s: (s, key0, frac0, dep0, gat0, fine0),
            st)

    # spans of the (possibly re-ordered) state; a repaired order
    # satisfies the telescoping bounds, so the tables below always fit
    # their static budgets
    live = st.ids < n_active
    rmin, rmax = _chunk_spans(key, chunk, geom)

    if cfg2 is None:
        dep_pairs = _deposit_table_spans(rmin, rmax, n_chunks, c_max_dep,
                                         geom)
    else:
        # segmented order: per-segment hulls (one global hull would
        # stretch across the A/B boundary for every window whose rows
        # intersect the refinement region)
        dep_pairs = _deposit_table_spans_seg(key, chunk, st.fine_b,
                                             n_chunks, c_max_dep, geom)
    key_p = jnp.concatenate(
        [key,
         jnp.full((chunk,), geom.sentinel, jnp.int32)]).reshape(1, -1)
    frac_p = jnp.concatenate(
        [frac, jnp.zeros((chunk,), jnp.int32)]).reshape(1, -1)
    dep = pm_pallas._build_deposit_dyn(
        chunk, c_max_dep, interpret, st.masses is not None,
        jnp.minimum(dep_total, c_max_dep).astype(jnp.int32), geom=geom)
    if st.masses is not None:
        m_p = jnp.concatenate(
            [st.masses, jnp.zeros((chunk,), jnp.float32)]).reshape(1, -1)
        tiles = dep(dep_pairs, key_p, frac_p, m_p)
    else:
        tiles = dep(dep_pairs, key_p, frac_p)
    rho = _tiles_to_grid(tiles, geom)
    if psum_axis is not None:
        rho = jax.lax.psum(rho, psum_axis)

    gat_pairs = _gather_table_spans(rmin, rmax, n_chunks, c_max_gat, geom)

    def coarse_gather(grids):
        gat = pm_pallas._build_gather_dyn(
            n, chunk, c_max_gat, interpret,
            jnp.minimum(gat_total, c_max_gat).astype(jnp.int32),
            geom=geom)
        return gat(gat_pairs, key.reshape(1, -1), frac.reshape(1, -1),
                   _grids_to_rows(grids, geom))[:, :n]

    if cfg2 is None:
        acc = coarse_gather(pm.solve_accel(rho, cfg, cfg.softening,
                                           kernels=base_kernels))
    else:
        # fine level on the SAME persistent order: masked spans over the
        # fine keys (SENTINEL outside the window) bound the tables, the
        # window mask rides as the deposit mass, and the gather lands in
        # slot order directly — no grouping sort, no un-sort. Tables are
        # only trusted when the (post-repair) totals fit their static
        # capacities; otherwise the cond pays the sorted fine path, so
        # no pair is ever silently dropped.
        w_src, key2, frac2, dep2_total, gat2_total, _ = fine
        fits = (dep2_total <= c_max_dep2) & (gat2_total <= c_max_gat2)
        if _force_fine_fallback:      # test hook: exercise the cond's
            fits = jnp.bool_(False)   # sorted-fallback plumbing
        if psum_axis is not None:
            # both branches carry collectives (the grid psums), so the
            # branch choice must be GLOBAL: any shard's overflow sends
            # everyone down the sorted path for the frame
            fits = jax.lax.psum(
                fits.astype(jnp.int32), psum_axis) == jax.lax.psum(
                jnp.int32(1), psum_axis)
        # both solves share the Hockney doubled-grid shape, so the spans
        # branch batches them through one FFT set when configs allow
        batchable = (cfg.boundary == "isolated"
                     and cfg.gradient == "exact"
                     and cfg2.gradient == "exact" and kernels is not None)
        h2 = cfg2.window_size / cfg.grid

        def _fine_spans(_):
            rmin2, rmax2 = _chunk_spans(key2, chunk, geom)
            dep2_pairs = _deposit_table_spans(rmin2, rmax2, n_chunks,
                                              c_max_dep2, geom)
            key2_p = jnp.concatenate(
                [key2, jnp.full((chunk,), geom.sentinel,
                                jnp.int32)]).reshape(1, -1)
            frac2_p = jnp.concatenate(
                [frac2, jnp.zeros((chunk,), jnp.int32)]).reshape(1, -1)
            m2 = w_src if st.masses is None else w_src * st.masses
            m2_p = jnp.concatenate(
                [m2, jnp.zeros((chunk,), jnp.float32)]).reshape(1, -1)
            dep2 = pm_pallas._build_deposit_dyn(
                chunk, c_max_dep2, interpret, True,
                jnp.minimum(dep2_total, c_max_dep2).astype(jnp.int32),
                geom=geom)
            rho2 = _tiles_to_grid(dep2(dep2_pairs, key2_p, frac2_p, m2_p),
                                  geom)
            if psum_axis is not None:
                rho2 = jax.lax.psum(rho2, psum_axis)
            if batchable:
                grids, grids2 = pm.solve_accel_pair(rho, rho2, cfg,
                                                    cfg.softening, kernels,
                                                    kernels1=base_kernels)
            else:
                grids = pm.solve_accel(rho, cfg, cfg.softening,
                                       kernels=base_kernels)
                grids2 = pm.solve_accel_diff(rho2, cfg.grid, h2,
                                             cfg2.softening, cfg.softening,
                                             cfg2.gradient, kernels=kernels)
            gat2_pairs = _gather_table_spans(rmin2, rmax2, n_chunks,
                                             c_max_gat2, geom)
            gat2 = pm_pallas._build_gather_dyn(
                n, chunk, c_max_gat2, interpret,
                jnp.minimum(gat2_total, c_max_gat2).astype(jnp.int32),
                geom=geom)
            acc2 = gat2(gat2_pairs, key2.reshape(1, -1),
                        frac2.reshape(1, -1),
                        _grids_to_rows(grids2, geom))[:, :n]
            # receivers == sources: window-internal pairs (antisymmetric)
            return coarse_gather(grids) + acc2 * w_src[None]

        def _fine_sorted(_):
            from . import pm2 as _pm2
            acc_c = coarse_gather(pm.solve_accel(rho, cfg, cfg.softening,
                                                 kernels=base_kernels))
            return acc_c + _pm2.fine_accel_fast(
                st.pos, live, cfg, cfg2, masses=st.masses, kernels=kernels,
                interpret=interpret, wmin=wmin, psum_axis=psum_axis)

        acc = jax.lax.cond(fits, _fine_spans, _fine_sorted, None)
    acc = _momentum_clean_live(acc, live.astype(jnp.float32), st.masses,
                               psum_axis=psum_axis)
    return st, g_const * acc


def init_sorted_multi(pos_flat: jax.Array, n_active, cfg: "P.PMConfig",
                      n_levels: int, vel_flat=None, masses=None,
                      col24=None) -> SortedPMState:
    """init_sorted for the MULTI-level persistent mode: ``fine_b`` is an
    i32[n_levels] class-boundary vector (all == N: every live particle
    starts class 0; the first accel_sorted_multi call migrates into the
    k+1-class order with one repair)."""
    st = init_sorted(pos_flat, n_active, cfg, vel_flat=vel_flat,
                     masses=masses, col24=col24)
    return st._replace(fine_b=jnp.full((n_levels,), pos_flat.shape[1],
                                       jnp.int32))


def accel_sorted_multi(st: SortedPMState, g_const, cfg: "P.PMConfig",
                       levels, *, n_active=None, interpret: bool = False,
                       chunk: int = 0, psum_axis=None, kernels=None,
                       base_kernels=None, cfgx=None, pmx_shards: int = 1,
                       _force_fine_fallback: bool = False
                       ) -> Tuple[SortedPMState, jax.Array]:
    """(state', acc) — MULTI-level PM acceleration on the persistent
    multi-segment order: every level sort-free in the steady state
    (pm2.pmn_accel's telescoping physics on the k+1-class order, see the
    multi-segment section comment). ``levels`` = tuple of PM2Config
    (outermost first, as pm2.pmn_accel); ``kernels`` =
    pm2.levels_kernels(cfg, levels); ``st.fine_b`` must be i32[k]
    (init_sorted_multi). Repairs re-class by the INNERMOST park-shrunk
    window and sort class m by its level-m cell key; each level's
    tables read classes >= m through per-class hulls; per-level
    lax.cond falls back to the per-frame-sorted fine path
    (pm2.fine_accel_fast) when that level's totals overflow. Multi-chip
    (psum_axis): nested window origins are global (pm2._nested_wmins
    psums each level's centroid), every grid joins the psum coupling,
    and each fits-vote is global.

    ``cfgx`` (a pmx.PMXConfig) terminates the stack with window-EXACT
    short-range forces — and on THIS order the compaction is free: the
    innermost class is a contiguous slot range, so the exact window's
    member buffer is one dynamic slice at fine_b[-1] (no flag sort, no
    scatter-back; ops/pmx.py pays one N-sort each way per frame).
    Members past the static capacity keep the mesh force (the same
    loud-truncation semantics as pmx.exact_accel); with ``cfgx`` the
    return gains a third element, i32[2] ``(n_members, n_corrected)``,
    so the engine can warn when the two differ.

    Multi-chip pmx (``psum_axis`` + static ``pmx_shards`` = the dp mesh
    size): each shard slices capacity/n_shards slots of ITS innermost
    class, the slices are all_gather'd (<= 0.8 MB of ICI traffic at the
    default capacity — trivial next to the grid psum), and every shard
    runs the rectangular pair kernel with its own members as receivers
    and the GLOBAL gathered buffer as sources — so cross-shard member
    pairs are seen by both ends with identical positions/masses, and
    the correction stays antisymmetric (momentum-exact). The counts are
    psum'd (global semantics everywhere)."""
    from . import pm2 as _pm2

    if cfg.auto_box:
        raise ValueError("persistent sorted mode needs a static box")
    if cfgx is not None:
        from . import pmx as _pmx
        if psum_axis is not None:
            if pmx_shards < 2:
                raise ValueError(
                    "multi-chip pmx needs the static shard count "
                    "(pmx_shards = the dp mesh size) for the gathered "
                    "member buffer's per-shard slice")
            if cfgx.capacity % (512 * pmx_shards):
                raise ValueError(
                    f"pmx capacity {cfgx.capacity} must be a multiple "
                    f"of 512 * {pmx_shards} shards for the gathered "
                    "buffer's slice/tile alignment")
        _pmx._validate(cfg, levels, cfgx)
    levels = _pm2._validate_levels(cfg, levels)
    k_lv = len(levels)
    geom = _geom(cfg.grid)
    n = st.pos.shape[1]
    n_active = jnp.int32(n) if n_active is None else n_active
    chunk = chunk or pick_chunk(n, geom)
    n_chunks = n // chunk
    c_max_dep, c_max_gat = budgets_multi(n_chunks, geom, k_lv + 1)
    if st.fine_b is None or st.fine_b.ndim != 1 or st.fine_b.shape[0] != k_lv:
        raise ValueError(
            f"multi-level persistent mode needs fine_b i32[{k_lv}] "
            "(init via init_sorted_multi)")

    live0 = st.ids < n_active
    slot = jnp.arange(n, dtype=jnp.int32)
    # nested window origins: order-invariant, hoisted OUT of the repair
    # cond (their centroid psums must run on every shard)
    wmins = _pm2._nested_wmins(st.pos, live0, cfg, levels, st.masses,
                               psum_axis=psum_axis)

    def _derive(s, live):
        key, frac = pm_pallas.cell_key_frac(s.pos, live, cfg)
        d1, g1 = _pair_totals_multi(key, chunk, s.fine_b, geom)
        fine = []
        for m in range(k_lv):
            w, k2, f2 = _fine_inputs(s.pos, live, wmins[m], cfg,
                                     levels[m])
            # fine_b[m] = start slot of class m+1; level m+1's sources
            # live in classes >= m+1, i.e. slots >= fine_b[m] — keys of
            # frozen lower classes are masked out (exact post-repair;
            # pre-repair entrants force the repair below). first_class:
            # classes <= m are all-sentinel by that mask, so their span
            # passes are skipped
            mask = slot >= s.fine_b[m]
            k2m = jnp.where(mask, k2, geom.sentinel)
            d2, g2 = _pair_totals_multi(k2m, chunk, s.fine_b, geom,
                                        first_class=m + 1)
            entrant = jnp.any(~mask & (w > 0.0))
            fine.append((w, k2m, f2, d2, g2, entrant))
        return key, frac, d1, g1, tuple(fine)

    key0, frac0, dep0, gat0, fine0 = _derive(st, live0)
    need = (dep0 > c_max_dep) | (gat0 > c_max_gat)
    for w, k2m, f2, d2, g2, entrant in fine0:
        need = need | (d2 > c_max_dep) | (g2 > c_max_gat) | entrant

    def _repair(s):
        # class key: innermost park-shrunk window wins; class m sorts by
        # its level-m cell key offset by m * seg_flag; dead slots last
        flag = _seg_flag(geom)
        skey = jnp.where(live0, key0, jnp.int32((k_lv + 1) * flag))
        for m, (c2, wm) in enumerate(zip(levels, wmins), start=1):
            h_m = c2.window_size / cfg.grid
            coords = pm.cell_coords_dyn(s.pos, wm, h_m, cfg.grid)
            memb = _pm2._in_window(s.pos, wm, c2.window_size,
                                   c2.margin - c2.park) & live0
            k_m, _ = pm_pallas.cell_key_frac(s.pos, memb, cfg,
                                             coords=coords)
            skey = jnp.where(memb, m * flag + k_m, skey)
        bounds = jnp.stack([
            jnp.sum(skey < (m + 1) * flag).astype(jnp.int32)
            for m in range(k_lv)])
        s2 = _sort_state(skey, s.pos, s.vel, s.ids, s.masses,
                         s.resorts + 1, bounds, s.col24)
        return (s2,) + _derive(s2, s2.ids < n_active)

    st, key, frac, dep_total, gat_total, fine = jax.lax.cond(
        need, _repair, lambda s: (s, key0, frac0, dep0, gat0, fine0), st)

    # the COARSE tables have no per-frame-sorted fallback (unlike each
    # fine level's fits-cond), so post-REPAIR totals above the clamped
    # budget — reachable only through deep nesting at very large N
    # (pick_chunk guarantees the single-class worst case fits, but not
    # k+1 of them; every supported config's fresh totals sit far below
    # the clamp, see budgets_multi) — would silently drop chunk visits
    # via the jnp.minimum below. Poison the frame instead (ADVICE r4):
    # NaN is the only failure channel that is loud on EVERY backend
    # (axon_pjrt rejects host callbacks, so jax.debug.print would
    # itself kill this path — observed killing the r5 bench leg), it
    # trips utils/debug.validate_state by name in debug mode, and a
    # visibly dead sim beats silently wrong forces.
    _poison = jnp.where((dep_total > c_max_dep) | (gat_total > c_max_gat),
                        jnp.float32(jnp.nan), jnp.float32(0.0))

    live = st.ids < n_active
    rmin, rmax = _chunk_spans(key, chunk, geom)
    dep_pairs = _deposit_table_spans_multi(key, chunk, st.fine_b,
                                           n_chunks, c_max_dep, geom)
    key_p = jnp.concatenate(
        [key,
         jnp.full((chunk,), geom.sentinel, jnp.int32)]).reshape(1, -1)
    frac_p = jnp.concatenate(
        [frac, jnp.zeros((chunk,), jnp.int32)]).reshape(1, -1)
    dep = pm_pallas._build_deposit_dyn(
        chunk, c_max_dep, interpret, st.masses is not None,
        jnp.minimum(dep_total, c_max_dep).astype(jnp.int32), geom=geom)
    if st.masses is not None:
        m_p = jnp.concatenate(
            [st.masses, jnp.zeros((chunk,), jnp.float32)]).reshape(1, -1)
        tiles = dep(dep_pairs, key_p, frac_p, m_p)
    else:
        tiles = dep(dep_pairs, key_p, frac_p)
    rho = _tiles_to_grid(tiles, geom)
    if psum_axis is not None:
        rho = jax.lax.psum(rho, psum_axis)

    gat_pairs = _gather_table_spans(rmin, rmax, n_chunks, c_max_gat, geom)

    def coarse_gather(grids):
        gat = pm_pallas._build_gather_dyn(
            n, chunk, c_max_gat, interpret,
            jnp.minimum(gat_total, c_max_gat).astype(jnp.int32),
            geom=geom)
        return gat(gat_pairs, key.reshape(1, -1), frac.reshape(1, -1),
                   _grids_to_rows(grids, geom))[:, :n]

    acc = coarse_gather(pm.solve_accel(rho, cfg, cfg.softening,
                                       kernels=base_kernels)) + _poison

    eps_outer = cfg.softening
    for m, c2 in enumerate(levels):
        w_src, key2, frac2, dep2_total, gat2_total, _ = fine[m]
        ker = None if kernels is None else kernels[m]
        h2 = c2.window_size / cfg.grid
        fits = (dep2_total <= c_max_dep) & (gat2_total <= c_max_gat)
        if _force_fine_fallback:
            fits = jnp.bool_(False)
        if psum_axis is not None:
            fits = jax.lax.psum(
                fits.astype(jnp.int32), psum_axis) == jax.lax.psum(
                jnp.int32(1), psum_axis)
        eo = eps_outer

        def _fine_spans(_, w_src=w_src, key2=key2, frac2=frac2,
                        dep2_total=dep2_total, gat2_total=gat2_total,
                        ker=ker, h2=h2, c2=c2, eo=eo, fc=m + 1):
            rmin2, rmax2 = _chunk_spans(key2, chunk, geom)
            dep2_pairs = _deposit_table_spans_multi(
                key2, chunk, st.fine_b, n_chunks, c_max_dep, geom,
                first_class=fc)
            key2_p = jnp.concatenate(
                [key2, jnp.full((chunk,), geom.sentinel,
                                jnp.int32)]).reshape(1, -1)
            frac2_p = jnp.concatenate(
                [frac2, jnp.zeros((chunk,), jnp.int32)]).reshape(1, -1)
            m2 = w_src if st.masses is None else w_src * st.masses
            m2_p = jnp.concatenate(
                [m2, jnp.zeros((chunk,), jnp.float32)]).reshape(1, -1)
            dep2 = pm_pallas._build_deposit_dyn(
                chunk, c_max_dep, interpret, True,
                jnp.minimum(dep2_total, c_max_dep).astype(jnp.int32),
                geom=geom)
            rho2 = _tiles_to_grid(dep2(dep2_pairs, key2_p, frac2_p, m2_p),
                                  geom)
            if psum_axis is not None:
                rho2 = jax.lax.psum(rho2, psum_axis)
            grids2 = pm.solve_accel_diff(rho2, cfg.grid, h2, c2.softening,
                                         eo, c2.gradient, kernels=ker)
            gat2_pairs = _gather_table_spans(rmin2, rmax2, n_chunks,
                                             c_max_gat, geom)
            gat2 = pm_pallas._build_gather_dyn(
                n, chunk, c_max_gat, interpret,
                jnp.minimum(gat2_total, c_max_gat).astype(jnp.int32),
                geom=geom)
            acc2 = gat2(gat2_pairs, key2.reshape(1, -1),
                        frac2.reshape(1, -1),
                        _grids_to_rows(grids2, geom))[:, :n]
            return acc2 * w_src[None]

        def _fine_sorted(_, c2=c2, ker=ker, eo=eo, wm=wmins[m]):
            return _pm2.fine_accel_fast(
                st.pos, live, cfg, c2, masses=st.masses, kernels=ker,
                interpret=interpret, wmin=wm, psum_axis=psum_axis,
                eps_outer=eo)

        acc = acc + jax.lax.cond(fits, _fine_spans, _fine_sorted, None)
        eps_outer = float(c2.softening)

    if cfgx is not None:
        # window-exact correction on the contiguous innermost class: one
        # dynamic slice replaces ops/pmx.py's flag sort + scatter-back
        from . import pairwise_pallas as _pw
        from . import pmx as _pmx

        n_sh = pmx_shards if psum_axis is not None else 1
        B = min(cfgx.capacity, n * n_sh)     # global member budget
        B_s = B // n_sh                      # this shard's slice
        b = jnp.clip(st.fine_b[k_lv - 1], 0, jnp.int32(n - B_s))
        buf = jax.lax.dynamic_slice(st.pos, (jnp.int32(0), b), (3, B_s))
        ids_buf = jax.lax.dynamic_slice(st.ids, (b,), (B_s,))
        live_buf = ids_buf < n_active
        # exact window nested inside the innermost mesh window (the
        # same origin chain pmx_accel uses, order-invariant; its
        # centroid is GLOBAL under psum_axis, so every shard agrees)
        lv_live = (_pm2._in_window(st.pos, wmins[-1],
                                   levels[-1].window_size,
                                   levels[-1].margin) & live)
        wminx = _pm2.window_min(st.pos, None, cfgx, st.masses,
                                live=lv_live, psum_axis=psum_axis)
        wminx = jnp.clip(
            wminx, wmins[-1] + jnp.float32(levels[-1].margin),
            wmins[-1] + jnp.float32(levels[-1].window_size
                                    - levels[-1].margin
                                    - cfgx.window_size))
        w_buf = (_pm2._in_window(buf, wminx, cfgx.window_size,
                                 cfgx.margin) & live_buf
                 ).astype(jnp.float32)
        m_buf = w_buf
        if st.masses is not None:
            m_buf = m_buf * jax.lax.dynamic_slice(st.masses, (b,), (B_s,))
        if psum_axis is not None:
            # global member buffer: every shard sees every member with
            # identical positions/masses -> antisymmetric cross-shard
            # pairs. [n_sh, 3, B_s] -> [3, B]; zero-mass columns (w=0)
            # contribute nothing, so slice padding is harmless.
            src = jax.lax.all_gather(buf, psum_axis).transpose(
                1, 0, 2).reshape(3, B)
            m_src = jax.lax.all_gather(m_buf, psum_axis).reshape(B)
        else:
            src, m_src = buf, m_buf
        a_x = _pw.pairwise_accel(buf.T, src, B, 1.0, cfgx.softening,
                                 masses=m_src, interpret=interpret)
        a_p = _pw.pairwise_accel(buf.T, src, B, 1.0, eps_outer,
                                 masses=m_src, interpret=interpret)
        corr = (a_x - a_p).T * w_buf[None]
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (jnp.int32(0), b),
                                       (3, B_s)) + corr,
            (jnp.int32(0), b))
        # truncation accounting (ADVICE r4): members OUTSIDE the slice
        # (innermost class bigger than the capacity, or window members
        # that migrated out of the class between repairs) silently keep
        # the mesh-only force — count them so the engine can warn
        n_members = jnp.sum(
            _pm2._in_window(st.pos, wminx, cfgx.window_size, cfgx.margin)
            & live).astype(jnp.int32)
        n_corr = jnp.sum(w_buf).astype(jnp.int32)
        if psum_axis is not None:
            n_members = jax.lax.psum(n_members, psum_axis)
            n_corr = jax.lax.psum(n_corr, psum_axis)
        pmx_counts = jnp.stack([n_members, n_corr])

    acc = _momentum_clean_live(acc, live.astype(jnp.float32), st.masses,
                               psum_axis=psum_axis)
    if cfgx is not None:
        return st, g_const * acc, pmx_counts
    return st, g_const * acc


def step_sorted(st: SortedPMState, param_vec: jax.Array,
                pair_vec: jax.Array, n_active, cfg: "P.PMConfig", *,
                interpret: bool = False, chunk: int = 0,
                psum_axis=None, cfg2=None, kernels=None,
                base_kernels=None, cfgx=None, pmx_shards: int = 1,
                two_tier: bool = True) -> SortedPMState:
    """One frame on the persistent state: PM self-gravity (repairing the
    order when needed; two-level with a single ``cfg2``, MULTI-level
    with a tuple of them — accel_sorted_multi, optionally terminated by
    the window-exact ``cfgx`` correction) + the reference
    kick/step contract (physics.kick_and_step_planes), all in slot
    order. ``two_tier=False`` forces full-sort-only repairs (the
    measurement control — see accel_sorted). With ``cfgx`` the return
    is ``(state', pmx_counts)`` — see accel_sorted_multi."""
    pmx_counts = None
    if isinstance(cfg2, tuple):
        out = accel_sorted_multi(st, pair_vec[0], cfg, cfg2,
                                 n_active=n_active,
                                 interpret=interpret, chunk=chunk,
                                 psum_axis=psum_axis, kernels=kernels,
                                 base_kernels=base_kernels,
                                 cfgx=cfgx, pmx_shards=pmx_shards)
        if cfgx is not None:
            st, acc, pmx_counts = out
        else:
            st, acc = out
    else:
        if cfgx is not None:
            raise ValueError("cfgx (window-exact forces) rides the "
                             "multi-level class order — pass a TUPLE "
                             "cfg2 (pm_persist.accel_sorted_multi)")
        st, acc = accel_sorted(st, pair_vec[0], cfg, n_active=n_active,
                               interpret=interpret, chunk=chunk,
                               psum_axis=psum_axis, cfg2=cfg2,
                               kernels=kernels, base_kernels=base_kernels,
                               two_tier=two_tier)
    shape = (3, st.pos.shape[1] // LANE, LANE)
    pos, vel = physics.kick_and_step_planes(
        st.pos.reshape(shape), st.vel.reshape(shape),
        acc.reshape(shape), param_vec)
    st = st._replace(pos=pos.reshape(3, -1), vel=vel.reshape(3, -1))
    if cfgx is not None:
        return st, pmx_counts
    return st


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "chunk",
                                             "cfg2", "cfgx", "two_tier"))
def step_sorted_jit(st, param_vec, pair_vec, n_active, cfg,
                    interpret: bool = False, chunk: int = 0,
                    cfg2=None, kernels=None, base_kernels=None,
                    cfgx=None, two_tier: bool = True):
    return step_sorted(st, param_vec, pair_vec, n_active, cfg,
                       interpret=interpret, chunk=chunk, cfg2=cfg2,
                       kernels=kernels, base_kernels=base_kernels,
                       cfgx=cfgx, two_tier=two_tier)


def unsort(st: SortedPMState, arrays) -> tuple:
    """Return ``arrays`` (each (..., N) in slot order) re-ordered to
    identity order — the consumer-side bridge for colors / streaming /
    checkpoints. Paid only when identity order is actually needed (never
    inside the frame).

    Implemented as ONE ``lax.sort`` keyed on ``ids`` (a permutation of
    0..N-1, so sorting by it IS the inverse permutation) with every
    component row as a payload — the same trick as pm_pallas's un-sort.
    Measured at 16M: the scatter this replaces (``at[..., ids].set``)
    takes 2700 ms (XLA TPU scatter is serial); the 7-operand sort is
    ~135 ms (41 ms comparator network + ~13.5 ms/operand)."""
    rows = []
    specs = []
    for a in arrays:
        flat = a.reshape(-1, a.shape[-1])
        specs.append((a.shape, flat.shape[0]))
        rows.extend(flat[i] for i in range(flat.shape[0]))
    s = jax.lax.sort((st.ids,) + tuple(rows), num_keys=1)
    out, k = [], 1
    for shape, nr in specs:
        out.append(jnp.stack(s[k:k + nr]).reshape(shape))
        k += nr
    return tuple(out)
