"""EXPERIMENT: merge-path sort — measured SLOWER than lax.sort; not wired.

Hypothesis: XLA's global variadic sort at 16M elements (~41 ms comparator
network + ~13.5 ms per 32-bit operand, v5e) is HBM-traffic-bound on its
long-distance compare-exchange stages, so a two-layer Pallas design that
streams HBM once per merge round should win:

  1. Base: a full bitonic sort of every SEG=32K block (15 phases, 120
     compare-exchange stages, VMEM-resident, one HBM read + write).
  2. log2(N/SEG) merge rounds: merge-path windows (exact per-segment
     consumption ranges found by a vectorized XLA bisection, delivered
     as scalar-prefetch bounds), 8-row-aligned window DMAs, a 10-bit
     static-shift rotation ladder to the exact element offset, and a
     VMEM bitonic merge with (key, padding-flag) lexicographic
     comparators so duplicate key-max elements keep their payloads.

Measured on v5e at 16M (3-word forward-sort shape / 2-word un-sort
shape): psort 95.2 / 74.1 ms vs lax.sort 68.0 / 55.0 ms. Breakdown:
base 28.1 ms, merge round 13.4 ms x 9 (4.8 ms of that is the partition
bisection's ~34 dependent micro-launches). The hypothesis is WRONG:
TPU sorts are shuffle-COMPUTE-bound, not traffic-bound — every
compare-exchange costs cross-lane/sublane rolls, and Mosaic rolls are
no faster than the shuffles XLA's own sort network emits, so the HBM
savings never materialize. The PM pipeline therefore keeps lax.sort
(ops/pm_pallas.pm_sort); this module stays as a correct, tested record
of the experiment and its cost model.

Correct and parity-tested (tests/test_psort.py, interpret + real TPU):
1-D operands >= 2*SEG elements, u32/i32 keys, 32-bit payloads; other
lengths are padded with key-max dummies and sliced back (callers must
keep real keys below key-max at such lengths); falls back to
``jax.lax.sort`` otherwise, and off-TPU. NOT stable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SEG = 32768                      # merge segment / base block (elements):
                                 # big enough to amortize per-grid-step
                                 # DMA/scalar overhead over ~2K segments
                                 # at 16M, small enough that two windows
                                 # + merge temporaries sit in VMEM
SEG_ROWS = SEG // LANE           # 256
WIN_ROWS = SEG_ROWS + 8          # slack for the 8-row-aligned DMA start
                                 # + in-window rotation (max 1023 elems)


def _maxval(dtype) -> int:
    dtype = jnp.dtype(dtype)
    if dtype == jnp.uint32:
        return 0xFFFFFFFF
    if dtype == jnp.int32:
        return 0x7FFFFFFF
    raise ValueError(f"unsupported key dtype {dtype}")


# ---------------------------------------------------------------------------
# XLA-side merge-path partition search
# ---------------------------------------------------------------------------

def _partitions(key: jax.Array, run_len: int):
    """(a_lo, b_lo, a_hi, b_hi): i32[n_seg] ABSOLUTE element windows.

    Segment j (merged output [j*SEG, (j+1)*SEG)) of run pair
    p = j*SEG // (2L) consumes A = key[base, base+L) on [a_lo, a_hi) and
    B = key[base+L, base+2L) on [b_lo, b_hi). The split ia at offset
    o = j*SEG - p*2L is the LAST value in [max(0,o-L), min(o,L)] with
    A[ia-1] <= B[o-ia] (ties consume A first), found by fixed-iteration
    bisection on that monotone predicate; the j+1 split (or the run ends,
    at a pair boundary) closes the windows.
    """
    n = key.shape[0]
    L = run_len
    n_seg = n // SEG
    j = jnp.arange(n_seg, dtype=jnp.int32)
    base = (j * SEG // (2 * L)) * (2 * L)
    o = j * SEG - base

    def split(o_, base_):
        lo = jnp.maximum(o_ - L, 0)
        hi = jnp.minimum(o_, L)

        def pred(ia):
            a = key[jnp.clip(base_ + ia - 1, 0, n - 1)]
            b = key[jnp.clip(base_ + L + o_ - ia, 0, n - 1)]
            return (ia <= jnp.maximum(o_ - L, 0)) | (a <= b)

        for _ in range(max(L, 2).bit_length() + 1):
            mid = (lo + hi + 1) // 2
            ok = pred(mid)
            lo = jnp.where(ok, mid, lo)
            hi = jnp.where(ok, hi, mid - 1)
        return lo

    ia = split(o, base)
    # closing split: the same pair's next segment, or the run ends
    last_in_pair = o + SEG >= 2 * L
    ia_next = jnp.where(last_in_pair, L, split(o + SEG, base))
    a_lo = base + ia
    b_lo = base + L + (o - ia)
    a_hi = base + ia_next
    b_hi = base + L + jnp.where(last_in_pair, L, o + SEG - ia_next)
    return a_lo, b_lo, a_hi, b_hi


# ---------------------------------------------------------------------------
# kernel helpers (static-shape, static-shift vector ops only)
# ---------------------------------------------------------------------------

def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _shift_left(x, amt):
    """Row-major 1-D left shift by static amt in [1, LANE) of (R, LANE)."""
    xl = _roll(x, -amt, 1)
    carry = _roll(xl, -1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANE - amt, xl, carry)


def _rotate_words(words, delta):
    """1-D left-rotate each (WIN_ROWS, LANE) word by traced delta < 1024.

    Bits 0-6 shift within lanes (with the +1-row carry); bits 7-9 are
    whole-row shifts. Used rows stay clear of the circular wraparound:
    1023 + SEG <= WIN_ROWS * LANE."""
    out = []
    for x in words:
        for b in range(7):
            bit = (delta >> b) & 1
            x = jnp.where(bit == 1, _shift_left(x, 1 << b), x)
        for b in range(7, 10):
            bit = (delta >> b) & 1
            x = jnp.where(bit == 1, _roll(x, -(1 << (b - 7)), 0), x)
        out.append(x)
    return out


def _flip(x):
    """Full reverse of a (SEG_ROWS, LANE) block.

    Reversal = XOR of the flat index with all-ones, i.e. an
    UNCONDITIONAL exchange at every power-of-two distance on each axis —
    rolls + selects only (``rev`` has no Mosaic lowering).
    """
    for axis in (0, 1):
        iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        d = 1
        while d < x.shape[axis]:
            x = jnp.where((iota & d) == 0, _roll(x, -d, axis),
                          _roll(x, d, axis))
            d *= 2
    return x


def _merge_stage(k, inval, ps, dist, axis, iota, desc=None):
    """One bitonic compare-exchange stage at power-of-two ``dist``.

    Positions pair up as (i, i XOR dist): on a power-of-two lattice the
    circular roll value is only USED where it equals the XOR partner
    (bit-d clear => i+d doesn't wrap; bit-d set => i-d doesn't borrow),
    so plain rolls implement the network exactly. Comparisons are
    lexicographic on (key, inval): window padding rides with inval=1 so
    it sorts strictly AFTER real elements whose key happens to equal the
    key maximum (their payloads must survive). ``desc`` flips the
    exchange direction where True (full bitonic sort phases); None means
    all-ascending (merge).
    """
    kl = _roll(k, dist, axis)
    kr = _roll(k, -dist, axis)
    hi_slot = (iota & dist) != 0
    if inval is None:
        gt_l, gt_r = kl > k, k > kr
        lt_l, lt_r = kl < k, k < kr
    else:
        il = _roll(inval, dist, axis)
        ir = _roll(inval, -dist, axis)
        gt_l = (kl > k) | ((kl == k) & (il > inval))
        gt_r = (k > kr) | ((k == kr) & (inval > ir))
        lt_l = (kl < k) | ((kl == k) & (il < inval))
        lt_r = (k < kr) | ((k == kr) & (inval < ir))
    # boolean algebra, not where(bool, bool, bool): Mosaic can't lower
    # the i1 select (i8->i1 truncation)
    swap = (hi_slot & gt_l) | (~hi_slot & gt_r)
    if desc is not None:
        swap_d = (hi_slot & lt_l) | (~hi_slot & lt_r)
        swap = (desc & swap_d) | (~desc & swap)
    k = jnp.where(swap, jnp.where(hi_slot, kl, kr), k)
    if inval is not None:
        inval = jnp.where(swap, jnp.where(hi_slot, il, ir), inval)
    nps = []
    for p in ps:
        pl_ = _roll(p, dist, axis)
        pr_ = _roll(p, -dist, axis)
        nps.append(jnp.where(swap, jnp.where(hi_slot, pl_, pr_), p))
    return k, inval, nps


def _merge_window(ka, ia_flag, pa, kb, ib_flag, pb):
    """Bitonic-merge two ascending (SEG_ROWS, LANE) windows; return the
    ascending first-SEG half (key + payloads)."""
    k = jnp.concatenate([ka, _flip(kb)], axis=0)     # (2*SEG_ROWS, LANE)
    inval = jnp.concatenate([ia_flag, _flip(ib_flag)], axis=0)
    ps = [jnp.concatenate([a, _flip(b)], axis=0) for a, b in zip(pa, pb)]
    rows = 2 * SEG_ROWS

    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    dr = rows // 2
    while dr >= 1:                                   # element dist SEG..LANE
        k, inval, ps = _merge_stage(k, inval, ps, dr, 0, riota)
        dr //= 2
    liota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    d = LANE // 2
    while d >= 1:                                    # element dist 64..1
        k, inval, ps = _merge_stage(k, inval, ps, d, 1, liota)
        d //= 2
    return k[:SEG_ROWS], [p[:SEG_ROWS] for p in ps]


# ---------------------------------------------------------------------------
# base: full bitonic sort of one SEG block, VMEM-resident
# ---------------------------------------------------------------------------

def _block_sort_kernel(n_words, *refs):
    """Bitonic sort of one SEG block laid out (SEG_ROWS, LANE) row-major.

    log2(SEG) phases / 120 compare-exchange stages at SEG=32K, all
    VMEM-resident — replaces the XLA batched base sort, which re-streams
    the block per stage. Phase directions come from bit log2(size) of
    the flat element index.
    """
    ins = refs[:n_words]
    outs = refs[n_words:]
    k = ins[0][...]
    ps = [ins[w][...] for w in range(1, n_words)]
    riota = jax.lax.broadcasted_iota(jnp.int32, (SEG_ROWS, LANE), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (SEG_ROWS, LANE), 1)
    flat = riota * LANE + liota

    size = 2
    while size <= SEG:
        desc = (flat & size) != 0          # all-False on the final phase
        d = size // 2
        while d >= 1:
            if d >= LANE:
                k, _, ps = _merge_stage(k, None, ps, d // LANE, 0, riota,
                                        desc=desc)
            else:
                k, _, ps = _merge_stage(k, None, ps, d, 1, liota,
                                        desc=desc)
            d //= 2
        size *= 2

    outs[0][...] = k
    for w in range(1, n_words):
        outs[w][...] = ps[w - 1]


@functools.lru_cache(maxsize=None)
def _build_block_sort(n_blocks: int, n_words: int, dtypes: tuple,
                      interpret: bool):
    kernel = functools.partial(_block_sort_kernel, n_words)
    spec = [pl.BlockSpec((SEG_ROWS, LANE), lambda b: (b, 0),
                         memory_space=pltpu.VMEM) for _ in range(n_words)]
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=spec,
        out_specs=spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * SEG_ROWS, LANE), jnp.dtype(d))
            for d in dtypes],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# merge-round kernel (shared by every round: bounds are prefetched)
# ---------------------------------------------------------------------------

def _round_kernel(n_real: int, n_words: int, maxval,
                  alo_ref, blo_ref, ahi_ref, bhi_ref, *refs):
    ins = refs[:n_words]
    outs = refs[n_words:2 * n_words]
    sa = refs[2 * n_words:3 * n_words]
    sb = refs[3 * n_words:4 * n_words]
    sem = refs[4 * n_words]

    j = pl.program_id(0)
    n_seg = n_real // SEG

    @pl.when(j >= n_seg)
    def _():
        # rewrite the key-max pad segments of the (padded) output buffers
        outs[0][...] = jnp.full((SEG_ROWS, LANE), maxval, outs[0].dtype)
        for w in range(1, n_words):
            outs[w][...] = jnp.zeros((SEG_ROWS, LANE), outs[w].dtype)

    @pl.when(j < n_seg)
    def _():
        a_lo = alo_ref[j]
        b_lo = blo_ref[j]
        # 8-row-aligned DMA starts (aligned (8,128) tiles); the rotation
        # ladder absorbs the full in-window offset (< 1024 elements)
        a_row = (a_lo // (8 * LANE)) * 8
        b_row = (b_lo // (8 * LANE)) * 8

        for w in range(n_words):
            pltpu.make_async_copy(
                ins[w].at[pl.ds(a_row, WIN_ROWS), :], sa[w],
                sem.at[2 * w]).start()
            pltpu.make_async_copy(
                ins[w].at[pl.ds(b_row, WIN_ROWS), :], sb[w],
                sem.at[2 * w + 1]).start()
        for w in range(n_words):
            pltpu.make_async_copy(
                ins[w].at[pl.ds(a_row, WIN_ROWS), :], sa[w],
                sem.at[2 * w]).wait()
            pltpu.make_async_copy(
                ins[w].at[pl.ds(b_row, WIN_ROWS), :], sb[w],
                sem.at[2 * w + 1]).wait()

        a_words = _rotate_words([sa[w][...] for w in range(n_words)],
                                a_lo - a_row * LANE)
        b_words = _rotate_words([sb[w][...] for w in range(n_words)],
                                b_lo - b_row * LANE)
        a_words = [x[:SEG_ROWS] for x in a_words]
        b_words = [x[:SEG_ROWS] for x in b_words]

        # mask to the EXACT half-open windows: the two windows then hold
        # precisely the segment's elements + key-max padding, so the
        # merged first SEG is the segment regardless of duplicate keys
        flat = (jax.lax.broadcasted_iota(jnp.int32, (SEG_ROWS, LANE), 0)
                * LANE
                + jax.lax.broadcasted_iota(jnp.int32, (SEG_ROWS, LANE), 1))
        mv = jnp.asarray(maxval, a_words[0].dtype)
        inval_a = a_lo + flat >= ahi_ref[j]
        inval_b = b_lo + flat >= bhi_ref[j]
        ka = jnp.where(inval_a, mv, a_words[0])
        kb = jnp.where(inval_b, mv, b_words[0])

        k, ps = _merge_window(ka, inval_a.astype(jnp.int32), a_words[1:],
                              kb, inval_b.astype(jnp.int32), b_words[1:])
        outs[0][...] = k
        for w in range(1, n_words):
            outs[w][...] = ps[w - 1]


@functools.lru_cache(maxsize=None)
def _build_round(n_real: int, n_words: int, key_dtype_name: str,
                 dtypes: tuple, interpret: bool):
    maxval = _maxval(key_dtype_name)
    n_seg = n_real // SEG
    grid = n_seg + 2                     # +2 rewrites the pad segments

    kernel = functools.partial(_round_kernel, n_real, n_words, maxval)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,           # a_lo, b_lo, a_hi, b_hi
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_words,
        out_specs=[
            pl.BlockSpec((SEG_ROWS, LANE), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_words)],
        scratch_shapes=(
            [pltpu.VMEM((WIN_ROWS, LANE), jnp.dtype(d)) for d in dtypes]
            + [pltpu.VMEM((WIN_ROWS, LANE), jnp.dtype(d)) for d in dtypes]
            + [pltpu.SemaphoreType.DMA((2 * n_words,))]),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((grid * SEG_ROWS, LANE), jnp.dtype(d))
            for d in dtypes],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def can_fast_sort(n: int) -> bool:
    blocks = n // SEG
    return n >= 2 * SEG and n % SEG == 0 and blocks & (blocks - 1) == 0


def _pad_target(n: int) -> int:
    """Smallest power-of-2 multiple of SEG that holds n (>= 2*SEG)."""
    m = 2 * SEG
    while m < n:
        m *= 2
    return m


def sort(operands, num_keys: int = 1, *, interpret: bool = False,
         pad_to_pow2: bool = False):
    """Drop-in for ``jax.lax.sort(operands, num_keys=1)`` on 1-D u32/i32
    keys with 32-bit payloads; falls back to ``lax.sort`` when the
    dtypes don't fit the fast path or off-TPU. NOT stable.

    ``pad_to_pow2`` extends the fast path to lengths that aren't a
    power-of-2 multiple of SEG by padding with key-max dummies and
    slicing back. It is OPT-IN because it is only correct when no REAL
    key equals the key maximum at such lengths (an unstable sort can
    swap a real key-max element's payload with a dummy's zeros); with
    the default False, those lengths fall back to ``lax.sort``.
    """
    operands = tuple(operands)
    key = operands[0]
    n = key.shape[0]
    if (num_keys != 1 or key.ndim != 1
            or key.dtype not in (jnp.uint32, jnp.int32)
            or n < 2 * SEG
            or any(o.ndim != 1 or o.dtype.itemsize != 4 for o in operands)
            or not (interpret or jax.default_backend() == "tpu")):
        return jax.lax.sort(operands, num_keys=num_keys)

    maxval = _maxval(key.dtype)
    n_words = len(operands)
    dtypes = tuple(str(o.dtype) for o in operands)

    n_orig = n
    if not can_fast_sort(n):
        if not pad_to_pow2:
            return jax.lax.sort(operands, num_keys=num_keys)
        n = _pad_target(n)
        operands = tuple(
            jnp.concatenate(
                [o, jnp.full((n - n_orig,), maxval if w == 0 else 0,
                             o.dtype)])
            for w, o in enumerate(operands))

    # base: independent SEG-block bitonic sorts, fully VMEM-resident
    base = _build_block_sort(n // SEG, n_words, dtypes, interpret)
    ops = [o.reshape(-1)
           for o in base(*[o.reshape(-1, LANE) for o in operands])]

    # TWO key-max pad segments: window reads past n stay monotone, and a
    # B-side window whose start reaches n exactly (empty window at a pair
    # boundary) still DMAs WIN_ROWS rows in bounds. The kernel's extra
    # grid steps rewrite the padding in every round's output.
    ops = [jnp.concatenate(
        [o, jnp.full((2 * SEG,), maxval if w == 0 else 0, o.dtype)])
        for w, o in enumerate(ops)]

    call = _build_round(n, n_words, str(key.dtype), dtypes, interpret)
    L = SEG
    while L < n:
        bounds = _partitions(ops[0][:n], L)
        outs = call(*bounds, *[o.reshape(-1, LANE) for o in ops])
        ops = [o.reshape(-1) for o in outs]
        L *= 2
    return tuple(o[:n_orig] for o in ops)
