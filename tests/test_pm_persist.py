"""Persistent cell-sorted PM: parity, disorder tolerance, repair triggers.

Oracle chain (SURVEY.md §4): accel_sorted must reproduce
pm_pallas.pm_accel (itself parity-tested against pm.pm_accel_ref and the
direct O(N^2) sum) with the acceleration permuted by the state's ids —
in EVERY ordering regime: freshly sorted, drifted-but-within-budget
(span tables absorb the disorder with zero repair), and scrambled past
the budget (the lax.cond repair fires and must restore exactness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import particle_sim_tpu as psim
from particle_sim_tpu.core.params import PMConfig
from particle_sim_tpu.ops import physics, pm, pm_pallas, pm_persist

CFG = PMConfig(softening=4.0, gradient="exact", boundary="isolated")


def _cloud(n, seed, radius=45.0, offset=(0, 0, 0)):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    r = radius * rng.random(n).astype(np.float32) ** (1 / 3)
    return (x * r[:, None] + np.asarray(offset, np.float32)).astype(
        np.float32)


def _flat(pos_nx3, capacity=None):
    st = psim.ParticleState.from_arrays(
        pos_nx3, np.zeros_like(pos_nx3), np.zeros_like(pos_nx3),
        capacity=capacity)
    return jnp.asarray(st.pos.reshape(3, -1)), st.n_active


def _ref_accel(pos_flat, n_active):
    return np.asarray(pm_pallas.pm_accel(
        pos_flat, n_active, 1.0, CFG, interpret=True))


def _assert_matches_ref(st, n_active, atol_rel=3e-3, **kw):
    """accel_sorted == pm_accel up to slot permutation. Tolerance: the
    reference path's un-sort quantizes accelerations through the 40-bit
    shared-exponent pack (~2^-10 of each particle's dominant component);
    accel_sorted never un-sorts, so it returns the UNquantized gather."""
    st2, acc = pm_persist.accel_sorted(st, 1.0, CFG, n_active=n_active,
                                       interpret=True, **kw)
    a_ref = _ref_accel(_ids_order(st2), n_active)
    ids = np.asarray(st2.ids)
    scale = np.abs(a_ref).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc), a_ref[:, ids],
                               atol=atol_rel * scale)
    return st2, acc


def _ids_order(st):
    """Positions in identity order (the reference path's input)."""
    inv = jnp.zeros_like(st.ids).at[st.ids].set(
        jnp.arange(st.ids.shape[0], dtype=jnp.int32))
    return st.pos[:, inv]


@pytest.mark.slow
def test_parity_fresh_sort():
    pos, n_act = _flat(_cloud(1500, 0))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    # freshly sorted: keys are globally ordered, no repair can fire
    st2, _ = _assert_matches_ref(st, n_act)
    assert int(st2.resorts) == 0
    assert np.all(np.diff(np.asarray(
        pm_pallas.cell_key_frac(st2.pos, st2.ids < n_act, CFG)[0])) >= 0)


def test_parity_drifted_no_repair():
    """Small random drift: span tables must absorb the disorder without
    a repair, and the result must stay exact."""
    pos, n_act = _flat(_cloud(2000, 1))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    rng = np.random.default_rng(2)
    drift = jnp.asarray(rng.normal(scale=0.3, size=st.pos.shape)
                        .astype(np.float32))
    st = st._replace(pos=st.pos + drift)
    st2, _ = _assert_matches_ref(st, n_act)
    assert int(st2.resorts) == 0


def test_repair_fires_on_scramble():
    """A global permutation destroys span locality: the pair budgets
    overflow, the cond repair fires, and the result is still exact."""
    pos, n_act = _flat(_cloud(2000, 3))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    perm = jnp.asarray(np.random.default_rng(4).permutation(
        st.pos.shape[1]).astype(np.int32))
    st = st._replace(pos=st.pos[:, perm], vel=st.vel[:, perm],
                     ids=st.ids[perm])
    st2, _ = _assert_matches_ref(st, n_act)
    assert int(st2.resorts) == 1


def test_partial_active_padding_inert():
    """Padding slots (ids >= n_active) must not deposit, gather zero, and
    stay inert even when poisoned with in-box garbage positions."""
    pos_np = _cloud(900, 5)
    st0 = psim.ParticleState.from_arrays(
        pos_np, np.zeros_like(pos_np), np.zeros_like(pos_np), capacity=2048)
    flat = jnp.asarray(st0.pos.reshape(3, -1))
    st = pm_persist.init_sorted(flat, st0.n_active, CFG)
    poison = jnp.where(st.ids[None] < st0.n_active, st.pos,
                       jnp.float32(1.5))
    st = st._replace(pos=poison)
    st2, acc = pm_persist.accel_sorted(st, 1.0, CFG, n_active=st0.n_active,
                                       interpret=True)
    dead = np.asarray(st2.ids) >= 900
    assert np.all(np.asarray(acc)[:, dead] == 0.0)
    a_ref = _ref_accel(_ids_order(st2), st0.n_active)
    ids = np.asarray(st2.ids)
    scale = np.abs(a_ref).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc), a_ref[:, ids],
                               atol=3e-3 * scale)


@pytest.mark.slow
def test_step_sorted_matches_step_pm():
    """One integrated frame must equal pm_pallas.step_pm modulo the slot
    permutation (identical accel + identical kick/step contract)."""
    n = 1024
    pos_np = _cloud(n, 6, radius=30.0)
    vel_np = np.random.default_rng(7).normal(
        scale=0.5, size=pos_np.shape).astype(np.float32)
    stp = psim.ParticleState.from_arrays(pos_np, vel_np,
                                         np.zeros_like(pos_np))
    pv = jnp.asarray(psim.SimParams(delta_time=0.016, gravity=0.0).pack())
    pairv = jnp.asarray(psim.PairwiseParams(1.0, CFG.softening).pack())
    planes_p = jnp.asarray(stp.pos)
    planes_v = jnp.asarray(stp.vel)

    p_ref, v_ref = pm_pallas.step_pm(planes_p, planes_v, pv, pairv,
                                     stp.n_active, CFG, interpret=True)

    st = pm_persist.init_sorted(planes_p.reshape(3, -1), stp.n_active, CFG,
                                vel_flat=planes_v.reshape(3, -1))
    st2 = pm_persist.step_sorted(st, pv, pairv, stp.n_active, CFG,
                                 interpret=True)
    ids = np.asarray(st2.ids)
    p_ref = np.asarray(p_ref).reshape(3, -1)
    v_ref = np.asarray(v_ref).reshape(3, -1)
    # the ref frame's accel rode the 40-bit un-sort pack; one kick at
    # dt=0.016 turns that ~2^-10-relative quantization into these bounds
    np.testing.assert_allclose(np.asarray(st2.pos), p_ref[:, ids],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st2.vel), v_ref[:, ids],
                               rtol=0, atol=5e-2)


@pytest.mark.slow
def test_masses_ride_repairs():
    """Sorted source masses follow their particles through a repair."""
    pos, n_act = _flat(_cloud(1024, 8))
    masses = jnp.asarray(
        np.random.default_rng(9).uniform(0.5, 2.0, 1024).astype(np.float32))
    st = pm_persist.init_sorted(pos, n_act, CFG, masses=masses)
    perm = jnp.asarray(np.random.default_rng(10).permutation(
        1024).astype(np.int32))
    st = st._replace(pos=st.pos[:, perm], vel=st.vel[:, perm],
                     ids=st.ids[perm], masses=st.masses[perm])
    st2, acc = pm_persist.accel_sorted(st, 1.0, CFG, n_active=n_act,
                                       interpret=True)
    assert int(st2.resorts) == 1
    # masses still paired with their particles: sorted-by-ids masses
    # equal the originals
    ids = np.asarray(st2.ids)
    np.testing.assert_array_equal(
        np.asarray(st2.masses)[np.argsort(ids)], np.asarray(masses))
    a_ref = np.asarray(pm_pallas.pm_accel(
        _ids_order(st2), n_act, 1.0, CFG,
        masses=jnp.asarray(np.asarray(st2.masses)[np.argsort(ids)]),
        interpret=True))
    scale = np.abs(a_ref).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc), a_ref[:, ids],
                               atol=3e-3 * scale)


def test_unsort_roundtrip():
    pos, n_act = _flat(_cloud(600, 11))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    (back,) = pm_persist.unsort(st, (st.pos,))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pos))


def test_periodic_boundary_parity():
    cfg = PMConfig(softening=4.0, gradient="exact", boundary="periodic")
    pos, n_act = _flat(_cloud(1200, 12))
    st = pm_persist.init_sorted(pos, n_act, cfg)
    st2, acc = pm_persist.accel_sorted(st, 1.0, cfg, n_active=n_act,
                                       interpret=True)
    a_ref = np.asarray(pm_pallas.pm_accel(_ids_order(st2), n_act, 1.0,
                                          cfg, interpret=True))
    ids = np.asarray(st2.ids)
    scale = np.abs(a_ref).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc), a_ref[:, ids],
                               atol=3e-3 * scale)


def test_rejects_auto_box():
    cfg = PMConfig(softening=4.0, auto_box=True)
    pos, n_act = _flat(_cloud(512, 13))
    with pytest.raises(ValueError, match="static box"):
        pm_persist.init_sorted(pos, n_act, cfg)


def test_pick_chunk_budget():
    for g in pm_pallas.SUPPORTED_GRIDS:
        geom = pm_pallas._geom(g)
        sd, sg = pm_persist._slack(geom)
        for n in (512 * 4, 1000448, 16 * 1024 * 1024):
            c = pm_persist.pick_chunk(n, geom)
            assert n % c == 0
            nc = n // c
            assert (max(sd * nc + 4 * geom.n_tiles,
                        sg * nc + 2 * geom.n_tiles_g) + 2 <= 65536)
    # the geometry-scaled slack lands on the measured G=128 optimum
    assert pm_persist._slack(pm_pallas._GEOM128) == (20, 24)


def test_budgets_clamped_and_sufficient():
    """Capacities are the doubled-SLACK drift headroom clamped to SMEM,
    and always cover a freshly-sorted order's totals (the repair
    guarantee). (At sparse tiny N the gather totals sit against the
    per-chunk tile-span floor, so only fit — not margin — is asserted.)"""
    for n in (2048, 61440):
        pos, n_act = _flat(_cloud(n - 7, 17))
        st = pm_persist.init_sorted(pos, n_act, CFG)
        cap = st.pos.shape[1]
        c = pm_persist.pick_chunk(cap)
        cd, cg = pm_persist.budgets(cap // c)
        assert cd <= pm_persist._SMEM_WORDS
        assert cg <= pm_persist._SMEM_WORDS
        key, _ = pm_pallas.cell_key_frac(st.pos, st.ids < n_act, CFG)
        dt, gt = pm_persist._pair_totals(key, c)
        assert int(dt) <= cd
        assert int(gt) <= cg


def test_pick_segment():
    """Local-repair segment sizing: multiple of the chunk, >= 8 chunks,
    >= 4 segments; ragged capacities that can't tile fall back to 0 (no
    local tier)."""
    assert pm_persist.pick_segment(16 * 1024 * 1024, 8192) == 65536
    assert pm_persist.pick_segment(131072, 512) == 32768
    assert pm_persist.pick_segment(1000448, 512) == 0   # 512*1954, 977 prime
    assert pm_persist.pick_segment(2048, 512) == 0      # too few segments


def test_sort_state_segmented_unit():
    """_sort_state(seg=...) sorts each segment independently, keeps
    payload rows paired with their keys, and leaves the dead tail at the
    END (dead keys are maximal and already live in the tail segments)."""
    rng = np.random.default_rng(21)
    n, seg, n_live = 4096, 1024, 3600
    key = np.where(np.arange(n) < n_live,
                   rng.integers(0, 10_000, n), pm_pallas.SENTINEL)
    # scramble each segment internally (dead slots stay in tail segments)
    perm = np.concatenate([rng.permutation(seg) + i * seg
                           for i in range(n // seg)])
    key = key[perm].astype(np.int32)
    pos = rng.normal(size=(3, n)).astype(np.float32)
    ids = perm.astype(np.int32)
    st = pm_persist._sort_state(jnp.asarray(key), jnp.asarray(pos),
                                jnp.asarray(pos * 2.0), jnp.asarray(ids),
                                None, jnp.int32(1), seg=seg)
    k_out = np.asarray(key)[np.argsort(np.asarray(st.ids), kind="stable")]
    for i in range(n // seg):
        s = np.sort(key[i * seg:(i + 1) * seg])
        got_pos = np.asarray(st.pos)[:, i * seg:(i + 1) * seg]
        # segment sorted, and each slot's payload still matches its key
        kk = np.asarray(
            jax.lax.sort((jnp.asarray(key[i * seg:(i + 1) * seg]),
                          jnp.asarray(pos[:, i * seg:(i + 1) * seg][0])),
                         num_keys=1)[1])
        np.testing.assert_array_equal(
            np.sort(np.asarray(st.ids)[i * seg:(i + 1) * seg]),
            np.sort(ids[i * seg:(i + 1) * seg]))
        assert (np.diff(s) >= 0).all()
        np.testing.assert_allclose(got_pos[0], kk)
    # dead tail intact: the last (n - n_live) slots are exactly the dead ids
    assert set(np.asarray(st.ids)[n_live:].tolist()) == set(
        range(n_live, n))
    del k_out


@pytest.mark.slow
def test_local_repair_tier_within_segment_scramble(monkeypatch):
    """Scrambling WITHIN segments overflows the budgets but is fixable by
    the tier-1 segment-local sort: exactly one repair pass fires and the
    result is exact. (pick_segment is patched so the two-tier path runs
    at a CI-sized N.)"""
    monkeypatch.setattr(pm_persist, "pick_segment", lambda n, c: 2048)
    pos, n_act = _flat(_cloud(8192, 22))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    n = st.pos.shape[1]
    rng = np.random.default_rng(23)
    perm = np.concatenate([rng.permutation(2048) + i * 2048
                           for i in range(n // 2048)]).astype(np.int32)
    perm = jnp.asarray(perm)
    st = st._replace(pos=st.pos[:, perm], vel=st.vel[:, perm],
                     ids=st.ids[perm])
    st2, _ = _assert_matches_ref(st, n_act)
    assert int(st2.resorts) == 1          # tier 1 only
    # the repaired order is per-segment sorted
    key = np.asarray(pm_pallas.cell_key_frac(
        st2.pos, st2.ids < n_act, CFG)[0])
    for i in range(n // 2048):
        assert (np.diff(key[i * 2048:(i + 1) * 2048]) >= 0).all()


@pytest.mark.slow
def test_local_repair_escalates_to_global(monkeypatch):
    """A GLOBAL scramble defeats the local tier (segment key ranges all
    span the whole cloud): tier 1 fires, the re-derived totals still
    overflow, tier 2 runs the full sort — two repair passes, exact
    result, globally sorted order."""
    monkeypatch.setattr(pm_persist, "pick_segment", lambda n, c: 2048)
    pos, n_act = _flat(_cloud(8192, 24))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    perm = jnp.asarray(np.random.default_rng(25).permutation(
        st.pos.shape[1]).astype(np.int32))
    st = st._replace(pos=st.pos[:, perm], vel=st.vel[:, perm],
                     ids=st.ids[perm])
    st2, _ = _assert_matches_ref(st, n_act)
    assert int(st2.resorts) == 2          # local pass + full pass
    key = np.asarray(pm_pallas.cell_key_frac(
        st2.pos, st2.ids < n_act, CFG)[0])
    assert (np.diff(key) >= 0).all()


def test_base_kernels_args_bit_exact():
    """Routing the Hockney kernel spectra as runtime arguments
    (pm.base_kernels_device — mandatory at G=256, where 1.6 GB of
    baked kernel constants broke the compile RPC) is bit-exact vs the
    baked-constant path: same spectra, different plumbing."""
    from particle_sim_tpu.ops import pm as pm_mod

    pos, n_act = _flat(_cloud(4096, 31))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    bk = pm_mod.base_kernels_device(CFG, CFG.softening)
    _, a_baked = pm_persist.accel_sorted(st, 1.0, CFG, n_active=n_act,
                                         interpret=True)
    _, a_args = pm_persist.accel_sorted(st, 1.0, CFG, n_active=n_act,
                                        interpret=True, base_kernels=bk)
    np.testing.assert_array_equal(np.asarray(a_baked), np.asarray(a_args))


@pytest.mark.slow
def test_two_tier_false_skips_local_tier(monkeypatch):
    """``two_tier=False`` (the r5 A/B's measured win for violent scenes)
    goes straight to the full sort: the SAME global scramble that costs
    the two-tier path two repair passes above repairs in ONE, with the
    identical exact result and a globally sorted order."""
    monkeypatch.setattr(pm_persist, "pick_segment", lambda n, c: 2048)
    pos, n_act = _flat(_cloud(8192, 24))
    st = pm_persist.init_sorted(pos, n_act, CFG)
    perm = jnp.asarray(np.random.default_rng(25).permutation(
        st.pos.shape[1]).astype(np.int32))
    st = st._replace(pos=st.pos[:, perm], vel=st.vel[:, perm],
                     ids=st.ids[perm])
    st2, _ = _assert_matches_ref(st, n_act, two_tier=False)
    assert int(st2.resorts) == 1          # full pass only, no tier 1
    key = np.asarray(pm_pallas.cell_key_frac(
        st2.pos, st2.ids < n_act, CFG)[0])
    assert (np.diff(key) >= 0).all()


def test_segmented_deposit_table_properties():
    """Brute-force check of _deposit_table_spans_seg over random
    segmented orders: (1) every true (window, chunk) incidence of either
    segment part is in the table, (2) no (window, chunk) pair appears
    twice (the boundary-chunk dedupe), (3) entries are tile-major with
    each tile's first fam-0 entry carrying the zero bit, (4) every tile
    has a fam-0 first-visit."""
    from particle_sim_tpu.ops import pm_persist as pp
    from particle_sim_tpu.ops.pm_pallas import (
        GRID, N_TILES, SENTINEL, SPREAD, T_ROWS, _S_BITS, _S_MASK,
        _T_MASK, _T_SHIFT)

    rng = np.random.default_rng(77)
    n, chunk = 8192, 512
    nc = n // chunk
    for trial in range(4):
        # clustered keys with dead slots, sorted per segment like a real
        # repair would produce
        fine_b = int(rng.integers(1, n))
        keys = rng.integers(0, SENTINEL, size=n).astype(np.int64)
        keys[rng.random(n) < 0.1] = SENTINEL
        a = np.sort(keys[:fine_b])
        b = np.sort(keys[fine_b:])
        key = jnp.asarray(np.concatenate([a, b]).astype(np.int32))
        c_max = 4096
        pairs = np.asarray(pp._deposit_table_spans_seg(
            key, chunk, jnp.int32(fine_b), nc, c_max)).astype(np.int64)
        s_k = pairs & _S_MASK
        fam_k = (pairs >> _S_BITS) & 1
        t_k = (pairs >> _T_SHIFT) & _T_MASK
        first_k = (pairs < 0).astype(np.int64)   # bit 31 == int32 sign
        real = t_k < N_TILES

        # (2) no duplicates among real entries
        seen = set()
        for w, s in zip((2 * t_k + fam_k)[real], s_k[real]):
            if s < nc:                      # PAD entries may repeat
                assert (w, s) not in seen, (trial, w, s)
                seen.add((w, s))

        # (1) completeness: every per-part incidence present
        kk = np.concatenate([a, b]).astype(np.int64)
        rows = kk >> 7
        slot = np.arange(n)
        for part, mask in (("A", slot < fine_b), ("B", slot >= fine_b)):
            for s in range(nc):
                m = mask[s * chunk:(s + 1) * chunk] & (
                    kk[s * chunk:(s + 1) * chunk] < SENTINEL)
                if not m.any():
                    continue
                r = rows[s * chunk:(s + 1) * chunk][m]
                rmin, rmax = r.min(), r.max()
                for w in range(2 * N_TILES):
                    t, fam = w >> 1, w & 1
                    lo = max(t * T_ROWS - (SPREAD if fam else 1), 0)
                    hi = (t + 1) * T_ROWS - (GRID if fam else 0) - 1
                    if rmax >= lo and rmin <= hi:
                        assert (w, s) in seen, (trial, part, w, s)

        # (3) tile-major order + (4) per-tile fam-0 first visit
        t_real = t_k[real]
        assert (np.diff(t_real) >= 0).all()
        for t in range(N_TILES):
            idx = np.where((t_k == t))[0]
            assert idx.size > 0
            f0 = idx[0]
            assert fam_k[f0] == 0 and first_k[f0] == 1, (trial, t)
            assert first_k[idx[1:]].sum() == 0


def test_gather_table_spans_properties():
    """Brute-force check of _gather_table_spans over random spans:
    (1) every chunk's corner tile range is fully covered per family (an
    out-of-range fam-1 tile redirects to the provably-empty (0, 1)),
    (2) entries are chunk-major with each chunk's first entry carrying
    the zero bit, (3) every chunk gets a first visit."""
    from particle_sim_tpu.ops import pm_persist as pp
    from particle_sim_tpu.ops.pm_pallas import (
        GRID, SENTINEL, _S_BITS, _S_MASK, _T_MASK, _T_SHIFT)
    from particle_sim_tpu.ops.pm_pallas import (
        N_TILES_G as N_TILES, T_ROWS_G as T_ROWS)

    rng = np.random.default_rng(78)
    n, chunk = 8192, 512
    nc = n // chunk
    for trial in range(4):
        keys = rng.integers(0, SENTINEL, size=n).astype(np.int64)
        keys[rng.random(n) < 0.15] = SENTINEL
        key = jnp.asarray(np.sort(keys).astype(np.int32))
        rmin, rmax = pp._chunk_spans(key, chunk)
        c_max = 4096
        pairs = np.asarray(pp._gather_table_spans(
            rmin, rmax, nc, c_max)).astype(np.int64)
        s_k = pairs & _S_MASK
        fam_k = (pairs >> _S_BITS) & 1
        t_k = (pairs >> _T_SHIFT) & _T_MASK
        first_k = (pairs < 0).astype(np.int64)
        real = s_k < nc

        rmin_np, rmax_np = np.asarray(rmin), np.asarray(rmax)
        got = set(zip(s_k[real], t_k[real], fam_k[real]))
        for s in range(nc):
            if rmax_np[s] < rmin_np[s]:
                continue                       # dead chunk: skip coverage
            t_lo = min(max(rmin_np[s] // T_ROWS, 0), N_TILES - 1)
            t_hi = max(min((rmax_np[s] + 1) // T_ROWS, N_TILES - 1), t_lo)
            fam_shift = GRID // T_ROWS         # fam-1 rows sit +GRID rows
            for t in range(t_lo, t_hi + 1):
                assert (s, t, 0) in got, (trial, s, t)
                t1 = t + fam_shift
                want1 = ((s, t1, 1) if t1 <= N_TILES - 1 else (s, 0, 1))
                assert want1 in got, (trial, s, t1)

        # chunk-major + per-chunk zeroing first visit (every chunk owns
        # an output block, dead or not)
        s_real = s_k[real]
        assert (np.diff(s_real) >= 0).all()
        for s in range(nc):
            idx = np.where(s_k == s)[0]
            assert idx.size > 0, (trial, s)
            assert first_k[idx[0]] == 1
            assert first_k[idx[1:]].sum() == 0


@pytest.mark.parametrize(
    "grid", [32, 64, pytest.param(256, marks=pytest.mark.slow)])
def test_parity_other_grids(grid):
    """Grid generalization (round-4 verdict item 5): the persistent path
    reproduces pm_accel at every SUPPORTED_GRIDS size, through all three
    ordering regimes — fresh sort, drifted-within-budget (no repair),
    and scrambled (repair fires). G=64/32 exercise the plane-padding
    (lane width 128 > G) branches of the tile<->grid bridges; G=256 the
    wide-plane (256-lane) layout and the scaled seg/dead key flags
    (periodic boundary there: the isolated Hockney solve doubles to a
    512^3 grid — minutes of interpret-mode FFT per call on a host CPU;
    the parity target is the solver-agnostic span/table machinery)."""
    cfg = PMConfig(softening=4.0, gradient="exact",
                   boundary="periodic" if grid == 256 else "isolated",
                   grid=grid)
    pos, n_act = _flat(_cloud(1500, 30 + grid))
    st = pm_persist.init_sorted(pos, n_act, cfg)

    def ref(st2):
        return np.asarray(pm_pallas.pm_accel(
            _ids_order(st2), n_act, 1.0, cfg, interpret=True))

    # fresh
    st2, acc = pm_persist.accel_sorted(st, 1.0, cfg, n_active=n_act,
                                       interpret=True)
    a_ref = ref(st2)
    ids = np.asarray(st2.ids)
    scale = np.abs(a_ref).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc), a_ref[:, ids],
                               atol=3e-3 * scale)
    assert int(st2.resorts) == 0
    if grid == 256:
        # G=256's ~9k-entry pair tables make each interpret-mode call
        # minutes on a host CPU; the fresh-parity pass above already
        # exercises every geometry-scaled constant (shift, plane,
        # sentinel, class flags) — the drift/repair REGIMES are
        # geometry-independent and covered at 32/64/128
        return
    # drifted within budget
    rng = np.random.default_rng(31)
    drift = jnp.asarray(rng.normal(scale=0.2, size=st2.pos.shape)
                        .astype(np.float32))
    st3, acc3 = pm_persist.accel_sorted(
        st2._replace(pos=st2.pos + drift), 1.0, cfg, n_active=n_act,
        interpret=True)
    a_ref3 = ref(st3)
    scale3 = np.abs(a_ref3).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc3),
                               a_ref3[:, np.asarray(st3.ids)],
                               atol=3e-3 * scale3)
    # scrambled: repair fires, still exact
    perm = jnp.asarray(rng.permutation(st3.pos.shape[1]).astype(np.int32))
    st4, acc4 = pm_persist.accel_sorted(
        st3._replace(pos=st3.pos[:, perm], vel=st3.vel[:, perm],
                     ids=st3.ids[perm]),
        1.0, cfg, n_active=n_act, interpret=True)
    assert int(st4.resorts) > int(st3.resorts)
    a_ref4 = ref(st4)
    scale4 = np.abs(a_ref4).max() + 1e-12
    np.testing.assert_allclose(np.asarray(acc4),
                               a_ref4[:, np.asarray(st4.ids)],
                               atol=3e-3 * scale4)


def test_engine_persist_grid_64():
    """Engine(pm_persist=True) accepts non-128 grids after the round-4
    un-pinning and tracks the per-frame-sorted engine."""
    import particle_sim_tpu as psim
    from particle_sim_tpu.core.params import Method
    from particle_sim_tpu.engine import Engine

    cfg = PMConfig(softening=4.0, gradient="exact", boundary="isolated",
                   grid=64)
    pv = psim.SimParams(delta_time=0.016, gravity=0.0)
    e = Engine(particle_count=1800, method=Method.PALLAS, pm=cfg,
               interpret=True, pm_persist=True)
    e_ref = Engine(particle_count=1800, method=Method.PALLAS, pm=cfg,
                   interpret=True, pm_persist=False)
    for _ in range(2):
        e.step(pv)
        e_ref.step(pv)
    assert e._persist is not None
    np.testing.assert_allclose(e.state.positions(),
                               e_ref.state.positions(), rtol=0, atol=5e-3)


def test_multi_deposit_table_properties():
    """Brute-force check of _deposit_table_spans_multi (k+1-class order)
    over random class layouts: same contract as the two-segment table —
    (1) every true (window, chunk) incidence of any class part is
    present, (2) no (window, chunk) pair appears twice (the cumulative
    boundary-chunk dedup, including the chain case of a class contained
    entirely inside one chunk), (3) tile-major with the fam-0 zeroing
    first-visit per tile."""
    from particle_sim_tpu.ops import pm_persist as pp
    from particle_sim_tpu.ops.pm_pallas import (
        GRID, N_TILES, SENTINEL, SPREAD, T_ROWS, _S_BITS, _S_MASK,
        _T_MASK, _T_SHIFT)

    rng = np.random.default_rng(79)
    n, chunk = 8192, 512
    nc = n // chunk
    for trial in range(4):
        # three class boundaries; trial 2 forces a TINY middle class
        # (inside one chunk) to exercise the dedup chain
        if trial == 2:
            b0 = int(rng.integers(1, n - chunk))
            bounds_np = np.array([b0, b0 + int(rng.integers(1, 64)),
                                  min(b0 + 100, n)], np.int32)
        else:
            bounds_np = np.sort(rng.integers(0, n, size=3)).astype(np.int32)
        keys = rng.integers(0, SENTINEL, size=n).astype(np.int64)
        keys[rng.random(n) < 0.1] = SENTINEL
        # sort each class region independently (what _repair produces)
        lo = [0] + list(bounds_np)
        hi = list(bounds_np) + [n]
        parts = [np.sort(keys[l:h]) for l, h in zip(lo, hi)]
        kk = np.concatenate(parts).astype(np.int64)
        key = jnp.asarray(kk.astype(np.int32))
        c_max = 6144
        pairs = np.asarray(pp._deposit_table_spans_multi(
            key, chunk, jnp.asarray(bounds_np), nc, c_max)).astype(np.int64)
        s_k = pairs & _S_MASK
        fam_k = (pairs >> _S_BITS) & 1
        t_k = (pairs >> _T_SHIFT) & _T_MASK
        first_k = (pairs < 0).astype(np.int64)
        real = t_k < N_TILES

        seen = set()
        for w, s in zip((2 * t_k + fam_k)[real], s_k[real]):
            if s < nc:
                assert (w, s) not in seen, (trial, w, s)
                seen.add((w, s))

        rows = kk >> 7
        slot = np.arange(n)
        for ci, (l, h) in enumerate(zip(lo, hi)):
            mask_c = (slot >= l) & (slot < h)
            for s in range(nc):
                m = mask_c[s * chunk:(s + 1) * chunk] & (
                    kk[s * chunk:(s + 1) * chunk] < SENTINEL)
                if not m.any():
                    continue
                r = rows[s * chunk:(s + 1) * chunk][m]
                rmin, rmax = r.min(), r.max()
                for w in range(2 * N_TILES):
                    t, fam = w >> 1, w & 1
                    wlo = max(t * T_ROWS - (SPREAD if fam else 1), 0)
                    whi = (t + 1) * T_ROWS - (GRID if fam else 0) - 1
                    if rmax >= wlo and rmin <= whi:
                        assert (w, s) in seen, (trial, ci, w, s)

        t_real = t_k[real]
        assert (np.diff(t_real) >= 0).all()
        for t in range(N_TILES):
            idx = np.where(t_k == t)[0]
            assert idx.size > 0
            f0 = idx[0]
            assert fam_k[f0] == 0 and first_k[f0] == 1, (trial, t)
            assert first_k[idx[1:]].sum() == 0
