"""PM fast-path parity: sorted Pallas deposit/gather vs the jnp reference.

Mirrors the repo's oracle chain (SURVEY.md §4): pm_pallas must reproduce
ops/pm.pm_accel_ref (itself parity-tested against the direct O(N^2) sum)
to float tolerance — the only intended deviation is the gather's bf16
acceleration tiles (~0.4% relative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import particle_sim_tpu as psim
from particle_sim_tpu.core.params import PMConfig
from particle_sim_tpu.ops import pm, pm_pallas

CFG = PMConfig(softening=4.0, gradient="exact", boundary="isolated")


def _planes(pos_nx3, capacity=None):
    n = pos_nx3.shape[0]
    st = psim.ParticleState.from_arrays(
        pos_nx3, np.zeros_like(pos_nx3), np.zeros_like(pos_nx3),
        capacity=capacity)
    return st.pos.reshape(3, -1), st.n_active, n


def _cloud(n, seed, radius=45.0, offset=(0, 0, 0)):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    r = radius * rng.random(n).astype(np.float32) ** (1 / 3)
    return (x * r[:, None] + np.asarray(offset, np.float32)).astype(
        np.float32)


def _compare(pos_flat, n_active, rtol=0.02):
    a_fast = np.asarray(pm_pallas.pm_accel(
        pos_flat, n_active, 1.0, CFG, interpret=True))
    a_ref = np.asarray(pm.pm_accel_ref(
        pos_flat, n_active, 1.0, CFG.softening, CFG))
    n = int(n_active)
    scale = np.abs(a_ref[:, :n]).max() + 1e-12
    np.testing.assert_allclose(a_fast[:, :n], a_ref[:, :n],
                               atol=rtol * scale)
    # padding particles get exactly zero acceleration
    assert np.all(a_fast[:, n:] == 0.0)


@pytest.mark.parametrize("seed,n", [
    (0, 1000), pytest.param(1, 3000, marks=pytest.mark.slow)])
def test_parity_filled_cloud(seed, n):
    pos, n_act, _ = _planes(_cloud(n, seed))
    _compare(pos, n_act)


def test_parity_clustered_off_center():
    """Dense off-center clump: exercises tile-spill and lookback paths."""
    pos_np = np.concatenate([
        _cloud(1500, 2, radius=6.0, offset=(30.0, -25.0, 40.0)),
        _cloud(500, 3, radius=55.0),
    ])
    pos, n_act, _ = _planes(pos_np)
    _compare(pos, n_act)


def test_parity_partial_active():
    """n_active < capacity: sentinel particles must not deposit/gather."""
    pos_np = _cloud(900, 4)
    st = psim.ParticleState.from_arrays(
        pos_np, np.zeros_like(pos_np), np.zeros_like(pos_np), capacity=2048)
    # poison the padding region with in-box garbage positions
    poison = jnp.asarray(
        np.tile(np.float32([[1.0], [2.0], [3.0]]), (1, 2048 - 900)))
    flat = st.pos.reshape(3, -1).at[:, 900:].set(poison)
    _compare(flat, st.n_active)


def test_parity_out_of_box_clamped():
    """Positions outside the box clamp to the boundary, same as the ref."""
    pos_np = _cloud(800, 5, radius=90.0)  # spills past the [-64,64) box
    pos, n_act, _ = _planes(pos_np)
    _compare(pos, n_act)


def test_parity_grid_aligned_positions():
    """Exact cell-corner positions (f == 0) hit one-hot edge cases."""
    g = np.stack(np.meshgrid(*([np.arange(-48, 48, 12, dtype=np.float32)] * 3),
                             indexing="ij"), axis=-1).reshape(-1, 3)
    pos, n_act, _ = _planes(g)
    _compare(pos, n_act)


def test_step_pm_matches_ref_step():
    n = 1024
    pos_np = _cloud(n, 6)
    st = psim.ParticleState.from_arrays(
        pos_np, np.zeros_like(pos_np), np.zeros_like(pos_np))
    pv = jnp.asarray(psim.SimParams(delta_time=0.016, gravity=0.5).pack())
    pp = jnp.asarray(psim.PairwiseParams(1.0, CFG.softening).pack())
    p_f, v_f = pm_pallas.step_pm(st.pos, st.vel, pv, pp, st.n_active, CFG,
                                 interpret=True)
    p_r, v_r = pm.step_pm_ref(st.pos, st.vel, pv, pp, st.n_active, CFG)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), atol=5e-2)


def test_rejects_unsupported_grid():
    pos = jnp.zeros((3, 512))
    with pytest.raises(ValueError, match="grid"):
        pm_pallas.pm_accel(pos, jnp.asarray(1), 1.0,
                           PMConfig(grid=48), interpret=True)


@pytest.mark.parametrize(
    "grid", [32, 64, pytest.param(256, marks=pytest.mark.slow)])
def test_parity_other_grids(grid):
    """The generalized lane/row geometry (pm_pallas._geom) at every
    non-default supported grid, vs the same-grid jnp reference."""
    cfg = PMConfig(softening=4.0, gradient="exact", boundary="isolated",
                   grid=grid)
    pos, n_act, _ = _planes(_cloud(1500, 8))
    a_fast = np.asarray(pm_pallas.pm_accel(
        pos, n_act, 1.0, cfg, interpret=True))
    a_ref = np.asarray(pm.pm_accel_ref(
        pos, n_act, 1.0, cfg.softening, cfg))
    n = int(n_act)
    scale = np.abs(a_ref[:, :n]).max() + 1e-12
    np.testing.assert_allclose(a_fast[:, :n], a_ref[:, :n],
                               atol=0.02 * scale)
    assert np.all(a_fast[:, n:] == 0.0)


def test_parity_grid64_masses_auto_box():
    """Non-default grid composed with per-particle masses + auto_box."""
    cfg = PMConfig(softening=4.0, gradient="exact", boundary="isolated",
                   grid=64, auto_box=True)
    pos, n_act, n = _planes(_cloud(1200, 9, radius=70.0))
    rng = np.random.default_rng(10)
    masses = jnp.asarray(
        np.where(np.arange(pos.shape[1]) < n,
                 rng.random(pos.shape[1]).astype(np.float32) + 0.5, 1.0))
    a_fast = np.asarray(pm_pallas.pm_accel(
        pos, n_act, 1.0, cfg, masses=masses, interpret=True))
    a_ref = np.asarray(pm.pm_accel_ref(
        pos, n_act, 1.0, cfg.softening, cfg, masses=masses))
    scale = np.abs(a_ref[:, :n]).max() + 1e-12
    np.testing.assert_allclose(a_fast[:, :n], a_ref[:, :n],
                               atol=0.02 * scale)


@pytest.mark.slow
def test_parity_chunk_1024():
    """Large-N kernel block size (pick_chunk escalates past 512 to keep
    the packed pair table inside SMEM) — same results at any chunk."""
    pos_np = _cloud(3000, 7)
    st = psim.ParticleState.from_arrays(
        pos_np, np.zeros_like(pos_np), np.zeros_like(pos_np), capacity=4096)
    flat = st.pos.reshape(3, -1)
    key_s, idx_s, frac_s, _ = pm_pallas.pm_sort(flat, st.n_active, CFG)
    rho_512 = pm_pallas.pm_deposit_sorted(key_s, frac_s, interpret=True,
                                          chunk=512)
    rho_1024 = pm_pallas.pm_deposit_sorted(key_s, frac_s, interpret=True,
                                           chunk=1024)
    np.testing.assert_allclose(np.asarray(rho_512), np.asarray(rho_1024),
                               atol=1e-4)
    grids = pm.solve_accel(rho_512, CFG, CFG.softening)
    a_512 = pm_pallas.pm_gather_sorted(grids, key_s, frac_s, idx_s,
                                       interpret=True, chunk=512)
    a_1024 = pm_pallas.pm_gather_sorted(grids, key_s, frac_s, idx_s,
                                        interpret=True, chunk=1024)
    np.testing.assert_allclose(np.asarray(a_512), np.asarray(a_1024),
                               atol=1e-4)


def test_pick_chunk_smem_budget():
    for n_pad in (1024, 1000448, 16_000_000, 64_000_000):
        c = pm_pallas.pick_chunk(n_pad)
        assert n_pad % c == 0
    assert pm_pallas.pick_chunk(1000448) == 512
    assert pm_pallas.pick_chunk(16_000_000) == 1024


@pytest.mark.parametrize("case", ["one_cell", "tile_edges", "two_clumps",
                                  "uniform_rows"])
def test_parity_adversarial_distributions(case):
    """Stress the static pair-table bounds: if c_max under-covers, pairs
    are silently dropped and the deposit/gather go wrong."""
    g = CFG.grid
    h = CFG.box_size / g
    if case == "one_cell":
        # every particle in a single cell: maximal per-tile chunk count
        pos_np = np.full((2048, 3), 3.14, np.float32)
    elif case == "tile_edges":
        # rows exactly at tile boundaries (t*T_ROWS), maximal lookback
        t_rows = pm_pallas.T_ROWS
        zs = (np.arange(2048) % 16) * (t_rows // g + 1)  # z hits row mults
        ys = (np.arange(2048) * 7) % g
        pos_np = np.stack([
            np.zeros(2048), ys * h + CFG.box_min[1],
            zs * h + CFG.box_min[2]], axis=1).astype(np.float32)
    elif case == "two_clumps":
        pos_np = np.concatenate([
            np.full((1024, 3), -50.0, np.float32),
            np.full((1024, 3), 50.0, np.float32)])
    else:  # uniform_rows: one particle per cell row-major (max tile span)
        idx = np.arange(2048) * (g * g * g // 2048)
        x = idx % g
        y = (idx // g) % g
        z = idx // (g * g)
        pos_np = (np.stack([x, y, z], 1) * h
                  + np.asarray(CFG.box_min) + 0.3).astype(np.float32)
    # snap to the 10-bit frac lattice so the jnp reference sees the same
    # effective positions as the quantizing fast path: any remaining
    # mismatch is a pair-table / kernel bug, not quantization
    ch = np.clip((pos_np - np.asarray(CFG.box_min)) / h, 0.0,
                 g - 1 - 1e-3)
    i0 = np.floor(ch)
    fq = np.round((ch - i0) * 1023.0) / 1023.0
    pos_np = ((i0 + fq) * h + np.asarray(CFG.box_min)).astype(np.float32)
    pos, n_act, _ = _planes(pos_np)
    if case == "one_cell":
        # degenerate for a relative comparison: the exact net force is ~0
        # (perfect cancellation), which bf16 acceleration tiles cannot
        # reproduce below ~0.4% of the LOCAL field. Check mass exactness
        # and that the residual stays at bf16 scale.
        key_s, idx_s, frac_s, _ = pm_pallas.pm_sort(pos, n_act, CFG)
        rho = pm_pallas.pm_deposit_sorted(key_s, frac_s, interpret=True)
        # identical fracs for every particle -> the bf16 weight rounding
        # all biases the same way (no averaging): mass exact to ~0.5%
        assert float(rho.sum()) == pytest.approx(int(n_act), rel=5e-3)
        grids = pm.solve_accel(rho, CFG, CFG.softening)
        a = np.asarray(pm_pallas.pm_gather_sorted(
            grids, key_s, frac_s, idx_s, interpret=True))
        bound = 0.01 * float(jnp.abs(grids).max())
        assert np.abs(a).max() < bound
        return
    _compare(pos, n_act, rtol=0.03)


def test_fast_path_momentum_isotropic():
    """Momentum drift must be axis-isotropic float noise: the lane (x)
    one-hot once used f32 weights against the deposit's bf16, producing a
    systematic x-only momentum pump (caught live by examples/collapse.py
    diagnostics)."""
    pos_np = _cloud(4096, 9, radius=30.0)
    st = psim.ParticleState.from_arrays(
        pos_np, np.zeros_like(pos_np), np.zeros_like(pos_np))
    flat = st.pos.reshape(3, -1)
    acc = np.asarray(pm_pallas.pm_accel(flat, st.n_active, 1.0, CFG,
                                        interpret=True))
    net = np.abs(acc.sum(axis=1))
    typical = np.linalg.norm(acc, axis=0).mean() * int(st.n_active)
    assert (net < 2e-3 * typical).all(), f"net force {net} vs {typical}"
    # no axis more than ~5x the others (isotropy of the residual noise)
    assert net.max() < 5.0 * max(net.min(), 1e-7 * typical)


def test_parity_periodic_with_strays():
    """Periodic fast path: out-of-box strays wrap; interior parity with
    the reference holds (the fast path's only deviation is the one-cell
    seam band at the box edge, excluded here)."""
    cfg = PMConfig(softening=4.0, boundary="periodic")
    pos_np = np.concatenate([
        _cloud(1200, 13, radius=30.0),
        _cloud(300, 14, radius=10.0, offset=(80.0, 0.0, -75.0)),  # strays
    ])
    st = psim.ParticleState.from_arrays(
        pos_np, np.zeros_like(pos_np), np.zeros_like(pos_np))
    flat = st.pos.reshape(3, -1)
    a_fast = np.asarray(pm_pallas.pm_accel(flat, st.n_active, 1.0, cfg,
                                           interpret=True))
    a_ref = np.asarray(pm.pm_accel_ref(flat, st.n_active, 1.0,
                                       cfg.softening, cfg))
    n = int(st.n_active)
    # exclude particles whose wrapped coords fall in the seam band
    c = np.asarray(pm.cell_coords(jnp.asarray(flat), cfg))[:, :n]
    interior = (c < cfg.grid - 1.0).all(axis=0)
    assert interior.sum() > n * 0.9
    scale = np.abs(a_ref[:, :n]).max() + 1e-12
    np.testing.assert_allclose(a_fast[:, :n][:, interior],
                               a_ref[:, :n][:, interior],
                               atol=0.03 * scale)


def test_unsort_pack_propagates_nonfinite():
    """A solver blowup must come OUT of the packed un-sort as non-finite
    (the reserved shared-exponent value decodes to an infinite scale),
    poisoning exactly the affected particles — not as plausible finite
    garbage, and without corrupting any OTHER particle's slot."""
    pos_np = _cloud(2000, 11)
    pos, n_act, n = _planes(pos_np)
    key_s, idx_s, frac_s, _ = pm_pallas.pm_sort(pos, n_act, CFG)
    rho = pm_pallas.pm_deposit_sorted(key_s, frac_s, interpret=True)
    grids = pm.solve_accel(rho, CFG, CFG.softening)
    a_clean = np.asarray(pm_pallas.pm_gather_sorted(
        grids, key_s, frac_s, idx_s, interpret=True))
    # blow up the x-gradient grid everywhere a particle deposits: every
    # live particle's gathered ax is NaN, y/z stay finite pre-pack
    grids_bad = grids.at[0].set(jnp.nan)
    a_bad = np.asarray(pm_pallas.pm_gather_sorted(
        grids_bad, key_s, frac_s, idx_s, interpret=True))
    assert not np.isfinite(a_bad[:, :n]).all()
    # every live particle is poisoned (shared exponent covers all 3)
    assert (~np.isfinite(a_bad[:, :n])).any(axis=0).all()
    # the clean decode is untouched by the reserved-exponent change
    assert np.isfinite(a_clean[:, :n]).all()
