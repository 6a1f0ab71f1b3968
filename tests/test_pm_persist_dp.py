"""Multi-chip persistent-sorted PM on the virtual 8-device mesh: the
sharded step (per-shard local sorts + one grid psum) must match the
single-device persistent step in identity order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particle_sim_tpu as psim
from particle_sim_tpu.core.params import PairwiseParams, PMConfig
from particle_sim_tpu.ops import pm_persist
from particle_sim_tpu.parallel import mesh as mesh_lib, pm_persist_dp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device (virtual) platform"
)

CFG = PMConfig(softening=4.0, gradient="exact", boundary="isolated")


def _inputs(n_dev, per_shard=1024, seed=0):
    n = n_dev * per_shard
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    r = 40.0 * rng.random(n).astype(np.float32) ** (1 / 3)
    pos = jnp.asarray((x * r[:, None]).T.copy())            # (3, N)
    vel = jnp.asarray(rng.normal(
        scale=0.5, size=(3, n)).astype(np.float32))
    return pos, vel, jnp.int32(n)


def _identity_order(ids, arr):
    """arr (..., N) from slot order to identity order."""
    out = np.zeros_like(arr)
    out[..., np.asarray(ids)] = arr
    return out


@pytest.mark.slow
def test_sharded_persist_matches_single_device():
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size
    pos, vel, n_active = _inputs(n_dev)
    pv = jnp.asarray(psim.SimParams(delta_time=0.016).pack())
    pp = jnp.asarray(PairwiseParams(1.0, CFG.softening).pack())

    init = pm_persist_dp.make_persist_init(mesh, CFG)
    sp, sv, ids, resorts, fine_b = init(pos, vel, n_active)
    # per-shard local sorts: ids stay on their home shard
    local_n = pos.shape[1] // n_dev
    ids_np = np.asarray(ids)
    assert np.array_equal(ids_np // local_n,
                          np.repeat(np.arange(n_dev), local_n))
    assert np.asarray(fine_b).tolist() == [local_n] * n_dev

    step = pm_persist_dp.make_persist_pm_step(mesh, CFG, interpret=True)
    sp2, sv2, ids2, resorts2, _ = step(sp, sv, ids, resorts, fine_b,
                                       pv, pp, n_active)
    assert np.asarray(resorts2).sum() == 0  # fresh sort: no repair

    st = pm_persist.init_sorted(pos, n_active, CFG, vel_flat=vel)
    st1 = pm_persist.step_sorted(st, pv, pp, n_active, CFG, interpret=True)

    p_dp = _identity_order(ids2, np.asarray(sp2))
    v_dp = _identity_order(ids2, np.asarray(sv2))
    p_1 = _identity_order(np.asarray(st1.ids), np.asarray(st1.pos))
    v_1 = _identity_order(np.asarray(st1.ids), np.asarray(st1.vel))
    # the psum'd deposit + per-shard chunking reorder f32 accumulation
    # and can flip bf16 grid roundings vs the single-device pass
    scale = np.abs(v_1).max() + 1e-12
    np.testing.assert_allclose(p_dp, p_1, rtol=0, atol=1e-2)
    np.testing.assert_allclose(v_dp, v_1, rtol=0,
                               atol=max(0.02 * scale, 2e-3))


@pytest.mark.slow
def test_sharded_persist_multi_frame_finite():
    """A few frames end-to-end: state stays finite, identity stays a
    permutation, repairs (if any) stay per-shard counters."""
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size
    pos, vel, n_active = _inputs(n_dev, per_shard=512, seed=1)
    pv = jnp.asarray(psim.SimParams(delta_time=0.016).pack())
    pp = jnp.asarray(PairwiseParams(1.0, CFG.softening).pack())

    init = pm_persist_dp.make_persist_init(mesh, CFG)
    carry = init(pos, vel, n_active)
    step = pm_persist_dp.make_persist_pm_step(mesh, CFG, interpret=True)
    for _ in range(3):
        carry = step(*carry, pv, pp, n_active)
    sp, sv, ids, resorts, _ = carry
    assert bool(jnp.isfinite(sp).all() & jnp.isfinite(sv).all())
    assert np.array_equal(np.sort(np.asarray(ids)),
                          np.arange(pos.shape[1]))
    assert np.asarray(resorts).shape == (n_dev,)


@pytest.mark.slow
def test_sharded_persist_with_masses():
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size
    pos, vel, n_active = _inputs(n_dev, per_shard=512, seed=2)
    n = pos.shape[1]
    masses = jnp.asarray(np.random.default_rng(3).uniform(
        0.5, 2.0, n).astype(np.float32))
    pv = jnp.asarray(psim.SimParams(delta_time=0.016).pack())
    pp = jnp.asarray(PairwiseParams(1.0, CFG.softening).pack())

    init = pm_persist_dp.make_persist_init(mesh, CFG, with_masses=True)
    sp, sv, ids, resorts, fine_b, sm = init(pos, vel, n_active, masses)
    np.testing.assert_array_equal(
        _identity_order(ids, np.asarray(sm)), np.asarray(masses))

    step = pm_persist_dp.make_persist_pm_step(mesh, CFG, interpret=True,
                                              with_masses=True)
    sp2, sv2, ids2, _, _, sm2 = step(sp, sv, ids, resorts, fine_b, pv, pp,
                                     n_active, sm)

    st = pm_persist.init_sorted(pos, n_active, CFG, vel_flat=vel,
                                masses=masses)
    st1 = pm_persist.step_sorted(st, pv, pp, n_active, CFG, interpret=True)
    v_dp = _identity_order(ids2, np.asarray(sv2))
    v_1 = _identity_order(np.asarray(st1.ids), np.asarray(st1.vel))
    scale = np.abs(v_1).max() + 1e-12
    np.testing.assert_allclose(v_dp, v_1, rtol=0,
                               atol=max(0.02 * scale, 2e-3))


@pytest.mark.slow
def test_sharded_persist_two_level():
    """cfg2 on the mesh: both levels sort-free per shard, fine grid
    psum'd, GLOBAL centroid window — matches the single-device
    two-level persistent step in identity order."""
    from particle_sim_tpu.ops import pm2

    cfg2 = pm2.PM2Config(window_min=None, window_size=32.0, softening=1.0)
    ker = pm2.fine_kernels(CFG, cfg2)
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size
    pos, vel, n_active = _inputs(n_dev, per_shard=512, seed=4)
    pv = jnp.asarray(psim.SimParams(delta_time=0.016).pack())
    pp = jnp.asarray(PairwiseParams(1.0, CFG.softening).pack())

    init = pm_persist_dp.make_persist_init(mesh, CFG)
    sp, sv, ids, resorts, fine_b = init(pos, vel, n_active)
    step = pm_persist_dp.make_persist_pm_step(mesh, CFG, interpret=True,
                                              cfg2=cfg2)
    sp2, sv2, ids2, resorts2, fb2 = step(sp, sv, ids, resorts, fine_b,
                                         pv, pp, n_active, ker)
    # first two-level frame migrates shards WITH window members into the
    # segmented order (one repair each); empty shards stay put
    assert 0 < np.asarray(resorts2).sum() <= n_dev

    st = pm_persist.init_sorted(pos, n_active, CFG, vel_flat=vel)
    st1 = pm_persist.step_sorted(st, pv, pp, n_active, CFG,
                                 interpret=True, cfg2=cfg2, kernels=ker)
    v_dp = _identity_order(ids2, np.asarray(sv2))
    v_1 = _identity_order(np.asarray(st1.ids), np.asarray(st1.vel))
    p_dp = _identity_order(ids2, np.asarray(sp2))
    p_1 = _identity_order(np.asarray(st1.ids), np.asarray(st1.pos))
    scale = np.abs(v_1).max() + 1e-12
    np.testing.assert_allclose(p_dp, p_1, rtol=0, atol=1e-2)
    np.testing.assert_allclose(v_dp, v_1, rtol=0,
                               atol=max(0.02 * scale, 2e-3))
