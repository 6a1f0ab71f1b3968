"""All-pairs force: oracle vs direct sum, Pallas kernel vs oracle, ring vs
single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import PairwiseParams, SimParams
from particle_sim_tpu.core.state import ParticleState
from particle_sim_tpu.ops import pairwise, pairwise_pallas
from particle_sim_tpu.parallel import mesh as mesh_lib, ring

INTERPRET = jax.default_backend() != "tpu"
GC, EPS = 2.5, 0.5


def direct_numpy_accel(pos_nx3, n_active):
    """Independent O(N^2) loop transcription of the documented formula."""
    n = pos_nx3.shape[0]
    acc = np.zeros((n, 3), dtype=np.float64)
    p = pos_nx3.astype(np.float64)
    for i in range(n):
        d = p[:n_active] - p[i]
        r2 = (d ** 2).sum(1) + EPS * EPS
        acc[i] = (GC * d / r2[:, None] ** 1.5).sum(0)
    return acc


def make_state(n, seed=0):
    pos, _, col = G.generate(n, G.SphereGeneration.FILLED)
    return ParticleState.from_arrays(pos, np.zeros_like(pos), col)


class TestOracle:
    def test_matches_direct_sum(self):
        state = make_state(300)
        n = int(state.n_active)
        flat = state.pos.reshape(3, -1)
        acc = pairwise.pairwise_accel(flat, state.n_active, GC, EPS)
        got = np.asarray(acc)[:, :n].T
        expect = direct_numpy_accel(state.positions(), n)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_momentum_conserved(self):
        # equal masses: sum of all internal forces is zero
        state = make_state(500)
        n = int(state.n_active)
        flat = state.pos.reshape(3, -1)
        acc = np.asarray(pairwise.pairwise_accel(flat, state.n_active, GC, EPS))
        total = np.abs(acc[:, :n].sum(axis=1))
        scale = np.abs(acc[:, :n]).sum()
        assert (total / max(scale, 1e-9) < 1e-5).all()

    def test_padding_masked(self):
        # forces must be identical whether capacity padding is 0 or garbage
        state = make_state(200)
        flat = np.asarray(state.pos.reshape(3, -1))
        n = int(state.n_active)
        poisoned = flat.copy()
        poisoned[:, n:] = 1e3
        a0 = np.asarray(pairwise.pairwise_accel(jnp.asarray(flat),
                                                state.n_active, GC, EPS))
        a1 = np.asarray(pairwise.pairwise_accel(jnp.asarray(poisoned),
                                                state.n_active, GC, EPS))
        np.testing.assert_array_equal(a0[:, :n], a1[:, :n])


class TestPallasKernel:
    @pytest.mark.parametrize("n", [1024, 4096])
    def test_matches_oracle(self, n):
        state = make_state(n)
        flat = state.pos.reshape(3, -1)
        expect = pairwise.pairwise_accel(flat, state.n_active, GC, EPS)
        got = pairwise_pallas.pairwise_accel(
            flat.T, flat, state.n_active, GC, EPS,
            tile_i=256, tile_j=256, interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect).T,
                                   rtol=2e-4, atol=1e-5)

    def test_ragged_and_masked(self):
        # 1500 active in 2048 capacity, tiles that don't divide evenly
        state = make_state(1500)
        flat = state.pos.reshape(3, -1)
        expect = pairwise.pairwise_accel(flat, state.n_active, GC, EPS)
        got = pairwise_pallas.pairwise_accel(
            flat.T, flat, state.n_active, GC, EPS,
            tile_i=256, tile_j=512, interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect).T,
                                   rtol=2e-4, atol=1e-5)

    def test_j_base_offset(self):
        # computing against the second half of sources with j_base must equal
        # the oracle restricted to those sources
        state = make_state(2048)
        flat = state.pos.reshape(3, -1)
        n = flat.shape[1]
        half = n // 2
        got = pairwise_pallas.pairwise_accel(
            flat.T, flat[:, half:], state.n_active, GC, EPS,
            j_base=half, tile_i=256, tile_j=256, interpret=INTERPRET)
        # oracle: full minus first half (both j_base-masked by n_active)
        full = pairwise.pairwise_accel(flat, state.n_active, GC, EPS)
        first = pairwise_pallas.pairwise_accel(
            flat.T, flat[:, :half], state.n_active, GC, EPS,
            j_base=0, tile_i=256, tile_j=256, interpret=INTERPRET)
        np.testing.assert_allclose(
            np.asarray(got) + np.asarray(first), np.asarray(full).T,
            rtol=2e-4, atol=1e-4)

    def test_mxu_variant_matches_loosely(self):
        # MXU path trades ~2% near-field accuracy for MXU offload (see
        # pairwise_pallas.py); verify it agrees to that documented tolerance.
        state = make_state(2048)
        flat = jnp.asarray(state.pos.reshape(3, -1))
        expect = np.asarray(
            pairwise.pairwise_accel(flat, state.n_active, GC, EPS))
        got = np.asarray(pairwise_pallas.pairwise_accel_mxu(
            flat, flat, state.n_active, GC, EPS,
            tile_i=256, tile_j=512, interpret=INTERPRET))
        n = int(state.n_active)
        rel = np.abs(got[:, :n] - expect[:, :n]) / (np.abs(expect[:, :n]) + 1e-2)
        assert rel.max() < 0.05

    def test_step_pairwise_matches_oracle_step(self):
        state = make_state(1024)
        pv = jnp.asarray(SimParams(gravity=0.3, is_mouse_dragging=True,
                                   mouse_position=(0, 0, 10),
                                   mouse_force=20.0).pack())
        pp = jnp.asarray(PairwiseParams(GC, EPS).pack())
        ep, ev = pairwise.step_pairwise(state.pos, state.vel, pv, pp,
                                        state.n_active)
        gp, gv = pairwise_pallas.step_pairwise(state.pos, state.vel, pv, pp,
                                               state.n_active,
                                               interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ep),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(ev),
                                   rtol=1e-4, atol=1e-5)


class TestTileSelection:
    def test_tiles_always_divide(self):
        # ragged j-blocks would feed uninitialized VMEM padding into the
        # force reduction on hardware (interpret mode hides it by
        # zero-filling) — tiles must divide the array exactly.
        from particle_sim_tpu.ops.pairwise_pallas import _dividing_tile
        for n in [1024, 5120, 65536, 1920, 128, 97, 3000]:
            for pref in [2048, 1024, 512, 256]:
                t = _dividing_tile(n, pref)
                assert n % t == 0 and 1 <= t <= max(pref, 1)
        assert _dividing_tile(5120, 2048) == 1024
        assert _dividing_tile(65536, 2048) == 2048


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestRing:
    def test_ring_matches_single_device(self):
        mesh = mesh_lib.make_mesh()
        state = make_state(8 * 1024)
        pv = jnp.asarray(SimParams(gravity=0.2).pack())
        pp = jnp.asarray(PairwiseParams(GC, EPS).pack())

        ep, ev = pairwise.step_pairwise(state.pos, state.vel, pv, pp,
                                        state.n_active)

        step = ring.make_ring_pairwise_step(mesh, interpret=INTERPRET,
                                            use_pallas=True)
        pos_sh, vel_sh = mesh_lib.shard_state_planes(mesh, state.pos, state.vel)
        gp, gv = step(pos_sh, vel_sh, pv, pp, state.n_active)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ep),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(ev),
                                   rtol=1e-4, atol=1e-4)

    def test_ring_masks_global_padding(self):
        # n_active smaller than one shard: most shards are pure padding
        mesh = mesh_lib.make_mesh()
        state = make_state(900)  # capacity 1024 -> one row per device
        assert state.capacity == 1024
        pv = jnp.asarray(SimParams().pack())
        pp = jnp.asarray(PairwiseParams(GC, EPS).pack())
        ep, ev = pairwise.step_pairwise(state.pos, state.vel, pv, pp,
                                        state.n_active)
        step = ring.make_ring_pairwise_step(mesh, interpret=INTERPRET)
        pos_sh, vel_sh = mesh_lib.shard_state_planes(mesh, state.pos, state.vel)
        gp, gv = step(pos_sh, vel_sh, pv, pp, state.n_active)
        n = int(state.n_active)
        got = np.asarray(gp).reshape(3, -1)[:, :n]
        exp = np.asarray(ep).reshape(3, -1)[:, :n]
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)
