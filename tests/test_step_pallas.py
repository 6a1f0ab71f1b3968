"""Pallas fused kernel vs the jnp oracle (the reference's dual-backend
cross-check made explicit — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import SimParams
from particle_sim_tpu.core.state import ParticleState
from particle_sim_tpu.ops import step_jnp, step_pallas

INTERPRET = jax.default_backend() != "tpu"  # compiled on TPU, interpreted on CPU


def random_state(n, seed=0):
    pos, _, col = G.generate(n)
    rng = np.random.default_rng(seed)
    vel = rng.normal(size=pos.shape).astype(np.float32) * 3.0
    return ParticleState.from_arrays(pos, vel, col)


PARAMS = [
    SimParams(),
    SimParams(gravity=2.0),
    SimParams(is_mouse_dragging=True, mouse_position=(3.0, -7.0, 20.0),
              mouse_force=80.0, mouse_radius=30.0, gravity=0.7),
]


@pytest.mark.parametrize("params", PARAMS)
@pytest.mark.parametrize("n", [100, 5000])
def test_kernel_matches_oracle(params, n):
    state = random_state(n)
    pv = jnp.asarray(params.pack())
    ep, ev = step_jnp.step(state.pos, state.vel, pv)
    gp, gv = step_pallas.step(state.pos, state.vel, pv, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), rtol=1e-6, atol=1e-6)


def test_ragged_tiles():
    # rows=24 with tile_rows=16 -> ragged final block must still be exact.
    state = random_state(24 * 128)
    assert state.rows == 24
    pv = jnp.asarray(PARAMS[2].pack())
    ep, ev = step_jnp.step(state.pos, state.vel, pv)
    gp, gv = step_pallas.step(state.pos, state.vel, pv, tile_rows=16,
                              interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), rtol=1e-6, atol=1e-6)


def test_substeps_equal_repeated_single_steps():
    state = random_state(2000)
    pv = jnp.asarray(PARAMS[2].pack())
    ep, ev = state.pos, state.vel
    for _ in range(5):
        ep, ev = step_jnp.step(ep, ev, pv)
    gp, gv = step_pallas.step(state.pos, state.vel, pv, substeps=5,
                              interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), rtol=1e-5, atol=1e-5)


def test_step_n_jit_composition():
    state = random_state(1500, seed=3)
    pv = jnp.asarray(SimParams(gravity=1.0).pack())
    ep, ev = step_jnp.step_n_jit(jnp.array(state.pos), jnp.array(state.vel), pv, 6)
    gp, gv = step_pallas.step_n_jit(state.pos, state.vel, pv, 3, substeps=2,
                                    interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), rtol=1e-5, atol=1e-5)
