"""jnp reference stepper vs the independent NumPy oracle and analytics."""

import numpy as np
import pytest

import jax.numpy as jnp

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import ColorMode, SimParams
from particle_sim_tpu.core.state import ParticleState
from particle_sim_tpu.ops import step_jnp

from reference_oracle import reference_color, reference_step


def make_state(n=400, mode="hollow"):
    pos, vel, col = G.generate(n)
    return ParticleState.from_arrays(pos, vel, col), pos, vel, col


def run_package_step(state, params):
    pv = jnp.asarray(params.pack())
    pos, vel = step_jnp.step(state.pos, state.vel, pv)
    new = ParticleState(pos=pos, vel=vel, init_color=state.init_color,
                        n_active=state.n_active)
    return new


@pytest.mark.parametrize("dragging", [False, True])
@pytest.mark.parametrize("gravity", [0.0, 2.5])
def test_step_matches_reference_math(dragging, gravity):
    state, pos, vel, _ = make_state(300)
    rng = np.random.default_rng(0)
    vel = rng.normal(size=vel.shape).astype(np.float32) * 2.0
    state = ParticleState.from_arrays(pos, vel, np.zeros_like(pos))

    params = SimParams(
        delta_time=0.016, gravity=gravity, mouse_force=30.0,
        mouse_radius=25.0, is_mouse_dragging=dragging,
        mouse_position=(5.0, -3.0, 40.0),
    )
    new = run_package_step(state, params)

    exp_pos, exp_vel = reference_step(
        pos, vel, dt=params.delta_time, gravity=params.gravity,
        mouse_force=params.mouse_force, mouse_radius=params.mouse_radius,
        damping=params.damping, mouse_position=params.mouse_position,
        dragging=dragging,
    )
    np.testing.assert_allclose(new.positions(), exp_pos, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(new.velocities(), exp_vel, rtol=2e-5, atol=2e-5)


def test_multi_step_trajectory():
    state, pos, vel, _ = make_state(64)
    params = SimParams(gravity=1.0, is_mouse_dragging=True,
                       mouse_position=(0.0, 0.0, 48.0), mouse_force=50.0)
    exp_pos, exp_vel = pos, vel
    for _ in range(25):
        state = run_package_step(state, params)
        exp_pos, exp_vel = reference_step(
            exp_pos, exp_vel, dt=params.delta_time, gravity=params.gravity,
            mouse_force=params.mouse_force, mouse_radius=params.mouse_radius,
            damping=params.damping, mouse_position=params.mouse_position,
            dragging=True,
        )
    np.testing.assert_allclose(state.positions(), exp_pos, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(state.velocities(), exp_vel, rtol=1e-4, atol=1e-3)


def test_integration_order_position_before_damping():
    # Analytic single particle: v1 = v0 - g*dt; p1 = p0 + v1*dt; v1 *= 0.99
    # (compute.wgsl:69-72 — the order is load-bearing).
    p0, v0, g, dt = 10.0, 3.0, 2.0, 0.016
    state = ParticleState.from_arrays(
        np.array([[0, p0, 0]], np.float32),
        np.array([[0, v0, 0]], np.float32),
        np.zeros((1, 3), np.float32),
    )
    new = run_package_step(state, SimParams(gravity=g))
    v1 = v0 - g * dt
    assert new.positions()[0, 1] == pytest.approx(p0 + v1 * dt, rel=1e-6)
    assert new.velocities()[0, 1] == pytest.approx(v1 * 0.99, rel=1e-6)


def test_attractor_cutoff_and_falloff():
    # Particle exactly at distance 2r gets no force; just inside gets
    # f = (1 - d/2r)^2 * 2 * F (cpu.rs:79-83).
    r, F, dt = 10.0, 5.0, 0.016
    pos = np.array([[2 * r, 0, 0], [r, 0, 0], [0.5, 0, 0]], np.float32)
    vel = np.zeros_like(pos)
    state = ParticleState.from_arrays(pos, vel, np.zeros_like(pos))
    params = SimParams(is_mouse_dragging=True, mouse_position=(0, 0, 0),
                       mouse_radius=r, mouse_force=F, gravity=0.0)
    new = run_package_step(state, params)
    v = new.velocities()
    assert v[0, 0] == 0.0                                 # at cutoff: no force
    expect_mid = -(1 - 0.5) ** 2 * 2 * F * dt * 0.99      # toward origin, damped
    assert v[1, 0] == pytest.approx(expect_mid, rel=1e-5)
    assert v[2, 0] < 0                                    # pulled inward


def test_mouse_on_particle_is_finite():
    # Reference NaNs here (dir.normalize() of zero vector); we define force=0.
    pos = np.array([[1.0, 2.0, 3.0]], np.float32)
    state = ParticleState.from_arrays(pos, np.zeros_like(pos), np.zeros_like(pos))
    params = SimParams(is_mouse_dragging=True, mouse_position=(1.0, 2.0, 3.0))
    new = run_package_step(state, params)
    assert np.isfinite(new.positions()).all()
    assert np.isfinite(new.velocities()).all()


@pytest.mark.parametrize("mode", [ColorMode.ORIGINAL, ColorMode.VELOCITY,
                                  ColorMode.POSITION])
def test_color_modes(mode):
    n = 200
    pos, _, col = G.generate(n)
    rng = np.random.default_rng(1)
    vel = rng.normal(size=(n, 3)).astype(np.float32) * 4.0
    state = ParticleState.from_arrays(pos, vel, col)
    params = SimParams(color_mode=int(mode), max_dist_for_color=50.0)
    rgb = step_jnp.colors_jit(state.pos, state.vel, state.init_color,
                              jnp.asarray(params.pack()))
    got = np.asarray(rgb.reshape(3, -1)[:, :n]).T
    exp = reference_color(pos, vel, col, color_mode=int(mode), max_dist=50.0)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_step_n_jit_equals_repeated_steps():
    state, pos, vel, col = make_state(128)
    pv = jnp.asarray(SimParams(gravity=1.5).pack())
    p1, v1 = state.pos, state.vel
    for _ in range(10):
        p1, v1 = step_jnp.step(p1, v1, pv)
    p2, v2 = step_jnp.step_n_jit(state.pos, state.vel, pv, 10)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_state_roundtrip_and_padding():
    n = 333  # not a multiple of 128 — exercises padding
    pos, vel, col = G.generate(n)
    state = ParticleState.from_arrays(pos, vel, col)
    assert state.capacity % 1024 == 0 and state.capacity >= n
    np.testing.assert_array_equal(state.positions(), pos)
    np.testing.assert_array_equal(state.init_colors_rgba()[:, :3], col)
    assert (state.init_colors_rgba()[:, 3] == 1.0).all()
    assert int(np.asarray(state.active_mask_flat()).sum()) == n
