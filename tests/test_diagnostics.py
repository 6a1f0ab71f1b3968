"""Physics diagnostics: values, conservation anchors, engine/CLI wiring."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import particle_sim_tpu as psim
from particle_sim_tpu.core.params import Method, PairwiseParams, PMConfig
from particle_sim_tpu.engine import Engine
from particle_sim_tpu.ops import diagnostics as diag


def _state(n=512, seed=0, v_scale=0.0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x *= (30.0 * rng.random(n).astype(np.float32) ** (1 / 3))[:, None]
    v = (v_scale * rng.normal(size=(n, 3))).astype(np.float32)
    return psim.ParticleState.from_arrays(x, v, np.zeros_like(x)), x, v


def test_kinetic_momentum_values():
    st, x, v = _state(300, seed=1, v_scale=2.0)
    d = diag.measure(st.pos, st.vel, st.n_active)
    assert d.kinetic == pytest.approx(0.5 * (v ** 2).sum(), rel=1e-4)
    np.testing.assert_allclose(d.momentum, v.sum(0), rtol=1e-3, atol=1e-3)
    assert d.mean_radius == pytest.approx(
        np.linalg.norm(x, axis=1).mean(), rel=1e-4)
    assert d.max_speed == pytest.approx(
        np.linalg.norm(v, axis=1).max(), rel=1e-4)
    assert d.potential is None


def test_direct_potential_two_body():
    eps, dist, g = 2.0, 10.0, 3.0
    x = np.array([[0, 0, 0], [dist, 0, 0]], np.float32)
    st = psim.ParticleState.from_arrays(x, np.zeros_like(x),
                                        np.zeros_like(x))
    d = diag.measure(st.pos, st.vel, st.n_active, g_const=g,
                     softening=eps, potential=True)
    expected = -g / np.sqrt(dist * dist + eps * eps)
    assert d.potential == pytest.approx(expected, rel=1e-5)


def test_padding_excluded():
    st, x, v = _state(100, seed=2, v_scale=1.0)
    # capacity 1024 >> 100: padding must not contribute
    st2 = psim.ParticleState.from_arrays(x, v, np.zeros_like(x),
                                         capacity=2048)
    d1 = diag.measure(st.pos, st.vel, st.n_active, g_const=1.0,
                      potential=True)
    d2 = diag.measure(st2.pos, st2.vel, st2.n_active, g_const=1.0,
                      potential=True)
    assert d1.kinetic == pytest.approx(d2.kinetic, rel=1e-5)
    assert d1.potential == pytest.approx(d2.potential, rel=1e-4)


def test_energy_bounded_in_undamped_orbit():
    """Self-gravitating cloud, damping=1, small dt: semi-implicit Euler
    keeps total energy bounded (a few % over 80 steps) and momentum ~0."""
    e = Engine(particle_count=1024, method=Method.JNP,
               generation_mode=psim.SphereGeneration.FILLED,
               pairwise=PairwiseParams(0.5, 3.0))
    params = psim.SimParams(delta_time=0.005, damping=1.0)
    d0 = e.diagnostics(potential=True)
    e0 = d0.kinetic + d0.potential
    for _ in range(80):
        e.step(params)
    d1 = e.diagnostics(potential=True)
    e1 = d1.kinetic + d1.potential
    assert abs(e1 - e0) < 0.05 * abs(e0), (e0, e1)
    assert np.abs(d1.momentum).max() < 1e-2 * np.sqrt(2 * d1.kinetic)


def test_pm_potential_estimate_tracks_direct():
    """Mesh potential (large-N path) within ~10% of the exact sum."""
    st, x, v = _state(2048, seed=3)
    cfg = PMConfig(softening=5.0)
    flat = st.pos.reshape(3, -1)
    exact = float(diag._potential_direct_jit(
        flat, st.n_active, 1.0, cfg.softening))
    mesh = float(diag._potential_pm(flat, st.n_active, 1.0, cfg))
    assert mesh == pytest.approx(exact, rel=0.1), (exact, mesh)


def test_cli_diagnostics_line(capsys):
    from particle_sim_tpu.app import cli

    rc = cli.main(["--count", "1500", "--steps", "4", "--method", "jnp",
                   "--pairwise", "--pairwise-g", "0.5",
                   "--pairwise-softening", "3.0",
                   "--stats-every", "2", "--diagnostics"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    stat = next(l for l in lines if l.get("step") == 2)
    assert "kinetic" in stat and stat["total_energy"] is not None


def test_auto_box_potential_uses_traced_box():
    """Potential diagnostics honor auto_box: a small off-center cloud gets
    the same answer as the direct sum with the equivalent physical eps."""
    rng = np.random.default_rng(4)
    n = 2000
    x = (rng.normal(size=(n, 3)) * 4.0 + np.float32([30, -10, 25])
         ).astype(np.float32)
    st = psim.ParticleState.from_arrays(x, np.zeros_like(x),
                                        np.zeros_like(x))
    flat = st.pos.reshape(3, -1)
    cfg = PMConfig(softening=6.0, auto_box=True)
    from particle_sim_tpu.ops import pm

    _, cell = pm.auto_box(flat, st.n_active, cfg.grid)
    eps_phys = cfg.softening * float(cell)
    exact = float(diag._potential_direct_jit(flat, st.n_active, 1.0,
                                             eps_phys))
    mesh = float(diag._potential_pm(flat, st.n_active, 1.0, cfg))
    assert mesh == pytest.approx(exact, rel=0.1), (exact, mesh)
