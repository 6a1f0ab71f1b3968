"""Generation distributions vs the reference's closed forms (mod.rs:145-192)."""

import numpy as np
import pytest

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import SPHERE_RADIUS, SphereGeneration


class TestHollow:
    def test_matches_reference_closed_form(self):
        # Independent scalar transcription of mod.rs:150-167.
        n = 1000
        pos = G.generate_hollow(n)
        golden = np.pi * (3.0 - np.sqrt(5.0))
        for i in [0, 1, 17, 499, 999]:
            y = 1.0 - (i / (n - 1)) * 2.0
            r_y = np.sqrt(1.0 - y * y)
            theta = golden * i
            expect = 50.0 * np.array(
                [np.cos(theta) * r_y, y, np.sin(theta) * r_y]
            )
            np.testing.assert_allclose(pos[i], expect, rtol=1e-5, atol=1e-4)

    def test_on_sphere_surface(self):
        pos = G.generate_hollow(5000)
        radii = np.linalg.norm(pos, axis=1)
        np.testing.assert_allclose(radii, SPHERE_RADIUS, rtol=1e-5)

    def test_poles(self):
        pos = G.generate_hollow(100)
        # i=0: y=1 -> north pole; i=n-1: y=-1 -> south pole (mod.rs:153)
        np.testing.assert_allclose(pos[0], [0, 50, 0], atol=1e-4)
        np.testing.assert_allclose(pos[-1], [0, -50, 0], atol=1e-3)

    def test_count_one_no_nan(self):
        # The reference divides by (count-1)=0 here (mod.rs:153); we guard.
        pos = G.generate_hollow(1)
        assert np.isfinite(pos).all()

    def test_empty(self):
        assert G.generate_hollow(0).shape == (0, 3)


class TestFilled:
    def test_inside_sphere(self):
        pos = G.generate_filled(10000)
        radii = np.linalg.norm(pos, axis=1)
        assert (radii <= SPHERE_RADIUS + 1e-3).all()

    def test_uniform_in_volume(self):
        # P(r < R/2) = (1/2)^3 = 0.125 for uniform-in-volume (mod.rs:173)
        pos = G.generate_filled(200_000)
        radii = np.linalg.norm(pos, axis=1)
        frac = (radii < SPHERE_RADIUS / 2).mean()
        assert abs(frac - 0.125) < 0.005
        # Mean position ~ 0 (isotropy)
        assert np.abs(pos.mean(axis=0)).max() < 0.5

    def test_fixed_seed_reproducible(self):
        # mod.rs:170: fixed seed => bit-identical across resets.
        a = G.generate_filled(5000)
        b = G.generate_filled(5000)
        np.testing.assert_array_equal(a, b)

    def test_different_seed_differs(self):
        a = G.generate_filled(100, seed=69)
        b = G.generate_filled(100, seed=70)
        assert not np.array_equal(a, b)


class TestColors:
    def test_initial_color_formula(self):
        # color = (pos/50 + 1)/2 (mod.rs:162-163)
        pos, vel, col = G.generate(1000, SphereGeneration.HOLLOW)
        np.testing.assert_allclose(
            col, (pos / SPHERE_RADIUS + 1.0) * 0.5, rtol=1e-6
        )
        assert (col >= 0).all() and (col <= 1).all()
        assert (vel == 0).all()

    def test_generate_dispatch(self):
        p_h, _, _ = G.generate(100, SphereGeneration.HOLLOW)
        p_f, _, _ = G.generate(100, SphereGeneration.FILLED)
        assert not np.allclose(p_h, p_f)
        with pytest.raises(ValueError):
            G.generate(10, "nonsense")  # type: ignore[arg-type]
