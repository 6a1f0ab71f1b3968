"""Headless rasterizer: projection correctness, blending, golden frame."""

import numpy as np
import pytest

import jax.numpy as jnp

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import ColorMode, SimParams
from particle_sim_tpu.core.state import ParticleState
from particle_sim_tpu.render import raster
from particle_sim_tpu.render.camera import Camera

W, H = 160, 120


def make_state(n=1000, mode=G.SphereGeneration.HOLLOW):
    pos, vel, col = G.generate(n, mode)
    return ParticleState.from_arrays(pos, vel, col)


def fb_for(state, params=None, cam=None, w=W, h=H):
    params = params or SimParams()
    cam = cam or Camera(aspect=w / h)
    return np.asarray(raster.render(
        state.pos, state.vel, state.init_color, jnp.asarray(params.pack()),
        jnp.asarray(cam.view_proj()), state.n_active, width=w, height=h,
    ))


class TestProjection:
    def test_single_particle_center_pixel(self):
        pos = np.array([[0.0, 0.0, 0.0]], np.float32)
        state = ParticleState.from_arrays(
            pos, np.zeros_like(pos) + np.array([[3.0, 0, 0]], np.float32),
            np.ones((1, 3), np.float32))
        fb = fb_for(state)
        ys, xs = np.nonzero(fb.sum(-1))
        assert list(zip(ys, xs)) == [(H // 2, W // 2)]

    def test_behind_camera_culled(self):
        pos = np.array([[0.0, 0.0, 200.0]], np.float32)  # behind (cam at z=100)
        vel = np.full((1, 3), 5.0, np.float32)
        state = ParticleState.from_arrays(pos, vel, np.ones((1, 3), np.float32))
        assert fb_for(state).sum() == 0.0

    def test_brightness_is_velocity_scaled(self):
        # |v|=0.25 -> brightness 0.5 (particle.wgsl:41-42: min(2|v|,1))
        pos = np.array([[0.0, 0.0, 0.0]], np.float32)
        vel = np.array([[0.25, 0.0, 0.0]], np.float32)
        state = ParticleState.from_arrays(pos, vel, np.ones((1, 3), np.float32))
        fb = fb_for(state)
        assert fb[H // 2, W // 2] == pytest.approx([0.5] * 3, abs=1e-6)

    def test_padding_not_rendered(self):
        # padded slots sit at (0,0,0) which projects on-screen: must not glow
        pos = np.array([[20.0, 0.0, 0.0]], np.float32)
        vel = np.full((1, 3), 5.0, np.float32)
        state = ParticleState.from_arrays(pos, vel, np.ones((1, 3), np.float32))
        fb = fb_for(state)
        assert fb[H // 2, W // 2].sum() == 0.0  # origin pixel dark
        assert fb.sum() > 0                      # the real particle rendered

    def test_additive_blend_clamps(self):
        # two coincident particles: contributions add then clamp to 1
        pos = np.zeros((2, 3), np.float32)
        vel = np.full((2, 3), 5.0, np.float32)
        col = np.full((2, 3), 0.4, np.float32)
        state = ParticleState.from_arrays(pos, vel, col)
        fb = fb_for(state)
        assert fb[H // 2, W // 2] == pytest.approx([0.8] * 3, abs=1e-5)


class TestColorModes:
    def test_position_mode_colors(self):
        state = make_state(2000)
        fb0 = fb_for(state, SimParams(color_mode=int(ColorMode.ORIGINAL)))
        fb2 = fb_for(state, SimParams(color_mode=int(ColorMode.POSITION)))
        assert fb0.sum() == 0.0  # velocity 0 -> brightness 0 everywhere
        assert fb2.sum() == 0.0
        # give them speed: both modes now differ
        v = np.full((2000, 3), 2.0, np.float32)
        pos, _, col = G.generate(2000)
        state = ParticleState.from_arrays(pos, v, col)
        fb0 = fb_for(state, SimParams(color_mode=int(ColorMode.ORIGINAL)))
        fb2 = fb_for(state, SimParams(color_mode=int(ColorMode.POSITION)))
        assert fb0.sum() > 0 and fb2.sum() > 0
        assert not np.allclose(fb0, fb2)


class TestGoldenFrame:
    def test_fixed_scene_reproducible(self):
        # Filled sphere is seed-fixed (mod.rs:170) -> frame is deterministic.
        pos, _, col = G.generate(5000, G.SphereGeneration.FILLED)
        vel = np.tile(np.array([[0.0, 0.5, 0.0]], np.float32), (5000, 1))
        state = ParticleState.from_arrays(pos, vel, col)
        fb1 = fb_for(state, SimParams(color_mode=2))
        fb2 = fb_for(state, SimParams(color_mode=2))
        np.testing.assert_array_equal(fb1, fb2)
        assert 0.001 < fb1.mean() < 0.9  # scene visible, not washed out

    def test_rgba8_roundtrip(self):
        state = make_state(500)
        fb = raster.render(
            state.pos, state.vel, state.init_color,
            jnp.asarray(SimParams().pack()),
            jnp.asarray(Camera(aspect=W / H).view_proj()),
            state.n_active, width=W, height=H)
        img = np.asarray(raster.to_rgba8(fb))
        assert img.shape == (H, W, 4) and img.dtype == np.uint8
        assert (img[..., 3] == 255).all()


def test_png_writer(tmp_path):
    from particle_sim_tpu.utils.png import write_png
    img = (np.random.default_rng(0).random((10, 12, 3)) * 255).astype(np.uint8)
    path = tmp_path / "t.png"
    write_png(str(path), img)
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data
