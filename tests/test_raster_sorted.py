"""Sorted-deposit Pallas rasterizer vs the scatter oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import SimParams
from particle_sim_tpu.core.state import ParticleState
from particle_sim_tpu.render import raster, raster_sorted
from particle_sim_tpu.render.camera import Camera

INTERPRET = jax.default_backend() != "tpu"
W, H = 256, 128


def make_args(n, color_mode=1, seed=0):
    pos, _, col = G.generate(n, G.SphereGeneration.HOLLOW)
    vel = np.random.default_rng(seed).normal(size=pos.shape).astype(np.float32)
    state = ParticleState.from_arrays(pos, vel, col)
    pv = jnp.asarray(SimParams(color_mode=color_mode).pack())
    vp = jnp.asarray(Camera(aspect=W / H).view_proj())
    return (state.pos, state.vel, state.init_color, pv, vp, state.n_active)


@pytest.mark.parametrize("n", [1000, 5000])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_matches_scatter_oracle(n, mode):
    args = make_args(n, color_mode=mode)
    ref = np.asarray(raster.render(*args, width=W, height=H))
    got = np.asarray(raster_sorted.render(*args, width=W, height=H,
                                          interpret=INTERPRET))
    # additive blend sums in a different (sorted) order: f32 tolerance only
    np.testing.assert_allclose(got, ref, atol=5e-3)
    assert (got.sum(-1) > 0).sum() == (ref.sum(-1) > 0).sum()


def test_partial_occupancy_masked(n=900):
    # padding (capacity 1024) must not deposit anything
    args = make_args(n)
    ref = np.asarray(raster.render(*args, width=W, height=H))
    got = np.asarray(raster_sorted.render(*args, width=W, height=H,
                                          interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_hotspot_single_pixel():
    # every particle on one pixel: worst-case skew exercises the multi-chunk
    # revisit accumulation path
    n = 4096
    pos = np.zeros((n, 3), np.float32)
    vel = np.full((n, 3), 5.0, np.float32)
    col = np.full((n, 3), 1.0 / n, np.float32)
    state = ParticleState.from_arrays(pos, vel, col)
    pv = jnp.asarray(SimParams(color_mode=0).pack())
    vp = jnp.asarray(Camera(aspect=W / H).view_proj())
    got = np.asarray(raster_sorted.render(
        state.pos, state.vel, state.init_color, pv, vp, state.n_active,
        width=W, height=H, interpret=INTERPRET))
    ys, xs = np.nonzero(got.sum(-1))
    assert list(zip(ys, xs)) == [(H // 2, W // 2)]
    # n contributions of 1/n each, clamped at 1
    assert got[H // 2, W // 2] == pytest.approx([1.0] * 3, abs=1e-3)


def test_rejects_unaligned_resolution():
    args = make_args(1000)
    with pytest.raises(ValueError, match="multiple"):
        raster_sorted.render(*args, width=250, height=100)
