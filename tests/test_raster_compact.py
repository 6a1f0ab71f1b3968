"""Compaction + segmented-sort rasterizer (render/raster_compact.py) vs
the scatter oracle: parity across color modes, occupancy masking, the
bucket switch (off-screen clouds compacting to a small bucket), hotspot
skew, and order-independence (shuffled input == coherent input)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_sim_tpu.core import generate as G
from particle_sim_tpu.core.params import SimParams
from particle_sim_tpu.core.state import ParticleState
from particle_sim_tpu.render import raster, raster_compact
from particle_sim_tpu.render.camera import Camera

INTERPRET = jax.default_backend() != "tpu"
W, H = 256, 128
# premultiplied color rides as bf16 (relative 2^-9 per point), so pixel
# error stays RELATIVE (~0.2%) regardless of stack depth
ATOL = 5e-3


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
    got = np.asarray(raster_compact.render(*args, width=W, height=H,
                                           interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, atol=ATOL)
    assert (got.sum(-1) > 0).sum() == (ref.sum(-1) > 0).sum()


def test_partial_occupancy_masked(n=900):
    # padding (capacity 1024) must not deposit anything
    args = make_args(n)
    ref = np.asarray(raster.render(*args, width=W, height=H))
    got = np.asarray(raster_compact.render(*args, width=W, height=H,
                                           interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_order_independence():
    """The same cloud shuffled must render the same frame: disorder only
    defeats the compaction (every chunk visible), never correctness."""
    pos, vel, col, pv, vp, na = make_args(5000)
    perm = np.random.default_rng(1).permutation(pos.shape[1] * pos.shape[2])
    shuf = tuple(
        jnp.asarray(np.asarray(a).reshape(3, -1)[:, perm]
                    .reshape(a.shape)) for a in (pos, vel, col))
    # full occupancy so the active-prefix mask is permutation-safe
    na = jnp.int32(pos.shape[1] * pos.shape[2])
    ref = np.asarray(raster_compact.render(pos, vel, col, pv, vp, na,
                                           width=W, height=H,
                                           interpret=INTERPRET))
    got = np.asarray(raster_compact.render(*shuf, pv, vp, na,
                                           width=W, height=H,
                                           interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_bucket_switch_offscreen_cloud():
    """A cloud mostly behind the camera compacts into a small bucket;
    the visible sliver must still render exactly."""
    n = 40960  # big enough for several buckets
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 4.0
    pos[:, 2] += 160.0           # camera sits at z=100 looking down -z:
    pos[: n // 64, 2] -= 140.0   # most of the cloud is BEHIND it
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    col = rng.random((n, 3), dtype=np.float32)
    state = ParticleState.from_arrays(pos, vel, col)
    pv = jnp.asarray(SimParams(color_mode=0).pack())
    vp = jnp.asarray(Camera(aspect=W / H).view_proj())
    args = (state.pos, state.vel, state.init_color, pv, vp, state.n_active)
    ref = np.asarray(raster.render(*args, width=W, height=H))
    got = np.asarray(raster_compact.render(*args, width=W, height=H,
                                           interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, atol=ATOL)
    assert (ref.sum(-1) > 0).any()   # the sliver IS visible


def test_hotspot_single_pixel():
    # every particle on one pixel: worst-case skew exercises the
    # multi-pair revisit accumulation path
    n = 4096
    pos = np.zeros((n, 3), np.float32)
    vel = np.full((n, 3), 5.0, np.float32)
    col = np.full((n, 3), 1.0 / n, np.float32)
    state = ParticleState.from_arrays(pos, vel, col)
    pv = jnp.asarray(SimParams(color_mode=0).pack())
    vp = jnp.asarray(Camera(aspect=W / H).view_proj())
    got = np.asarray(raster_compact.render(
        state.pos, state.vel, state.init_color, pv, vp, state.n_active,
        width=W, height=H, interpret=INTERPRET))
    ys, xs = np.nonzero(got.sum(-1))
    assert list(zip(ys, xs)) == [(H // 2, W // 2)]
    # n contributions of ~1/n each, clamped at 1 (10-bit per-point color)
    assert got[H // 2, W // 2] == pytest.approx([1.0] * 3, abs=0.02)


def test_rejects_unaligned_resolution():
    args = make_args(1000)
    with pytest.raises(ValueError, match="multiple"):
        raster_compact.render(*args, width=250, height=100)
