"""Round-3 design measurements: the 16M interactive render path.

Measures, on the real chip, every candidate cost in the flagship
16M --pm-persist --view-mode raster frame so the round-3 redesign of
render/raster_sorted.py is chosen from data (VERDICT.md "next round" #1):

  * persist step (the 34.9 ms leg the render must get under)
  * current sorted-raster render (incl. its 4-operand global lax.sort)
  * lax.sort cost by operand count at 16M (the pack-rgb option)
  * ensure_identity_order (unsort scatter) — the color-mode-0 tax
  * pack_points (wire modes 0/1)
  * screen-tile span statistics of the persistent cell-sorted order
    under the default camera — sizes the pm_persist-style span-table
    raster candidate (pairs = sum of per-chunk tile-interval widths)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_sim_tpu.core.params import PMConfig, SimParams, ColorMode
from particle_sim_tpu.engine.engine import Engine
from particle_sim_tpu.render import raster, raster_sorted
from particle_sim_tpu.render.camera import Camera

N = 16_777_216
W, H = 1920, 1080
REPS = 8


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(label, fn, reps=REPS):
    fn()  # warm/compile
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = sorted(ts)
    med = ts[len(ts) // 2]
    print(f"{label:44s} med {med:8.2f} ms  (min {ts[0]:.2f} max {ts[-1]:.2f})")
    return med


def main():
    print(f"devices: {jax.devices()}")
    eng = Engine(particle_count=N, pm=PMConfig(), pm_persist=True)
    params = SimParams(color_mode=ColorMode.ORIGINAL)
    pv = jnp.asarray(params.pack())
    cam = Camera()
    # settle into steady state (repairs done)
    for _ in range(6):
        eng.step(params)
    sync(eng._persist.pos)

    def step():
        eng.step(params)
        return eng._persist.pos
    timeit("persist step 16M", step)

    st = eng._persist
    n = st.pos.shape[1]
    print(f"capacity {n}, resorts {int(st.resorts)}")
    shape = eng._state.pos.shape
    sp, sv = st.pos.reshape(shape), st.vel.reshape(shape)
    scol = eng._state.init_color
    vp = jnp.asarray(cam.view_proj())
    na = eng._state.n_active

    timeit("raster_sorted.render 16M (sorted planes)",
           lambda: raster_sorted.render_jit(sp, sv, scol, pv, vp, na,
                                            width=W, height=H), reps=4)

    # lax.sort operand scaling at the padded capacity
    k = jnp.asarray(np.random.randint(0, 1 << 21, n).astype(np.int32))
    f1 = jnp.asarray(np.random.rand(n).astype(np.float32))
    i1 = jnp.asarray(np.arange(n, dtype=np.int32))

    s1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))
    s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    s4 = jax.jit(lambda a, b, c, d, e: jax.lax.sort((a, b, c, d, e),
                                                    num_keys=1))
    timeit("lax.sort 1-op 16M", lambda: s1(k), reps=4)
    timeit("lax.sort 2-op 16M", lambda: s2(k, i1), reps=4)
    timeit("lax.sort 4-op 16M (key+rgb, current raster)",
           lambda: s4(k, f1, f1, f1, f1)[0], reps=4)

    # unsort scatter (the ensure_identity_order tax)
    from particle_sim_tpu.ops import pm_persist as pper
    un = jax.jit(lambda s: pper.unsort(s, (s.pos, s.vel)))
    timeit("unsort scatter (pos+vel) 16M", lambda: un(st), reps=4)

    # pack_points (wire mode planar)
    timeit("pack_points 16M",
           lambda: raster.pack_points_jit(sp, sv, scol, pv, n_stop=na),
           reps=4)
    timeit("pack_points 16M stride 8",
           lambda: raster.pack_points_jit(sp, sv, scol, pv, n_stop=na,
                                          stride=8), reps=4)

    # span statistics for the span-table raster candidate
    flat_pos = sp.reshape(3, -1)
    px, py, valid = raster.project_to_pixels(flat_pos, vp, W, H)
    tiles_x = W // raster_sorted.TILE_W
    tile = (py // raster_sorted.TILE_H) * tiles_x + (px // raster_sorted.TILE_W)
    n_tiles = tiles_x * (H // raster_sorted.TILE_H)
    tile = jnp.where(valid > 0, tile, n_tiles)  # invalid -> sentinel tile
    live_frac = float((valid > 0).mean())
    print(f"visible fraction: {live_frac:.3f}, n_tiles {n_tiles}")
    for chunk in (128, 256, 512, 1024):
        t = np.asarray(tile).reshape(-1, chunk)
        tmin = np.where(t < n_tiles, t, n_tiles).min(axis=1)
        tmax = np.where(t < n_tiles, t, -1).max(axis=1)
        wdt = np.maximum(tmax - tmin + 1, 0)
        pairs = int(wdt.sum())
        # deposit cost model: one (24,chunk)@(chunk,128) bf16 matmul/pair
        mxu = pairs * (24 * chunk * 128 * 2) / 197e12 * 1e3
        hbm = pairs * chunk * 16 / 8.2e11 * 1e3
        print(f"chunk {chunk:5d}: pairs {pairs:9d} "
              f"(avg span {wdt.mean():7.1f}, p95 {np.percentile(wdt, 95):7.1f}) "
              f"est MXU {mxu:6.1f} ms + stream {hbm:5.1f} ms")

    # same after a camera yaw of 30 deg (rotation robustness)
    cam2 = Camera(yaw=float(cam.yaw) + 0.5)
    vp2 = jnp.asarray(cam2.view_proj())
    px, py, valid = raster.project_to_pixels(flat_pos, vp2, W, H)
    tile = (py // raster_sorted.TILE_H) * tiles_x + (px // raster_sorted.TILE_W)
    tile = jnp.where(valid > 0, tile, n_tiles)
    t = np.asarray(tile).reshape(-1, 512)
    tmin = np.where(t < n_tiles, t, n_tiles).min(axis=1)
    tmax = np.where(t < n_tiles, t, -1).max(axis=1)
    wdt = np.maximum(tmax - tmin + 1, 0)
    print(f"yaw+0.5 chunk 512: pairs {int(wdt.sum()):9d} "
          f"(avg span {wdt.mean():7.1f})")


if __name__ == "__main__":
    main()
