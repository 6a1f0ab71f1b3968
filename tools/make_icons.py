"""Generate the PWA install icons by rendering the simulation itself.

The reference ships four install assets and wires them through its shell
(`/root/reference/index.html:26-50`, `assets/manifest.json:10-27`):
icon-1024.png, icon-256.png, icon_ios_touch_192.png,
maskable_icon_x512.png. Here the icon IS a frame of the engine — the
hollow sphere mid-drag rendered by the repo's own rasterizer — so the
brand asset regenerates from the product with zero external tooling.

Run from the repo root (CPU is forced; deterministic output):

    python tools/make_icons.py

Writes into particle_sim_tpu/app/viewer/assets/ (served by app/server.py,
bundled by app/release.py, referenced by manifest.json + index.html).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from particle_sim_tpu.core.params import SimParams  # noqa: E402
from particle_sim_tpu.engine import Engine  # noqa: E402
from particle_sim_tpu.render.camera import Camera  # noqa: E402
from particle_sim_tpu.utils.png import write_png  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "particle_sim_tpu",
                       "app", "viewer", "assets")
BASE = 1024


def render_base() -> np.ndarray:
    """u8[1024, 1024, 4] — the hollow sphere pulled into a swirl."""
    engine = Engine(particle_count=100_000)
    params = SimParams(gravity=1.0, is_mouse_dragging=True,
                      mouse_position=(10.0, 8.0, 40.0), mouse_force=60.0,
                      mouse_radius=30.0, color_mode=0)
    for _ in range(50):
        engine.step(params)
    cam = Camera(aspect=1.0)
    img = np.asarray(engine.render_frame(cam, params,
                                         width=BASE, height=BASE))
    img = img.copy()
    img[..., 3] = 255          # install icons are opaque (black space bg)
    return img


def resize(img: np.ndarray, size: int) -> np.ndarray:
    out = jax.image.resize(jnp.asarray(img, jnp.float32),
                           (size, size, 4), method="linear")
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def maskable(img: np.ndarray, size: int = 512,
             safe: float = 0.78) -> np.ndarray:
    """Content shrunk into the maskable safe zone (inner ~80% circle),
    padded with the background color."""
    inner = int(size * safe)
    core = resize(img, inner)
    out = np.zeros((size, size, 4), np.uint8)
    out[..., 3] = 255
    o = (size - inner) // 2
    out[o:o + inner, o:o + inner] = core
    return out


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    base = render_base()
    targets = {
        "icon-1024.png": base,
        "icon-256.png": resize(base, 256),
        "icon_ios_touch_192.png": resize(base, 192),
        "maskable_icon_x512.png": maskable(base),
        "favicon.png": resize(base, 64),
    }
    for name, img in targets.items():
        path = os.path.join(OUT_DIR, name)
        write_png(path, img)
        print(f"wrote {path} ({img.shape[0]}x{img.shape[1]}, "
              f"{os.path.getsize(path)} B)")


if __name__ == "__main__":
    main()
