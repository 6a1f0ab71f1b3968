"""Particle state: SoA component planes resident in HBM.

The reference stores particles as an interleaved array of 64-byte AoS structs
(``/root/reference/src/simulation/mod.rs:86-98``: position vec3 + pad,
velocity vec3 + pad, color vec4, initial_color vec4) used simultaneously as a
STORAGE and VERTEX buffer. That layout is a GPU-vertex-fetch artifact; on TPU
it would waste lanes and HBM bandwidth.

TPU-native layout decisions:
  * **SoA component planes** shaped ``float32[3, R, LANE]`` with
    ``LANE = 128`` and padded capacity ``R * 128`` — the last dim maps to VPU
    lanes, the middle dim to sublanes, so every elementwise kernel runs at
    full vector width and Pallas blocks tile naturally.
  * **No stored current color.** The per-frame color (``compute.wgsl:74-93``)
    is a pure function of (position, velocity, initial_color, params); we
    compute it on demand in the consumer (packer / rasterizer). This cuts the
    steady-state step traffic from 64+48 B/particle (reference read+write) to
    24+24 B/particle. Semantics follow the compute-shader backend: switching
    back to ColorMode.ORIGINAL shows initial colors (``compute.wgsl:75-77``;
    the reference CPU backend instead freezes the last computed color,
    ``cpu.rs:106`` — a statefulness artifact we intentionally do not copy).
  * **Padded capacity + dynamic active count.** JAX recompiles per shape, so
    the interactive particle-count UI (``app.rs:442-492``) maps to padded
    capacity buckets with a traced ``n_active`` scalar — mirroring the
    reference's own keep-capacity-on-shrink behavior (``cpu.rs:132-150``).
    Padding particles are zero-initialized and harmlessly stepped; consumers
    slice/mask to ``n_active``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128      # TPU lane width (last-dim tiling unit)
SUBLANE = 8     # float32 sublane tiling unit


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def capacity_rows(n: int, row_multiple: int = SUBLANE) -> int:
    """Rows R such that capacity = R*LANE >= n, R aligned for f32 tiles."""
    return max(round_up(cdiv(max(n, 1), LANE), row_multiple), row_multiple)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """SoA particle state. All planes are ``float32[3, R, LANE]``.

    ``pos[c]``/``vel[c]`` hold the x/y/z component planes; ``init_color[c]``
    holds the r/g/b channels of the generation color (alpha is constant 1.0
    in the reference, ``mod.rs:163``, so it is not stored).
    ``n_active`` is a traced int32 scalar: the live particle count.
    """

    pos: jax.Array
    vel: jax.Array
    init_color: jax.Array
    n_active: jax.Array

    # -- static shape helpers ------------------------------------------------
    @property
    def rows(self) -> int:
        return self.pos.shape[1]

    @property
    def capacity(self) -> int:
        return self.pos.shape[1] * self.pos.shape[2]

    # -- construction --------------------------------------------------------
    @classmethod
    def from_arrays(
        cls,
        positions: np.ndarray,      # float32[n, 3]
        velocities: np.ndarray,     # float32[n, 3]
        init_colors: np.ndarray,    # float32[n, 3] (rgb) or [n, 4]
        capacity: Optional[int] = None,
        row_multiple: int = SUBLANE,
    ) -> "ParticleState":
        n = positions.shape[0]
        rows = (
            capacity_rows(n, row_multiple)
            if capacity is None
            else capacity // LANE
        )
        if rows * LANE < n:
            raise ValueError(f"capacity {rows * LANE} < particle count {n}")

        def to_planes(a: np.ndarray, channels: int) -> jnp.ndarray:
            buf = np.zeros((channels, rows * LANE), dtype=np.float32)
            buf[:, :n] = np.asarray(a, dtype=np.float32)[:, :channels].T
            return jnp.asarray(buf.reshape(channels, rows, LANE))

        return cls(
            pos=to_planes(positions, 3),
            vel=to_planes(velocities, 3),
            init_color=to_planes(init_colors, 3),
            n_active=jnp.asarray(n, dtype=jnp.int32),
        )

    # -- views (host-side, slice to active count) -----------------------------
    def _flat(self, plane: jax.Array) -> np.ndarray:
        n = int(self.n_active)
        return np.asarray(plane.reshape(3, -1)[:, :n]).T  # [n, 3]

    def positions(self) -> np.ndarray:
        return self._flat(self.pos)

    def velocities(self) -> np.ndarray:
        return self._flat(self.vel)

    def init_colors_rgba(self) -> np.ndarray:
        rgb = self._flat(self.init_color)
        return np.concatenate(
            [rgb, np.ones((rgb.shape[0], 1), dtype=np.float32)], axis=1
        )

    # -- device-side views -----------------------------------------------------
    def pos_nx3(self) -> jax.Array:
        """Positions as float32[capacity, 3] (padded; device-side)."""
        return self.pos.reshape(3, -1).T

    def vel_nx3(self) -> jax.Array:
        return self.vel.reshape(3, -1).T

    def active_mask_flat(self) -> jax.Array:
        """bool[capacity]: True for live particles."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)
        return idx < self.n_active


def zeros_state(capacity: int) -> ParticleState:
    rows = capacity // LANE
    plane = jnp.zeros((3, rows, LANE), dtype=jnp.float32)
    return ParticleState(
        pos=plane, vel=plane, init_color=plane,
        n_active=jnp.asarray(0, dtype=jnp.int32),
    )
