"""Independent NumPy transcription of the reference's per-particle step.

A direct, scalar-level translation of the physics in
``/root/reference/src/simulation/cpu.rs:65-113`` and
``/root/reference/src/shaders/compute.wgsl:52-93``, kept deliberately naive
(python loop over particles) and separate from the package under test. Every
stepper in the package must match this within float32 tolerance.
"""

import numpy as np


def reference_step(pos, vel, *, dt, gravity, mouse_force, mouse_radius,
                   damping, mouse_position, dragging):
    """pos, vel: float[n,3]. Returns stepped copies (float64 math)."""
    pos = np.array(pos, dtype=np.float64)
    vel = np.array(vel, dtype=np.float64)
    m = np.asarray(mouse_position, dtype=np.float64)
    for i in range(pos.shape[0]):
        v = vel[i].copy()
        p = pos[i].copy()
        # gravity (cpu.rs:72)
        v[1] -= gravity * dt
        # mouse attractor (cpu.rs:75-84)
        if dragging:
            dirv = m - p
            dist = np.linalg.norm(dirv)
            if dist < mouse_radius * 2.0:
                force_factor = (1.0 - dist / (mouse_radius * 2.0)) ** 2 * 2.0
                if dist > 0:
                    v += (dirv / dist) * mouse_force * force_factor * dt
        # integrate then damp (cpu.rs:87-90)
        p += v * dt
        v *= damping
        pos[i] = p
        vel[i] = v
    return pos, vel


def reference_color(pos, vel, init_color_rgb, *, color_mode, max_dist):
    """RGB per particle (cpu.rs:93-107 / compute.wgsl:74-93, wgsl case-0
    semantics for mode 0: color = initial color)."""
    n = pos.shape[0]
    out = np.zeros((n, 3), dtype=np.float64)
    for i in range(n):
        if color_mode == 1:
            speed = np.linalg.norm(vel[i])
            s = min(speed / 5.0, 1.0)
            out[i] = [s, 0.5 - s * 0.5, 1.0 - s]
        elif color_mode == 2:
            d = np.clip(np.linalg.norm(pos[i]) / max(max_dist, 0.01), 0.0, 1.0)
            out[i] = [d, 0.0, 1.0 - d]
        else:
            out[i] = init_color_rgb[i]
    return out
