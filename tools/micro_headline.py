"""Marginal-chip headline sampler: per-launch readbacks, fresh
buffers, progressive JSON - survives tunnel states where
bench.py's launch bursts wedge (see tools/tpu_watch.py)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # python adds the SCRIPT dir, not cwd
import numpy as np, jax, jax.numpy as jnp
import particle_sim_tpu as psim
from particle_sim_tpu.ops import step_pallas

pos, vel, col = psim.generate.generate(1_000_000, psim.SphereGeneration.HOLLOW)
st = psim.ParticleState.from_arrays(pos, vel, col)
cap = st.capacity
pv = jnp.asarray(psim.SimParams(gravity=1.0, is_mouse_dragging=True,
    mouse_position=(0., 0., 48.), mouse_force=50.0, mouse_radius=25.0).pack())

def sync(x):
    return float(np.asarray(x[0].ravel()[1]))

def timed(k):
    p, v = jnp.array(st.pos), jnp.array(st.vel)
    out = step_pallas.step_n_jit(p, v, pv, k)
    sync(out)            # includes compile on first use of this k
    p, v = jnp.array(st.pos), jnp.array(st.vel)
    t0 = time.perf_counter()
    out = step_pallas.step_n_jit(p, v, pv, k)
    sync(out)
    return time.perf_counter() - t0

samples = []
for rep in range(3):
    t8 = timed(8)
    t108 = timed(108)
    dt = max(t108 - t8, 1e-9) / 100.0
    samples.append(dt)
    print(f"rep {rep}: t8={t8*1e3:.2f}ms t108={t108*1e3:.2f}ms "
          f"-> {dt*1e3:.4f} ms/step, {cap/dt/1e9:.2f} G steps/s", flush=True)
    with open("/tmp/micro_headline.json", "w") as f:
        json.dump({"samples_ms_per_step": [round(s*1e3, 4) for s in samples],
                   "particles": cap,
                   "rate_med": cap / float(np.median(samples))}, f)
print("DONE", flush=True)
