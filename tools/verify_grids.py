"""One-off: fast-path parity + timing on the REAL TPU at every
supported grid. Reference = ops/pm.pm_accel_ref run on the same TPU
(the interpret-mode CPU tests already check vs the jnp reference
independently; this run validates the compiled Mosaic kernels)."""
import time
import numpy as np
import jax, jax.numpy as jnp
import particle_sim_tpu as psim
from particle_sim_tpu.core.params import PMConfig
from particle_sim_tpu.ops import pm, pm_pallas

print("devices:", jax.devices())
rng = np.random.default_rng(0)
n = 1 << 18
x = rng.normal(size=(n, 3)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
r = 45.0 * rng.random(n).astype(np.float32) ** (1 / 3)
pos_np = (x * r[:, None]).astype(np.float32)
st = psim.ParticleState.from_arrays(pos_np, np.zeros_like(pos_np),
                                    np.zeros_like(pos_np))
flat = st.pos.reshape(3, -1)

for g in (32, 64, 128, 256):
    cfg = PMConfig(softening=4.0, gradient="exact", boundary="isolated",
                   grid=g)
    f = jax.jit(lambda p, n, cfg=cfg: pm_pallas.pm_accel(p, n, 1.0, cfg))
    a = f(flat, st.n_active)
    a.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        a = f(flat, st.n_active)
    a.block_until_ready()
    ms = (time.perf_counter() - t0) / 5 * 1e3
    fr = jax.jit(lambda p, n, cfg=cfg: pm.pm_accel_ref(
        p, n, 1.0, cfg.softening, cfg))
    a_ref = fr(flat, st.n_active)
    a_np, r_np = np.asarray(a), np.asarray(a_ref)
    scale = np.abs(r_np).max()
    err = np.abs(a_np - r_np).max() / scale
    assert np.isfinite(a_np).all(), f"grid {g}: non-finite"
    print(f"grid {g:4d}: 256K pm_accel {ms:7.2f} ms   rel-err {err:.4f}")
    assert err < 0.02, f"grid {g} parity fail: {err}"
print("OK: fast-path parity on real TPU at grids 32/64/128/256")
