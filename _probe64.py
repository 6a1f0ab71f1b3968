import numpy as np
import jax, jax.numpy as jnp
import particle_sim_tpu as psim
from particle_sim_tpu.core.params import PMConfig
from particle_sim_tpu.ops import pm, pm_pallas

rng = np.random.default_rng(0)
n = 1 << 16
x = rng.normal(size=(n, 3)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
r = 45.0 * rng.random(n).astype(np.float32) ** (1 / 3)
pos_np = (x * r[:, None]).astype(np.float32)
st = psim.ParticleState.from_arrays(pos_np, np.zeros_like(pos_np),
                                    np.zeros_like(pos_np))
flat = st.pos.reshape(3, -1)
cfg = PMConfig(softening=4.0, gradient="exact", boundary="isolated", grid=64)

key_s, idx_s, frac_s, _ = jax.jit(
    lambda p, na: pm_pallas.pm_sort(p, na, cfg))(flat, st.n_active)
print("sort ok", np.asarray(key_s[:3]))
rho = jax.jit(lambda k, f: pm_pallas.pm_deposit_sorted(k, f, grid=64))(
    key_s, frac_s)
print("deposit ok, mass =", float(rho.sum()))
grids = jax.jit(lambda r: pm.solve_accel(r, cfg, cfg.softening))(rho)
print("solve ok", float(jnp.abs(grids).max()))
acc = jax.jit(lambda g, k, f, i: pm_pallas.pm_gather_sorted(
    g, k, f, i, grid=64))(grids, key_s, frac_s, idx_s)
print("gather ok", np.abs(np.asarray(acc)).max())
