import numpy as np
import jax, jax.numpy as jnp
import particle_sim_tpu as psim
from particle_sim_tpu.core.params import PMConfig
from particle_sim_tpu.ops import pm

cfg = PMConfig(softening=4.0, gradient="exact", boundary="isolated", grid=64)
n = 1 << 20
rng = np.random.default_rng(0)
x = rng.normal(size=(n, 3)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
r = 45.0 * rng.random(n).astype(np.float32) ** (1 / 3)
pos_np = (x * r[:, None]).astype(np.float32)
st = psim.ParticleState.from_arrays(pos_np, np.zeros_like(pos_np),
                                    np.zeros_like(pos_np))
flat = st.pos.reshape(3, -1)
a_ref = pm.pm_accel_ref(flat, st.n_active, 1.0, cfg.softening, cfg)
print("ref ok", np.abs(np.asarray(a_ref)).max())
