"""Stage breakdown of a PM self-gravity frame on the attached device.

Usage:  python tools/pm_profile.py [N] [boundary]
        N        particle count (default 16777216)
        boundary isolated | periodic (default isolated)

Prints per-stage marginal times (sort / deposit+table / spectral solve /
gather+un-sort) and the full pm_accel frame. Timing is bracketed by a
1-element readback (block_until_ready is a no-op on the axon platform)
and averaged over several iterations after a warm-up; see
docs/DESIGN.md "Platform notes".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from particle_sim_tpu.core import params as P
from particle_sim_tpu.ops import pm, pm_pallas
from particle_sim_tpu.utils.cache import enable as _enable_cache

_enable_cache()


def timeit(f, *args, iters=6):
    o = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024 * 1024
    boundary = sys.argv[2] if len(sys.argv) > 2 else "isolated"
    cfg = P.PMConfig(boundary=boundary)
    print(f"N={n}  cfg: {cfg}", flush=True)

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (3, n), jnp.float32, -45.0, 45.0)
    n_active = jnp.int32(n)

    sort_jit = jax.jit(lambda p: pm_pallas.pm_sort(p, n_active, cfg))
    key_s, idx_s, frac_s, _ = sort_jit(pos)
    print(f"pm_sort          {timeit(sort_jit, pos):8.2f} ms", flush=True)

    dep_jit = jax.jit(lambda k, f: pm_pallas.pm_deposit_sorted(k, f))
    rho = dep_jit(key_s, frac_s)
    print(f"deposit(+table)  {timeit(dep_jit, key_s, frac_s):8.2f} ms",
          flush=True)

    solve_jit = jax.jit(lambda r: pm.solve_accel(r, cfg, cfg.softening))
    grids = solve_jit(rho)
    print(f"spectral solve   {timeit(solve_jit, rho):8.2f} ms", flush=True)

    gat_jit = jax.jit(
        lambda g, k, f, i: pm_pallas.pm_gather_sorted(g, k, f, i))
    _ = gat_jit(grids, key_s, frac_s, idx_s)
    print(f"gather+unsort    "
          f"{timeit(gat_jit, grids, key_s, frac_s, idx_s):8.2f} ms",
          flush=True)

    full_jit = jax.jit(
        lambda p: pm_pallas.pm_accel(p, n_active, jnp.float32(1.0), cfg))
    _ = full_jit(pos)
    print(f"full pm_accel    {timeit(full_jit, pos, iters=4):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
