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

    # persistent-sorted mode (ops/pm_persist.py): stage marginals of the
    # sort-free frame — every stage consumes its result (a state-only
    # return lets XLA dead-code the solver; see bench.py)
    from particle_sim_tpu.ops import pm_persist

    st = pm_persist.init_sorted(pos, n_active, cfg)
    chunk = pm_persist.pick_chunk(n)
    n_chunks = n // chunk
    print(f"-- persist (chunk {chunk}) --", flush=True)

    keys_jit = jax.jit(lambda s: pm_pallas.cell_key_frac(
        s.pos, s.ids < n_active, cfg))
    key_p, frac_p = keys_jit(st)
    print(f"keys+fracs       {timeit(keys_jit, st):8.2f} ms", flush=True)

    spans_jit = jax.jit(lambda k: pm_persist._pair_totals(k, chunk))
    _ = spans_jit(key_p)
    print(f"spans+totals     {timeit(spans_jit, key_p):8.2f} ms",
          flush=True)

    c_max_dep, c_max_gat = pm_persist.budgets(n_chunks)

    def dep_persist(k, f):
        rmin, rmax = pm_persist._chunk_spans(k, chunk)
        pairs = pm_persist._deposit_table_spans(rmin, rmax, n_chunks,
                                                c_max_dep)
        k_p = jnp.concatenate(
            [k, jnp.full((chunk,), pm_pallas.SENTINEL, jnp.int32)])
        f_p = jnp.concatenate([f, jnp.zeros((chunk,), jnp.int32)])
        total, _ = pm_persist._pair_totals(k, chunk)
        dep = pm_pallas._build_deposit_dyn(
            chunk, c_max_dep, False, False,
            jnp.minimum(total, c_max_dep).astype(jnp.int32))
        return dep(pairs, k_p.reshape(1, -1),
                   f_p.reshape(1, -1))[:pm_pallas.N_TILES]

    dp_jit = jax.jit(dep_persist)
    rho_p = dp_jit(key_p, frac_p)
    print(f"span deposit     {timeit(dp_jit, key_p, frac_p):8.2f} ms",
          flush=True)

    def gat_persist(g, k, f):
        rmin, rmax = pm_persist._chunk_spans(k, chunk)
        pairs = pm_persist._gather_table_spans(rmin, rmax, n_chunks,
                                               c_max_gat)
        _, total = pm_persist._pair_totals(k, chunk)
        gat = pm_pallas._build_gather_dyn(
            n, chunk, c_max_gat, False,
            jnp.minimum(total, c_max_gat).astype(jnp.int32))
        tiles = g.reshape(3, pm_pallas.ROWS_TOTAL,
                          pm_pallas.LANE).astype(jnp.bfloat16)
        return gat(pairs, k.reshape(1, -1), f.reshape(1, -1), tiles)[:, :n]

    gp_jit = jax.jit(gat_persist)
    _ = gp_jit(grids, key_p, frac_p)
    print(f"span gather      {timeit(gp_jit, grids, key_p, frac_p):8.2f} ms",
          flush=True)

    acc_jit = jax.jit(lambda s: (lambda s2, a: a.sum())(
        *pm_persist.accel_sorted(s, jnp.float32(1.0), cfg)))
    _ = acc_jit(st)
    print(f"full persist     {timeit(acc_jit, st, iters=4):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
