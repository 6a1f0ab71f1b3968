"""Stage breakdown of a PM self-gravity frame on the attached device.

Usage:  python tools/pm_profile.py [N] [boundary]
        python tools/pm_profile.py pmn [N]
        N        particle count (default 16777216)
        boundary isolated | periodic (default isolated)

Default mode prints per-stage marginal times (sort / deposit+table /
spectral solve / gather+un-sort) and the full pm_accel frame.

``pmn`` mode (VERDICT r4 item 4) decomposes the MULTI-level persistent
frame — where does pmn_persistent_16m_steady (131 ms) go beyond the
two-level number (78 ms)? It times the full frame at every level count
(coarse-only / 1 window / 2 windows / the two-level cfg2 mode) so each
level's marginal cost is a difference of same-process numbers, plus the
micro stages a level adds (nested window origins, fine inputs + masked
totals, the difference-kernel solve) so the marginal can be attributed.
budgets() and budgets_multi() both clamp to the same 64Ki SMEM budget
at 16M, so table capacity is NOT a candidate — see budgets_multi.

Timing is bracketed by a 1-element readback (block_until_ready is a
no-op on the axon platform) and averaged over several iterations after
a warm-up; see docs/DESIGN.md "Platform notes".
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


def main_pmn() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16 * 1024 * 1024
    cfg = P.PMConfig(softening=2.0)
    from particle_sim_tpu.ops import pm2, pm_persist

    L1 = pm2.PM2Config(window_min=None, window_size=32.0, softening=0.5)
    L2 = pm2.PM2Config(window_min=None, window_size=8.0, softening=0.2)
    print(f"pmn mode  N={n}  cfg: {cfg}  levels: 32/0.5, 8/0.2",
          flush=True)

    key = jax.random.PRNGKey(2)   # resident_bench's pmn scene
    pos = jax.random.uniform(key, (3, n), jnp.float32, -45.0, 45.0)
    n_active = jnp.int32(n)
    live = jnp.arange(n, dtype=jnp.int32) < n_active
    chunk = pm_persist.pick_chunk(n)

    def settled_multi(levels):
        ker = pm2.levels_kernels(cfg, levels)
        st = pm_persist.init_sorted_multi(pos, n_active, cfg,
                                          len(levels))
        frame = jax.jit(lambda s, k: (lambda s2, a: (s2, a.sum()))(
            *pm_persist.accel_sorted_multi(s, jnp.float32(1.0), cfg,
                                           levels, kernels=k)))
        st, _ = frame(st, ker)      # settle into the k+1-class order
        st, _ = frame(st, ker)
        return st, ker, frame

    # -- full-frame ladder: each row's delta = that level's total cost
    st0 = pm_persist.init_sorted(pos, n_active, cfg)
    f0 = jax.jit(lambda s: (lambda s2, a: a.sum())(
        *pm_persist.accel_sorted(s, jnp.float32(1.0), cfg)))
    _ = f0(st0)
    t0 = timeit(f0, st0, iters=4)
    print(f"frame coarse-only          {t0:8.2f} ms", flush=True)

    st2lv = pm_persist.init_sorted(pos, n_active, cfg)
    ker2lv = pm2.fine_kernels(cfg, L1)
    f2lv = jax.jit(lambda s, k: (lambda s2, a: (s2, a.sum()))(
        *pm_persist.accel_sorted(s, jnp.float32(1.0), cfg, cfg2=L1,
                                 kernels=k)))
    # CARRY the state: the first call migrates into the segmented order
    # (one repair) — timing the unmigrated input would repair every
    # frame and measure the repair sort, not the steady state
    st2lv, _ = f2lv(st2lv, ker2lv)
    st2lv, _ = f2lv(st2lv, ker2lv)
    t2lv = timeit(f2lv, st2lv, ker2lv, iters=4)
    print(f"frame two-level mode (L1)  {t2lv:8.2f} ms  "
          f"(+{t2lv - t0:.2f} vs coarse)", flush=True)

    st1, ker1, f1 = settled_multi((L1,))
    t1 = timeit(f1, st1, ker1, iters=4)
    print(f"frame multi k=1 (L1)       {t1:8.2f} ms  "
          f"(+{t1 - t0:.2f} vs coarse; multi-order overhead "
          f"{t1 - t2lv:+.2f} vs two-level mode)", flush=True)

    st2, ker2, f2 = settled_multi((L1, L2))
    t2 = timeit(f2, st2, ker2, iters=4)
    print(f"frame multi k=2 (L1,L2)    {t2:8.2f} ms  "
          f"(+{t2 - t1:.2f} for L2)", flush=True)

    # -- micro stages a level adds (timed on the settled k=2 state) ----
    wmins_jit = jax.jit(lambda s: pm2._nested_wmins(
        s.pos, s.ids < n_active, cfg, (L1, L2), None))
    wmins = wmins_jit(st2)
    print(f"  nested window origins    {timeit(wmins_jit, st2):8.2f} ms",
          flush=True)

    for m, (lv, wm) in enumerate(zip((L1, L2), wmins)):
        fi_jit = jax.jit(lambda s, w, lv=lv: pm_persist._fine_inputs(
            s.pos, s.ids < n_active, w, cfg, lv))
        _ = fi_jit(st2, wm)
        print(f"  fine inputs L{m + 1}          "
              f"{timeit(fi_jit, st2, wm):8.2f} ms", flush=True)

    tot_jit = jax.jit(lambda s: pm_persist._pair_totals_multi(
        pm_pallas.cell_key_frac(s.pos, s.ids < n_active, cfg)[0],
        chunk, s.fine_b))
    _ = tot_jit(st2)
    print(f"  keys + 3-class totals    {timeit(tot_jit, st2):8.2f} ms",
          flush=True)

    geom = pm_persist._geom(cfg.grid)
    rho = jax.random.uniform(jax.random.PRNGKey(3),
                             (cfg.grid,) * 3, jnp.float32)
    h2 = L2.window_size / cfg.grid
    dk = pm2.levels_kernels(cfg, (L1, L2))[1]
    solve_jit = jax.jit(lambda r, k: pm.solve_accel_diff(
        r, cfg.grid, h2, L2.softening, L1.softening, L2.gradient,
        kernels=k))
    _ = solve_jit(rho, dk)
    print(f"  diff-kernel solve (1 lv) {timeit(solve_jit, rho, dk):8.2f} "
          "ms", flush=True)

    spans_jit = jax.jit(lambda s: pm_persist._deposit_table_spans_multi(
        pm_pallas.cell_key_frac(s.pos, s.ids < n_active, cfg)[0],
        chunk, s.fine_b, n // chunk,
        pm_persist.budgets_multi(n // chunk, geom, 3)[0], geom))
    _ = spans_jit(st2)
    print(f"  3-class deposit spans    {timeit(spans_jit, st2):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "pmn":
        main_pmn()
    else:
        main()
