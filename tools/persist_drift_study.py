"""Drift study for the persistent cell-sorted PM state (ops/pm_persist.py).

Question this tool answers (docs/DESIGN.md "future work", outlier
side-channel): in a dynamic self-gravitating scene, is the pair-budget
overflow that forces repair sorts driven by a FEW far-drifted particles
per chunk (so exiling the top-M row-outliers into a small compact side
block would keep the span tables tight and stretch repair cadence), or
by bulk coherent drift (where exiling cannot help and periodic repairs
are fundamental)?

Method: evolve a collapse scene with the jnp PM reference stepper
(backend-agnostic — runs on CPU at 1M, TPU at 16M), and SIMULATE the
persistent slot layout host-side: a slot permutation initialized by one
grouping sort, per-frame pair totals computed by the real
pm_persist._pair_totals on the slot-ordered keys, a repair (re-sort of
the permutation) whenever the totals would overflow the real
pm_persist.budgets. For each exile width M in --exiles, an independent
simulation masks the top-M |row - live mean row| particles per chunk to
SENTINEL before computing totals (exactly what the side-channel would
do), with its own permutation and repair counter.

Output: one JSON line per frame variant + a summary of repairs and mean
totals per M. No repo behavior depends on this tool; it is the recorded
evidence for the side-channel design decision.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--dt", type=float, default=0.016)
    ap.add_argument("--g-total", type=float, default=16e6,
                    help="G * total mass; the 16M-particle bench scene "
                         "has mass 1/particle and g=1 => 16e6. Matching "
                         "it keeps per-frame drift comparable at any N.")
    ap.add_argument("--damping", type=float, default=0.99)
    ap.add_argument("--exiles", type=int, nargs="*",
                    default=[0, 2, 4, 8, 16, 32, 64])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from particle_sim_tpu.core.params import PMConfig
    from particle_sim_tpu.ops import pm, pm_persist
    from particle_sim_tpu.ops.pm_pallas import SENTINEL, cell_key_frac

    n = args.n
    cfg = PMConfig(softening=2.0)
    chunk = pm_persist.pick_chunk(n)
    n_chunks = n // chunk
    c_dep, c_gat = pm_persist.budgets(n_chunks)
    g = args.g_total / n
    print(json.dumps({"n": n, "chunk": chunk, "n_chunks": n_chunks,
                      "budget_dep": c_dep, "budget_gat": c_gat,
                      "g_const": g, "backend": jax.default_backend()}))

    key_r = jax.random.PRNGKey(args.seed)
    pos = jax.random.uniform(key_r, (3, n), jnp.float32, -45.0, 45.0)
    vel = jnp.zeros_like(pos)
    n_act = jnp.int32(n)

    accel = jax.jit(lambda q: pm.pm_accel_ref(
        q, n_act, jnp.float32(g), cfg.softening, cfg))
    keys_of = jax.jit(lambda q: cell_key_frac(
        q, jnp.ones((n,), bool), cfg)[0])
    totals_of = jax.jit(lambda k: pm_persist._pair_totals(k, chunk))

    # one independent layout simulation per exile width
    sims = {m: {"perm": None, "repairs": 0, "deps": [], "gats": [],
                "span_p50": [], "span_max": []}
            for m in args.exiles}

    def masked_keys(key_slot: np.ndarray, m: int) -> np.ndarray:
        """Exile the top-m |row - live mean row| per chunk -> SENTINEL."""
        if m == 0:
            return key_slot
        k = key_slot.reshape(n_chunks, chunk)
        rows = (k >> 7).astype(np.float32)
        live = k < SENTINEL
        cnt = np.maximum(live.sum(axis=1, keepdims=True), 1)
        mean = (np.where(live, rows, 0).sum(axis=1, keepdims=True) / cnt)
        score = np.where(live, np.abs(rows - mean), -1.0)
        idx = np.argpartition(score, chunk - m, axis=1)[:, chunk - m:]
        out = k.copy()
        np.put_along_axis(out, idx, SENTINEL, axis=1)
        return out.reshape(-1)

    for frame in range(args.frames):
        key_id = np.asarray(keys_of(pos))       # identity order
        for m, s in sims.items():
            if s["perm"] is None:
                s["perm"] = np.argsort(key_id, kind="stable")
            key_slot = key_id[s["perm"]]
            km = masked_keys(key_slot, m)
            dep, gat = (int(x) for x in totals_of(jnp.asarray(km)))
            if dep > c_dep or gat > c_gat:
                s["repairs"] += 1
                s["perm"] = np.argsort(key_id, kind="stable")
                km = masked_keys(key_id[s["perm"]], m)
                dep, gat = (int(x) for x in totals_of(jnp.asarray(km)))
            s["deps"].append(dep)
            s["gats"].append(gat)
            kk = km.reshape(n_chunks, chunk)
            live = kk < SENTINEL
            r = kk >> 7
            rmin = np.where(live, r, 1 << 30).min(axis=1)
            rmax = np.where(live, r, -1).max(axis=1)
            w = np.maximum(rmax - rmin, 0)
            s["span_p50"].append(int(np.median(w)))
            s["span_max"].append(int(w.max()))
        line = {"frame": frame}
        for m, s in sims.items():
            line[f"m{m}"] = {"dep": s["deps"][-1], "gat": s["gats"][-1],
                             "rep": s["repairs"],
                             "span_p50": s["span_p50"][-1],
                             "span_max": s["span_max"][-1]}
        print(json.dumps(line), flush=True)

        acc = accel(pos)
        vel = vel + acc * args.dt
        pos = pos + vel * args.dt
        vel = vel * args.damping

    summary = {m: {"repairs": s["repairs"],
                   "dep_mean": int(np.mean(s["deps"])),
                   "dep_max": int(np.max(s["deps"])),
                   "gat_mean": int(np.mean(s["gats"])),
                   "gat_max": int(np.max(s["gats"]))}
               for m, s in sims.items()}
    print(json.dumps({"summary": summary,
                      "budget_dep": c_dep, "budget_gat": c_gat}))


if __name__ == "__main__":
    main()
