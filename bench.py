"""Headline benchmark — prints ONE JSON line.

Metric: particle-steps/sec/chip on the attractor workload at 1M particles
(the reference's compute-shader default count, app.rs:117), interactive mode
(one fused Pallas kernel launch per frame, params re-fed each step — the
frame-loop shape of app.rs:202-318). vs_baseline is measured against the
BASELINE.json target of 1e10 particle-steps/sec/chip.

Methodology notes (see .claude/skills/verify/SKILL.md): on the axon platform
``block_until_ready`` does not actually block, so every timing is bracketed
by a tiny device->host readback; per-dispatch tunnel overhead (~27 ms) is
amortized by timing K launches inside one jit and reporting the marginal.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def _device_responsive(timeout_s: float = 180.0) -> bool:
    """True if the accelerator completes a trivial op within timeout.

    The axon tunnel can wedge its data plane (device_put hangs forever even
    though jax.devices() answers); without this probe a hung chip would
    stall the whole bench run.
    """
    import threading

    ok = []

    def probe():
        try:
            import jax.numpy as jnp
            _sync((jnp.ones((8, 128)) * 2.0).sum())
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main() -> None:
    import jax

    from particle_sim_tpu.utils.cache import enable as enable_compile_cache
    enable_compile_cache()

    if not _device_responsive():
        print(json.dumps({
            "metric": "particle_steps_per_sec_per_chip_1m_attractor",
            "value": 0.0,
            "unit": "particle-steps/s/chip",
            "vs_baseline": 0.0,
            "detail": {"error": "accelerator unresponsive (data-plane hang); "
                                "see memory/axon-tpu-platform-quirks"},
        }))
        return

    import jax.numpy as jnp

    import particle_sim_tpu as psim
    from particle_sim_tpu.ops import step_jnp, step_pallas

    on_tpu = jax.default_backend() == "tpu"
    n = 1_000_000
    pos_np, vel_np, col = psim.generate.generate(
        n, psim.SphereGeneration.HOLLOW
    )
    state = psim.ParticleState.from_arrays(pos_np, vel_np, col)
    cap = state.capacity
    params = psim.SimParams(
        gravity=1.0, is_mouse_dragging=True, mouse_position=(0.0, 0.0, 48.0),
        mouse_force=50.0, mouse_radius=25.0,
    )
    pv = jnp.asarray(params.pack())

    if on_tpu:
        def run(p, v, n_steps, substeps=1):
            return step_pallas.step_n_jit(p, v, pv, n_steps, substeps=substeps)
    else:  # fallback so the bench still reports off-TPU
        def run(p, v, n_steps, substeps=1):
            return step_jnp.step_n_jit(p, v, pv, n_steps * substeps)

    def timed(n_steps, substeps=1, reps=5):
        best = float("inf")
        for _ in range(reps):
            p, v = jnp.array(state.pos), jnp.array(state.vel)
            out = run(p, v, n_steps, substeps)
            _sync(out)  # includes compile on first rep
            t0 = time.perf_counter()
            out = run(*out, n_steps, substeps)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # Interactive rate: marginal cost per kernel launch (substeps=1),
    # dispatch overhead cancelled between 8 and 108 launches.
    t_small = timed(8)
    t_big = timed(108)
    dt_step = max((t_big - t_small) / 100.0, 1e-9)
    interactive_rate = cap / dt_step
    p50_frame_ms = dt_step * 1e3

    # Batch rate: fused in-kernel substeps (headless throughput mode),
    # marginal between 512 and 2048 substeps to cancel dispatch.
    t_b_small = timed(1, substeps=512)
    t_b_big = timed(1, substeps=2048)
    batch_rate = 1536 * cap / max(t_b_big - t_b_small, 1e-9)

    # 16M-particle attractor frame (BASELINE metric names 1M and 16M).
    p50_16m_ms = None
    if on_tpu:
        pos16, vel16, col16 = psim.generate.generate(
            16_000_000, psim.SphereGeneration.HOLLOW)
        st16 = psim.ParticleState.from_arrays(pos16, vel16, col16)
        del pos16, vel16, col16

        def timed16(n_steps):
            best = float("inf")
            for _ in range(2):
                p, v = jnp.array(st16.pos), jnp.array(st16.vel)
                out = step_pallas.step_n_jit(p, v, pv, n_steps)
                _sync(out)
                t0 = time.perf_counter()
                out = step_pallas.step_n_jit(*out, pv, n_steps)
                _sync(out)
                best = min(best, time.perf_counter() - t0)
            return best

        p50_16m_ms = max(timed16(12) - timed16(2), 1e-9) / 10 * 1e3
        del st16

    # Particle-mesh self-gravity frame at 1M (O(N) long-range solver —
    # the algorithmic route past the O(N^2) wall; ops/pm_pallas.py).
    pm_ms = None
    if on_tpu:
        from particle_sim_tpu.core.params import PMConfig
        from particle_sim_tpu.ops import pm_pallas

        cfg = PMConfig(softening=2.0)
        pp_vec = jnp.asarray(psim.PairwiseParams(0.05, cfg.softening).pack())

        @jax.jit
        def pm_frames(p, v, k):
            def body(_, c):
                return pm_pallas.step_pm(c[0], c[1], pv, pp_vec,
                                         jnp.asarray(cap, jnp.int32), cfg)
            return jax.lax.fori_loop(0, k, body, (p, v))

        best = float("inf")
        for _ in range(2):
            p, v = jnp.array(state.pos), jnp.array(state.vel)
            out = pm_frames(p, v, 2)
            _sync(out)
            t0 = time.perf_counter()
            out = pm_frames(out[0], out[1], 2)
            _sync(out)
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = pm_frames(out[0], out[1], 12)
            _sync(out)
            best = min(best, (time.perf_counter() - t0 - t2) / 10)
        pm_ms = best * 1e3

    # Particle-mesh self-gravity frame at 16M (BASELINE names 1M and 16M;
    # the number this repo's PM optimization passes track — see
    # docs/DESIGN.md). Guarded: a failure here must not cost the
    # headline line.
    pm16_ms = None
    if on_tpu:
        try:
            from particle_sim_tpu.ops import pm_pallas as _pmp
            from particle_sim_tpu.core.params import PMConfig as _PMC
            import jax.numpy as _jnp

            n16 = 16 * 1024 * 1024
            cfg16 = _PMC(softening=2.0)
            pos16m = jax.random.uniform(
                jax.random.PRNGKey(0), (3, n16), _jnp.float32, -45.0, 45.0)
            acc_fn = jax.jit(lambda q: _pmp.pm_accel(
                q, _jnp.int32(n16), _jnp.float32(1.0), cfg16))
            _sync(acc_fn(pos16m))
            t0 = time.perf_counter()
            for _ in range(4):
                out16 = acc_fn(pos16m)
            _sync(out16)
            pm16_ms = (time.perf_counter() - t0) / 4 * 1e3
            del pos16m, out16
        except Exception:
            pm16_ms = None

    # All-pairs O(N^2) frame at 65k (BASELINE config 3).
    pairwise_ms = None
    if on_tpu:
        from particle_sim_tpu.ops import pairwise_pallas
        import functools

        pos65, _, _ = psim.generate.generate(65536, psim.SphereGeneration.FILLED)
        st65 = psim.ParticleState.from_arrays(
            pos65, np.zeros_like(pos65), np.zeros_like(pos65))
        flat = jnp.asarray(st65.pos.reshape(3, -1))
        n65 = flat.shape[1]

        @jax.jit
        def pair_frames(f, n_active):
            def body(_, x):
                acc = pairwise_pallas.pairwise_accel(
                    x.T, x, n_active, 1.0, 0.5, tile_i=512, tile_j=1024)
                return x + acc.T * 1e-6
            return jax.lax.fori_loop(0, 5, body, f)

        best = float("inf")
        for _ in range(2):
            out = pair_frames(flat, st65.n_active)
            _sync(out)
            t0 = time.perf_counter()
            out = pair_frames(out, st65.n_active)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        pairwise_ms = best / 5 * 1e3

    value = interactive_rate
    target = 1e10  # BASELINE.json: >=1e10 particle-steps/sec/chip
    result = {
        "metric": "particle_steps_per_sec_per_chip_1m_attractor",
        "value": round(value, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(value / target, 4),
        "detail": {
            "backend": jax.default_backend(),
            "particles": cap,
            "p50_frame_time_ms": round(p50_frame_ms, 4),
            "interactive_steps_per_sec": round(1e3 / p50_frame_ms, 1),
            "batch_substep_rate": round(batch_rate, 1),
            "reference_implied_floor": 6.0e7,  # 1M @ 60 FPS (SURVEY.md §6)
            "vs_reference_floor": round(value / 6.0e7, 1),
            "all_pairs_65k_frame_ms": (
                round(pairwise_ms, 3) if pairwise_ms else None),
            "pm_self_gravity_1m_frame_ms": (
                round(pm_ms, 3) if pm_ms else None),
            "pm_self_gravity_16m_frame_ms": (
                round(pm16_ms, 3) if pm16_ms else None),
            "p50_frame_time_ms_16m": (
                round(p50_16m_ms, 3) if p50_16m_ms else None),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
