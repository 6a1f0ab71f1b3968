"""Headline benchmark — prints ONE JSON line.

Metric: particle-steps/sec/chip on the attractor workload at 1M particles
(the reference's compute-shader default count, app.rs:117), interactive mode
(one fused Pallas kernel launch per frame, params re-fed each step — the
frame-loop shape of app.rs:202-318). vs_baseline is measured against the
BASELINE.json target of 1e10 particle-steps/sec/chip.

Methodology notes (see .claude/skills/verify/SKILL.md): on the axon platform
``block_until_ready`` does not actually block, so every timing is bracketed
by a tiny device->host readback; per-dispatch tunnel overhead is amortized
by timing K launches inside one jit and reporting the marginal. The headline
is the MEDIAN over ``REPS_K`` independent marginal measurements (samples in
``detail``).

Robustness (the axon data plane can wedge for 20 min - 3 h; jax.devices()
still answers while every real op hangs forever):
  * the responsiveness probe retries with backoff before giving up;
  * all measurements run in a daemon worker thread that fills the result
    dict PROGRESSIVELY, so a mid-run wedge keeps every stage already done;
  * each stage's failure is recorded by name in ``detail.errors`` instead
    of silently mapping to null;
  * a fully-successful run persists its result to ``BENCH_LASTGOOD.json``;
    a wedged run reports that file under ``detail.fallback_last_good``;
  * every exit path ends in ``os._exit(0)`` AFTER printing the JSON line —
    a thread stuck inside a wedged device op must never abort interpreter
    teardown (round 1 died rc 134 exactly that way).
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

METRIC = "particle_steps_per_sec_per_chip_1m_attractor"
TARGET = 1e10  # BASELINE.json: >=1e10 particle-steps/sec/chip
REPS_K = 10    # POST-WARMUP marginal repetitions; headline = median
LASTGOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LASTGOOD.json")
WORKER_DEADLINE_S = 2400.0   # whole measurement suite budget (r02 full
                             # run was 1433 s; round-4 adds the multi-
                             # level and G=256 persistent legs)
PROBE_SCHEDULE_S = (90.0, 180.0, 270.0)   # retry-with-backoff windows


def _sync(x):
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def _emit(result: dict) -> None:
    """Print the one JSON line and hard-exit (skips teardown of any thread
    still wedged inside a device op)."""
    print(json.dumps(result), flush=True)
    os._exit(0)


def _load_lastgood():
    try:
        with open(LASTGOOD) as f:
            return json.load(f)
    except Exception:
        return None


def _save_lastgood(result: dict) -> None:
    try:
        with open(LASTGOOD, "w") as f:
            json.dump({"saved_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                 time.gmtime()),
                       "result": result}, f, indent=1)
    except Exception:
        pass


def _probe_once(timeout_s: float) -> bool:
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


def _device_responsive() -> bool:
    """Probe with retry + backoff: a wedge sometimes clears within minutes
    (first op after recovery takes ~70-80 s, so windows must exceed that)."""
    for i, window in enumerate(PROBE_SCHEDULE_S):
        if _probe_once(window):
            return True
        if i + 1 < len(PROBE_SCHEDULE_S):
            time.sleep(20.0)
    return False


# ---------------------------------------------------------------------------
# measurement stages (run inside the worker thread; fill `res` progressively)
# ---------------------------------------------------------------------------

def _measure(res: dict) -> None:
    import jax
    import jax.numpy as jnp

    import particle_sim_tpu as psim
    from particle_sim_tpu.ops import step_jnp, step_pallas

    detail = res["detail"]
    errors = detail["errors"]
    on_tpu = jax.default_backend() == "tpu"
    detail["backend"] = jax.default_backend()

    n = 1_000_000
    pos_np, vel_np, col = psim.generate.generate(
        n, psim.SphereGeneration.HOLLOW)
    state = psim.ParticleState.from_arrays(pos_np, vel_np, col)
    cap = state.capacity
    detail["particles"] = cap
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

    def marginal_samples(small, big, reps, substeps=1):
        """Per-rep (t_big - t_small) marginal seconds; dispatch cancels.
        Warms up (compile + one full timed shape pass) BEFORE collecting,
        so every returned sample is clean — round-2 reported the compile-
        contaminated first rep inside the sample list.

        Per-rep fault tolerance (observed 2026-08-21, twice): a
        marginally-healthy tunnel executes SINGLE launches fine but
        drops some launches in a burst with INVALID_ARGUMENT — which
        used to kill the whole headline on the first dropped launch.
        Now each rep runs from fresh input buffers, a failed rep is
        dropped (counted in detail.headline_dropped_reps), and the
        headline is the median of the reps that survived (>= 3)."""
        p, v = jnp.array(state.pos), jnp.array(state.vel)
        for n_steps in (small, big, small, big):  # compile + cache settle
            p, v = run(p, v, n_steps, substeps)
            _sync((p, v))   # eager: don't let a burst build up
        out = []
        dropped = 0
        attempts = 0
        while len(out) < reps and attempts < 3 * reps:
            attempts += 1
            try:
                w = run(jnp.array(state.pos), jnp.array(state.vel),
                        small, substeps)
                _sync(w)
                t0 = time.perf_counter()
                w = run(*w, small, substeps)
                _sync(w)
                t_small = time.perf_counter() - t0
                t0 = time.perf_counter()
                w = run(*w, big, substeps)
                _sync(w)
                t_big = time.perf_counter() - t0
                out.append(max(t_big - t_small, 1e-9))
            except Exception:   # dropped launch: cool off, fresh buffers
                dropped += 1
                time.sleep(3.0)
        detail["headline_dropped_reps"] = dropped
        if len(out) < 3:
            raise RuntimeError(
                f"only {len(out)} clean headline reps out of "
                f"{attempts} attempts ({dropped} dropped)")
        return out

    # -- headline: interactive marginal cost per kernel launch ------------
    # Persistent-compile-cache poisoning (observed 2026-08-21): cached
    # executables written under an older runtime state can be REJECTED
    # by the tunnel after a platform update — the load fails in seconds
    # with INVALID_ARGUMENT while fresh compiles of the same program
    # succeed. On any headline failure, disable the cache, clear the
    # in-process caches, and retry once with fresh compiles.
    try:
        samples = marginal_samples(8, 108, REPS_K)
    except Exception as e:
        errors["headline_first_try"] = repr(e)[:200]
        jax.config.update("jax_compilation_cache_dir", None)
        jax.clear_caches()
        samples = marginal_samples(8, 108, REPS_K)
    dt_step = float(np.median(samples)) / 100.0
    res["value"] = cap / dt_step
    detail["p50_frame_time_ms"] = round(dt_step * 1e3, 4)
    detail["interactive_steps_per_sec"] = round(1.0 / dt_step, 1)
    detail["headline_reps_k"] = REPS_K
    detail["headline_samples_ms_per_step"] = [
        round(s / 100.0 * 1e3, 4) for s in samples]
    # spread over the CLEAN samples (round-2 verdict item 7: the 19.0 vs
    # 14.96 G same-day runs were 3 clean samples each — report the
    # min/median/max so tunnel-day variance is visible in every record)
    detail["headline_ms_min_med_max"] = [
        round(float(f(samples)) / 100.0 * 1e3, 4)
        for f in (np.min, np.median, np.max)]
    detail["reference_implied_floor"] = 6.0e7  # 1M @ 60 FPS (SURVEY.md §6)
    detail["vs_reference_floor"] = round(res["value"] / 6.0e7, 1)

    # -- batch rate: fused in-kernel substeps ------------------------------
    try:
        # marginal between 512 and 2048 substeps inside ONE launch
        # (first rep of each shape includes its compile, then best-of-3)
        def batch_time(substeps):
            best = float("inf")
            for _ in range(3):
                p, v = jnp.array(state.pos), jnp.array(state.vel)
                w = run(p, v, 1, substeps)
                _sync(w)
                t0 = time.perf_counter()
                w = run(*w, 1, substeps)
                _sync(w)
                best = min(best, time.perf_counter() - t0)
            return best
        detail["batch_substep_rate"] = round(
            1536 * cap / max(batch_time(2048) - batch_time(512), 1e-9), 1)
    except Exception as e:  # noqa: BLE001 — record, keep benching
        errors["batch"] = repr(e)[:200]

    if not on_tpu:
        return

    # -- 16M attractor frame (BASELINE names 1M and 16M) -------------------
    try:
        pos16, vel16, col16 = psim.generate.generate(
            16_000_000, psim.SphereGeneration.HOLLOW)
        st16 = psim.ParticleState.from_arrays(pos16, vel16, col16)
        del pos16, vel16, col16

        def timed16(n_steps):
            best = float("inf")
            for _ in range(2):
                p, v = jnp.array(st16.pos), jnp.array(st16.vel)
                w = step_pallas.step_n_jit(p, v, pv, n_steps)
                _sync(w)
                t0 = time.perf_counter()
                w = step_pallas.step_n_jit(*w, pv, n_steps)
                _sync(w)
                best = min(best, time.perf_counter() - t0)
            return best

        detail["p50_frame_time_ms_16m"] = round(
            max(timed16(12) - timed16(2), 1e-9) / 10 * 1e3, 3)
        del st16
    except Exception as e:
        errors["attractor_16m"] = repr(e)[:200]

    # -- particle-mesh self-gravity frame at 1M ----------------------------
    try:
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
            w = pm_frames(p, v, 2)
            _sync(w)
            t0 = time.perf_counter()
            w = pm_frames(w[0], w[1], 2)
            _sync(w)
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            w = pm_frames(w[0], w[1], 12)
            _sync(w)
            best = min(best, (time.perf_counter() - t0 - t2) / 10)
        detail["pm_self_gravity_1m_frame_ms"] = round(best * 1e3, 3)
        # persistent-sorted mode at 1M — the realistic interactive
        # self-gravity configuration (Engine --pm-persist)
        try:
            from particle_sim_tpu.ops import pm_persist as _pmp1

            from particle_sim_tpu.ops import pm as _pm_mod

            st1 = _pmp1.init_sorted(state.pos.reshape(3, -1),
                                    jnp.asarray(cap, jnp.int32), cfg)
            # Hockney kernels as runtime args, not program constants
            # (r5: baked kernels broke the G=256 compile RPC; smaller
            # programs compile faster at every grid)
            bk1 = _pm_mod.base_kernels_device(cfg, cfg.softening)

            # in-jit frame loop (same dispatch-cancelling pattern as
            # pm_frames above — per-dispatch overhead is ~5 ms on the
            # axon tunnel, comparable to the frame itself at 1M)
            @jax.jit
            def persist_frames(s, k, bk):
                def body(_, c):
                    return _pmp1.step_sorted(
                        c, pv, pp_vec, jnp.asarray(cap, jnp.int32), cfg,
                        base_kernels=bk)
                return jax.lax.fori_loop(0, k, body, s)

            best_p = float("inf")
            for _ in range(2):
                st1 = persist_frames(st1, 2, bk1)
                _sync(st1.pos)
                t0 = time.perf_counter()
                st1 = persist_frames(st1, 2, bk1)
                _sync(st1.pos)
                t2 = time.perf_counter() - t0
                t0 = time.perf_counter()
                st1 = persist_frames(st1, 12, bk1)
                _sync(st1.pos)
                best_p = min(best_p, (time.perf_counter() - t0 - t2) / 10)
            detail["pm_persistent_1m_frame_ms"] = round(best_p * 1e3, 3)
        except Exception as e:
            errors["pm_persist_1m"] = repr(e)[:200]
    except Exception as e:
        errors["pm_1m"] = repr(e)[:200]

    # -- particle-mesh at 16M (the number the PM optimizations track) ------
    try:
        from particle_sim_tpu.core.params import PMConfig as _PMC
        from particle_sim_tpu.ops import pm_pallas as _pmp

        n16 = 16 * 1024 * 1024
        cfg16 = _PMC(softening=2.0)
        pos16m = jax.random.uniform(
            jax.random.PRNGKey(0), (3, n16), jnp.float32, -45.0, 45.0)
        acc_fn = jax.jit(lambda q: _pmp.pm_accel(
            q, jnp.int32(n16), jnp.float32(1.0), cfg16))
        _sync(acc_fn(pos16m))
        t0 = time.perf_counter()
        for _ in range(4):
            out16 = acc_fn(pos16m)
        _sync(out16)
        detail["pm_self_gravity_16m_frame_ms"] = round(
            (time.perf_counter() - t0) / 4 * 1e3, 3)
        # persistent cell-sorted mode (ops/pm_persist.py): steady accel
        # (result consumed — returning only the state lets XLA dead-code
        # the whole solver) + dynamic integrated frames with repairs
        try:
            from particle_sim_tpu.ops import pm_persist as _pmper
            from particle_sim_tpu.render import raster as _ras

            # carry the packed display color (col24) — the flagship
            # interactive config: repairs pay one extra sort operand,
            # every rendered frame skips the identity un-sort entirely
            col24_16 = _ras.pack_col24(jnp.clip(pos16m / 90.0 + 0.5, 0, 1))
            st_p = _pmper.init_sorted(pos16m, jnp.int32(n16), cfg16,
                                      col24=col24_16)
            from particle_sim_tpu.ops import pm as _pm16
            bk16 = _pm16.base_kernels_device(cfg16, cfg16.softening)

            # steady-state accel in an in-jit loop (result consumed via
            # the carried sum so XLA can't dead-code the solver); one
            # timed 1-frame dispatch cancels the dispatch overhead
            @jax.jit
            def steady_frames(s, k, bk):
                def body(_, c):
                    s2, a = _pmper.accel_sorted(c[0], jnp.float32(1.0),
                                                cfg16, base_kernels=bk)
                    return (s2, c[1] + a.sum())
                return jax.lax.fori_loop(0, k, body, (s, jnp.float32(0.0)))

            st_p, tot = steady_frames(st_p, 1, bk16)
            _sync(tot)
            t0 = time.perf_counter()
            st_p, tot = steady_frames(st_p, 1, bk16)
            _sync(tot)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            st_p, tot = steady_frames(st_p, 5, bk16)
            _sync(tot)
            detail["pm_persistent_16m_steady_ms"] = round(
                (time.perf_counter() - t0 - t1) / 4 * 1e3, 3)
            pp16 = jnp.asarray(psim.PairwiseParams(1.0, 2.0).pack())
            # gravity-only collapse (no mouse attractor): the documented
            # dynamic scene — drift comes from the self-gravity infall
            pv16 = jnp.asarray(psim.SimParams(delta_time=0.016,
                                              gravity=0.0).pack())
            # dynamic frames in ONE in-jit loop dispatch (repairs fire on
            # data-dependent frames, so no 2-point cancellation — the one
            # ~5 ms dispatch amortizes to <0.5 ms/frame)
            @jax.jit
            def dyn_frames(s, k, bk):
                def body(_, c):
                    return _pmper.step_sorted(c, pv16, pp16,
                                              jnp.int32(n16), cfg16,
                                              base_kernels=bk)
                return jax.lax.fori_loop(0, k, body, s)

            r0 = int(st_p.resorts)
            st_p = dyn_frames(st_p, 1, bk16)
            _sync(st_p.pos)
            t0 = time.perf_counter()
            k_dyn = 12
            st_p = dyn_frames(st_p, k_dyn, bk16)
            _sync(st_p.pos)
            detail["pm_persistent_16m_dynamic_ms"] = round(
                (time.perf_counter() - t0) / k_dyn * 1e3, 3)
            detail["pm_persistent_16m_repairs"] = (
                f"{int(st_p.resorts) - r0}/{k_dyn + 1}")

            # -- flagship 16M interactive frame (round-2 verdict item 1c):
            # persist step + compact render + RGBA8 + HOST FETCH — the
            # exact per-frame work of `--count 16777216 --pm-persist
            # --view-mode raster` through app/server.py
            try:
                from particle_sim_tpu.render import raster_compact as _rc
                from particle_sim_tpu.render.camera import Camera as _Cam

                vp16 = jnp.asarray(
                    _Cam(aspect=1920.0 / 1080.0).view_proj())

                # render-only leg, dispatch-cancelled in-jit loop
                @jax.jit
                def render16_frames(s, k):
                    col = _ras.unpack_col24(s.col24)
                    def body(_, acc):
                        fb = _rc.render(s.pos + acc * 1e-20, s.vel, col,
                                        pv16, vp16, jnp.int32(n16),
                                        width=1920, height=1080)
                        return acc + fb[0, 0, 0]
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

                _sync(render16_frames(st_p, 1))
                t0 = time.perf_counter()
                _sync(render16_frames(st_p, 1))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                _sync(render16_frames(st_p, 5))
                detail["raster_16m_1080p_ms"] = round(
                    max(time.perf_counter() - t0 - t1, 1e-9) / 4 * 1e3, 3)

                # interactive frame = step dispatch + render dispatch —
                # the server's exact per-frame shape (engine.step, then
                # render_frame_device), and it reuses dyn_frames'
                # already-compiled step (a fused step+render jit costs
                # ~7 min of extra Mosaic compile for no semantic gain)
                @jax.jit
                def render_rgba16(s):
                    fb = _rc.render(s.pos, s.vel,
                                    _ras.unpack_col24(s.col24),
                                    pv16, vp16, jnp.int32(n16),
                                    width=1920, height=1080)
                    return _ras.to_rgba8(fb)

                rgba = render_rgba16(st_p)
                _sync(rgba)  # compile
                ts = []
                for _ in range(8):
                    t0 = time.perf_counter()
                    st_p = dyn_frames(st_p, 1, bk16)
                    rgba = render_rgba16(st_p)
                    _sync(rgba)   # 1-element readback: device-complete
                    ts.append(time.perf_counter() - t0)
                detail["interactive_16m_frame_ms"] = round(
                    float(np.median(ts)) * 1e3, 3)
                detail["interactive_16m_fps"] = round(
                    1.0 / float(np.median(ts)), 1)
                # the full 8.3 MB RGBA fetch is ~390 ms on the axon dev
                # tunnel (~21 MB/s) vs <1 ms over a real host's PCIe —
                # report it separately so the tunnel doesn't masquerade
                # as framework cost
                t0 = time.perf_counter()
                np.asarray(rgba)
                detail["frame_fetch_1080p_ms_tunnel"] = round(
                    (time.perf_counter() - t0) * 1e3, 1)
            except Exception as e:
                errors["interactive_16m"] = repr(e)[:200]

            # -- stream pack at 16M: device shade/pack (from the sorted
            # persist planes) + host f16 interleave
            try:
                from particle_sim_tpu.io import packer as _pk

                col16f = jnp.clip(st_p.pos / 90.0 + 0.5, 0, 1)
                packed16 = _ras.pack_points_jit(
                    st_p.pos, st_p.vel, col16f, pv16, jnp.int32(n16))
                _sync(packed16)
                t0 = time.perf_counter()
                for _ in range(4):
                    packed16 = _ras.pack_points_jit(
                        st_p.pos, st_p.vel, col16f, pv16, jnp.int32(n16))
                _sync(packed16)
                detail["stream_pack_16m_device_ms"] = round(
                    (time.perf_counter() - t0) / 4 * 1e3, 3)
                # host interleave cost is data-independent (memory-bound
                # copy); synthesize host arrays instead of pulling 256 MB
                # through the tunnel
                hp = np.random.rand(3, n16).astype(np.float32)
                hc = np.random.randint(0, 255, (n16, 4), dtype=np.uint8)
                _pk.pack_f16(hp, hc)  # warm: first call builds/loads the lib
                t0 = time.perf_counter()
                for _ in range(2):
                    buf16 = _pk.pack_f16(hp, hc)
                detail["stream_pack_16m_host_ms"] = round(
                    (time.perf_counter() - t0) / 2 * 1e3, 3)
                del hp, hc, buf16, packed16
            except Exception as e:
                errors["stream_pack_16m"] = repr(e)[:200]

            # two-level refinement riding the SAME persistent order
            # (sort-free fine level, ops/pm_persist.py two-level mode)
            try:
                from particle_sim_tpu.ops import pm2 as _pm2p

                cfg2p = _pm2p.PM2Config(window_min=None, window_size=32.0,
                                        softening=0.5)
                ker2p = _pm2p.fine_kernels(cfg16, cfg2p)

                @jax.jit
                def pm2_frames(s, k, ker, bk):
                    def body(_, c):
                        s2, a = _pmper.accel_sorted(
                            c[0], jnp.float32(1.0), cfg16,
                            cfg2=cfg2p, kernels=ker, base_kernels=bk)
                        return (s2, c[1] + a.sum())
                    return jax.lax.fori_loop(0, k, body,
                                             (s, jnp.float32(0.0)))

                # two warmup frames: the first migrates into the
                # segmented order (one repair), the second settles
                st_p, tot = pm2_frames(st_p, 2, ker2p, bk16)
                _sync(tot)
                t0 = time.perf_counter()
                st_p, tot = pm2_frames(st_p, 1, ker2p, bk16)
                _sync(tot)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                st_p, tot = pm2_frames(st_p, 5, ker2p, bk16)
                _sync(tot)
                detail["pm2_persistent_16m_steady_ms"] = round(
                    (time.perf_counter() - t0 - t1) / 4 * 1e3, 3)
            except Exception as e:
                errors["pm2_persist_16m"] = repr(e)[:200]

            # MULTI-level (two nested windows) riding the persistent
            # k+1-class order (round-4: pm_persist.accel_sorted_multi)
            try:
                from particle_sim_tpu.ops import pm2 as _pm2n

                cfgs_n = (_pm2n.PM2Config(window_min=None,
                                          window_size=32.0, softening=0.5),
                          _pm2n.PM2Config(window_min=None,
                                          window_size=8.0, softening=0.2))
                ker_n = _pm2n.levels_kernels(cfg16, cfgs_n)
                st_n = st_p._replace(fine_b=jnp.full((2,), st_p.pos.shape[1],
                                                     jnp.int32))

                @jax.jit
                def pmn_frames(s, k, ker, bk):
                    def body(_, c):
                        s2, a = _pmper.accel_sorted_multi(
                            c[0], jnp.float32(1.0), cfg16, cfgs_n,
                            kernels=ker, base_kernels=bk)
                        return (s2, c[1] + a.sum())
                    return jax.lax.fori_loop(0, k, body,
                                             (s, jnp.float32(0.0)))

                st_n, tot = pmn_frames(st_n, 2, ker_n, bk16)  # migrate + settle
                _sync(tot)
                t0 = time.perf_counter()
                st_n, tot = pmn_frames(st_n, 1, ker_n, bk16)
                _sync(tot)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                st_n, tot = pmn_frames(st_n, 5, ker_n, bk16)
                _sync(tot)
                detail["pmn_persistent_16m_steady_ms"] = round(
                    (time.perf_counter() - t0 - t1) / 4 * 1e3, 3)
                del st_n
            except Exception as e:
                errors["pmn_persist_16m"] = repr(e)[:200]
        except Exception as e:
            errors["pm_persist_16m"] = repr(e)[:200]

        # persistent mode at grid 256^3 (round-4: grid un-pinning) —
        # isolated Hockney at G=256 solves on a 512^3 doubled grid
        try:
            from particle_sim_tpu.ops import pm_persist as _pmper2

            cfg256 = _PMC(softening=2.0, grid=256)
            st_256 = _pmper2.init_sorted(pos16m, jnp.int32(n16), cfg256)
            # kernels as runtime args are MANDATORY here: baked G=256
            # kernels are ~1.6 GB of program constants and break the
            # compile RPC (r5: strands at 900/2100 s + a broken pipe)
            from particle_sim_tpu.ops import pm as _pm256
            bk256 = _pm256.base_kernels_device(cfg256, cfg256.softening)

            @jax.jit
            def steady256(s, k, bk):
                def body(_, c):
                    s2, a = _pmper2.accel_sorted(c[0], jnp.float32(1.0),
                                                 cfg256, base_kernels=bk)
                    return (s2, c[1] + a.sum())
                return jax.lax.fori_loop(0, k, body, (s, jnp.float32(0.0)))

            st_256, tot = steady256(st_256, 1, bk256)
            _sync(tot)
            t0 = time.perf_counter()
            st_256, tot = steady256(st_256, 1, bk256)
            _sync(tot)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            st_256, tot = steady256(st_256, 3, bk256)
            _sync(tot)
            detail["pm_persistent_16m_g256_steady_ms"] = round(
                (time.perf_counter() - t0 - t1) / 2 * 1e3, 3)
            del st_256
        except Exception as e:
            errors["pm_persist_g256"] = repr(e)[:200]
        del pos16m
    except Exception as e:
        errors["pm_16m"] = repr(e)[:200]

    # -- two-level PM (fine-softened window) at 1M -------------------------
    try:
        from particle_sim_tpu.core.params import PMConfig as _PMC2
        from particle_sim_tpu.ops import pm2 as _pm2

        n2 = 1_048_576
        rng2 = np.random.default_rng(0)
        clump = (rng2.normal(size=(n2 // 2, 3)) * 2.0
                 + np.array([5, 4, -3])).astype(np.float32)
        halo = (rng2.normal(size=(n2 - n2 // 2, 3)) * 20.0).astype(np.float32)
        posc = jnp.asarray(np.clip(
            np.concatenate([clump, halo]), -60, 60).T.copy())
        cfgc = _PMC2(softening=3.0)
        cfg2 = _pm2.PM2Config(window_min=None, window_size=32.0,
                              softening=0.75)
        # fine kernels as jit ARGUMENTS (docs/DESIGN.md: remote-compile 413)
        ker = _pm2.fine_kernels(cfgc, cfg2)

        # in-jit frame loop (input must depend on the carry or XLA
        # hoists the loop-invariant accel out); dispatch-cancelled
        @jax.jit
        def pm2_1m_frames(q, k, kr):
            def body(_, x):
                acc = _pm2.pm2_accel(x, jnp.int32(n2), jnp.float32(1.0),
                                     cfgc, cfg2, kernels=kr)
                return x + acc * 1e-9
            return jax.lax.fori_loop(0, k, body, q)

        posc = pm2_1m_frames(posc, 1, ker)
        _sync(posc)
        t0 = time.perf_counter()
        posc = pm2_1m_frames(posc, 1, ker)
        _sync(posc)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        posc = pm2_1m_frames(posc, 5, ker)
        _sync(posc)
        detail["pm2_two_level_1m_frame_ms"] = round(
            (time.perf_counter() - t0 - t1) / 4 * 1e3, 3)
        del posc
    except Exception as e:
        errors["pm2_1m"] = repr(e)[:200]

    # -- window-EXACT correction (ops/pmx.py) full-stack frame at 1M -------
    # coarse PM + the 65k-capacity exact window: two passes of the
    # all-pairs kernel over the compacted member buffer + the flag-sort/
    # un-sort each way (the per-frame path; the persistent slice path is
    # covered by the resident harness). Window sized so the uniform
    # scene fills ~46k of the 65k budget.
    try:
        from particle_sim_tpu.core.params import (PMConfig as _PMCX,
                                                  PairwiseParams as _PWX)
        from particle_sim_tpu.ops import pmx as _pmx

        nx = 1_048_576
        posx = jax.random.uniform(jax.random.PRNGKey(7), (3, nx),
                                  jnp.float32, -45.0, 45.0)
        velx = jnp.zeros_like(posx)
        cfgx_pm = _PMCX(softening=2.0)
        cfgx = _pmx.PMXConfig(window_size=32.0, softening=0.5,
                              capacity=65536)
        ppx = jnp.asarray(_PWX(1.0, 2.0).pack())
        pvx = jnp.asarray(psim.SimParams(delta_time=0.004,
                                         gravity=0.0).pack())

        @jax.jit
        def pmx_frames(p, v, k):
            def body(_, c):
                p2, v2, _ = _pmx.step_pmx(c[0], c[1], pvx, ppx,
                                          jnp.int32(nx), cfgx_pm, (),
                                          cfgx)
                return (p2, v2)
            return jax.lax.fori_loop(0, k, body, (p, v))

        p_, v_ = pmx_frames(posx, velx, 1)
        _sync(p_)
        t0 = time.perf_counter()
        p_, v_ = pmx_frames(p_, v_, 1)
        _sync(p_)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        p_, v_ = pmx_frames(p_, v_, 4)
        _sync(p_)
        detail["pmx_1m_frame_ms"] = round(
            (time.perf_counter() - t0 - t1) / 3 * 1e3, 3)
        del posx, velx, p_, v_
    except Exception as e:
        errors["pmx_1m"] = repr(e)[:200]

    # -- all-pairs O(N^2) frame at 65k (BASELINE config 3) ------------------
    try:
        from particle_sim_tpu.ops import pairwise_pallas

        pos65, _, _ = psim.generate.generate(
            65536, psim.SphereGeneration.FILLED)
        st65 = psim.ParticleState.from_arrays(
            pos65, np.zeros_like(pos65), np.zeros_like(pos65))
        flat = jnp.asarray(st65.pos.reshape(3, -1))

        @jax.jit
        def pair_frames(f, n_active):
            def body(_, x):
                acc = pairwise_pallas.pairwise_accel(
                    x.T, x, n_active, 1.0, 0.5, tile_i=512, tile_j=1024)
                return x + acc.T * 1e-6
            return jax.lax.fori_loop(0, 5, body, f)

        best = float("inf")
        for _ in range(2):
            w = pair_frames(flat, st65.n_active)
            _sync(w)
            t0 = time.perf_counter()
            w = pair_frames(w, st65.n_active)
            _sync(w)
            best = min(best, time.perf_counter() - t0)
        detail["all_pairs_65k_frame_ms"] = round(best / 5 * 1e3, 3)
    except Exception as e:
        errors["pairwise_65k"] = repr(e)[:200]

    # -- headless raster: 1M points -> 1080p -------------------------------
    try:
        from particle_sim_tpu.render import camera as cam_lib
        from particle_sim_tpu.render import raster_sorted

        cam = cam_lib.Camera(aspect=1920.0 / 1080.0)
        vp = jnp.asarray(cam.view_proj())
        pos_j, vel_j = jnp.array(state.pos), jnp.array(state.vel)
        col_j = jnp.array(state.init_color)
        n_act = jnp.asarray(cap, jnp.int32)

        @jax.jit
        def frames(k):
            # the render input must depend on the loop carry or XLA hoists
            # the whole (loop-invariant) render out of the fori_loop
            def body(_, acc):
                fb = raster_sorted.render(pos_j + acc * 1e-20, vel_j, col_j,
                                          pv, vp, n_act,
                                          width=1920, height=1080)
                return acc + fb[0, 0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        _sync(frames(1))
        t0 = time.perf_counter()
        _sync(frames(5))
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(frames(1))
        t1 = time.perf_counter() - t0
        detail["raster_1m_1080p_ms"] = round(max(t5 - t1, 1e-9) / 4 * 1e3, 3)
    except Exception as e:
        errors["raster_1m"] = repr(e)[:200]

    # -- stream pack: device shading/pack + host f16 interleave ------------
    try:
        from particle_sim_tpu.io import packer
        from particle_sim_tpu.render import raster

        pos_j, vel_j = jnp.array(state.pos), jnp.array(state.vel)
        col_j = jnp.array(state.init_color)
        packed = raster.pack_points_jit(pos_j, vel_j, col_j, pv, cap)
        _sync(packed)
        t0 = time.perf_counter()
        for _ in range(4):
            packed = raster.pack_points_jit(pos_j, vel_j, col_j, pv, cap)
        _sync(packed)
        detail["stream_pack_1m_device_ms"] = round(
            (time.perf_counter() - t0) / 4 * 1e3, 3)
        ppos = np.asarray(packed[0])
        prgba = np.asarray(packed[1])
        t0 = time.perf_counter()
        for _ in range(4):
            buf = packer.pack_f16(ppos, prgba)
        t_host = (time.perf_counter() - t0) / 4 * 1e3
        detail["stream_pack_1m_host_ms"] = round(t_host, 3)
        detail["stream_pack_native"] = packer.have_native()
        del buf
    except Exception as e:
        errors["stream_pack"] = repr(e)[:200]


def main() -> None:
    from particle_sim_tpu.utils.cache import enable as enable_compile_cache
    enable_compile_cache()

    if not _device_responsive():
        detail = {"error": "accelerator unresponsive after "
                           f"{len(PROBE_SCHEDULE_S)} probe attempts "
                           f"({'+'.join(str(int(s)) for s in PROBE_SCHEDULE_S)}s); "
                           "see memory/axon-tpu-tunnel-and-sort-costs"}
        lg = _load_lastgood()
        if lg:
            detail["fallback_last_good"] = lg
        _emit({"metric": METRIC, "value": 0.0,
               "unit": "particle-steps/s/chip", "vs_baseline": 0.0,
               "detail": detail})

    res = {"value": None, "detail": {"errors": {}}}

    def _measure_guarded(res):
        # the headline stage ran unguarded before: a failure there (OOM
        # in generate, a compile error) died silently with errors == {},
        # indistinguishable from a wedge — record it by name instead
        try:
            _measure(res)
        except BaseException as e:  # noqa: BLE001 — record, then emit
            res["detail"]["errors"]["headline"] = repr(e)[:300]

    worker = threading.Thread(target=_measure_guarded, args=(res,),
                              daemon=True)
    t_start = time.time()
    worker.start()
    worker.join(WORKER_DEADLINE_S)
    detail = res["detail"]
    if worker.is_alive():
        detail["errors"]["wedge"] = (
            f"measurement thread still running at the {WORKER_DEADLINE_S:.0f}s "
            "deadline (mid-run data-plane wedge); partial results kept")
    detail["bench_wall_s"] = round(time.time() - t_start, 1)

    value = res["value"]
    if value is None:
        lg = _load_lastgood()
        if lg:
            detail["fallback_last_good"] = lg
        # the resident samplers (tools/resident_sampler.py) measure
        # through tunnel states this process can't survive — attach
        # their records so a failed bench still carries the round's
        # real numbers
        import glob
        here = os.path.dirname(os.path.abspath(__file__))
        for path in sorted(glob.glob(os.path.join(here, "MICRO_*.json"))):
            try:
                with open(path) as f:
                    key = os.path.basename(path).rsplit(".", 1)[0].lower()
                    detail[key] = json.load(f)
            except Exception:
                pass
        _emit({"metric": METRIC, "value": 0.0,
               "unit": "particle-steps/s/chip", "vs_baseline": 0.0,
               "detail": detail})

    result = {"metric": METRIC, "value": round(value, 1),
              "unit": "particle-steps/s/chip",
              "vs_baseline": round(value / TARGET, 4),
              "detail": detail}
    # refresh the fallback record whenever the HEADLINE is real — a
    # tunnel-era run with a valid headline and a few errored legs is
    # still newer truth than a record from two rounds ago (VERDICT r4
    # weak 1: the fallback must not predate the code); the stored
    # detail carries detail.errors for transparency
    if value and value > 0:
        _save_lastgood(result)
    _emit(result)


if __name__ == "__main__":
    main()
