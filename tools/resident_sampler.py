"""Resident headline sampler for a flapping tunnel.

Observed 2026-08-21: the axon REMOTE COMPILE service and the execution
data plane fail independently — fresh processes can hit
INVALID_ARGUMENT at compile time while already-compiled functions keep
executing, and vice versa. This process therefore (1) loops until the
headline functions COMPILE and validate once, then (2) stays resident,
attempting an execution-only timed measurement every few minutes in a
timeout-bracketed daemon thread (a wedged op strands the thread, never
the process), appending every success to MICRO_HEADLINE.json.

    nohup python tools/resident_sampler.py > /tmp/resident.log 2>&1 &
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "MICRO_HEADLINE.json")
RETRY_S = 300
ATTEMPT_TIMEOUT_S = 150


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import particle_sim_tpu as psim
    from particle_sim_tpu.ops import step_pallas

    pos, vel, col = psim.generate.generate(
        1_000_000, psim.SphereGeneration.HOLLOW)
    st = psim.ParticleState.from_arrays(pos, vel, col)
    cap = st.capacity
    pv = jnp.asarray(psim.SimParams(
        gravity=1.0, is_mouse_dragging=True, mouse_position=(0., 0., 48.),
        mouse_force=50.0, mouse_radius=25.0).pack())

    def attempt(out_list):
        """One timed (k=8, k=108) marginal with fresh buffers and
        per-launch readbacks; appends ms/step to out_list."""
        def timed(k):
            p, v = jnp.array(st.pos), jnp.array(st.vel)
            o = step_pallas.step_n_jit(p, v, pv, k)
            float(np.asarray(o[0].ravel()[1]))
            p, v = jnp.array(st.pos), jnp.array(st.vel)
            t0 = time.perf_counter()
            o = step_pallas.step_n_jit(p, v, pv, k)
            float(np.asarray(o[0].ravel()[1]))
            return time.perf_counter() - t0

        t8 = timed(8)
        t1008 = timed(1008)
        # 1000-step marginal: ~67 ms of device work at the r02 rate —
        # well above the tunnel's launch/readback jitter (a 100-step
        # marginal measured 2026-08-21 drowned in it)
        dt = (t1008 - t8) / 1000.0
        if dt > 1e-6:                  # drop jitter-dominated samples
            out_list.append(dt)

    # phase 1: compile+validate once (retry until a compile window opens)
    while True:
        box = []
        th = threading.Thread(target=attempt, args=(box,), daemon=True)
        th.start()
        th.join(600)          # first success includes the ~20 s compiles
        if box:
            print(f"compiled + first sample {box[0]*1e3:.4f} ms/step",
                  flush=True)
            break
        print("compile window closed; retrying", flush=True)
        time.sleep(RETRY_S)

    samples = list(box)

    def flush():
        with open(OUT, "w") as f:
            json.dump({
                "metric": "micro_headline_1m_attractor",
                "samples_ms_per_step": [round(s * 1e3, 4) for s in samples],
                "particles": cap,
                "rate_per_chip": cap / float(np.median(samples)),
                "saved_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
            }, f, indent=1)

    flush()
    # phase 2: resident execution-only sampling
    while True:
        time.sleep(RETRY_S)
        box = []
        th = threading.Thread(target=attempt, args=(box,), daemon=True)
        th.start()
        th.join(ATTEMPT_TIMEOUT_S)
        if box:
            samples.extend(box)
            flush()
            print(f"sample {box[0]*1e3:.4f} ms/step "
                  f"({len(samples)} total)", flush=True)
        else:
            print("execution window closed (thread stranded)", flush=True)


if __name__ == "__main__":
    main()
