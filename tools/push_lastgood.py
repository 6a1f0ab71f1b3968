"""Merge resident-bench medians into BENCH_LASTGOOD.json.

VERDICT r4 weak 1: the resident harness (tools/resident_bench.py)
captured fresh hardware medians through tunnel weather, but the
driver's fallback record (BENCH_LASTGOOD.json, read by bench.py when
the tunnel denies it a clean pass) still dated from round 2 — so a
wedged round reported numbers predating two rounds of code. This tool
pushes MICRO_BENCH.json's medians into the fallback record with full
provenance, so the driver's fallback always reflects the newest code
that actually ran on hardware.

Only keys with >= 1 sample are touched; everything else in the record
is preserved. The headline value/vs_baseline are recomputed from the
headline median when present. Run after a resident session:

    python tools/push_lastgood.py [--dry-run]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "MICRO_BENCH.json")
LASTGOOD = os.path.join(REPO, "BENCH_LASTGOOD.json")
TARGET_RATE = 1.0e10    # BASELINE.md: particle-steps/s/chip target


def main() -> None:
    with open(MICRO) as f:
        micro = json.load(f)
    medians = micro.get("medians") or {}
    if not medians:
        print("MICRO_BENCH.json has no medians; nothing to push")
        return
    try:
        with open(LASTGOOD) as f:
            lg = json.load(f)
    except FileNotFoundError:
        lg = {"result": {
            "metric": "particle_steps_per_sec_per_chip_1m_attractor",
            "unit": "particle-steps/s/chip", "detail": {}}}
    result = lg.setdefault("result", {})
    detail = result.setdefault("detail", {})

    merged = []
    cap1 = micro.get("particles_1m")
    if "headline_1m_ms_per_step" in medians and cap1:
        ms = float(medians["headline_1m_ms_per_step"])
        result["value"] = round(cap1 / (ms * 1e-3), 1)
        result["vs_baseline"] = round(result["value"] / TARGET_RATE, 4)
        detail["p50_frame_time_ms"] = round(ms, 4)
        detail["particles"] = cap1
        merged.append("headline_1m_ms_per_step")
    for key, val in medians.items():
        if key == "headline_1m_ms_per_step":
            continue
        detail[key] = val
        merged.append(key)
    for key in ("dyn_repairs", "dyn_full_repairs"):
        if micro.get(key):
            detail["pm_persistent_16m_repairs" if key == "dyn_repairs"
                   else "pm_persistent_16m_fullsort_repairs"] = micro[key]

    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    lg["saved_at"] = now
    detail["resident_merge"] = {
        "merged_at": now,
        "micro_saved_at": micro.get("saved_at"),
        "keys": merged,
        "samples_per_key": {k: len(v) for k, v in
                            (micro.get("samples") or {}).items()},
    }
    if "--dry-run" in sys.argv:
        print(json.dumps(lg, indent=1))
        return
    with open(LASTGOOD, "w") as f:
        json.dump(lg, f, indent=1)
    print(f"pushed {len(merged)} keys into {LASTGOOD}")


if __name__ == "__main__":
    main()
