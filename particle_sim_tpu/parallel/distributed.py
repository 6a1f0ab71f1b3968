"""Multi-host (multi-slice) initialization — the DCN story.

The reference has no distributed communication at all (SURVEY.md §5); the
TPU-native equivalent is the JAX runtime itself: within a slice, collectives
ride ICI (parallel/dp.py, parallel/ring.py run unchanged on any mesh);
across slices/hosts, ``jax.distributed.initialize`` wires the DCN layer and
``jax.devices()`` becomes the global device list. This module is the thin
entry point so multi-host launches need no code changes:

    # on every host (e.g. one process per v5e-8 slice):
    from particle_sim_tpu.parallel import distributed
    distributed.initialize()            # env-driven on Cloud TPU
    mesh = distributed.global_mesh()    # 1-D dp mesh over ALL chips

Single-host (or this repo's 1-chip tunnel) is a no-op fallback, so the same
script runs everywhere. Not exercisable in this environment (one chip, no
second host) — covered by the forced-host-device mesh tests structurally.
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host runtime; False if single-process.

    With no arguments, relies on the Cloud TPU environment (JAX infers
    coordinator/process topology). Safe to call unconditionally.
    """
    global _initialized
    if _initialized:
        return True
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
        return True
    except (ValueError, RuntimeError):
        # single-process / unsupported platform: run locally
        return False


def global_mesh():
    """1-D dp mesh spanning every chip visible to this process group."""
    return make_mesh(jax.devices())


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
