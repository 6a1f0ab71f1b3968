"""Checkpoint roundtrip and CLI driver end-to-end (CPU backend)."""

import json
import os

import numpy as np
import pytest

from particle_sim_tpu.core.params import Method, PairwiseParams, SimParams
from particle_sim_tpu.engine import Engine
from particle_sim_tpu.io import checkpoint as ckpt


class TestCheckpoint:
    def test_roundtrip_preserves_trajectory(self, tmp_path):
        path = str(tmp_path / "c.npz")
        e1 = Engine(particle_count=1000, method=Method.JNP)
        params = SimParams(gravity=2.0, is_mouse_dragging=True,
                           mouse_position=(0, 0, 20), mouse_force=30.0)
        for _ in range(5):
            e1.step(params)
        ckpt.save(path, e1, step_index=5)

        # continue original 5 more steps
        for _ in range(5):
            e1.step(params)

        # resume and run the same 5 steps
        e2, idx = ckpt.load(path)
        assert idx == 5
        assert e2.particle_count == 1000
        for _ in range(5):
            e2.step(params)

        np.testing.assert_allclose(e2.state.positions(),
                                   e1.state.positions(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(e2.state.velocities(),
                                   e1.state.velocities(), rtol=1e-5, atol=1e-5)

    def test_preserves_flags(self, tmp_path):
        path = str(tmp_path / "c.npz")
        e1 = Engine(particle_count=256, method=Method.JNP,
                    pairwise=PairwiseParams(3.0, 0.7), substeps=2)
        e1.set_paused(True)
        ckpt.save(path, e1, step_index=42)
        e2, idx = ckpt.load(path)
        assert idx == 42 and e2.is_paused()
        assert e2.pairwise.gravitational_constant == 3.0
        assert e2.substeps == 2

    def test_method_override_on_load(self, tmp_path):
        path = str(tmp_path / "c.npz")
        e1 = Engine(particle_count=256, method=Method.JNP)
        ckpt.save(path, e1)
        e2, _ = ckpt.load(path, method=Method.JNP)
        assert e2.method == Method.JNP


class TestCli:
    def test_headless_run_with_render_and_checkpoint(self, tmp_path, capsys):
        from particle_sim_tpu.app.cli import main
        frames = tmp_path / "frames"
        ck = tmp_path / "ck.npz"
        rc = main([
            "--count", "2000", "--steps", "60", "--method", "jnp",
            "--drag", "--orbit-mouse", "--mouse-force", "50",
            "--gravity", "1.0", "--color-mode", "1",
            "--render-every", "30", "--render-dir", str(frames),
            "--width", "160", "--height", "120",
            "--checkpoint-every", "50", "--checkpoint", str(ck),
            "--stats-every", "30",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        final = json.loads(out[-1])
        assert final["done"] and final["steps"] == 60
        assert final["particle_steps_per_sec"] > 0
        assert sorted(os.listdir(frames)) == ["frame_000030.png",
                                              "frame_000060.png"]
        assert ck.exists()

    def test_resume_flow(self, tmp_path, capsys):
        from particle_sim_tpu.app.cli import main
        ck = tmp_path / "ck.npz"
        main(["--count", "500", "--steps", "20", "--method", "jnp",
              "--checkpoint-every", "20", "--checkpoint", str(ck),
              "--stats-every", "0"])
        capsys.readouterr()
        rc = main(["--resume", str(ck), "--steps", "10", "--method", "jnp",
                   "--stats-every", "0"])
        assert rc == 0
        final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert final["done"]


def test_checkpoint_save_is_atomic(tmp_path):
    """Re-saving over an existing checkpoint goes through a temp file +
    os.replace — no .tmp litter, and the final file always loads."""
    import os

    from particle_sim_tpu.core.params import Method
    from particle_sim_tpu.engine import Engine
    from particle_sim_tpu.io import checkpoint as ckpt

    e = Engine(particle_count=500, method=Method.JNP)
    path = str(tmp_path / "c.npz")
    ckpt.save(path, e, step_index=1)
    ckpt.save(path, e, step_index=2)
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]
    _, step = ckpt.load(path)
    assert step == 2
