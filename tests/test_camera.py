"""Camera math vs independent transcriptions of camera.rs / app.rs."""

import numpy as np
import pytest

from particle_sim_tpu.render.camera import (
    Camera, look_at_rh, perspective_rh,
)


class TestBasis:
    def test_default_forward_is_minus_z(self):
        # yaw=-pi/2, pitch=0 -> forward = (cos(-pi/2), 0, sin(-pi/2)) = -Z
        cam = Camera()
        np.testing.assert_allclose(cam.forward(), [0, 0, -1], atol=1e-7)
        np.testing.assert_allclose(cam.right(), [1, 0, 0], atol=1e-7)
        np.testing.assert_allclose(cam.up(), [0, 1, 0], atol=1e-7)

    def test_pitch_clamp(self):
        cam = Camera()
        cam.process_mouse_movement(0.0, -1e6)  # pitch up hard
        assert cam.pitch == pytest.approx(np.pi / 2 - 0.01)
        cam.process_mouse_movement(0.0, 1e6)
        assert cam.pitch == pytest.approx(-np.pi / 2 + 0.01)

    def test_yaw_rotation_rate(self):
        cam = Camera()
        cam.process_mouse_movement(100.0, 0.0)
        assert cam.yaw == pytest.approx(-np.pi / 2 + 0.3)  # 100 px * 0.003


class TestMatrices:
    def test_projection_depth_range(self):
        # wgpu convention: z' in [0,1]; camera at origin looking down -Z
        p = perspective_rh(np.pi / 3, 1.0, 0.1, 1000.0)
        near_pt = p @ np.array([0, 0, -0.1, 1.0])
        far_pt = p @ np.array([0, 0, -1000.0, 1.0])
        assert near_pt[2] / near_pt[3] == pytest.approx(0.0, abs=1e-6)
        assert far_pt[2] / far_pt[3] == pytest.approx(1.0, abs=1e-6)

    def test_origin_projects_to_screen_center(self):
        cam = Camera()  # at (0,0,100) looking at origin
        vp = cam.view_proj()
        clip = vp @ np.array([0, 0, 0, 1.0], dtype=np.float32)
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)

    def test_known_offset_point(self):
        # point 10 right of the view axis at depth 100: ndc_x =
        # 10 / (100 * tan(fov/2) * aspect)
        cam = Camera(aspect=2.0)
        vp = cam.view_proj()
        clip = vp @ np.array([10.0, 0, 0, 1.0])
        ndc_x = clip[0] / clip[3]
        expect = 10.0 / (100.0 * np.tan(np.pi / 6) * 2.0)
        assert ndc_x == pytest.approx(expect, rel=1e-6)

    def test_look_at_inverts_position(self):
        eye = np.array([3.0, -2.0, 7.0])
        m = look_at_rh(eye, np.array([0.0, 0, 0]), np.array([0.0, 1, 0]))
        np.testing.assert_allclose(m @ np.array([*eye, 1.0]),
                                   [0, 0, 0, 1], atol=1e-6)


class TestMovement:
    def test_wasd(self):
        cam = Camera()
        cam.process_keyboard({"w"}, False, 0.1)  # forward 5 units (-Z)
        np.testing.assert_allclose(cam.position, [0, 0, 95], atol=1e-6)
        cam.process_keyboard({"d"}, False, 0.1)  # right 5 (+X)
        np.testing.assert_allclose(cam.position, [5, 0, 95], atol=1e-6)
        cam.process_keyboard({"space"}, False, 0.1)
        np.testing.assert_allclose(cam.position, [5, 5, 95], atol=1e-6)
        cam.process_keyboard(set(), True, 0.1)  # shift: down
        np.testing.assert_allclose(cam.position, [5, 0, 95], atol=1e-6)


class TestUnprojection:
    def test_center_cursor_stays_on_axis(self):
        # cursor at screen center -> world point on the camera axis at the
        # current depth (app.rs:244-280)
        cam = Camera(aspect=1.0)
        current = np.array([0.0, 0.0, 48.0])  # default depth (app.rs:147)
        world = cam.unproject_cursor((400, 300), (800, 600), current)
        np.testing.assert_allclose(world, [0, 0, 48.0], atol=1e-6)

    def test_corner_cursor_extent(self):
        # right edge, vertical middle: offset = half plane width
        cam = Camera(aspect=2.0)
        current = np.array([0.0, 0.0, 0.0])   # depth 100 from camera
        world = cam.unproject_cursor((800, 300), (800, 600), current)
        half_w = 100.0 * np.tan(np.pi / 6) * 2.0
        np.testing.assert_allclose(world, [half_w, 0, 0], atol=1e-4)

    def test_scroll_moves_along_forward(self):
        cam = Camera()
        p = cam.scroll_cursor_depth(np.array([1.0, 2.0, 48.0]), 5.0)
        np.testing.assert_allclose(p, [1, 2, 47.0], atol=1e-6)  # fwd=-Z, 5*0.2
