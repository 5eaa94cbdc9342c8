"""Interactive-preview building blocks (frontend/interactive.py): the
first-person camera controller math and the ANSI half-block preview.
Reference roles: frontend/main.cpp:19-85 (CameraControl),
frontend/render_window.cpp:50-122 (live view)."""

import numpy as np

from imbatracer_tpu.frontend.interactive import FirstPersonCamera, ansi_preview


def test_fps_camera_moves_and_rotations():
    c = FirstPersonCamera((0, 0, 0), (0, 0, -1), (0, 1, 0), speed=2.0)
    c.move(0, 0, 1)                       # forward
    np.testing.assert_allclose(c.pos, [0, 0, -2], atol=1e-12)
    c.move(1, 0, 0)                       # right = forward x up = (+1,0,0)
    np.testing.assert_allclose(c.pos, [2, 0, -2], atol=1e-12)
    c.move(0, 1, 0)
    np.testing.assert_allclose(c.pos, [2, 2, -2], atol=1e-12)

    # Quarter yaw about up rotates -z forward onto +-x.
    c2 = FirstPersonCamera((0, 0, 0), (0, 0, -1), (0, 1, 0), speed=1.0)
    c2.yaw(np.pi / 2)
    assert abs(abs(c2.forward[0]) - 1.0) < 1e-7 and abs(c2.forward[2]) < 1e-7
    # Forward stays unit under arbitrary chains.
    for _ in range(50):
        c2.yaw(0.3)
        c2.pitch(0.2)
    assert abs(np.linalg.norm(c2.forward) - 1.0) < 1e-6
    # Pitch clamp: forward never aligns with up.
    c3 = FirstPersonCamera((0, 0, 0), (0, 0, -1), (0, 1, 0), speed=1.0)
    for _ in range(100):
        c3.pitch(0.3)
    assert abs(np.dot(c3.forward, c3.up)) < 0.995

    # camera() produces the renderer's Camera pytree.
    cam = c3.camera(64, 32, 60.0)
    assert cam.width == 64 and cam.height == 32


def test_ansi_preview_downsamples_colors():
    img = np.zeros((32, 64, 3), np.float32)
    img[:16, :, 0] = 1.0    # top half red
    img[16:, :, 2] = 1.0    # bottom half blue
    s = ansi_preview(img, cols=8, rows=4)
    lines = s.split("\n")
    assert len(lines) == 4
    assert "▀" in lines[0]
    # Top text row: fg (upper pixel) red, bg red too (rows 0..7 all red).
    assert "\x1b[38;2;255;0;0m" in lines[0]
    # Bottom text row: blue.
    assert "38;2;0;0;255" in lines[-1]
    # Every line resets attributes.
    assert all(line.endswith("\x1b[0m") for line in lines)
