"""Headless tests for the GL viewer math (bts_tpu/apps/live3d_gl.py).

The GL shell itself needs Qt/PyOpenGL (absent in this image); everything it
computes — MVP matrices, trackball state, VBO vertex data — is pure numpy
and verified here. Reference semantics: pytorch/bts_live_3d.py:300-484.
"""

import numpy as np

from bts_tpu.apps.live3d_gl import (
    EDGE_FAR,
    SCENE_SHIFT,
    Trackball,
    cloud_vertex_data,
    look_at,
    perspective,
    rotate,
)


def _project(mvp, p):
    v = mvp @ np.array([*p, 1.0], np.float32)
    return v[:3] / v[3]


def test_perspective_matrix():
    m = perspective(45.0, 640 / 480, 0.01, 100.0)
    # Points on the near/far planes map to NDC z = -1 / +1.
    assert np.isclose(_project(m, (0, 0, -0.01))[2], -1.0, atol=1e-5)
    assert np.isclose(_project(m, (0, 0, -100.0))[2], 1.0, atol=1e-4)
    # A point on the top edge of the frustum at z=-1 hits NDC y=1.
    f = 1.0 / np.tan(np.deg2rad(45.0) / 2.0)
    assert np.isclose(_project(m, (0, 1.0 / f, -1.0))[1], 1.0, atol=1e-5)


def test_look_at():
    # Camera at origin looking down -z with +y up = identity view.
    m = look_at((0, 0, 0), (0, 0, -1), (0, 1, 0))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-7)
    # Looking at a point 2 units ahead from z=+2: that point lands at
    # view-space z = -2 (in front of the camera).
    m = look_at((0, 0, 2), (0, 0, 0), (0, 1, 0))
    np.testing.assert_allclose(
        (m @ np.array([0, 0, 0, 1.0]))[:3], [0, 0, -2], atol=1e-7
    )


def test_rotate_axis_angle():
    m = rotate(np.eye(4, dtype=np.float32), np.pi / 2, (0, 0, 1))
    np.testing.assert_allclose(
        (m @ np.array([1, 0, 0, 1.0]))[:3], [0, 1, 0], atol=1e-6
    )
    # Post-multiplication: rotate(M, a, ax) applies the rotation in M's
    # local frame (glm.rotate semantics).
    base = rotate(np.eye(4, dtype=np.float32), np.pi / 2, (0, 1, 0))
    m2 = rotate(base, np.pi / 2, (0, 0, 1))
    np.testing.assert_allclose(m2[:3, :3], base[:3, :3] @ m2_local(), atol=1e-6)


def m2_local():
    c, s = 0.0, 1.0
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_trackball_reference_semantics():
    tb = Trackball()
    # Reference initial pose (pytorch/bts_live_3d.py:303-306).
    assert (tb.x_rot, tb.y_rot, tb.z_rot, tb.zoom_level) == (5040, 40, 0, 9)

    # Left drag: dy adds to xRot, -dx adds to yRot.
    tb.drag(dx_px=10, dy_px=4, button="left")
    assert (tb.x_rot, tb.y_rot, tb.z_rot) == (5044, 30, 0)
    # Right drag: dy adds to xRot, -dx adds to zRot.
    tb.drag(dx_px=-6, dy_px=1, button="right")
    assert (tb.x_rot, tb.y_rot, tb.z_rot) == (5045, 30, 6)
    # Wheel: 120 eighth-degrees = one 15-degree step = +1 zoom level.
    tb.wheel(120)
    assert np.isclose(tb.zoom_level, 10.0)

    mvp = tb.mvp(640, 480)
    assert mvp.shape == (4, 4) and mvp.dtype == np.float32
    assert np.all(np.isfinite(mvp))
    # Zooming out moves the eye back -> projected points shrink toward
    # the center.
    p = np.array([0.05, 0.0, -0.5])
    x_near = abs(_project(mvp, p)[0])
    tb.zoom_level = 20.0
    x_far = abs(_project(tb.mvp(640, 480), p)[0])
    assert x_far < x_near


def test_cloud_vertex_data():
    h, w = 6, 8
    depth = np.full((h, w), 2.0, np.float32)
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = 255
    pos, col = cloud_vertex_data(depth, rgb, focal=100.0)
    # Fixed-length buffers: one vertex per pixel, edges hidden not dropped.
    assert pos.shape == (h * w, 3) and col.shape == (h * w, 3)
    np.testing.assert_allclose(col[:, 0], 1.0)
    np.testing.assert_allclose(col[:, 1:], 0.0)
    # Flat depth -> no edges; z = depth + scene shift everywhere.
    np.testing.assert_allclose(pos[:, 2], 2.0 + SCENE_SHIFT[2], atol=1e-6)
    # Ray math: pixel (0,0) -> ((0-w/2)/f*z, (0-h/2)/f*z, z) + shift.
    np.testing.assert_allclose(
        pos[0], [(0 - w / 2) / 100.0 * 2.0 + SCENE_SHIFT[0],
                 (0 - h / 2) / 100.0 * 2.0 + SCENE_SHIFT[1],
                 2.0 + SCENE_SHIFT[2]],
        atol=1e-6,
    )

    # A depth step produces hidden (z≈1e6) vertices at the discontinuity,
    # and the buffer length does not change.
    depth2 = depth.copy()
    depth2[:, 4:] = 9.0
    pos2, _ = cloud_vertex_data(depth2, rgb, focal=100.0)
    assert pos2.shape == (h * w, 3)
    assert (pos2[:, 2] > EDGE_FAR / 2).any()
    # Non-edge pixels keep their true depth.
    assert np.isclose(pos2[0, 2], 2.0 + SCENE_SHIFT[2], atol=1e-5)


def test_gl_shell_import_gated():
    """Without Qt/PyOpenGL installed, the GL entry points raise ImportError
    (and main() falls back); the math API stays importable."""
    import pytest

    from bts_tpu.apps import live3d_gl

    try:
        live3d_gl._import_gui()
        have_gui = True
    except ImportError:
        have_gui = False
    if not have_gui:
        with pytest.raises(ImportError):
            live3d_gl.make_widget_class()
