"""Undistortion remap tests for the live 3D demo."""

import numpy as np

from bts_tpu.apps.live3d import remap_nearest, undistort_maps


def test_undistort_identity_when_no_distortion():
    cam = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    map_x, map_y = undistort_maps(cam, np.zeros(5), cam, (640, 480))
    u, v = np.meshgrid(np.arange(640.0), np.arange(480.0))
    np.testing.assert_allclose(map_x, u, atol=1e-9)
    np.testing.assert_allclose(map_y, v, atol=1e-9)


def test_undistort_radial_moves_corners_outward():
    cam = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    dist = np.array([0.1, 0, 0, 0, 0])  # barrel k1>0
    map_x, map_y = undistort_maps(cam, dist, cam, (640, 480))
    # Center pixel unmoved; corner source lies farther from center.
    assert abs(map_x[240, 320] - 320) < 1e-6
    r_corner = np.hypot(map_x[0, 0] - 320, map_y[0, 0] - 240)
    assert r_corner > np.hypot(320, 240)


def test_remap_nearest_shapes(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    cam = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    map_x, map_y = undistort_maps(cam, np.zeros(5), cam, (640, 480))
    out = remap_nearest(img, map_x, map_y)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)  # identity map
