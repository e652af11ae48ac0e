"""Undistortion remap + headless point-cloud render tests (live 3D demo)."""

import os

import pytest
import numpy as np
from PIL import Image

from bts_tpu.apps.live3d import (
    NYU_FOCAL,
    pixel_rays,
    remap_nearest,
    render_cloud,
    run_headless,
    undistort_maps,
    unproject,
)


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


def test_render_cloud_front_view_reprojects_image():
    # A flat plane at constant depth, unprojected with the render focal and
    # viewed from azimuth=elevation=0 at that same distance, must land back
    # on the original pixel grid (modulo the 1px splat).
    h, w = 48, 64
    depth = np.full((h, w), 2.0, np.float32)
    rays = pixel_rays(h, w, focal=NYU_FOCAL)
    points = unproject(depth, rays).reshape(-1, 3)
    colors = np.zeros((h, w, 3), np.float32)
    colors[:, : w // 2] = [1.0, 0.0, 0.0]
    colors[:, w // 2 :] = [0.0, 0.0, 1.0]
    img = render_cloud(
        points,
        colors.reshape(-1, 3),
        height=h,
        width=w,
        distance=2.0,
        splat=1,
    )
    # Left half red, right half blue (centroid-centered projection).
    assert img[h // 2, w // 4, 0] > 200 and img[h // 2, w // 4, 2] == 0
    assert img[h // 2, 3 * w // 4, 2] > 200 and img[h // 2, 3 * w // 4, 0] == 0


def test_render_cloud_occlusion_near_wins():
    # Two points projecting to the same pixel: the nearer must win.
    points = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])
    colors = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    img = render_cloud(
        points, colors, height=9, width=9, distance=2.0, splat=1, focal=10.0
    )
    rendered = img[img.sum(axis=-1) > 0]
    assert rendered.size and (rendered[:, 1] > 200).all()  # green (near)


def test_render_cloud_azimuth_rotates_view():
    # A single off-axis point moves across the image as the camera orbits.
    points = np.array([[0.8, 0.0, 2.0], [0.0, 0.0, 2.0]])
    colors = np.ones((2, 3), np.float32)
    a = render_cloud(points, colors, 64, 64, azimuth_deg=0, distance=3.0, splat=1, focal=40.0)
    b = render_cloud(points, colors, 64, 64, azimuth_deg=60, distance=3.0, splat=1, focal=40.0)
    assert (a > 0).any() and (b > 0).any()
    assert not np.array_equal(a, b)


@pytest.mark.slow
def test_run_headless_renders_views(tmp_path):
    from bts_tpu.config import Config

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        ).save(frames / f"frame_{i}.png")
    cfg = Config(encoder="mobilenetv2_bts", dataset="nyu", max_depth=10.0)
    out = tmp_path / "out"
    n = run_headless(cfg, str(frames), str(out), views=((0.0, 0.0), (20.0, -5.0)))
    assert n == 2
    renders = sorted(os.listdir(out))
    assert len(renders) == 4  # 2 frames x 2 views
    img = np.asarray(Image.open(out / renders[0]))
    assert img.shape == (64, 96, 3)
    assert (img > 0).any()  # something was rasterized


def test_remap_nearest_shapes(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    cam = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    map_x, map_y = undistort_maps(cam, np.zeros(5), cam, (640, 480))
    out = remap_nearest(img, map_x, map_y)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)  # identity map
