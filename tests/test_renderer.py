"""Software rasterizer tests: geometry of the projection, occlusion
ordering, overlay compositing, and the image-group layout."""

import numpy as np

from spec_tpu.utils.renderer import (
    rasterize_mesh,
    render_image_group,
    render_overlay_image,
)


def make_quad(z, half=0.5, offset=(0.0, 0.0)):
    """Two triangles forming a square at depth z, facing the camera."""
    ox, oy = offset
    verts = np.array([
        [-half + ox, -half + oy, z],
        [half + ox, -half + oy, z],
        [half + ox, half + oy, z],
        [-half + ox, half + oy, z],
    ], np.float32)
    faces = np.array([[0, 2, 1], [0, 3, 2]], np.int32)  # CW -> faces camera
    return verts, faces


K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], np.float32)


def test_quad_projects_to_center():
    verts, faces = make_quad(z=2.0)
    rgb, mask = rasterize_mesh(verts, faces, K, (128, 128))
    assert mask.any()
    ys, xs = np.nonzero(mask)
    # quad spans +-0.5m at 2m with f=100 -> +-25px around (64, 64)
    assert abs(xs.mean() - 64) < 2 and abs(ys.mean() - 64) < 2
    assert 38 < xs.min() < 40 and 88 < xs.max() < 90


def test_occlusion_order():
    """A near red-ish quad must occlude a far one."""
    v1, f1 = make_quad(z=2.0)             # near
    v2, f2 = make_quad(z=4.0, half=2.5)   # far, bigger
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    rgb_near, _ = rasterize_mesh(v1, f1, K, (128, 128),
                                 base_color=(1, 0, 0))
    rgb_both, mask = rasterize_mesh(verts, faces, K, (128, 128),
                                    base_color=(1, 0, 0))
    # center pixel comes from the near quad in both cases
    np.testing.assert_allclose(rgb_both[64, 64], rgb_near[64, 64])
    # far quad extends farther out
    assert mask[64, 10] and not rasterize_mesh(
        v1, f1, K, (128, 128))[1][64, 10]


def test_overlay_composites_on_image(rng):
    verts, faces = make_quad(z=2.0)
    img = rng.rand(128, 128, 3).astype(np.float32)
    out = render_overlay_image(
        img, np.zeros(3, np.float32), verts, np.eye(3, dtype=np.float32),
        (100.0, 100.0), (64.0, 64.0), faces)
    changed = np.abs(out - img).sum(-1) > 1e-6
    assert changed.any()
    assert not changed[0, 0]  # corners untouched
    assert changed[64, 64]


def test_render_image_group_layout(rng):
    verts, faces = make_quad(z=2.0)
    img = rng.rand(96, 128, 3).astype(np.float32)
    out = render_image_group(
        img, np.zeros(3, np.float32), verts, np.eye(3, dtype=np.float32),
        (100.0, 100.0), (64.0, 48.0), faces,
        cam_params=np.array([1.0, 0.05, 0.01, 100.0]))
    assert out.shape == (96, 128 * 3, 3)
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6


def test_render_tb_grid_layout(rng):
    """Multi-sample / multi-sideview grid (reference RendererCam.
    visualize_tb, renderer_cam.py:221-393): rows = samples, cols =
    [input | overlay | one per sideview angle]."""
    from spec_tpu.utils.renderer import render_tb_grid

    N = 3
    verts, faces = make_quad(z=2.0)
    images = rng.rand(N, 64, 96, 3).astype(np.float32)
    out = render_tb_grid(
        images,
        vertices=np.stack([verts] * N),
        camera_translation=np.zeros((N, 3), np.float32),
        camera_rotation=np.stack([np.eye(3, dtype=np.float32)] * N),
        focal_length=np.full((N, 2), 100.0, np.float32),
        camera_center=np.tile(np.array([48.0, 32.0], np.float32), (N, 1)),
        faces=faces,
        sideview_angles=(90, 270),
        max_samples=2)
    # max_samples caps rows; 2 sideviews -> 4 columns.
    assert out.shape == (2 * 64, 4 * 96, 3)
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6
    # Row 1 input panel shows sample 1, not sample 0.
    np.testing.assert_allclose(out[64:128, :96], images[1], atol=1e-6)
    # Overlay column composites the mesh near each sample's center.
    changed0 = np.abs(out[:64, 96:192] - images[0]).sum(-1) > 1e-6
    assert changed0[32, 48]
    # Side-view panels render on black with a ground plane: non-empty.
    assert out[:64, 192:288].sum() > 0
