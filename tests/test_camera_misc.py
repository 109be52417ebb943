"""Coverage for Camera ops, profiling utilities, the soup renderer path and
writer error propagation."""

import numpy as np
import pytest

from depthrenderer_tpu import profiling, transforms
from depthrenderer_tpu.ops.common import RasterConfig
from depthrenderer_tpu.render import MeshRenderer
from depthrenderer_tpu.scene import Camera, Mesh, Texture


# -- Camera (reference: render.py:14-180) -------------------------------------------


def test_camera_projection_matches_transforms():
    cam = Camera(window_size=(640, 480), fov_y=18)
    want = np.asarray(transforms.perspective(18.0, 640 / 480))
    np.testing.assert_allclose(cam.projection, want, rtol=1e-6)
    assert cam.aspect_ratio == pytest.approx(4 / 3)


def test_camera_zoom_rules():
    # Reference zoom semantics (render.py:94-121): +speed above the threshold,
    # multiplicative near zero, reset restores the original.
    cam = Camera(window_size=(100, 100), fov_y=60, zoom_speed=10)
    cam.zoom_in()
    assert cam.fov_y == 70
    cam.zoom_out()
    cam.zoom_out()
    assert cam.fov_y == 50
    cam.reset_zoom()
    assert cam.fov_y == 60
    np.testing.assert_allclose(cam.projection, Camera((100, 100), fov_y=60).projection)

    near = Camera(window_size=(100, 100), fov_y=5, zoom_speed=10)
    near.zoom_in()
    assert near.fov_y == pytest.approx(5 * 1.05)
    near.zoom_out()
    assert near.fov_y == pytest.approx(5 * 1.05 * 0.9)


def test_camera_pan_and_rotate_update_view():
    cam = Camera(window_size=(200, 100))
    v0 = cam.view.copy()
    cam.pan(20, 10)
    assert not np.allclose(cam.view, v0)
    # Pan must be normalised by the window size (render.py:158).
    assert cam.view[0, 3] == pytest.approx(20 / 200)
    assert cam.view[1, 3] == pytest.approx(10 / 100)

    cam2 = Camera(window_size=(200, 100))
    cam2.rotate(100, 50)
    R = cam2.view[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert not np.allclose(R, np.eye(3))

    # view_projection_matrix = projection @ view (render.py:71-75).
    np.testing.assert_allclose(
        cam2.view_projection_matrix, cam2.projection @ cam2.view, rtol=1e-6
    )


# -- profiling ----------------------------------------------------------------------


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts == {"a": 2, "b": 1}
    assert t.totals["a"] >= 0.0
    t.report()  # must not raise


def test_throughput_meter():
    m = profiling.ThroughputMeter()
    m.add(10)
    assert m.frames == 10
    assert m.fps >= 0.0


# -- soup (non-grid) renderer path ---------------------------------------------------


def test_mesh_renderer_soup_fallback(checker_texture):
    # A hand-built non-grid mesh must render through the soup rasteriser.
    verts = np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]],
                     np.float32)
    uvs = np.array([[0, 0], [1, 0], [0.5, 1]], np.float32)
    mesh = Mesh(Texture(checker_texture), verts, uvs, np.array([0, 1, 2], np.uint32))
    assert not mesh.is_grid

    cam = Camera(window_size=(48, 48), fov_y=60)
    cam.view = np.asarray(transforms.translation(dz=-5.0)) @ cam.view
    r = MeshRenderer(camera=cam, config=RasterConfig(tile_h=8, tile_w=32,
                                                     window_rows=8, window_cols=8,
                                                     patch_size=4))
    r.mesh = mesh
    r.draw()
    frame = r.get_frame()
    bg = np.array([0, 0, 0, 255], np.uint8)
    assert frame.shape == (48, 48, 4)
    assert not (frame == bg).all()


def test_wireframe_toggle_keeps_impl(checker_texture):
    rng = np.random.default_rng(0)
    mesh = Mesh.from_texture(Texture(checker_texture),
                             rng.integers(0, 256, (16, 16), dtype=np.uint8),
                             density=2)
    cam = Camera(window_size=(32, 32), fov_y=18)
    cam.view = np.asarray(transforms.translation(dz=-10.0)) @ cam.view
    r = MeshRenderer(camera=cam, config=RasterConfig(tile_h=8, tile_w=32,
                                                     window_rows=8, window_cols=8,
                                                     patch_size=4))
    r.mesh = mesh
    r.draw()
    filled = r.get_frame().copy()
    impl_before = r.impl
    r.toggle_wireframe()
    # Wireframe is implemented by every rasteriser now (winner min-barycentric
    # gate) — the toggle changes only the mode, never the implementation.
    assert r.mode == "wireframe" and r.impl == impl_before
    r.draw()
    wire = r.get_frame().copy()
    bg = np.array([0, 0, 0, 255], np.uint8)
    assert (~(wire == bg).all(-1)).sum() < (~(filled == bg).all(-1)).sum()
    r.toggle_wireframe()
    assert r.mode == "texture"


# -- writer error propagation ---------------------------------------------------------


def test_async_image_writer_surfaces_errors(tmp_path):
    from depthrenderer_tpu.writers import AsyncImageWriter

    w = AsyncImageWriter(num_workers=1)
    w.write(np.zeros((8, 8, 4), np.uint8), tmp_path / "nodir" / "x.png")
    with pytest.raises(Exception):
        w.cleanup()


def test_async_video_writer_surfaces_errors(tmp_path):
    from depthrenderer_tpu.writers import AsyncVideoWriter

    w = AsyncVideoWriter(tmp_path / "v.avi", (16, 16), fps=5, codec="DIB ")
    w.write(np.zeros((16, 16, 4), np.uint8))
    w.writer.close()  # sabotage: container closed under the encoder thread
    with pytest.raises(Exception):
        w.write(np.zeros((16, 16, 4), np.uint8))
        w.write(np.zeros((16, 16, 4), np.uint8))
        w.cleanup()
