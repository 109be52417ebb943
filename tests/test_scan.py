"""Column-crossing-scan rasteriser vs the numpy oracle (interpret mode on CPU).

The scan path is designed for production-density grids (pixel-scale cells) but
must stay correct on any grid; random-depth low-density scenes are its worst
case (strong folds, giant stretched cells), so tolerances here allow a slightly
larger winner-flip budget than the tiled paths (see scan_proto3.py's measured
agreement taxonomy)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from depthrenderer_tpu import transforms
from depthrenderer_tpu.ops import raster_reference, raster_scan
from depthrenderer_tpu.ops.raster_scan import ScanConfig
from depthrenderer_tpu.transforms import Axis

from test_raster import assert_images_close, scene

CFG = ScanConfig(rmax=16, cw=128, sr=8, off=3)
CFG_MED = ScanConfig(rmax=40, cw=128, sr=10, off=4)


def _render_scan(verts, uvs, mvp, tex, W, H, cfg, mode="texture"):
    n = int(np.sqrt(len(verts)))
    vg = verts.reshape(n, n, 3)
    uvg = uvs.reshape(n, n, 2)
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(
            raster_scan.render_frame_scan(
                mvp, vg, uvg, tex, W, H, cfg, mode, interpret=True
            )
        )


@pytest.mark.parametrize("angle_deg", [0.0, 4.0])
def test_scan_matches_oracle(checker_texture, angle_deg):
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=1)
    mvp = (
        mvp @ np.asarray(transforms.rotation(np.deg2rad(angle_deg), axis=Axis.Y))
    ).astype(np.float32)
    W, H = 64, 48
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H
    )
    got = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, CFG)
    assert got.shape == (H, W, 4)
    assert_images_close(got, want, min_psnr=35.0, max_diff_frac=0.02)
    cov_a = want[..., 3] > 0
    cov_b = got[..., 3] > 0
    assert (cov_a == cov_b).mean() > 0.98


def test_scan_flat_depth_near_exact(checker_texture):
    # A fold-free scene: the crossing structure is single-sheet, so the scan's
    # candidate set is complete and the render should match almost pixel-exactly.
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=2)
    verts = verts.copy()
    verts[:, 2] = 0.7
    W, H = 64, 48
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H
    )
    got = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, CFG)
    assert_images_close(got, want, min_psnr=45.0, max_diff_frac=0.003)


def test_scan_medium_grid_rotated(checker_texture):
    verts, uvs, idx, mvp, _ = scene(density=4, size=(48, 64), seed=3)
    spin = np.asarray(transforms.rotation(np.deg2rad(3.0), axis=Axis.X))
    mvp = (mvp @ spin).astype(np.float32)
    W, H = 96, 72
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H
    )
    got = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, CFG_MED)
    # Random-depth d=4 scenes are the scan's worst case (fold-dominated, cells
    # far larger than the design point); 2.5% winner-flip budget per the
    # measured stretched-triangle class. sr=14 passes 2% but its interpret
    # compile is pathological (hours); sr=10 keeps CI tractable.
    assert_images_close(got, want, min_psnr=35.0, max_diff_frac=0.025)


def test_scan_debug_mode(checker_texture):
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=4)
    W, H = 64, 48
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp.astype(np.float32), checker_texture, W, H,
        mode="debug_z",
    )
    got = _render_scan(verts, uvs, mvp.astype(np.float32),
                       checker_texture.astype(np.float32), W, H, CFG,
                       mode="debug_z")
    assert_images_close(got, want, min_psnr=30.0, max_diff_frac=0.02)
    assert (got[..., 0] == got[..., 1]).all()


def test_scan_batched(checker_texture):
    verts, uvs, _, mvp, _ = scene(density=3, size=(24, 32), seed=5)
    n = int(np.sqrt(len(verts)))
    mvps = np.stack([
        mvp @ np.asarray(transforms.rotation(np.deg2rad(a), axis=Axis.Y))
        for a in (0.0, 2.0)
    ]).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        frames = np.asarray(
            raster_scan.render_frames_scan(
                mvps, verts.reshape(n, n, 3), uvs.reshape(n, n, 2),
                checker_texture.astype(np.float32), 64, 48, CFG,
                interpret=True,
            )
        )
    assert frames.shape == (2, 48, 64, 4)
    assert not np.array_equal(frames[0], frames[1])


def test_scan_prep_overflow_diagnostic(checker_texture):
    # An rmax far smaller than the hull span must be *reported*, not silent.
    verts, uvs, _, mvp, _ = scene(density=4, size=(48, 64), seed=6)
    n = int(np.sqrt(len(verts)))
    import jax.numpy as jnp

    cfg = ScanConfig(rmax=8, cw=128, sr=6, off=2)
    out = raster_scan._prep_scan(
        jnp.asarray(mvp, jnp.float32), verts.reshape(n, n, 3), 96, 72, cfg
    )
    assert int(out[-1]) > 0


def test_scan_wireframe(checker_texture):
    # In-kernel wireframe: coverage restricted to pixels near triangle edges.
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=7)
    W, H = 64, 48
    solid = _render_scan(verts, uvs, mvp.astype(np.float32),
                         checker_texture.astype(np.float32), W, H, CFG)
    wf = _render_scan(verts, uvs, mvp.astype(np.float32),
                      checker_texture.astype(np.float32), W, H, CFG,
                      mode="wireframe")
    cov_wf = (wf[..., :3].sum(-1) > 0).mean()
    cov_solid = (solid[..., :3].sum(-1) > 0).mean()
    assert 0.0 < cov_wf < cov_solid
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H, mode="wireframe"
    )
    # Same edge-band semantics as the oracle (tolerant: bands are thin).
    agree = ((wf[..., :3].sum(-1) > 0) == (np.asarray(want)[..., :3].sum(-1) > 0)).mean()
    assert agree > 0.95
