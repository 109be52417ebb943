"""Ground-truth quality gate: renders vs a REAL OpenGL rasteriser's output.

The committed golden (tests/goldens/gl_sample_d8_frontal.png) was produced by
tools/gl_groundtruth.c — the reference's GL pipeline (shader.vert:13 /
shader.frag:8 semantics, transpose-on-upload MVP, cull+depth state) executed
by Mesa llvmpipe via EGL surfaceless, fully independent of this package's
rasterisers. BASELINE's bar: PSNR >= 40 dB away from depth discontinuities.

Regenerate with: python tools/make_gl_golden.py --check
"""

import os

import numpy as np
import pytest
from PIL import Image

import depthrenderer_tpu as dr
from depthrenderer_tpu import transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops.common import suggest_config
from depthrenderer_tpu.ops.raster_grid import render_frame_grid

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "gl_sample_d8_frontal.png")
SAMPLES = "/root/reference/samples"


@pytest.fixture(scope="module")
def gl_scene():
    colour = dr.io.load_colour(f"{SAMPLES}/00000_colors.png")
    depth = dr.io.resize(dr.io.load_depth(f"{SAMPLES}/00000_depth.png"),
                         colour.shape)
    mesh = dr.Mesh.from_texture(dr.Texture(colour), depth, density=8)
    mesh.vertices[:, 2] *= 4.0
    aspect = colour.shape[1] / colour.shape[0]
    proj = np.asarray(transforms.perspective(18.0, aspect))
    mvp = (proj @ np.asarray(transforms.translation(dz=-10.0))).astype(np.float32)
    golden = np.asarray(Image.open(GOLDEN))
    return colour, depth, mesh, mvp, golden


def test_grid_matches_opengl_ground_truth(gl_scene):
    colour, depth, mesh, mvp, golden = gl_scene
    n = 2**8 + 1
    W, H = golden.shape[1], golden.shape[0]
    ours = np.asarray(render_frame_grid(
        mvp, mesh.vertices.reshape(n, n, 3),
        mesh.texture_coordinates.reshape(n, n, 2),
        colour.astype(np.float32), W, H, suggest_config(n, W, H),
    ))
    away = masked_psnr(ours, golden, depth=depth)
    overall = masked_psnr(ours, golden)
    assert away >= 40.0, f"masked PSNR vs OpenGL {away:.1f} dB < 40"
    # Measured 56.5/56.1 dB at generation time; keep headroom but catch drift.
    assert overall >= 45.0, f"overall PSNR vs OpenGL {overall:.1f} dB"


@pytest.fixture(scope="module")
def scan_frame(gl_scene):
    """One interpret-mode scan render at the golden's config (d8/VGA), shared
    by the GL gate and the scan-vs-grid relative gate below (~40 s warm on
    one CPU — the cheapest config that exercises the production kernel)."""
    from jax.experimental.pallas import tpu as pltpu

    from depthrenderer_tpu.ops import raster_scan

    colour, depth, mesh, mvp, golden = gl_scene
    n = 2**8 + 1
    W, H = golden.shape[1], golden.shape[0]
    cfg = raster_scan.suggest_scan_config(n, W, H)
    with pltpu.force_tpu_interpret_mode():
        frame = np.asarray(raster_scan.render_frames_scan(
            mvp[None], mesh.vertices.reshape(n, n, 3),
            mesh.texture_coordinates.reshape(n, n, 2),
            colour.astype(np.float32), W, H, cfg, frame_batch=1,
            interpret=True))[0]
    return frame


def test_scan_matches_opengl_ground_truth(gl_scene, scan_frame):
    """The PRODUCTION fast path (scan, default config) vs the real-GL golden.

    VERDICT r3 next-round #3: a scan fidelity regression must fail pytest,
    not just surface as a bench footnote. Measured 42.1 dB masked at HEAD
    (suggest_scan_config defaults incl. pack_xy); BASELINE bar is 40."""
    colour, depth, mesh, mvp, golden = gl_scene
    away = masked_psnr(scan_frame, golden, depth=depth)
    assert away >= 40.0, f"scan masked PSNR vs OpenGL {away:.1f} dB < 40"


def test_scan_within_reach_of_lossless_grid(gl_scene, scan_frame):
    """Relative gate: scan vs the LOSSLESS grid render at the same config.

    Catches regressions the absolute GL gate's 2 dB headroom would hide —
    at d8/VGA (multi-pixel cells) the two implementations agree to 0.178%
    flipped pixels (measured at r4 HEAD, default config); gate at 2x that."""
    from depthrenderer_tpu.ops.raster_grid import measured_config

    colour, depth, mesh, mvp, golden = gl_scene
    n = 2**8 + 1
    W, H = golden.shape[1], golden.shape[0]
    cfg_ll = measured_config(mvp[None], mesh.vertices.reshape(n, n, 3), W, H,
                             quantile=1.0, row_anchors=2)
    grid = np.asarray(render_frame_grid(
        mvp, mesh.vertices.reshape(n, n, 3),
        mesh.texture_coordinates.reshape(n, n, 2),
        colour.astype(np.float32), W, H, cfg_ll))
    flips = (np.abs(scan_frame.astype(int) - grid.astype(int)).max(-1)
             > 8).mean()
    assert flips <= 0.0036, \
        f"scan-vs-lossless-grid flip fraction {flips:.4%} > 0.36%"


def test_oracle_matches_opengl_ground_truth(gl_scene):
    # The numpy oracle is this package's internal ground truth; pin it to the
    # external one so every other implementation is transitively GL-anchored.
    from depthrenderer_tpu.ops.raster_reference import rasterize_reference

    colour, depth, mesh, mvp, golden = gl_scene
    W, H = golden.shape[1], golden.shape[0]
    ours = np.asarray(rasterize_reference(
        mesh.vertices, mesh.texture_coordinates, mesh.indices, mvp,
        colour, W, H,
    ))
    away = masked_psnr(ours, golden, depth=depth)
    assert away >= 40.0, f"oracle masked PSNR vs OpenGL {away:.1f} dB < 40"
