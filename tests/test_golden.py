"""Golden-image regression test: BASELINE config #1 anchor (SURVEY.md §4).

The committed golden is the production grid rasteriser's render of the reference's
sample colour/depth pair at mesh density 8, single frontal view (fov 18, camera at
dz = -10 — the reference CLI's defaults), at 320x240. Any semantic change to
projection, mesh generation, rasterisation or texture sampling shows up here as a
PSNR drop against the committed image.
"""

import os

import numpy as np
from PIL import Image

import depthrenderer_tpu as dr
from depthrenderer_tpu import transforms
from depthrenderer_tpu.ops.common import suggest_config
from depthrenderer_tpu.ops.raster_grid import render_frame_grid
from depthrenderer_tpu.utils import psnr

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "sample_d8_frontal_320x240.png")
SAMPLES = "/root/reference/samples"


def test_golden_sample_frontal():
    colour = dr.io.load_colour(f"{SAMPLES}/00000_colors.png")
    depth = dr.io.resize(dr.io.load_depth(f"{SAMPLES}/00000_depth.png"), colour.shape)
    mesh = dr.Mesh.from_texture(dr.Texture(colour), depth, density=8)
    mesh.vertices[:, 2] *= 4.0

    n = 2**8 + 1
    cam = dr.Camera(window_size=(640, 480), fov_y=18)
    mvp = (cam.projection @ np.asarray(transforms.translation(dz=-10.0))).astype(
        np.float32
    )
    W, H = 320, 240
    frame = np.asarray(
        render_frame_grid(
            mvp,
            mesh.vertices.reshape(n, n, 3),
            mesh.texture_coordinates.reshape(n, n, 2),
            colour.astype(np.float32),
            W, H,
            suggest_config(n, W, H),
        )
    )

    golden = np.asarray(Image.open(GOLDEN))
    assert frame.shape == golden.shape
    # Bit-exact on this platform at generation time; allow small headroom for
    # cross-platform float differences while still catching semantic changes.
    p = psnr(frame, golden)
    assert p >= 50.0, f"golden PSNR {p:.1f} dB — rendering semantics changed"
    diff_frac = (np.abs(frame.astype(int) - golden.astype(int)).max(axis=-1) > 8).mean()
    assert diff_frac < 0.005, f"{diff_frac:.3%} pixels changed vs golden"
