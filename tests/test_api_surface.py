"""API-surface parity checks: package exports, CLI argument surfaces, edge cases."""

import numpy as np

import depthrenderer_tpu as dr


def test_package_exports():
    assert dr.Camera and dr.Mesh and dr.Texture and dr.Axis
    assert dr.MeshRenderer and dr.render_clip
    assert dr.writers.AsyncImageWriter and dr.video.AviFile
    assert dr.postprocess.create_mosaic_video and dr.evaluate.masked_psnr
    assert dr.profiling.StageTimer


def test_cli_parser_reference_surface():
    # The reference's plac-style single-dash options must parse
    # (python -m DepthRenderer <colour> <depth> -fps 60 -mesh-density 8
    #  -displacement-factor 4.0 -output-path frames).
    from depthrenderer_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["c.png", "d.png", "-fps", "30", "-mesh-density", "7",
         "-displacement-factor", "2.5", "-output-path", "out"]
    )
    assert args.fps == 30 and args.mesh_density == 7
    assert args.displacement_factor == 2.5 and str(args.output_path) == "out"
    # Defaults match the reference (__main__.py:70).
    d = build_parser().parse_args(["c.png", "d.png"])
    assert d.fps == 60 and d.mesh_density == 8
    assert d.displacement_factor == 4.0 and str(d.output_path) == "frames"


def test_batch_parser_reference_surface():
    from depthrenderer_tpu.batch import build_parser

    args = build_parser().parse_args(
        ["c.png", "depths", "-fps", "24", "-mesh-density", "6",
         "-output-path", "o"]
    )
    assert args.fps == 24 and args.mesh_density == 6
    d = build_parser().parse_args(["c.png", "depths"])
    assert str(d.output_path) == "output"  # reference render_many default


def test_quality_flag_surface():
    # --quality (CLI + batch) selects the dual-column scan config through
    # suggest_scan_config(quality=True); default stays the fast config.
    from depthrenderer_tpu.cli import build_parser as cli_parser
    from depthrenderer_tpu.batch import build_parser as batch_parser
    from depthrenderer_tpu.ops.raster_scan import suggest_scan_config

    assert cli_parser().parse_args(["c.png", "d.png", "--quality"]).quality
    assert not cli_parser().parse_args(["c.png", "d.png"]).quality
    assert batch_parser().parse_args(["c.png", "depths", "--quality"]).quality

    cfg = suggest_scan_config(1025, 1920, 1080, quality=True)
    assert cfg.dual_col and cfg.sr == 12 and cfg.off == 5 and cfg.dmax is None
    assert cfg.pack_xy and not cfg.big_grid
    assert cfg.colfix == 3  # round 4: quality runs the widest column fan
    base = suggest_scan_config(1025, 1920, 1080)
    # Round 4: colfix=1 defaults ON, and the strips shrink to sr=6/off=2
    # (pixel-identical under the fixup, measured on chip — ROADMAP).
    assert not base.dual_col and base.colfix == 1 and base.sr == 6
    # Disabling colfix reverts the strip knobs to the round-3 production
    # values (sr=6 is only fidelity-neutral WITH the fixup).
    nofix = suggest_scan_config(1025, 1920, 1080, colfix=None)
    assert nofix.colfix is None and nofix.sr == 10 and nofix.dmax == 5
    # Explicit overrides survive the quality defaults.
    assert suggest_scan_config(1025, 1920, 1080, quality=True, sr=10).sr == 10
    # d11/d12 grids fall to the big_grid variant: quality sheds dual_col and
    # colfix (standard-variant only) instead of crashing, and reverts the
    # colfix-shrunken strips.
    big = suggest_scan_config(4097, 3840, 2160, quality=True)
    assert big.big_grid and not big.dual_col and big.sr == 12
    assert big.colfix is None
    bigf = suggest_scan_config(4097, 3840, 2160)
    assert bigf.big_grid and bigf.colfix is None and bigf.sr == 10


def test_mesh_from_texture_without_depth(checker_texture):
    # No depth map -> flat quad grid at z = 1 (reference render.py:513-514).
    mesh = dr.Mesh.from_texture(dr.Texture(checker_texture), density=2)
    np.testing.assert_allclose(mesh.vertices[:, 2], 1.0)


def test_texture_rgb_gains_alpha(checker_texture):
    tex = dr.Texture(checker_texture[..., :3])
    assert tex.image.shape[2] == 4
    assert (tex.image[..., 3] == 255).all()
    copy = tex.copy()
    copy.image[0, 0, 0] = 7
    assert tex.image[0, 0, 0] != 7 or checker_texture[0, 0, 0] == 7
