"""Column-crossing-scan rasteriser vs the numpy oracle (interpret mode on CPU).

The scan path is designed for production-density grids (pixel-scale cells) but
must stay correct on any grid; random-depth low-density scenes are its worst
case (strong folds, giant stretched cells), so tolerances here allow a slightly
larger winner-flip budget than the tiled paths (see scan_proto3.py's measured
agreement taxonomy)."""

import dataclasses

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


@pytest.mark.scan_slow
def test_scan_row_edge_quality_closes_holes(checker_texture):
    """The two-pass row-edge pipeline (quality mode) must close nearly all of
    the single pass's coverage holes: cells a pixel enters through a
    horizontal edge anchor on the transposed pass's records
    (raster_scan.render_frames_scan_quality). The budget here is ~50x
    tighter than the single-pass test above on the same fold-heavy scene."""
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=1)
    mvp = (
        mvp @ np.asarray(transforms.rotation(np.deg2rad(4.0), axis=Axis.Y))
    ).astype(np.float32)
    W, H = 64, 48
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H
    )
    cfgq = dataclasses.replace(CFG, row_edge=True)
    n = int(np.sqrt(len(verts)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(raster_scan.render_frames_scan(
            mvp[None], verts.reshape(n, n, 3), uvs.reshape(n, n, 2),
            checker_texture.astype(np.float32), W, H, cfgq, "texture",
            interpret=True))[0]
    assert got.shape == (H, W, 4)
    assert_images_close(got, want, min_psnr=40.0, max_diff_frac=0.002)
    single = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                          W, H, CFG)
    flips_q = (np.abs(got.astype(int) - want.astype(int)).max(axis=-1)
               > 8).mean()
    flips_s = (np.abs(single.astype(int) - want.astype(int)).max(axis=-1)
               > 8).mean()
    assert flips_q < 0.25 * max(flips_s, 1e-9), (flips_q, flips_s)


@pytest.mark.scan_slow
def test_scan_quality_texture_z_matches_attrs_merge(checker_texture):
    """The texture_z fast form of the quality pipeline (in-kernel-shaded
    passes, u32 depth merge) must agree with the attrs-merged + XLA-shaded
    form: identical winners (same merge key) and sampler-rounding-level
    pixel differences only. On chip the two measured bit-identical at
    1080p/d10 once the windows were orientation-sized."""
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=1)
    mvp = (
        mvp @ np.asarray(transforms.rotation(np.deg2rad(4.0), axis=Axis.Y))
    ).astype(np.float32)
    W, H = 64, 48
    n = int(np.sqrt(len(verts)))
    vg = verts.reshape(n, n, 3)
    tex = checker_texture.astype(np.float32)
    cfgq = dataclasses.replace(CFG, row_edge=True)
    import jax.numpy as jnp

    cfg1 = dataclasses.replace(cfgq, row_edge=False,
                               tex_rows=max(cfgq.tex_rows, 128),
                               tex_cols=max(cfgq.tex_cols, 384))
    cfg2 = raster_scan.suggest_scan_config(
        n, H, W, sr=cfgq.sr, off=cfgq.off, dmax=cfgq.dmax,
        rmax=cfgq.rmax, cw=cfgq.cw, tex_rows=192, tex_cols=384)
    S = np.asarray(raster_scan._ROW_EDGE_SWAP, np.float64)
    mvps = jnp.asarray(mvp[None])
    mvps2 = jnp.asarray(np.einsum(
        "ij,tjk->tik", S, np.asarray(mvps, np.float64)).astype(np.float32))
    vg_t = jnp.transpose(jnp.asarray(vg), (1, 0, 2))
    with pltpu.force_tpu_interpret_mode():
        b1, _ = raster_scan._scan_attrs_grouped(mvps, vg, W, H, cfg1, True, 1)
        b2, _ = raster_scan._scan_attrs_grouped(mvps2, vg_t, H, W, cfg2,
                                                True, 1)
        merged = raster_scan._merge_row_edge(b1, b2, W, H)
        attrs_q = np.asarray(raster_scan._shade_scan_batched(
            merged, jnp.asarray(tex), W, H, "texture"))[0]
        r1, z1, _ = raster_scan._scan_rgba_z_grouped(
            mvps, vg, tex, W, H, cfg1, True, 1)
        r2, z2, _ = raster_scan._scan_rgba_z_grouped(
            mvps2, vg_t, jnp.transpose(jnp.asarray(tex), (1, 0, 2)),
            H, W, cfg2, True, 1)
        raw = raster_scan._merge_row_edge_raw(r1, z1, r2, z2, W, H)
        tz_q = np.asarray(raster_scan._assemble_rgba_batched(raw, W, H))[0]
    diff = np.abs(tz_q.astype(int) - attrs_q.astype(int))
    assert (diff.max(axis=-1) > 8).mean() == 0.0
    assert diff.max() <= 8


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


@pytest.mark.scan_slow
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


@pytest.mark.scan_slow
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


@pytest.mark.scan_slow
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


@pytest.mark.scan_slow
def test_scan_solve_forensics_vs_host_replica(checker_texture):
    """Replay the compiled solve against a host-side numpy replica (round-3
    VERDICT item: production-config scan forensics in CI). The kernel's
    ``debug_records`` hook exports slot-0's full record planes; the replica
    recomputes the crossing/slot assignment from the same window data and
    per-chunk bounds, so a solver regression surfaces without a TPU."""
    import jax.numpy as jnp

    verts, uvs, idx, mvp, _ = scene(density=4, size=(48, 64), seed=9)
    n = int(np.sqrt(len(verts)))
    W, H = 96, 72
    cfg = CFG_MED
    win, w0, bounds, canch, mid, _ = (np.asarray(a) for a in
                                      raster_scan._prep_scan(
        jnp.asarray(mvp, jnp.float32), verts.reshape(n, n, 3), W, H, cfg))
    nbands = H // 8
    bounds2 = bounds.reshape(nbands, -1)
    kb = bounds2 & 0xFFF
    ke = (bounds2 >> 12) & 0xFFF
    minv = np.linalg.inv(np.asarray(mvp, np.float64))
    minv_rows = jnp.asarray(
        np.concatenate([minv[2], minv[3]]).astype(np.float32))
    texq = jnp.zeros((cfg.tex_rows, cfg.tex_cols), jnp.uint32)
    with pltpu.force_tpu_interpret_mode():
        _, dbg = raster_scan._raster_scan_pallas(
            jnp.asarray(win)[None], texq, (1, 1), minv_rows[None],
            jnp.asarray(w0)[None], jnp.asarray(bounds)[None],
            jnp.asarray(canch)[None], jnp.asarray(mid)[None], W, H, n, n,
            cfg, interpret=True, debug_records=True)
    dbg = np.asarray(dbg)[0]  # (nbands, 1, nrec, 8, CL)

    FAR = 3.0e38
    CL = win.shape[2]
    for i in range(0, nbands, 3):
        w0i = int(w0[i]) * 8
        winb = win[:, w0i:w0i + cfg.rmax]
        qy = (H - (i * 8 + np.arange(8)) - 0.5)[:, None]
        sxc = np.full((8, CL), FAR, np.float32)
        bw = np.full((8, CL), -1.0e9, np.float32)
        cnt = np.zeros((8, CL), np.float32)
        for ci in range(CL // 128):
            cs = slice(ci * 128, ci * 128 + 128)
            for k in range(int(kb[i, ci]), int(ke[i, ci])):
                k1 = min(k + 1, cfg.rmax - 1)
                s_hi = winb[1, k][None, cs]
                s_lo = winb[1, k1][None, cs]
                cross = (s_hi >= qy) & (s_lo < qy)
                denom = np.maximum(s_hi - s_lo, 1e-12)
                frac = np.where(cross, (s_hi - qy) / denom, 0.0).astype(
                    np.float32)
                sxn = (winb[0, k][None, cs]
                       + (winb[0, k1][None, cs] - winb[0, k][None, cs]) * frac)
                fire = cross & (cnt[:, cs] == 0)
                sxc[:, cs] = np.where(fire, sxn, sxc[:, cs])
                bw[:, cs] = np.where(fire, float(k), bw[:, cs])
                cnt[:, cs] += cross
        got_sxc = dbg[i, 0, 0]
        got_bw = dbg[i, 0, 2]
        valid = bw > -1e8
        assert ((got_bw > -1e8) == valid).mean() > 0.999, f"band {i}: slot-0 validity"
        if valid.any():
            mism = ~np.isclose(got_sxc[valid], sxc[valid], rtol=1e-4,
                               atol=1e-2)
            assert mism.mean() < 0.005, f"band {i}: sxc mismatch {mism.mean()}"
            assert np.allclose(got_bw[valid], bw[valid]), f"band {i}: basew"


@pytest.mark.scan_slow
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


@pytest.mark.scan_slow
def test_scan_big_grid_matches_standard(checker_texture):
    """The big_grid kernel variant (per-chunk window DMA, curve-free march —
    the BASELINE config #4 path, raster_scan.py big_grid) must reproduce the
    standard variant's render on a grid both can handle (round-3 VERDICT:
    the 4K/d12 production path needs CI coverage at tiny scale)."""
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=1)
    mvp = (
        mvp @ np.asarray(transforms.rotation(np.deg2rad(4.0), axis=Axis.Y))
    ).astype(np.float32)
    W, H = 64, 48
    import dataclasses

    big = dataclasses.replace(CFG, big_grid=True)
    got = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, big)
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H
    )
    assert_images_close(got, want, min_psnr=35.0, max_diff_frac=0.02)
    std = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, CFG)
    # Same candidate semantics as the standard variant: near-identical output.
    assert_images_close(got, std, min_psnr=40.0, max_diff_frac=0.005)


@pytest.mark.scan_slow
def test_scan_edge_cull(checker_texture):
    """In-kernel edge culling reproduces the oracle's triangle-level model-z
    spread cull (both reconstruct 3 corner depths; the kernel via the inverse
    MVP). Note backgrounds are opaque (GL clear alpha = 255), so coverage is
    compared via RGB, not alpha."""
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=8)
    mvp = mvp.astype(np.float32)
    W, H = 64, 48
    import dataclasses

    # Brighten the checker's dark squares so covered pixels are RGB-nonzero.
    tex = np.maximum(checker_texture, 32).astype(np.float32)
    cfg = dataclasses.replace(CFG, edge_cull_threshold=0.5)
    got = _render_scan(verts, uvs, mvp, tex, W, H, cfg)
    solid = _render_scan(verts, uvs, mvp, tex, W, H, CFG)
    cov_culled = (got[..., :3].sum(-1) > 0).mean()
    cov_solid = (solid[..., :3].sum(-1) > 0).mean()
    assert cov_culled < cov_solid  # the random-depth scene has stretch to cull
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, np.maximum(checker_texture, 32), W, H,
        edge_cull_threshold=0.5)
    assert_images_close(got, want, min_psnr=35.0, max_diff_frac=0.01)


def test_scan_near_plane_triangles_masked(checker_texture):
    """Scan parity for the near-plane whole-triangle drop (round-3 VERDICT
    missing #5): vertices with clip_w <= 0 must render nothing, matching the
    oracle's documented masking (common.py:21-26) instead of painting
    sign-flipped geometry. Same pose as test_raster's
    test_near_plane_triangles_masked."""
    verts, uvs, idx, _, _ = scene(density=3, size=(24, 32), seed=11,
                                  displacement=4.0)
    W, H = 64, 48
    mvp = (
        np.asarray(transforms.perspective(18.0, W / H))
        @ np.asarray(transforms.translation(dz=-1.0))
    ).astype(np.float32)
    v4 = np.c_[verts, np.ones(len(verts))] @ mvp.T
    assert (v4[:, 3] <= 0).any(), "pose must actually cross the near plane"

    want = np.asarray(raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H))
    got = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, CFG)
    # The oracle masks; the scan must not paint flipped geometry where the
    # oracle has background.
    oracle_bg = want[..., :3].sum(-1) == 0
    painted_over_bg = (got[..., :3].sum(-1) > 0) & oracle_bg
    assert painted_over_bg.mean() < 0.01, (
        f"scan paints {painted_over_bg.mean():.1%} of oracle-background "
        "pixels at a near-plane-crossing pose"
    )
    assert_images_close(got, want, min_psnr=25.0, max_diff_frac=0.05)


@pytest.mark.scan_slow
def test_scan_narrow_march_matches_wide(checker_texture):
    """The prep-centered 128-column narrow march window (round 3) must match
    the full-cw wide sweep wherever prep declares a block narrow-eligible —
    its pair-span bound is rigorous (plus the 66 px silhouette slack), so on
    a fold-free scene the outputs are identical; forcing mid = -1 replays
    the same frame through the wide path for comparison."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 257  # density-8 grid: CL = 384 >= cw + 128, so cw=256 is legal
    W, H = 192, 96
    depth = rng.uniform(0.55, 0.75, (n, n))  # gentle relief: no folds
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(1, -1, n))
    verts = np.stack([xs, ys, depth], axis=-1).astype(np.float32)
    uvs = np.stack([np.meshgrid(np.linspace(0, 1, n),
                                np.linspace(1, 0, n))[0],
                    np.meshgrid(np.linspace(0, 1, n),
                                np.linspace(1, 0, n))[1]], -1
                   ).reshape(-1, 2).astype(np.float32)
    mvp = (np.asarray(transforms.perspective(18.0, W / H))
           @ np.asarray(transforms.translation(dz=-4.0))).astype(np.float32)

    cfg = raster_scan.suggest_scan_config(n, W, H)
    assert cfg.cw >= 256, f"test needs a narrow-eligible config, got {cfg}"
    win, w0, bounds, canch, mid, _ = raster_scan._prep_scan(
        jnp.asarray(mvp), jnp.asarray(verts), W, H, cfg)
    mid_np = np.asarray(mid)
    assert (mid_np >= 0).mean() > 0.5, (
        f"expected mostly narrow-eligible blocks, got {(mid_np >= 0).mean():.0%}")

    minv = np.linalg.inv(np.asarray(mvp, np.float64))
    minv_rows = jnp.asarray(
        np.concatenate([minv[2], minv[3]]).astype(np.float32))
    tex = checker_texture.astype(np.float32)
    ht, wt = tex.shape[0], tex.shape[1]
    rpad_t = max(-(-ht // 8) * 8, cfg.tex_rows)
    cpad_t = max(-(-wt // 128) * 128, cfg.tex_cols)
    texq = raster_scan._pack_texture(jnp.asarray(tex), rpad_t, cpad_t)

    def run(mid_arr):
        with pltpu.force_tpu_interpret_mode():
            bands = raster_scan._raster_scan_pallas(
                jnp.asarray(win)[None], texq, (ht, wt), minv_rows[None],
                jnp.asarray(w0)[None], jnp.asarray(bounds)[None],
                jnp.asarray(canch)[None], jnp.asarray(mid_arr)[None],
                W, H, n, n, cfg, mode="texture", interpret=True)
        u8 = np.asarray(bands).view(np.uint8).reshape(1, -1, bands.shape[-1], 4)
        return u8[0, :H, :W]

    got_narrow = run(mid_np)
    got_wide = run(np.full_like(mid_np, -1))
    same = (got_narrow == got_wide).all(axis=-1).mean()
    assert same > 0.999, f"narrow vs wide agreement {same:.4%}"


@pytest.mark.scan_slow
def test_scan_slot_gate_matches_full(checker_texture):
    """The per-(band, chunk) slot-1 capture gate must be bit-exact: prep's
    monotonicity-violation count provably covers every double crossing, so
    rendering with the computed gate bits equals forcing every chunk through
    the full nbr-slot capture body. The scene needs real folds (a depth step)
    so gated and ungated chunks both occur."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = 65
    W, H = 96, 72
    depth = rng.uniform(0.55, 0.6, (n, n))
    # Slot 1 fires only when ONE COLUMN's polyline crosses a scanline twice,
    # i.e. sy is non-monotone ALONG the column — a horizontal silhouette
    # (row-wise depth step) seen from a tilted camera, not the vertical fold
    # class (which occludes across columns within one crossing each).
    # 98 TRUE double crossings at these parameters (host-counted from the
    # projected window; both sheets visible), with 7/9 chunks flagged and 2
    # provably-monotone chunks gated — so the comparison exercises both
    # solve bodies against real slot-1 records.
    depth[n // 2:, :] += 0.3
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(1, -1, n))
    verts = np.stack([xs, ys, depth], axis=-1).astype(np.float32)
    mvp = (
        np.asarray(transforms.perspective(25.0, W / H))
        @ np.asarray(transforms.translation(dz=-2.2))
        @ np.asarray(transforms.rotation(np.deg2rad(45.0), axis=Axis.X))
    ).astype(np.float32)

    cfg = CFG_MED
    win, w0, bounds, canch, mid, _ = raster_scan._prep_scan(
        jnp.asarray(mvp), jnp.asarray(verts), W, H, cfg)
    bounds_np = np.asarray(bounds)
    gate_bits = (bounds_np >> 24) & 1
    assert gate_bits.any(), "expected some multi-crossing chunks (fold scene)"
    assert (gate_bits == 0).any(), "expected some gated (monotone) chunks"

    minv = np.linalg.inv(np.asarray(mvp, np.float64))
    minv_rows = jnp.asarray(
        np.concatenate([minv[2], minv[3]]).astype(np.float32))
    tex = checker_texture.astype(np.float32)
    ht, wt = tex.shape[0], tex.shape[1]
    rpad_t = max(-(-ht // 8) * 8, cfg.tex_rows)
    cpad_t = max(-(-wt // 128) * 128, cfg.tex_cols)
    texq = raster_scan._pack_texture(jnp.asarray(tex), rpad_t, cpad_t)

    def run(bounds_arr):
        with pltpu.force_tpu_interpret_mode():
            bands = raster_scan._raster_scan_pallas(
                jnp.asarray(win)[None], texq, (ht, wt), minv_rows[None],
                jnp.asarray(w0)[None], jnp.asarray(bounds_arr)[None],
                jnp.asarray(canch)[None], jnp.asarray(mid)[None],
                W, H, n, n, cfg, mode="texture", interpret=True)
        u8 = np.asarray(bands).view(np.uint8).reshape(1, -1, bands.shape[-1], 4)
        return u8[0, :H, :W]

    got_gated = run(bounds_np)
    got_full = run(bounds_np | (1 << 24))
    assert (got_gated == got_full).all(), (
        f"slot-gate mismatch on {(got_gated != got_full).any(-1).sum()} px"
    )


@pytest.mark.scan_slow
def test_scan_pack_xy_matches_unpacked(checker_texture):
    """pack_xy stores strip (sx, sy) as one fixed-point plane, delta-coded at
    1/256 px against the record's crossing x and the band scanline anchor;
    the render must match the unpacked path up to that quantisation. Run both
    a smooth scene and the slot-gate fold scene so the packed
    realign/passthrough paths are both exercised."""
    import jax.numpy as jnp

    def render(depth_fn, rot, dz, pack):
        rng = np.random.default_rng(11)
        n = 65
        W, H = 96, 72
        depth = depth_fn(rng, n)
        xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(1, -1, n))
        verts = np.stack([xs, ys, depth], axis=-1).astype(np.float32)
        uvs = np.stack(np.meshgrid(np.linspace(0, 1, n),
                                   np.linspace(1, 0, n)), -1
                       ).reshape(-1, 2).astype(np.float32)
        mvp = (
            np.asarray(transforms.perspective(25.0, W / H))
            @ np.asarray(transforms.translation(dz=dz))
            @ np.asarray(transforms.rotation(np.deg2rad(rot), axis=Axis.X))
        ).astype(np.float32)
        cfg = ScanConfig(rmax=40, cw=128, sr=10, off=4, pack_xy=pack)
        return _render_scan(verts.reshape(-1, 3), uvs, mvp,
                            checker_texture.astype(np.float32), W, H, cfg)

    smooth = lambda rng, n: rng.uniform(0.55, 0.65, (n, n))

    def folded(rng, n):
        d = rng.uniform(0.55, 0.6, (n, n))
        d[n // 2:, :] += 0.3
        return d

    for name, fn, rot, dz in (("smooth", smooth, 5.0, -3.0),
                              ("folded", folded, 45.0, -2.2)):
        a = render(fn, rot, dz, False)
        b = render(fn, rot, dz, True)
        same = (a == b).all(axis=-1).mean()
        # At this toy scale cells are ~1 px, so ~4% of pixels sit within the
        # 1/32-px quantisation band of an edge and legitimately flip (checker
        # texture makes any flip a full-color diff). The thresholds here are
        # a STRUCTURAL gate (mis-indexed planes render garbage, not 90%+
        # agreement); the production-scale quality verdict is the bench's
        # scan-vs-grid flip-rate/PSNR diagnostics under --scan-overrides
        # pack_xy=1.
        assert same > 0.90, f"{name}: packed vs unpacked agreement {same:.4%}"
        cov_same = ((a[..., 3] > 0) == (b[..., 3] > 0)).mean()
        assert cov_same > 0.97, f"{name}: coverage agreement {cov_same:.4%}"


@pytest.mark.scan_slow
def test_scan_dual_col_matches_oracle(checker_texture):
    """dual_col captures the right column's corners at the record's OWN rows
    (self-contained records, no neighbour realign); it must stay a valid
    rasteriser against the oracle — with at-least-as-good coverage as the
    single-column path (the realign-cap class becomes reachable)."""
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=1)
    W, H = 64, 48
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H
    )
    cfg_dual = ScanConfig(rmax=16, cw=128, sr=8, off=3, dual_col=True)
    got = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                       W, H, cfg_dual)
    assert_images_close(got, want, min_psnr=35.0, max_diff_frac=0.02)
    cov_w = want[..., 3] > 0
    cov_d = got[..., 3] > 0
    assert (cov_w == cov_d).mean() > 0.98

    # vs the single-column path: dual must never LOSE covered pixels the
    # single path renders (it only adds reachable corners); packed variant
    # must track the unpacked one through the dual planes too.
    got_single = _render_scan(verts, uvs, mvp,
                              checker_texture.astype(np.float32), W, H, CFG)
    cov_s = got_single[..., 3] > 0
    lost = (cov_s & ~cov_d).mean()
    assert lost < 0.002, f"dual_col lost {lost:.4%} covered pixels"

    cfg_dual_packed = ScanConfig(rmax=16, cw=128, sr=8, off=3, dual_col=True,
                                 pack_xy=True)
    got_p = _render_scan(verts, uvs, mvp, checker_texture.astype(np.float32),
                         W, H, cfg_dual_packed)
    same = (got_p == got).all(axis=-1).mean()
    assert same > 0.90, f"dual packed vs unpacked agreement {same:.4%}"


@pytest.mark.scan_slow
def test_scan_patch_closes_flagged_holes():
    """The hole-driven sparse patch pass (``ScanConfig.patch``) must close
    every pass-1 coverage hole its flag logic marks (background strictly
    inside a covered column/row span), leave unflagged pixels no worse than
    the single pass, and its traceable form must match the eager pipeline
    bit-for-bit. Scene: a fold-heavy random grid at a pose measured to leave
    ~4% single-pass holes at these (deliberately tight) scan knobs."""
    import jax.numpy as jnp

    from depthrenderer_tpu import meshgen

    rng = np.random.default_rng(1)
    depth = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    verts, uvs, idx = meshgen.grid_mesh(depth, 3)
    verts = np.asarray(verts).copy()
    uvs = np.asarray(uvs)
    idx = np.asarray(idx)
    verts[:, 2] *= 4.0
    mvp = (
        np.asarray(transforms.perspective(18.0, 32 / 24))
        @ np.asarray(transforms.translation(dz=-13.0))
        @ np.asarray(transforms.rotation(np.deg2rad(20.0), axis=Axis.Y))
    ).astype(np.float32)
    W, H = 64, 48
    n = 9
    vg = verts.reshape(n, n, 3)
    uvg = uvs.reshape(n, n, 2)
    texf = np.full((24, 32, 4), 200, np.float32)
    want = raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, texf.astype(np.uint8), W, H)

    cfgp = dataclasses.replace(CFG, patch=True)
    with pltpu.force_tpu_interpret_mode():
        _, z1, _ = raster_scan._scan_rgba_z_grouped(
            jnp.asarray(mvp[None]), jnp.asarray(vg), jnp.asarray(texf),
            W, H, CFG, True, 1)
        single = np.asarray(raster_scan.render_frames_scan(
            mvp[None], vg, uvg, texf, W, H, CFG, "texture",
            interpret=True))[0]
        patched = np.asarray(raster_scan.render_frames_scan(
            mvp[None], vg, uvg, texf, W, H, cfgp, "texture",
            interpret=True))[0]
        traced = np.asarray(raster_scan.render_frames_scan_traceable(
            jnp.asarray(mvp[None]), jnp.asarray(vg), jnp.asarray(uvg),
            jnp.asarray(texf), W, H, cfgp, "texture", interpret=True))[0]

    # Recompute the flag mask the pipeline used (pixel-granular form).
    z = np.asarray(z1)[0, :H, :W]
    cov = z < raster_scan._FAR * 0.5
    rr = np.arange(H)[:, None]
    cc = np.arange(W)[None, :]
    big = 1 << 20
    ymin = np.where(cov, rr, big).min(axis=0)
    ymax = np.where(cov, rr, -1).max(axis=0)
    xmin = np.where(cov, cc, big).min(axis=1)
    xmax = np.where(cov, cc, -1).max(axis=1)
    flag = ~cov & (((rr > ymin[None]) & (rr < ymax[None]))
                   | ((cc > xmin[:, None]) & (cc < xmax[:, None])))
    ocov = want.max(axis=-1) > 0
    flagged_holes = flag & ocov
    assert flagged_holes.sum() > 100  # the scene exercises the machinery

    closed = (np.abs(patched.astype(int) - want.astype(int)).max(axis=-1)
              <= 8)
    assert closed[flagged_holes].all(), (
        f"{(~closed & flagged_holes).sum()} flagged holes left open")

    def flips(a):
        return (np.abs(a.astype(int) - want.astype(int)).max(axis=-1)
                > 8).mean()

    assert flips(patched) < 0.55 * flips(single), (flips(patched),
                                                   flips(single))
    assert np.array_equal(traced, patched)


@pytest.mark.scan_slow
def test_scan_mxu_march_bit_exact(checker_texture):
    """The MXU exclusive-hit march (round 4) must be byte-identical to the
    dense sweep: eligible blocks' one-hot matmul reproduces the dense answer
    exactly (bf16-exact products, f32 accumulation) and multi-hit blocks fall
    back to the dense sweep in-kernel. The fold-heavy random-depth scene
    exercises both branches (folds -> multi-hit fallback; smooth regions ->
    the matmul). Production-config (cw=256, narrow-march) exactness is
    A/B-verified on chip (ROADMAP round-4 log)."""
    verts, uvs, idx, mvp, _ = scene(density=4, size=(48, 64), seed=3,
                                    displacement=10.0)
    W, H = 128, 96
    n = 17
    vg = verts.reshape(n, n, 3)
    uvg = uvs.reshape(n, n, 2)
    texf = checker_texture.astype(np.float32)
    base = dataclasses.replace(CFG, rmax=24, hyps=1)
    with pltpu.force_tpu_interpret_mode():
        dense = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H, base, "texture", interpret=True))
        mxu = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H,
            dataclasses.replace(base, mxu_march=True), "texture",
            interpret=True))
    assert np.array_equal(dense, mxu), (
        f"{(dense != mxu).any(-1).sum()} pixels differ between the MXU and "
        f"dense marches")


@pytest.mark.scan_slow
def test_scan_colfix_closes_holes(checker_texture):
    """The column-exhaustive hole fill (round 4, ScanConfig.colfix) must
    close most coverage holes WITHOUT breaking covered pixels: for blocks
    with uncovered-but-bracketed pixels it exact-tests every scanned window
    row at a column fan around each slot's marched top-1 column, so the
    strip-window and realign-cap classes (covering row outside the sr-row
    strip) recover. The pixel-scale-cell random-depth scene (n-1 == W cells)
    is the class's home turf: measured here base 875 holes -> 26 at K=2
    with 1186/1722 oracle flips fixed and one near-tie flip introduced."""
    verts, uvs, idx, mvp, _ = scene(density=6, size=(48, 64), seed=3,
                                    displacement=10.0)
    W, H = 64, 48
    n = 65
    vg = verts.reshape(n, n, 3)
    uvg = uvs.reshape(n, n, 2)
    texf = checker_texture.astype(np.float32)
    want = np.asarray(raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H))
    base_cfg = dataclasses.replace(CFG_MED, rmax=48)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H, base_cfg, "texture", interpret=True))
        fixed = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H,
            dataclasses.replace(base_cfg, colfix=2), "texture",
            interpret=True))

    def flips(img):
        return np.abs(img.astype(int) - want.astype(int)).max(-1) > 8

    def holes(img):
        return (flips(img) & (img[..., :3] == 0).all(-1)
                & ~(want[..., :3] == 0).all(-1))

    fb, hb = flips(base), holes(base)
    fx, hx = flips(fixed), holes(fixed)
    assert hb.sum() > 200, "scene no longer exhibits the hole class"
    assert hx.sum() < 0.1 * hb.sum(), (hb.sum(), hx.sum())
    broke = (~fb & fx).sum()
    assert broke <= max(2, (fb & ~fx).sum() // 100), (
        f"colfix broke {broke} previously-correct pixels")


@pytest.mark.scan_slow
def test_scan_colfix_production_window_shape(checker_texture):
    """colfix at the PRODUCTION gather shape: cw=256 with a CL=384 window is
    the only config class where the fixup's dynamically-based 2-subtable
    gather (base = min bracket >> 7) actually moves — the small-grid tests
    above all collapse to one subtable. Gates the same no-false-coverage /
    hole-closure contract on an n=257 grid (the on-chip 1080p/d10 A/B
    measured identical fidelity for the dynamic window vs the static
    3-subtable chain; this pins the interpret-mode equivalent)."""
    verts, uvs, idx, mvp, _ = scene(density=8, size=(48, 64), seed=3,
                                    displacement=10.0)
    W, H = 256, 64
    n = 257
    vg = verts.reshape(n, n, 3)
    uvg = uvs.reshape(n, n, 2)
    texf = checker_texture.astype(np.float32)
    want = np.asarray(raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H))
    base_cfg = ScanConfig(rmax=96, cw=256, sr=6, off=2, dmax=4)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H, base_cfg, "texture", interpret=True))
        fixed = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H,
            dataclasses.replace(base_cfg, colfix=1), "texture",
            interpret=True))

    def flips(img):
        return np.abs(img.astype(int) - want.astype(int)).max(-1) > 8

    fb, fx = flips(base), flips(fixed)
    assert fx.sum() <= fb.sum(), (fb.sum(), fx.sum())
    broke = (~fb & fx).sum()
    assert broke <= max(2, (fb & ~fx).sum() // 8), (
        f"colfix (2-subtable window) broke {broke} pixels, "
        f"fixed {(fb & ~fx).sum()}")


@pytest.mark.scan_slow
def test_scan_colfix_big_grid_closes_holes(checker_texture):
    """colfix on the big_grid variant (round 5, the preset-4 fidelity fix):
    the fan windows are DMA'd fresh from HBM with per-subtable global row
    ranges (the per-chunk solve scratch is stale by march time). Same
    contract as the standard-variant test: close most holes, break no
    previously-correct pixels. The d12 hole forensics measured the fan's
    classes (march-rank + strip-window + realign-cap + slot overflow) at
    ~83% of preset-4 holes (experiments/p4_classify.py)."""
    verts, uvs, idx, mvp, _ = scene(density=6, size=(48, 64), seed=3,
                                    displacement=10.0)
    W, H = 64, 48
    n = 65
    vg = verts.reshape(n, n, 3)
    uvg = uvs.reshape(n, n, 2)
    texf = checker_texture.astype(np.float32)
    want = np.asarray(raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, checker_texture, W, H))
    base_cfg = dataclasses.replace(CFG_MED, rmax=48, big_grid=True)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H, base_cfg, "texture", interpret=True))
        fixed = np.asarray(raster_scan.render_frame_scan(
            mvp, vg, uvg, texf, W, H,
            dataclasses.replace(base_cfg, colfix=2), "texture",
            interpret=True))

    def flips(img):
        return np.abs(img.astype(int) - want.astype(int)).max(-1) > 8

    def holes(img):
        return (flips(img) & (img[..., :3] == 0).all(-1)
                & ~(want[..., :3] == 0).all(-1))

    fb, hb = flips(base), holes(base)
    fx, hx = flips(fixed), holes(fixed)
    assert hb.sum() > 200, "scene no longer exhibits the hole class"
    assert hx.sum() < 0.15 * hb.sum(), (hb.sum(), hx.sum())
    broke = (~fb & fx).sum()
    assert broke <= max(2, (fb & ~fx).sum() // 100), (
        f"big_grid colfix broke {broke} previously-correct pixels")
