"""Pallas TPU inverse rasteriser — the column-crossing scan.

Replaces the candidate-generation role of the GL pipeline's rasteriser
(/root/reference/DepthRenderer/render.py:448 glDrawElements) for *grid* meshes
at production density, where the projected cells are pixel-scale and novel-view
rendering is a resampling problem: for each pixel, find the grid cell whose
projected micro-triangle covers it, instead of testing every pixel against
every candidate triangle (the tiled pair kernel's ~1000x overtest,
ROADMAP.md "round-2 design").

Algorithm (validated in experiments/scan_proto3.py against a windowed
exhaustive reference: 99.5-99.9%% exact-winner agreement at d10/1080p on the
default sway path; residual misses are stretched depth-edge triangles — the
same class the tiled path's binning quantile drops, and exact under edge
culling):

1. **Column solve** (per 8-pixel-row band, scanning a depth-hull row window):
   for each pixel row y and grid column c, find the rows where the projected
   column polyline crosses the scanline qy ( sy[r,c] >= qy > sy[r+1,c] ).
   The first ``nbr`` crossings in row order become *slots* (fold sheets own
   separate slots). Each (y, slot, c) record stores the crossing x (sxc),
   crossing depth (zc), bracket row (basew, window-local), and a vertical
   *strip* of raw corner values sx/sy/z at rows basew-off .. basew-off+sr-1 —
   captured in-loop from a rolling row ring, so the record is self-contained
   and every later read is a gather along the **column axis only** (Mosaic
   cannot lower 2D dynamic gathers; lane-dim gathers measure ~5.8 ns per
   (8,128) vector, ROADMAP.md "Round-2 measurements").
2. **March** (per 128-pixel block): the crossing-x curve sxc(y, slot, ·) is
   transposed sublane-major once per band; a dense (cw x 128) outer sign test
   finds columns whose crossing brackets the pixel's qx, keeping the best
   ``hyps`` by crossing depth.
3. **Exact tests**: for each hypothesis, gather the record at column c* and
   its right neighbour, realign the neighbour strip by the bracket-row delta,
   and run the oracle's exact edge functions on the sr-1 cells x 2 triangles.
   Depth ties break to the lowest triangle id (GL first-drawn semantics,
   matching ops/raster_reference.py).

Perspective-correct attributes use the analytic inverse: for a grid mesh the
corner UVs are affine in (row, col), and 1/w (and model z) of any corner are
linear in its NDC coordinates via rows of the inverse MVP, so strips carry only
(sx, sy, z) and the kernel reconstructs inv_w = minv[3] . [ndc, 1] per corner.

Stages mirror the tiled Pallas path (raster_pallas.py): XLA prep (projection +
hull bands + march anchors), one fused Pallas kernel (grid over pixel-row
bands), XLA shade (common.shade — texture semantics of shader.frag:8).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import common

_FAR = float(common.FAR_SENTINEL)
_NOBASE = -1.0e9  # basew sentinel for invalid records (fails every row test)


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """Static configuration for the column-crossing-scan rasteriser.

    :param rmax: projected-grid rows DMA'd per band; must cover the depth-hull
        row span (measured mean ~111, max 229 at d10/1080p on the sway path)
        plus margins. Hull rows beyond this are clipped (reported by prep's
        overflow diagnostic).
    :param cw: march window width in grid columns (multiple of 128). Must cover
        the anchor spread (measured ~[-30, +42] cols at p99.9) plus the block's
        own 128-pixel extent in cells.
    :param sr: strip rows per record; cells tested per record = sr - 1.
    :param off: strip start offset above the bracket row.
    :param nbr: crossing slots kept per (pixel row, column).
    :param hyps: march hypotheses kept per slot (1 = top crossing by depth,
        2 = top two; 2 costs ~2x fetch/exact work for ~+0.3pp winner agreement).
    :param margin: hull margin in grid rows.
    :param dmax: cap on the neighbour-strip realign delta (None = full
        +-(sr-1) range). +-5 saves ~0.9 ms/frame at -0.22pp winner agreement
        (scan_proto3 DMAX sweep).
    :param big_grid: the large-grid kernel variant (d11/d12, BASELINE config
        #4): the row window is DMA'd PER 128-COLUMN CHUNK (per-chunk spans
        stay under rmax even at d12 — measured max 287 rows at 4K/d12 —
        where the band-union window would need ~1280 rows and 65 MB of VMEM),
        records store GLOBAL base rows, and the march reads the record table
        directly through 128-aligned lane slices + a per-block (8, W)->(W, 8)
        transpose instead of the sublane-major curve scratch (whose lane-dim
        padding costs 16x VMEM at d12).
    :param edge_cull_threshold: if set, cull cells whose corner model-z spread
        exceeds this value inside the kernel — the scan-path equivalent of
        RasterConfig.edge_cull_threshold (depth-discontinuity culling; the
        reference GL path never culls, SURVEY §7 step 7 adds it for the
        "rubber sheet" stretch class).
    """

    rmax: int = 320
    cw: int = 256
    sr: int = 12
    off: int = 5
    nbr: int = 2
    hyps: int = 2
    margin: int = 10
    dmax: int | None = None
    edge_cull_threshold: float | None = None
    big_grid: bool = False
    # Pack each strip row's (sx, sy) into ONE 16+16-bit fixed-point plane,
    # DELTA-coded at 1/256 px against the record's own crossing x (plane 0)
    # and the band scanline anchor (``_DELTA_QP``) — finer than llvmpipe's
    # own subpixel snapping, so the coding is quality-neutral (the earlier
    # absolute 1/32-px coding cost a measured ~0.7-1.2 dB GL PSNR at
    # 1080p/d10). Cuts the record fetch from 2 + 2*3*sr to 4 + 2*2*sr
    # gathers per pair and the realign selects by a third; corners unpack
    # once per exact pass. Deltas beyond +-128 px clamp (stretched fold
    # corners only — the documented candidate-compromise class; the z
    # channel stays exact f32, so depth tests and near-plane rejection are
    # unaffected). Standard-variant only for now (big_grid untested).
    pack_xy: bool = False
    # Dual-column strips (round 3): capture the +1-lane-rolled window row
    # BESIDE each strip row, so a record carries its right column's corners
    # at its OWN rows — records become self-contained and the whole
    # neighbour-record fetch + shear-realign machinery (and its ``dmax``
    # cap) disappears from the exact pass. Kills the realign-cap hole class
    # (34% of the residual coverage holes, ROADMAP.md forensics) exactly:
    # the right corners come from the window at the left record's rows,
    # which no realign of the neighbour's differently-anchored strip can
    # always reach. Costs ~2x capture selects + 2x record VMEM.
    # Standard-variant only: big_grid's per-chunk window DMA does not hold
    # the next chunk's column for the lane-127 roll boundary.
    dual_col: bool = False
    # Row-edge record family (round 3, host-orchestrated): render a SECOND,
    # transposed pass whose records anchor on crossings of grid ROWS with
    # vertical scanlines, and merge the two passes by depth. Kills the
    # strip-window coverage-hole class exactly (55% of the residual holes,
    # ROADMAP.md forensics: pixels entering a cell through a horizontal
    # edge, whose column-crossing anchor is >= off rows away). The kernel
    # never sees this flag — ``render_frames_scan`` dispatches to the
    # two-pass pipeline (see ``render_frames_scan_quality``); ~2.2x cost.
    # Standard-variant only (the transposed pass reuses the same kernel).
    row_edge: bool = False
    # Hole-driven sparse patch pass (round 4): after the standard pass, flag
    # the background pixels that sit strictly INSIDE their screen column's
    # covered span (the coverage-hole classes: strip-window folds, slot
    # overflow — genuine background can never be vertically enclosed by a
    # heightfield's silhouette at the supported poses), then re-run the
    # transposed row-edge pass ONLY on the flagged work: unflagged transposed
    # bands skip in-kernel (sparse_bands), unflagged blocks are gated via the
    # prep ``mid = -2`` sentinel, and solve chunks no flagged block can fetch
    # from get zeroed bounds. Recovers most of the quality mode's hole
    # closure at a small fraction of its cost (holes cover ~1% of pixels in
    # patches). The kernel never sees this flag — ``render_frames_scan``
    # dispatches to the patched pipeline. Standard variant, texture mode.
    patch: bool = False
    # MXU exclusive-hit march (round 4): at hyps=1, when no (scanline, pixel)
    # has two REAL-keyed bracket intervals (every block away from fold sheets
    # and overlapping silhouette stretches), the dense march's per-scanline
    # where/min-reduce chains collapse to sums — ONE (16, 8*Lw) @ (8*Lw, 128)
    # bf16 matmul on the MXU (block-diagonal iota/ones lhs) returns every
    # scanline's hit column and hit count at once. All products are bf16-exact
    # (hit in {0,1}, column ids <= 256, f32 accumulation), so eligible blocks
    # reproduce the dense answer exactly; blocks whose count proves a
    # multi-hit lane (depth must arbitrate) fall back to the dense sweep via
    # one block-level branch. Standard variant, hyps=1, cw <= 256.
    #
    # MEASURED NEUTRAL-TO-SLOWER on v5e (round 4, default OFF): 83.1-84.6 fps
    # vs 86.7-87.3 dense at 1080p/d10, byte-identical output. Confirms the
    # round-3 finding from the opposite direction: the march is bound by the
    # (Lw, 128) interval-test compute, which the matmul cannot absorb — and
    # the (8*Lw, 128) bf16 stack costs ~64 VREG stores + MXU reloads per
    # slot-block (~0.5 ms/frame) while the removed reduce chain was only
    # ~0.4 us. Kept behind this flag (with the bit-exactness test) because
    # the trade may flip on hardware with a different MXU:VPU cost ratio.
    mxu_march: bool = False
    # In-kernel column-exhaustive hole fill (round 4, "colfix"): after the
    # per-slot march + exact passes, blocks that still hold UNCOVERED pixels
    # with a real marched bracket re-test, per slot, EVERY scanned window row
    # at a (2*colfix+1)-cell column fan around that slot's marched top-1
    # column — straight from the band window resident in VMEM (corners =
    # raw (sx, sy, z) rows; u/v/1/w are analytic), so no records, no strip
    # limit, no realign. Attacks the two dominant hole classes at their
    # shared root (ROADMAP forensics: strip-window 55% + realign-cap 34% of
    # default holes BOTH have a correct marched bracket — only the captured
    # sr-row strip misses the covering cell's row; the host replay measures
    # the covering row inside the chunk scan bounds for 100% of sampled
    # holes, and the covering column within +-K of a slot's top-1 for
    # 56/76/86% at K=0/1/2). Exact-test-gated: can only ADD true covering
    # cells, never false coverage. Value = the fan half-width K; None = off.
    # Standard variant, cw <= 256 (the window gather reuses the fetch
    # table's 128-lane subtable chain), not with mxu_march (needs the dense
    # sweep's min key to flag real-bracket pixels).
    colfix: int | None = None
    # In-kernel shading texture window (per 128-pixel block): rows / cols of
    # the packed-RGBA texture DMA'd to VMEM. Sized from the measured per-block
    # texture-coordinate spread on the sway path at d10/1080p (ty <= 118 px,
    # tx <= 237 px); outliers clamp to the window edge (bounded mis-sample at
    # extreme depth folds, same class as the candidate compromise).
    tex_rows: int = 128
    tex_cols: int = 384

    def __post_init__(self):
        assert self.cw % 128 == 0 and self.cw >= 128
        assert 0 < self.off < self.sr
        assert 1 <= self.nbr <= 4
        assert self.hyps in (1, 2)
        assert self.rmax % 8 == 0
        # packed per-chunk bounds: 12-bit kb/ke (standard), 9-bit (big_grid)
        assert self.rmax < (512 if self.big_grid else 4096)
        assert self.tex_rows % 8 == 0 and self.tex_cols % 128 == 0
        assert self.dmax is None or 1 <= self.dmax <= self.sr - 1
        assert not (self.pack_xy and self.big_grid), \
            "pack_xy is standard-variant only (untested with big_grid)"
        assert not (self.dual_col and self.big_grid), \
            "dual_col is standard-variant only (big_grid's per-chunk window" \
            " lacks the next chunk's column for the roll boundary)"
        assert not (self.row_edge and self.big_grid), \
            "row_edge is standard-variant only (the transposed pass reuses" \
            " the standard kernel)"
        assert not (self.patch and self.big_grid), \
            "patch is standard-variant only (the sparse transposed pass" \
            " reuses the standard kernel)"
        assert not (self.patch and self.row_edge), \
            "patch and row_edge are exclusive (row_edge already runs the" \
            " full transposed pass)"
        assert not (self.mxu_march and (self.big_grid or self.hyps != 1
                                        or self.cw > 256)), \
            "mxu_march is standard-variant, hyps=1, cw <= 256 only (bf16 " \
            "column ids are exact only up to 256; hyps=2 needs the dense " \
            "sweep's counts and second-minimum)"
        assert self.colfix is None or (
            not self.mxu_march and 0 <= self.colfix <= 3), \
            "colfix fan K in [0, 3]; not combinable with mxu_march (the " \
            "fixup flags real-bracket pixels off the dense sweep's min " \
            "key). The march-structure requirement (standard cw <= 384 or " \
            "big_grid, so h1/m1 thread out of the sweep) is checked at " \
            "kernel-build time — suggest_scan_config's intermediate " \
            "standard config may carry a wide cw before the big_grid switch"

    @property
    def nrec(self) -> int:
        """f32 record planes per slot: sxc, zc, basew + sr strip rows of
        (sx, sy, z) — or (packed_xy, z) when ``pack_xy`` — doubled per row
        (left + right column) when ``dual_col``."""
        per_row = (2 if self.pack_xy else 3) * (2 if self.dual_col else 1)
        return 3 + per_row * self.sr


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def scan_supported(grid_n: int, config: ScanConfig | None = None) -> bool:
    """Whether the scan kernel's VMEM budget fits this grid.

    The standard variant needs the (3, rmax, CL) band window plus the
    sublane-major curve scratch; beyond ~d10 that exceeds VMEM and
    ``suggest_scan_config`` switches to the ``big_grid`` variant (per-chunk
    window DMA, no curve scratch), which fits through d12 (n=4097). Callers
    should fall back to the tiled path only when even that fails.
    """
    cfg = config if config is not None else suggest_scan_config(grid_n, 1920,
                                                                1080)
    return _vmem_budget_ok(grid_n, cfg)


def _vmem_budget_ok(grid_n: int, cfg: ScanConfig) -> bool:
    cl = _ceil_to(grid_n, 128)
    rec_bytes = cfg.nbr * cfg.nrec * 8 * cl * 4
    if cfg.big_grid:
        # No curve scratch; window is one 128-column chunk. The record table
        # is the dominant term (8.9 MB at d12/sr=10).
        win_bytes = 3 * cfg.rmax * 128 * 4
        tex_bytes = 2 * cfg.tex_rows * cfg.tex_cols * 4  # double-buffered
        return win_bytes + rec_bytes + tex_bytes < 10 * 2**20
    # Standard variant: DOUBLE-buffered band window (round 3) + records +
    # curve scratch must fit ~16 MB VMEM with compiler headroom.
    win_bytes = 2 * 3 * cfg.rmax * cl * 4
    curve_bytes = cfg.nbr * 2 * cl * 8 * 4
    return win_bytes + rec_bytes + curve_bytes < 13 * 2**20


def suggest_scan_config(grid_n: int, width: int, height: int,
                        quality: bool = False, **overrides) -> ScanConfig:
    """Heuristic scan config for an ``grid_n``-vertex grid at the given output.

    ``rmax`` scales with the grid (the depth-hull row span grows with density;
    measured max 229 rows at n=1025/1080p on the sway path) and is capped at the
    default 320; too-small values are *reported* by prep's overflow diagnostic,
    not silent. ``cw`` covers a 128-pixel block's own extent in cells plus the
    measured fold spread (~±40 cells at n=1025).

    ``quality`` is the user-facing fidelity knob (CLI ``--quality``): it
    selects self-contained dual-column records (kills the realign-cap
    coverage-hole class — 34% of the residual scan-vs-grid holes, ROADMAP.md
    forensics), full sr=12 strip rows and an uncapped realign for any
    non-dual fallback. Slower; standard-variant grids only (the big_grid
    variant at d>=11 falls back to sr/dmax alone).
    """
    rmax_explicit = "rmax" in overrides
    pack_explicit = "pack_xy" in overrides
    dual_explicit = "dual_col" in overrides
    rowe_explicit = "row_edge" in overrides
    colfix_explicit = "colfix" in overrides
    strips_explicit = {k: k in overrides for k in ("sr", "off", "dmax")}
    if quality:
        # Quality mode = the row-edge second pass (kills the strip-window
        # hole class, 55% of residual holes) + dual-column self-contained
        # records (kills realign-cap, 34%). Measured on chip: 1080p/d10
        # flips vs the lossless grid 0.88% -> 0.19%, GL-golden masked PSNR
        # +4.8 dB frontal / +3.0 dB sway40 (~2 dB from the grid's own GL
        # floor at this config); at BASELINE config #1 (VGA/d8) it reaches
        # the grid's own 56.3 dB vs real GL (single pass: 44.7 dB) with
        # 0.009% cross flips. ~4x the fast path's frame time (attrs-mode
        # passes + XLA shade). Interpret validation: 7.3% -> 0.03% oracle
        # flips on the fold-heavy d3 scene (test_scan_row_edge_quality_*).
        overrides.setdefault("row_edge", not overrides.get("big_grid", False))
        overrides.setdefault("dual_col", not overrides.get("big_grid", False))
        overrides.setdefault("sr", 12)
        overrides.setdefault("off", 5)
        overrides.setdefault("dmax", None)
        overrides.setdefault("hyps", 2)
    rmax = overrides.pop(
        "rmax", min(320, _ceil_to(max(grid_n // 3 + 48, 64), 8))
    )
    # Delta-coded pack_xy is quality-neutral on chip (GL-golden PSNR -0.15 dB,
    # flip rate unchanged at 1080p/d10) and saves ~2% frame time — default ON
    # for the standard variant; the big_grid switch below clears it unless the
    # caller forced it (then the ScanConfig assert reports the conflict).
    overrides.setdefault("pack_xy", not overrides.get("big_grid", False))
    # Round-3 production knobs (measured trade-offs, ROADMAP.md): sr=10/off=4
    # (-0.12pp winner agreement) and the +-5 realign cap (-0.22pp) buy
    # ~3.5 ms/frame at d10/1080p; quality-gated by the GL-golden/flip-rate
    # checks (bench.py diagnostics, tests/test_scan.py). Applied BELOW, after
    # the colfix default is resolved — under colfix the strips shrink to
    # sr=6/off=2/dmax=4 at pixel-identical output (round 4, see below).
    # Single march hypothesis at production density (round 3, measured):
    # the gated hypothesis-2 pass costs 2.56 ms/frame on the fold-heavy NYU
    # scene for +0.12pp winner agreement and +1.0 dB GL PSNR — at d>=10,
    # where even the LOSSLESS grid floors at 37-43 dB against real GL
    # (sub-pixel coverage rules), that fidelity sits below the measurement
    # floor, so the default takes the 75.5 -> 90.6 fps. Coarser grids keep
    # hyps=2 (the d8/VGA BASELINE gate has real margin to protect), as does
    # quality mode.
    overrides.setdefault("hyps", 2 if grid_n < 1025 else 1)
    # 4K outputs spread a block's texture footprint wider; one extra 128-col
    # page keeps the clamp-to-window outliers as rare as at 1080p. At <=1080p
    # class outputs the measured spreads (tx <= 237, ty <= 118 p-outlier)
    # clamp only the fold class whose shade error is already bounded — and
    # 256x64 windows shave a measured 0.8 ms/frame off the shade gathers
    # (round-3 profile: 3.68 -> 2.87 ms; quality gated by the bench's
    # GL-golden and lossless-grid cross checks).
    if width > 2048:
        overrides.setdefault("tex_cols", 512)
    else:
        overrides.setdefault("tex_cols", 256)
        overrides.setdefault("tex_rows", 64)
    # The march window anchors on an 8-column grid (sublane alignment of the
    # transposed curve), so cw only needs the span itself: half the block's
    # own extent in cells + the fold/anchor spread (measured -78..+42 cols
    # p99.9 at n=1025, ~ grid_n/13) + margin. Record fetches use a separate
    # 128-aligned table window with its own +128 slack (gather_rec).
    cells_per_block = int(128 * grid_n / max(width, 1))
    half_need = cells_per_block // 2 + grid_n // 13 + 12
    cw = overrides.pop(
        "cw",
        max(128, min(_ceil_to(2 * half_need + 8, 128),
                     _ceil_to(grid_n, 128))),
    )
    # Column-exhaustive hole fill (round 4): default ON for the standard
    # variant. Measured at 1080p/d10 (ROADMAP round-4 log): the fast default
    # (colfix=1) takes flips vs the lossless control 1.00% -> 0.33% and the
    # GL-golden masked PSNR 29.3 -> 33.1 dB frontal / 31.8 -> 35.1 sway40 at
    # 87 -> 59 fps; quality mode (colfix=3) reaches 40.2 dB frontal — the
    # first config to PASS the >= 40 dB BASELINE gate at production density
    # (sway40 38.5 dB, within 0.55 dB of the lossless control's own 39.0 GL
    # floor there). With the fixup recovering every well-bracketed strip
    # miss, the strip machinery itself shrinks: sr=6/off=2/dmax=4 measures
    # PIXEL-IDENTICAL output to sr=10/off=4/dmax=5 under colfix (the sr-
    # induced misses are exactly the class the fixup recovers) at +2.5 fps.
    if (not overrides.get("big_grid", False)
            and not overrides.get("mxu_march", False) and cw <= 384):
        overrides.setdefault("colfix", 3 if quality else 1)
    if overrides.get("colfix") is not None and not quality:
        overrides.setdefault("sr", 6)
        overrides.setdefault("off", 2)
        overrides.setdefault("dmax", 4)
    overrides.setdefault("sr", 10)
    overrides.setdefault("off", 4)
    overrides.setdefault("dmax", 5)
    cfg = ScanConfig(rmax=rmax, cw=cw, **overrides)
    if (cfg.dual_col and not dual_explicit and not cfg.big_grid
            and not _vmem_budget_ok(grid_n, cfg)):
        # Quality mode's doubled record planes can outgrow VMEM before the
        # base config does; shedding dual_col beats losing the whole standard
        # variant (big_grid drops pack_xy and the shared band window too).
        cfg = dataclasses.replace(cfg, dual_col=False)
    if not cfg.big_grid and not _vmem_budget_ok(grid_n, cfg):
        # Large grids (d11/d12): per-chunk window DMA + curve-free march.
        # Per-chunk row spans stay small (measured max 287 at 4K/d12,
        # experiments/hull_stats), so the default rmax applies per chunk.
        # An explicit rmax override survives the variant switch (it only must
        # fit big_grid's 9-bit packed bounds, < 512).
        cfg = dataclasses.replace(
            cfg, big_grid=True,
            pack_xy=cfg.pack_xy if pack_explicit else False,
            dual_col=cfg.dual_col if dual_explicit else False,
            row_edge=cfg.row_edge if rowe_explicit else False,
            patch=False,  # sparse patch is standard-variant only
            # round 5: colfix defaults ON for big_grid too (fan windows
            # DMA'd from HBM) — it is the preset-4 fidelity fix (the d12
            # hole classes — march-rank 34% + strip-window 25% + realign-
            # cap 13% + slot overflow 11%, experiments/p4_classify.py —
            # all die in the exhaustive fan: 24.7 -> 28.9 dB / 1.82% ->
            # 0.70% flips vs the exact control at K=1). The standard-path
            # default above is gated on cw <= 384 and so never fires for
            # big_grid-bound grids; set it here (explicit override wins).
            # big_grid keeps the round-3 strip knobs: at ~0.5-px cells the
            # strips are the only capture and the colfix fan supplements
            # rather than replaces them.
            colfix=cfg.colfix if colfix_explicit else (3 if quality else 1),
            sr=cfg.sr if (strips_explicit["sr"] or quality) else 10,
            off=cfg.off if (strips_explicit["off"] or quality) else 4,
            dmax=cfg.dmax if (strips_explicit["dmax"] or quality) else 5,
            rmax=cfg.rmax if rmax_explicit else min(cfg.rmax, 320))
    return cfg


# ---------------------------------------------------------------------------
# Texture packing (XLA, once per texture)
# ---------------------------------------------------------------------------


# Fixed-point parameters for the DELTA-coded strip pack (round 3, v2): strip
# (sx, sy) are stored relative to the record's own crossing x (``sxc``, record
# plane 0 — fetched anyway by the march/fetch path) and the band's scanline
# anchor row. The deltas are tiny away from folds (the strip spans ~sr grid
# rows around the bracket, a few pixels), so 16 bits buy **1/256-px**
# resolution over a +-128-px span — finer than llvmpipe's own subpixel
# snapping, vs the earlier absolute 1/32-px coding that measurably cost
# ~0.7-1.2 dB GL PSNR at 1080p/d10. Deltas beyond the span clamp (stretched
# fold corners only — the documented candidate-compromise class; the z channel
# stays exact f32, so depth tests and near-plane rejection are unaffected).
_DELTA_QP = (256.0, -128.0, -128.0)


def _band_anchor_y(i, height: int):
    """The band's shared sy reference (scanline center of pixel row i*8+4),
    used by BOTH the capture-time pack and the fetch-time unpack — one
    expression so the two sides are bit-identical f32."""
    return jnp.float32(height) - (i * 8).astype(jnp.float32) - 4.0


def _pack2_xy(x, y, qp):
    """Pack (sx, sy) into one 16+16-bit fixed-point word (scale/offsets from
    ``_DELTA_QP``), bit-stored as f32 so it rides the existing f32
    record planes. Kernel-safe ops only (round, clip, int32 shift/or,
    pltpu.bitcast)."""
    scale, ox, oy = qp
    xi = jnp.clip(jnp.round((x - ox) * scale), 0.0, 65535.0).astype(jnp.int32)
    yi = jnp.clip(jnp.round((y - oy) * scale), 0.0, 65535.0).astype(jnp.int32)
    return pltpu.bitcast((xi << 16) | yi, jnp.float32)


def _unpack2_xy(p, qp):
    """Inverse of :func:`_pack2_xy` (arithmetic shift + mask == logical)."""
    scale, ox, oy = qp
    pi = pltpu.bitcast(p, jnp.int32)
    x = ((pi >> 16) & 0xFFFF).astype(jnp.float32) * (1.0 / scale) + ox
    y = (pi & 0xFFFF).astype(jnp.float32) * (1.0 / scale) + oy
    return x, y


@functools.partial(jax.jit, static_argnames=("rpad", "cpad"))
def _pack_texture(texture_f32, rpad: int, cpad: int):
    """(Ht, Wt, 4) float -> (RPAD, CPAD) uint32 packed RGBA8 (LSB = red).

    Texels quantise to 8 bits before filtering, exactly like
    common.sample_texture_bilinear (GL filters the uploaded RGBA8 texels).
    """
    t8 = jnp.clip(jnp.round(texture_f32), 0.0, 255.0).astype(jnp.uint32)
    p = t8[..., 0] | (t8[..., 1] << 8) | (t8[..., 2] << 16) | (t8[..., 3] << 24)
    return jnp.pad(p, ((0, rpad - p.shape[0]), (0, cpad - p.shape[1])),
                   mode="edge")


# ---------------------------------------------------------------------------
# Stage 1 (XLA): projection, hull bands, march anchors
# ---------------------------------------------------------------------------


def _monotone_interp(q, xp, fp):
    """jnp.interp over a curve that may be increasing or decreasing in xp."""
    flip = xp[-1] < xp[0]
    xp = jnp.where(flip, -xp, xp)
    q = jnp.where(flip, -q, q)
    return jnp.interp(q, xp, fp)


def _prep_scan_impl(mvp, vertex_grid, width, height, config: ScanConfig):
    """Project the grid and derive the kernel's per-band/per-chunk scalars.

    :return: (win, w0, bounds, canch, mid, overflow_rows) where ``win`` is the
        (3, RPAD, CL) channel-major projected grid (sx, sy, z; rows and cols
        edge-padded), ``w0`` is the (nbands,) int32 window origin in 8-row
        units, ``bounds`` is the (nbands, nchunks) int32 PACKED per-128-column
        scan range (kb | ke << 12, window-relative; the round-3 solve lever:
        per-chunk bounds from the chunk's actual projected-sy extrema scan a
        measured ~0.32x of the global hull span at d10/1080p), ``canch`` is
        (nblocks,) int32 march window anchors in 8-column units, and
        ``overflow_rows`` counts hull rows clipped by ``rmax`` (0 = the scan
        saw every candidate row).
    """
    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    mvp = jnp.asarray(mvp, jnp.float32)

    sx, sy, z, inv_w = common.project_vertices(vertex_grid, mvp, width, height)

    # Near-plane masking (parity with the tiled paths' whole-triangle drop,
    # common.py:21-26; reference GL clips per-primitive, render.py:631-634).
    # Vertices behind the camera plane (clip_w <= 0 -> inv_w <= 0) get:
    # (a) sy pushed above every scanline, so no column crossing ever fires on
    #     an edge ENTERING a bad vertex (s_lo = 1e9 is never < qy) — records
    #     only anchor on bad->good edges, where the interpolant lands at the
    #     good endpoint;
    # (b) z = 1e9 (finite — a NaN would poison the kernel's min-reduce slot
    #     gates), so the exact coverage test zz in [-1, 1] fails for every
    #     cell whose triangle touches a bad corner — the whole-triangle drop;
    # (c) sx clamped to a bounded band so the column-mean march anchors stay
    #     finite under sign-flipped projections.
    bad = inv_w <= 0.0
    sy = jnp.where(bad, jnp.float32(1.0e9), sy)
    z = jnp.where(bad, jnp.float32(1.0e9), z)
    sx = jnp.where(bad, jnp.clip(sx, -2.0 * width, 3.0 * width), sx)

    CL = _ceil_to(n_c, 128)
    RPAD = max(_ceil_to(n_r, 8), config.rmax)
    pad = ((0, RPAD - n_r), (0, CL - n_c))
    win = jnp.stack([jnp.pad(a, pad, mode="edge") for a in (sx, sy, z)])

    nbands = -(-height // 8)
    nchunks = CL // 128
    band = jnp.arange(nbands, dtype=jnp.float32)
    qy_top = height - (band * 8.0 + 0.5)   # (nbands,)
    qy_bot = height - (band * 8.0 + 7.5)

    # Per-chunk row bounds from the chunk's ACTUAL projected sy extrema
    # (conservative: a row k can cross a band scanline only if the chunk's
    # max sy[k] reaches the band's bottom and its min sy[k+1] is at or above
    # the band's top — verified to cover every candidate crossing row on the
    # bench path, experiments/hull_stats.py).
    syp = jnp.pad(sy, ((0, 0), (0, CL - n_c)), mode="edge")
    cmin = syp.reshape(n_r, nchunks, 128).min(axis=2)  # (n_r, nchunks)
    cmax = syp.reshape(n_r, nchunks, 128).max(axis=2)
    c_lo = cmin[1:, :] if n_r > 1 else cmin
    c_hi = cmax[:-1, :] if n_r > 1 else cmax
    big = jnp.int32(1 << 20)
    # Two-level first/last-row search (round 3 prep lever): the one-level
    # form broadcast (nbands, n_r-1, nchunks) compare+reduce tensors; an
    # 8-row-block level reduce finds the boundary BLOCKS (10x smaller) and
    # one tiny gather refines the exact first/last row inside them —
    # bit-identical results (validated exactly on CPU).
    nk = c_lo.shape[0]
    nkb = -(-nk // 8)
    pad_r = ((0, nkb * 8 - nk), (0, 0))
    c_lo_p = jnp.pad(c_lo, pad_r, constant_values=3.0e38)   # never <= qy_top
    c_hi_p = jnp.pad(c_hi, pad_r, constant_values=-3.0e38)  # never >= qy_bot
    bl_lo = c_lo_p.reshape(nkb, 8, nchunks).min(axis=1)
    bl_hi = c_hi_p.reshape(nkb, 8, nchunks).max(axis=1)
    bs = jnp.arange(nkb, dtype=jnp.int32)
    b0 = jnp.min(jnp.where(bl_lo[None] <= qy_top[:, None, None],
                           bs[None, :, None], big), axis=1)
    b1 = jnp.max(jnp.where(bl_hi[None] >= qy_bot[:, None, None],
                           bs[None, :, None], -1), axis=1)

    def _rows_of_block(vals, blk):
        """Rows blk*8..blk*8+7 of ``vals`` per (band, chunk)."""
        idx = jnp.clip(blk, 0, nkb - 1)[:, None, :] * 8 \
            + jnp.arange(8, dtype=jnp.int32)[None, :, None]
        return jnp.take_along_axis(
            jnp.broadcast_to(vals[None], (nbands,) + vals.shape), idx, axis=1)

    ri = jnp.arange(8, dtype=jnp.int32)[None, :, None]
    sat0 = _rows_of_block(c_lo_p, b0) <= qy_top[:, None, None]
    k0 = jnp.clip(b0, 0, nkb - 1) * 8 + jnp.min(
        jnp.where(sat0, ri, big), axis=1)
    k0 = jnp.where(b0 >= big, big, k0)  # (nbands, nchunks); big = no row
    sat1 = _rows_of_block(c_hi_p, b1) >= qy_bot[:, None, None]
    k1 = jnp.clip(b1, 0, nkb - 1) * 8 + jnp.max(
        jnp.where(sat1, ri, -big), axis=1)
    k1 = jnp.where(b1 < 0, -1, k1)
    empty = k0 > k1
    r_lo = jnp.clip(k0 - config.margin, 0, max(n_r - 2, 0))
    r_hi = jnp.clip(k1 + config.margin, 0, max(n_r - 2, 0))

    # Scan rows k in [kb, ke): needs row k+1; capture tail needs sr-off-1 more.
    tail = config.sr - config.off
    ke_cap = config.rmax - tail - 1

    # Multi-crossing flag per (band, chunk) — the slot-1 capture gate
    # (round 3). A scanline qy can cross a column's polyline twice only if
    # the column's sy comes back UP over that same qy between the two down-
    # crossings: an up-step pair (s[k] < qy <= s[k+1]) inside the scanned
    # row range. Per chunk, track each up-step row's straddle interval
    # (min s[k] / max s[k+1] over the chunk's violating columns — mixing
    # columns is conservative) and flag a band iff some scanned row's
    # interval meets the band's [qy_bot, qy_top]. Chunks left unflagged
    # provably never fire crossing slot 1, and the kernel runs a capture
    # body with the slot-1 strip selects deleted (~44% of the capture cost
    # at nbr=2). The flag rides bit 24 (standard) / bit 28 (big_grid) of
    # the packed bounds word; every unpacker masks. Measured flag rate at
    # d10/1080p sway: 55-64% of non-empty chunks with a row-range-only
    # test; the qy-straddle refinement cuts the rate further at ~1.7M
    # elementwise ops per frame.
    up = win[1][1:, :] > win[1][:-1, :]                      # (RPAD-1, CL)
    inf = jnp.float32(3.0e38)
    up_lo = jnp.where(up, win[1][:-1, :], inf)               # s[k] of up-steps
    up_hi = jnp.where(up, win[1][1:, :], -inf)               # s[k+1]
    lo_c = up_lo.reshape(RPAD - 1, nchunks, 128).min(axis=2)
    hi_c = up_hi.reshape(RPAD - 1, nchunks, 128).max(axis=2)

    def _multi_flag(kb_g, ke_g):
        # kb_g/ke_g: (nbands, nchunks) global scan bounds (pairs [kb, ke)).
        # Block-granular conservative form (round 3 prep lever): flag iff
        # some 8-row block OVERLAPPING the scan range has an up-step whose
        # straddle interval meets the band. Boundary blocks may overflag
        # (slot-1 capture merely runs where it needn't — never the
        # unsound direction) for a 10x smaller broadcast.
        nr2 = lo_c.shape[0]
        nb2 = -(-nr2 // 8)
        pad2 = ((0, nb2 * 8 - nr2), (0, 0))
        lo_b = jnp.pad(lo_c, pad2, constant_values=3.0e38) \
            .reshape(nb2, 8, nchunks).min(axis=1)
        hi_b = jnp.pad(hi_c, pad2, constant_values=-3.0e38) \
            .reshape(nb2, 8, nchunks).max(axis=1)
        bs2 = jnp.arange(nb2, dtype=jnp.int32)[None, :, None]
        cond = (
            (bs2 * 8 + 7 >= kb_g[:, None, :])
            & (bs2 * 8 < ke_g[:, None, :])
            & (lo_b[None] < qy_top[:, None, None])
            & (hi_b[None] >= qy_bot[:, None, None])
        )
        return jnp.any(cond, axis=1).astype(jnp.int32)
    if config.big_grid:
        # Per-chunk window origin: each 128-column chunk DMAs its own
        # (3, rmax, 128) row window; bounds pack (w0c_units | kb<<10 |
        # ke<<19). Band-level w0 is unused (zeros keep the prefetch shape).
        w0c = jnp.clip(r_lo - (config.off + 3), 0, max(RPAD - config.rmax, 0))
        w0c = (w0c // 8) * 8  # (nbands, nchunks)
        kb = jnp.clip(r_lo - w0c, 0, ke_cap)
        ke = jnp.minimum(r_hi + 1 - w0c,
                         jnp.minimum(n_r - 1 - w0c, ke_cap))
        ke = jnp.maximum(ke, kb)
        kb = jnp.where(empty, 0, kb)
        ke = jnp.where(empty, 0, ke)
        overflow_rows = jnp.sum(
            jnp.where(empty, 0, jnp.maximum((r_hi + 1 - w0c) - ke_cap, 0))
        )
        multi = _multi_flag(w0c + kb, w0c + ke)
        bounds = ((w0c // 8) | (kb << 10) | (ke << 19)
                  | (multi << 28)).astype(jnp.int32)
        bounds = bounds.reshape(-1)  # SMEM pads the LAST dim to 128: keep 1-D
        w0 = jnp.zeros((nbands,), jnp.int32)
    else:
        # Band window origin: min over chunks; strip rows reach off below the
        # first crossing row. Rounded down to a multiple of 8: the kernel's
        # DMA source slice needs a provably sublane-aligned offset (Mosaic:
        # "tile index ... divisible by the tiling (8)"), so w0 is passed in
        # 8-row units.
        r_lo_band = jnp.min(jnp.where(empty, big, r_lo), axis=1)
        r_lo_band = jnp.where(r_lo_band >= big, 0, r_lo_band)
        w0 = jnp.clip(r_lo_band - (config.off + 3),
                      0, max(RPAD - config.rmax, 0))
        w0 = (w0 // 8) * 8  # (nbands,)
        kb = jnp.clip(r_lo - w0[:, None], 0, ke_cap)
        ke = jnp.minimum(r_hi + 1 - w0[:, None],
                         jnp.minimum(n_r - 1 - w0[:, None], ke_cap))
        ke = jnp.maximum(ke, kb)
        kb = jnp.where(empty, 0, kb)
        ke = jnp.where(empty, 0, ke)
        overflow_rows = jnp.sum(
            jnp.where(empty, 0,
                      jnp.maximum((r_hi + 1 - w0[:, None]) - ke_cap, 0))
        )
        # (nbands * nchunks,) flattened: a trailing dim of `nchunks` would be
        # SMEM-padded to 128 lanes (measured 1.06 MB > the 1 MiB SMEM budget
        # at T=16/1080p/d10); flat it stays at ~5 KB per frame.
        multi = _multi_flag(w0[:, None] + kb, w0[:, None] + ke)
        bounds = (kb | (ke << 12) | (multi << 24)).astype(jnp.int32).reshape(-1)

    # March anchors per 128-pixel block from the mean projected column x,
    # in 8-column units (the transposed curve slices on the sublane grid;
    # the fetch-table window adds its own 128-aligned slack in the kernel).
    col_x = sx.mean(axis=0)  # (n_c,)
    nblocks = -(-width // 128)
    qx_c = jnp.arange(nblocks, dtype=jnp.float32) * 128.0 + 64.0
    c0 = _monotone_interp(qx_c, col_x, jnp.arange(n_c, dtype=jnp.float32))
    canch = jnp.clip(
        jnp.round((c0 - config.cw / 2.0) / 8.0).astype(jnp.int32),
        0,
        max((CL - config.cw - 128) // 8, 0),
    )

    # Centered NARROW march window per (band, block) — round-3 lever. The
    # dense march sign-tests all cw columns; here prep bounds the candidate
    # PAIR bases rigorously: sxc(y, c) interpolates two window rows, so it
    # lies in [min, max] of column c's sx over the band's row window, and a
    # pair (c, c+1) can bracket a block pixel only if the union of the two
    # columns' intervals meets the block's qx range. When all candidate pair
    # bases fit a 120-column span, the kernel marches a centered 128-column
    # window (8-aligned offset `mid` relative to canch) instead of the full
    # cw — the wide fallback keeps fold-heavy blocks lossless. Sentinels:
    # mid = -1 -> wide march, mid = -2 -> no candidates at all (skip).
    if config.big_grid or config.cw <= 128:
        mid = jnp.full((nbands * nblocks,), -1, jnp.int32)
    else:
        sxw = win[0]                       # (RPAD, CL), near-plane-clamped
        nrb = RPAD // 8
        bmin = sxw.reshape(nrb, 8, CL).min(axis=1)   # per-8-row-block extrema
        bmax = sxw.reshape(nrb, 8, CL).max(axis=1)
        nwb = config.rmax // 8
        # Sparse-table window extrema (round 3 prep lever): the old
        # take-and-reduce materialised (nbands * nwb, CL) row copies (~25 MB
        # at 1080p/d10) to reduce over each band's nwb-block window; instead
        # build the power-of-2 running min/max table in log2(p) shifted
        # passes and cover [a, a+nwb) with TWO overlapping p-blocks
        # (idempotent min/max). Out-of-range rows clamp to the last block —
        # exactly the old ridx clip — so the result is bit-identical.
        p = 1 << (max(nwb, 1).bit_length() - 1)
        lmin, lmax = bmin, bmax
        k = 1
        while k < p:
            shift_min = jnp.concatenate(
                [lmin[k:], jnp.repeat(lmin[-1:], min(k, nrb), axis=0)])[:nrb]
            shift_max = jnp.concatenate(
                [lmax[k:], jnp.repeat(lmax[-1:], min(k, nrb), axis=0)])[:nrb]
            lmin = jnp.minimum(lmin, shift_min)
            lmax = jnp.maximum(lmax, shift_max)
            k *= 2
        a_i = jnp.clip(w0 // 8, 0, nrb - 1)
        b_i = jnp.clip(w0 // 8 + nwb - p, 0, nrb - 1)
        smin = jnp.minimum(jnp.take(lmin, a_i, axis=0),
                           jnp.take(lmin, b_i, axis=0))   # (nbands, CL)
        smax = jnp.maximum(jnp.take(lmax, a_i, axis=0),
                           jnp.take(lmax, b_i, axis=0))
        # pair-base intervals: union of columns c and c+1 (edge-pad the last)
        pmin = jnp.minimum(smin, jnp.concatenate([smin[:, 1:],
                                                  smin[:, -1:]], axis=1))
        pmax = jnp.maximum(smax, jnp.concatenate([smax[:, 1:],
                                                  smax[:, -1:]], axis=1))
        # Left slack 66 px: a (real, FAR) silhouette pair left of the block
        # can own stretched cells reaching into it with no crossing inside
        # (the big_grid chunk gate keeps the same 64-px class); cells
        # stretching further than that are the documented extreme-fold
        # compromise. Right slack 2 px covers float interpolation safety.
        x0 = jnp.arange(nblocks, dtype=jnp.float32)[None, :, None] * 128.0 - 66.0
        x1 = jnp.arange(nblocks, dtype=jnp.float32)[None, :, None] * 128.0 + 130.0
        cand = (pmin[:, None, :] <= x1) & (pmax[:, None, :] >= x0)
        cidx = jnp.arange(CL, dtype=jnp.int32)
        bigc = jnp.int32(1 << 20)
        p_lo = jnp.min(jnp.where(cand, cidx[None, None, :], bigc), axis=2)
        p_hi = jnp.max(jnp.where(cand, cidx[None, None, :], -1), axis=2)
        has = p_hi >= p_lo                           # (nbands, nblocks)
        canch_m = canch[None, :] * 8
        centre = jnp.where(has, (p_lo + p_hi) // 2, canch_m + config.cw // 2)
        mid_cols = jnp.clip(((centre - 63) // 8) * 8,
                            canch_m, canch_m + config.cw - 128)
        ok = has & (p_lo >= mid_cols) & (p_hi <= mid_cols + 126)
        mid8 = (mid_cols - canch_m) // 8
        mid = jnp.where(ok, mid8,
                        jnp.where(has, -1, -2)).astype(jnp.int32).reshape(-1)

    return (win, (w0 // 8).astype(jnp.int32), bounds, canch, mid,
            overflow_rows)


_prep_scan = jax.jit(
    _prep_scan_impl, static_argnames=("width", "height", "config")
)


# ---------------------------------------------------------------------------
# Stage 2 (Pallas): fused solve + march + exact-test kernel
# ---------------------------------------------------------------------------


# Bands per grid step for the standard variant (module-level so equivalence
# tests can pin it). Round-4 A/B on chip: 2 bands/step is byte-identical
# (experiments/band_merge_check.py) but measured 84.5-84.9 fps vs 86.7-87.3
# at 1 band/step (1080p/d10) — the ~8-12 us/step pipeline overhead the merge
# removes is outweighed by the doubled live window scratch shrinking Mosaic's
# DMA/compute overlap. Kept at 1; see ROADMAP "Measured dead ends".
_BANDS_PER_STEP = 1
# Bands per grid step for the SPARSE patch pass only (round 5): the dense
# pass measured slower at 2 bands/step (ROADMAP "Measured dead ends"), but
# the sparse pass-2's unflagged steps cost pure pipeline overhead (~8-12 us
# x 240 transposed bands at 1080p), so folding bands per step attacks the
# zero-flag floor directly. Env override for the mid-ladder A/B harness.
_PATCH_BANDS_PER_STEP = int(os.environ.get("DEPTHRENDERER_PATCH_BPS", "1"))


def _scan_kernel_steps(*args, bands_per_step: int = 1, **kwargs):
    """Grid-step dispatcher: render ``bands_per_step`` consecutive 8-row bands
    per grid step (round 4). Per-step pipeline overhead measured ~8-12 us
    (135 band-steps ~= 1.1 ms/frame at 1080p, the 'step+DMA' profile entry);
    two bands per step halve the step count. ``jband`` specialises each
    band's body STATICALLY (python loop), so output-row offsets and window
    double-buffer parities are compile-time constants."""
    for j in range(bands_per_step):
        _scan_kernel(*args, jband=j, bands_per_step=bands_per_step, **kwargs)


def _scan_kernel(w0_ref, bounds_ref, canch_ref, mid_ref, fconst_ref, *refs,
                 config: ScanConfig, width: int, height: int,
                 n_r: int, n_c: int, cl: int, wl: int, ht: int, wt: int,
                 mode: str, debug_records: bool = False, phases: str = "all",
                 sparse_bands: bool = False, jband: int = 0,
                 bands_per_step: int = 1):
    # Sparse-band mode (round 4, the hole-driven patch pass): a 6th scalar-
    # prefetch plane flags which (frame, band) steps render at all; unflagged
    # steps skip the window DMA, solve, march and shade entirely and write
    # background + FAR sentinels, so a band costs only its grid-step overhead.
    if sparse_bands:
        assert mode == "texture_z" and not config.big_grid \
            and not debug_records and phases == "all"
        bflag_ref, win_hbm, tex_hbm, *refs = refs
    else:
        bflag_ref = None
        win_hbm, tex_hbm, *refs = refs
    cfx_ref = None
    if config.big_grid and config.colfix is not None:
        # round-5 big_grid colfix: the fan-window scratch (appended last in
        # scratch_shapes) — the per-chunk solve scratch is stale by march
        # time, so the fixup DMAs its two fan subtables fresh from HBM.
        *refs, cfx_ref = refs
    curve_ref = None
    outz_ref = None
    if mode == "texture_z":  # rgba + raster-z outputs (quality-merge path)
        assert not debug_records and phases == "all"
        if config.big_grid:
            out_ref, outz_ref, win_ref, rec_ref, attrs_ref, texw_ref, sem = \
                refs
        else:
            (out_ref, outz_ref, win_ref, rec_ref, curve_ref, attrs_ref,
             texw_ref, sem) = refs
    elif debug_records and config.big_grid:
        out_ref, dbg_ref, win_ref, rec_ref, attrs_ref, texw_ref, sem = refs
    elif debug_records:
        (out_ref, dbg_ref, win_ref, rec_ref, curve_ref, attrs_ref, texw_ref,
         sem) = refs
    elif config.big_grid:
        out_ref, win_ref, rec_ref, attrs_ref, texw_ref, sem = refs
    else:
        out_ref, win_ref, rec_ref, curve_ref, attrs_ref, texw_ref, sem = refs
    """One grid step per 8-pixel-row band: DMA the hull row window, solve the
    column crossings into self-contained records, then march + exact-test each
    128-pixel block.

    ``bounds_ref`` packs the PER-CHUNK scan range (kb | ke << 12,
    window-relative): each 128-column chunk scans only its own candidate rows
    (~0.32x of the band hull span at d10/1080p, experiments/hull_stats.py).

    Scratch: ``win_ref`` (3, rmax, CL) projected rows; ``rec_ref``
    (nbr, nrec, 8, CL) records; ``curve_ref`` (nbr, 2, CL, 8) sublane-major
    sxc/zc curves for the march.
    """
    t = pl.program_id(0)  # frame within the group
    # pixel-row band: bands_per_step consecutive bands share one grid step
    # (jband is a PYTHON index — the band body below specialises statically)
    i = pl.program_id(1) * bands_per_step + jband
    SR, OFF, NBR, CW = config.sr, config.off, config.nbr, config.cw
    w0 = w0_ref[t, i] * 8  # in 8-row units: provably tile-aligned offset
    act0 = (bflag_ref[t, i] != 0) if sparse_bands else None

    # Double-buffered window prefetch (round 3): the band window DMA
    # (~4.4 MB/band at d10/1080p) used to run start();wait() serially with
    # the band's compute; now step g waits on the copy step g-1 started and
    # prefetches step g+1 into the other half. The two buffers are folded
    # into the scratch's ROW dimension ((3, 2*rmax, CL), parity row offset
    # in 8-row tile units) so reads use the same provably-8-aligned dynamic
    # slicing the window origin already relies on — no dynamic leading-dim
    # indexing, no dynamic semaphore indexing (parity is branched with
    # pl.when on static buffer ids).
    if not config.big_grid:
        nbb = pl.num_programs(1) * bands_per_step  # bands per frame (padded)
        nt = pl.num_programs(0)
        g = t * nbb + i  # global band counter

        def win_copy(tt, ii, buf):
            return pltpu.make_async_copy(
                win_hbm.at[tt, :, pl.ds(w0_ref[tt, ii] * 8, config.rmax), :],
                win_ref.at[:, pl.ds(buf * config.rmax, config.rmax), :],
                sem.at[buf],
            )

        # Sparse-band protocol: copies are started iff the TARGET band is
        # flagged and waited iff the OWN band is — every flagged band's copy
        # is started exactly once (by its predecessor band, or by itself at
        # g == 0) and waited exactly once, and unflagged bands touch no
        # semaphore at all.
        gn = g + 1
        has_next = gn < nt * nbb
        tn = gn // nbb
        inx = gn - tn * nbb
        tn = jnp.minimum(tn, nt - 1)  # clamp: the when-guard skips the copy
        if sparse_bands:
            # inx can be nbb at the final band; clamp the FLAG READ only (the
            # has_next guard already skips the copy itself).
            has_next &= bflag_ref[tn, jnp.minimum(inx, nbb - 1)] != 0
        wait_ok = act0 if sparse_bands else True

        if bands_per_step > 1:
            # nbb is padded to a bands_per_step multiple, so band parity is
            # the STATIC jband parity — buffer ids need no runtime branch.
            buf_cur = jband % 2
            win_row0 = jnp.int32(buf_cur * (config.rmax // 8))
            if jband == 0:
                first_ok = (g == 0) if not sparse_bands else ((g == 0) & act0)

                @pl.when(first_ok)  # the very first band owns buffer 0
                def _():
                    win_copy(t, i, 0).start()

            @pl.when(has_next)
            def _():
                win_copy(tn, inx, 1 - buf_cur).start()

            @pl.when(wait_ok)
            def _():
                win_copy(t, i, buf_cur).wait()
        else:
            # One band per step (big-grid-adjacent configs, debug_records):
            # the band count per frame can be odd, so parity is dynamic.
            par0 = jax.lax.rem(g, 2) == 0
            win_row0 = jnp.where(par0, 0, config.rmax // 8)  # 8-row units
            first_ok = (g == 0) if not sparse_bands else ((g == 0) & act0)

            @pl.when(first_ok)  # the very first step owns buffer 0
            def _():
                win_copy(t, i, 0).start()

            @pl.when(has_next & par0)
            def _():
                win_copy(tn, inx, 1).start()

            @pl.when(has_next & jnp.logical_not(par0))
            def _():
                win_copy(tn, inx, 0).start()

            @pl.when(par0 & wait_ok)
            def _():
                win_copy(t, i, 0).wait()

            @pl.when(jnp.logical_not(par0) & wait_ok)
            def _():
                win_copy(t, i, 1).wait()
    else:
        win_row0 = jnp.int32(0)

    nchunks = cl // 128

    qy_col = (
        height
        - (i * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)).astype(
            jnp.float32
        )
        - 0.5
    )  # (8, 1) scanline y per band row

    # ---------------- Phase S: column solve + strip capture ----------------
    # Rows are consumed in sublane-aligned blocks of 8 with *static* sub-row
    # slicing (Mosaic cannot lower a dynamically-offset single-row vector
    # load: "dynamic load with unaligned indices"); one block load serves 8
    # scan steps. The loop starts OFF+1 rows before the first scanned row so
    # the strip ring (rows k-OFF..k) is warm when crossings begin.
    nrow_blocks = config.rmax // 8

    def load_block(v, b, chunk):
        """Window rows 8b..8b+7 of channel v as (8, 128)."""
        if config.big_grid:  # the window scratch holds only this chunk
            return win_ref[v, pl.ds(b * 8, 8), :].reshape(8, 128)
        return win_ref[v, pl.ds((win_row0 + b) * 8, 8),
                       pl.ds(chunk * 128, 128)].reshape(8, 128)

    def solve_chunk(chunk, _):
        bnd = bounds_ref[t, i * nchunks + chunk]
        if config.big_grid:
            w0c = (bnd & 0x3FF) * 8   # chunk window origin (global rows)
            kb = (bnd >> 10) & 0x1FF  # scan bounds, chunk-window-relative
            ke = (bnd >> 19) & 0x1FF
            multi2 = (bnd >> 28) & 1  # slot-1 capture gate (prep cumsum)
            ccopy = pltpu.make_async_copy(
                win_hbm.at[t, :, pl.ds(w0c, config.rmax),
                           pl.ds(chunk * 128, 128)],
                win_ref, sem.at[0],
            )
            ccopy.start()
            ccopy.wait()
            # records store GLOBAL base rows in this mode (chunks have
            # different window origins, and the march/fetch mix columns
            # across chunks)
            k_base = w0c.astype(jnp.float32)
        else:
            kb = bnd & 0xFFF          # per-chunk scan bounds, window-relative
            ke = (bnd >> 12) & 0xFFF
            multi2 = (bnd >> 24) & 1  # slot-1 capture gate (prep cumsum)
            k_base = jnp.float32(0.0)

        # Capture always carries the raw (sx, sy, z) rows; with pack_xy the
        # (sx, sy) -> one-plane fixed-point pack happens ONCE at record-store
        # time (below), where the record's own ``sxc`` is known — the delta
        # reference that keeps the pack near-lossless (see ``_DELTA_QP``).
        # With dual_col the capture rows carry SIX channels: the lane's own
        # (sx, sy, z) plus the +1-lane-rolled (right column) values at the
        # SAME window rows, so records are self-contained (no neighbour
        # fetch / realign in the exact pass).
        NCH = 3
        NCHC = 6 if config.dual_col else 3
        lane_last = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 127
        )

        def load_all(b):
            chans = [load_block(v, b, chunk) for v in range(3)]
            if config.dual_col:
                # Channels 3-5: the +1-lane-rolled (right column) block,
                # built ONCE per (8, 128) block-step — the wrap lane takes
                # the next chunk's lane 0 (that chunk's column 128). The
                # last chunk self-clamps: its lane 127 is at/beyond the
                # grid's final column, masked downstream by cg <= n_c - 2.
                cn = jnp.minimum(chunk + 1, nchunks - 1)
                for v in range(3):
                    own = pltpu.roll(chans[v], 127, 1)
                    nxtc = pltpu.roll(load_block(v, b, cn), 127, 1)
                    chans.append(jnp.where(lane_last, nxtc, own))
            return tuple(chans)

        def cap_row(blk, r0, r1):
            """Capture-channel row [r0:r1] of a loaded block (6 channels
            with dual_col: own + pre-rolled right-column values)."""
            return tuple(blk[v][r0:r1] for v in range(NCHC))

        def init_slot():
            zero = jnp.zeros((8, 128), jnp.float32)
            return (
                jnp.full((8, 128), _FAR, jnp.float32),   # sxc
                jnp.full((8, 128), _FAR, jnp.float32),   # zc
                jnp.full((8, 128), _NOBASE, jnp.float32),  # basew
                tuple(tuple(zero for _ in range(NCHC)) for _ in range(SR)),
            )

        tail = SR - OFF - 1
        b_begin = jnp.maximum(kb - (OFF + 1), 0) // 8
        b_end = (ke + tail + 7) // 8

        def make_body(nbr_cap):
            """Solve/capture row-step body touching only slots < nbr_cap.

            The slot-1 capture gate (round 3): prep proves per (band, chunk)
            whether ANY column can cross a scanline twice in the scanned row
            range (sy monotonicity violations, cumulative-count test); chunks
            without fire slot 1 never, so the nbr_cap=1 body deletes its
            strip/anchor selects — ~44% of the capture cost at nbr=2 —
            bit-identically (the untouched slot keeps its FAR/NOBASE init,
            which the march's any_rec gate then skips)."""
            def body(b, carry):
                cnt, slots, ring, cur = carry
                bn = jnp.minimum(b + 1, nrow_blocks - 1)
                nxt = load_all(bn)
                for j in range(8):
                    k = b * 8 + j
                    kf = k.astype(jnp.float32) + k_base
                    row0 = tuple(cur[v][j : j + 1] for v in range(3))  # row k
                    row1 = tuple(  # row k+1
                        cur[v][j + 1 : j + 2] if j < 7 else nxt[v][0:1]
                        for v in range(3)
                    )
                    crow0 = cap_row(cur, j, j + 1)
                    crow1 = (cap_row(cur, j + 1, j + 2) if j < 7
                             else cap_row(nxt, 0, 1))
                    ring = (crow0,) + ring[1:]  # ring[m] = win row k - m
                    s_hi = row0[1]
                    s_lo = row1[1]
                    cross = (
                        (s_hi >= qy_col) & (s_lo < qy_col)
                        & (k >= kb) & (k < ke)
                    )
                    denom = jnp.maximum(s_hi - s_lo, 1e-12)
                    frac = jnp.where(cross, (s_hi - qy_col) / denom, 0.0)
                    sxc_new = row0[0] + (row1[0] - row0[0]) * frac
                    zc_new = row0[2] + (row1[2] - row0[2]) * frac

                    new_slots = []
                    for s in range(NBR):
                        if s >= nbr_cap:  # provably never fires: passthrough
                            new_slots.append(slots[s])
                            continue
                        sxc_s, zc_s, bw_s, strips = slots[s]
                        fire = cross & (cnt == jnp.float32(s))
                        sxc_s = jnp.where(fire, sxc_new, sxc_s)
                        zc_s = jnp.where(fire, zc_new, zc_s)
                        bw_s = jnp.where(fire, kf, bw_s)
                        if phases == "solve_nocap":  # profiling: no capture
                            new_slots.append((sxc_s, zc_s, bw_s, strips))
                            continue
                        new_strips = []
                        for sj in range(SR):
                            row_vals = []
                            if sj <= OFF:
                                src = ring[OFF - sj]  # win[k - off + sj]
                                for v in range(NCHC):
                                    row_vals.append(
                                        jnp.where(fire, src[v], strips[sj][v])
                                    )
                            elif sj == OFF + 1:
                                for v in range(NCHC):
                                    row_vals.append(
                                        jnp.where(fire, crow1[v],
                                                  strips[sj][v])
                                    )
                            else:
                                # deferred: capture row k+1 into records whose
                                # strip row sj is that row:
                                # basew - off + sj == k+1
                                m = bw_s == (kf + 1.0 - jnp.float32(sj - OFF))
                                for v in range(NCHC):
                                    row_vals.append(
                                        jnp.where(m, crow1[v], strips[sj][v])
                                    )
                            new_strips.append(tuple(row_vals))
                        new_slots.append((sxc_s, zc_s, bw_s,
                                          tuple(new_strips)))
                    slots = tuple(new_slots)
                    cnt = cnt + jnp.where(cross, 1.0, 0.0)
                    ring = (crow0,) + ring[:-1]  # shift: next k-1 is this k
                return cnt, slots, ring, nxt
            return body

        cnt0 = jnp.zeros((8, 128), jnp.float32)
        slots0 = tuple(init_slot() for _ in range(NBR))
        zero_row = jnp.zeros((1, 128), jnp.float32)
        ring0 = tuple((zero_row,) * NCHC for _ in range(OFF + 1))
        cur0 = load_all(b_begin)
        init = (cnt0, slots0, ring0, cur0)
        if NBR >= 2:
            _, slots, _, _ = jax.lax.cond(
                multi2 == 1,
                lambda ini: jax.lax.fori_loop(b_begin, b_end,
                                              make_body(NBR), ini),
                lambda ini: jax.lax.fori_loop(b_begin, b_end,
                                              make_body(1), ini),
                init,
            )
        else:
            _, slots, _, _ = jax.lax.fori_loop(
                b_begin, b_end, make_body(NBR), init
            )

        csl = pl.ds(chunk * 128, 128)
        for s in range(NBR):
            sxc_s, zc_s, bw_s, strips = slots[s]
            rec_ref[s, 0, :, csl] = sxc_s
            rec_ref[s, 1, :, csl] = zc_s
            rec_ref[s, 2, :, csl] = bw_s
            if config.pack_xy:
                # Delta pack at store time: SR packs per chunk per slot (vs
                # the strip-select pyramid's hundreds of row-step selects).
                # Lanes without a record have sxc = _FAR; the clamped garbage
                # plane is masked downstream by bw = _NOBASE. dual_col packs
                # the right column against the SAME (sxc, anchor) reference
                # (one cell farther -> still well inside the +-128-px span).
                ay = _band_anchor_y(i, height)
                pr = 4 if config.dual_col else 2
                for j in range(SR):
                    rec_ref[s, 3 + j * pr, :, csl] = _pack2_xy(
                        strips[j][0] - sxc_s, strips[j][1] - ay, _DELTA_QP)
                    rec_ref[s, 3 + j * pr + 1, :, csl] = strips[j][2]
                    if config.dual_col:
                        rec_ref[s, 3 + j * pr + 2, :, csl] = _pack2_xy(
                            strips[j][3] - sxc_s, strips[j][4] - ay,
                            _DELTA_QP)
                        rec_ref[s, 3 + j * pr + 3, :, csl] = strips[j][5]
            else:
                for j in range(SR):
                    for v in range(NCHC):
                        rec_ref[s, 3 + j * NCHC + v, :, csl] = strips[j][v]
        return 0

    def _solve_phase():
        """Solve + curve transposes — deferred so the sparse-band mode can
        predicate the whole phase on the band flag (executed before the
        march by ``_active_body`` below, preserving the original order)."""
        if phases != "noop":  # profiling: noop isolates grid-step+DMA overhead
            jax.lax.fori_loop(0, nchunks, solve_chunk, 0)

        # Sublane-major crossing curves for the march (one transpose per
        # band). big_grid marches straight off the record planes through
        # 128-aligned lane slices + per-block transposes instead (16x less
        # VMEM at d12).
        if not config.big_grid and phases != "noop":
            for s in range(NBR):
                curve_ref[s, 0] = jnp.transpose(rec_ref[s, 0], (1, 0))
                curve_ref[s, 1] = jnp.transpose(rec_ref[s, 1], (1, 0))
        if debug_records:
            for p in range(config.nrec):
                dbg_ref[0, 0, 0, p] = rec_ref[0, p]

    # ---------------- Phase M+E: march, fetch, exact tests ----------------
    # minv rows 2, 3 — element reads (only scalars can load from SMEM)
    m2r = [fconst_ref[t, k] for k in range(4)]
    m3r = [fconst_ref[t, 4 + k] for k in range(4)]
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    inv_ncm1 = 1.0 / jnp.float32(max(n_c - 1, 1))
    inv_nrm1 = 1.0 / jnp.float32(max(n_r - 1, 1))
    w0f = w0.astype(jnp.float32)

    # Fetch-table window: march window + 128-alignment slack, capped at the
    # record table's width — an uncapped window's second subtable slice lands
    # out of bounds when CL < cw + 128 (small grids), and Pallas clamps the
    # slice start, silently aliasing subtable 1 onto the table's first lanes.
    CWF = min(CW + 128, cl)
    # March window width: big_grid marches over the whole 128-aligned fetch
    # window (no separate sublane-major curve), standard over the cw window.
    MW = CWF if config.big_grid else CW
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (MW, 128), 0).astype(
        jnp.float32)
    iota_nw = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(
        jnp.float32)  # narrow-march window iota

    # MXU-march lhs constants (round 4): row r < 8 holds scanline r's
    # column ids (c+1, so 0 can mean "no hit"), row 8 + r scanline r's ones —
    # block-diagonal over the 8 per-scanline segments of the stacked hit
    # matrix. Values <= max(Lw, 1) <= 256 are bf16-exact.
    use_mxu = (config.mxu_march and config.hyps == 1 and not config.big_grid
               and MW <= 256 and MW // 128 < 4)
    # Column-exhaustive hole fill (round 4, ScanConfig.colfix): threaded
    # through the march as (h1, m1) per slot; runs after the slot loop.
    colfix_run = (config.colfix is not None
                  and (config.big_grid or MW // 128 < 4)
                  and phases == "all")
    if config.colfix is not None and phases == "all" and not colfix_run:
        raise ValueError(
            f"colfix={config.colfix} configured but the chunked march "
            f"(standard variant, MW={MW}) cannot thread the fixup's h1/m1 "
            f"out — use cw <= 384 or the big_grid variant")
    if use_mxu:
        def _mxu_lhs(L):
            ii = jax.lax.broadcasted_iota(jnp.int32, (16, 8 * L), 1)
            rr = jax.lax.broadcasted_iota(jnp.int32, (16, 8 * L), 0)
            sel = (ii // L) == jax.lax.rem(rr, 8)
            val = jnp.where(rr < 8,
                            (jax.lax.rem(ii, L) + 1).astype(jnp.float32),
                            jnp.float32(1.0))
            return jnp.where(sel, val, jnp.float32(0.0)).astype(jnp.bfloat16)

        mxu_lhs_nw = _mxu_lhs(128)
        mxu_lhs_mw = mxu_lhs_nw if MW == 128 else _mxu_lhs(MW)
    else:
        mxu_lhs_nw = mxu_lhs_mw = None

    def gather_rec(s, plane, canch_f, idx, base):
        """rec[s, plane, y, canch_f*128 + idx] as (8, 128) via TWO 128-lane
        subtables at the dynamically chosen 128-aligned ``base`` (round 3:
        a block's hit columns span ~cells_per_block << CWF, so 2 dynamic
        subtables replace the CWF//128 static ones — at big_grid's CWF=1024
        that is 8 static gathers+selects per plane fetch).

        ``base`` is per-march-hypothesis (min hit column >> 7, clamped);
        indices outside its 256-lane window clamp to its edge — a mis-fetch
        only for hit spans > 256 columns (extreme folds; the fetched record
        still only ADDS exact-tested candidate cells, never false coverage,
        so the failure mode is a missed candidate in the already-compromised
        fold class)."""
        if CWF // 128 < 4:
            # Measured (round 3, cw=256/CWF=384): the static per-128 subtable
            # chain beats two dynamically-offset lane slices by ~1 ms/frame —
            # Mosaic lowers a dynamic lane offset to per-lane shuffles. Keep
            # static below 4 subtables; go dynamic only where the static chain
            # would be long (big_grid CWF>=1024: 8 gathers+selects/plane).
            parts = []
            for tt in range(CWF // 128):
                parts.append(rec_ref[
                    s, plane, :,
                    pl.ds(pl.multiple_of((canch_f + tt) * 128, 128), 128),
                ])
            idc = jnp.clip(idx, 0, CWF - 1)
            g = jnp.take_along_axis(parts[0], jnp.clip(idc, 0, 127), axis=1)
            for tt in range(1, CWF // 128):
                subt = jnp.clip(idc - tt * 128, 0, 127)
                g = jnp.where(
                    idc >= tt * 128,
                    jnp.take_along_axis(parts[tt], subt, axis=1), g
                )
            return g
        idc = jnp.clip(idx - base * 128, 0, 255)
        t0 = rec_ref[s, plane, :,
                     pl.ds(pl.multiple_of((canch_f + base) * 128, 128), 128)]
        t1 = rec_ref[s, plane, :,
                     pl.ds(pl.multiple_of((canch_f + base + 1) * 128, 128),
                           128)]
        g = jnp.take_along_axis(t0, jnp.clip(idc, 0, 127), axis=1)
        return jnp.where(
            idc >= 128,
            jnp.take_along_axis(t1, jnp.clip(idc - 128, 0, 127), axis=1), g
        )

    def march_block(blk, _):
        canch_m = canch_ref[t, blk] * 8        # march anchor, 8-col aligned
        canch_f = canch_m // 128               # fetch-table anchor (128-aligned)
        if config.big_grid or (config.cw <= 128 and not sparse_bands):
            mid = jnp.int32(-1)                # narrow march n/a: always wide
        else:
            # prep-computed centered narrow-march window offset (8-col units
            # relative to canch); -1 = wide fallback, -2 = no candidates.
            # Small-grid configs (cw <= 128) have no narrow march, but the
            # sparse patch pass still needs the -2 block gate, so they read
            # the (gated) sentinel values {-1, -2} under sparse_bands.
            mid = mid_ref[t, i * (wl // 128) + blk]
        if config.big_grid:
            off_f = canch_m - canch_m          # march window == fetch window
        else:
            off_f = canch_m - canch_f * 128    # march col -> fetch-window col
        qx = (blk * 128).astype(jnp.float32) + lane_f + 0.5  # (8, 128)
        # cgf - off_f below lands on the fetch window's global start column in
        # both modes (canch_f * 128).
        cgf = (canch_f * 128 + off_f).astype(jnp.float32)

        best = (
            jnp.full((8, 128), _FAR, jnp.float32),   # z NUMERATOR
            jnp.ones((8, 128), jnp.float32),         # doubled area (denom)
            jnp.full((8, 128), jnp.float32(2.0e30), jnp.float32),  # id
            jnp.zeros((8, 128), jnp.float32),        # u/w * area
            jnp.zeros((8, 128), jnp.float32),        # v/w * area
            jnp.zeros((8, 128), jnp.float32),        # 1/w * area
            jnp.zeros((8, 128), jnp.float32),        # min-lambda num (wire)
        )

        def march_one(o_idx):
            """Exact-test the records picked by an (8, 128) march hypothesis."""
            jf = jnp.clip(o_idx, 0.0, jnp.float32(MW - 1))
            j_i = jf.astype(jnp.int32) + off_f  # fetch-window col
            base = jnp.clip(jnp.min(j_i) >> 7, 0, max(CWF // 128 - 2, 0))
            return lambda best_in, s: _exact_record(
                best_in, s, j_i, base, canch_f,
                cgf - off_f.astype(jnp.float32),
                qx, qy_col, gather_rec, m2r, m3r, config, width, height, w0f,
                inv_ncm1, inv_nrm1, n_r, n_c,
                need_minl=(mode in ("attrs", "wireframe")),
                anchor_y=_band_anchor_y(i, height) if config.pack_xy
                else None,
            )

        fix_slots = []  # (h1, m1) per slot when colfix_run (see below)
        for s in range(NBR):
            # -- march: dense (MW x 128) outer sign test, top-`hyps` by zc --
            if config.big_grid:
                # No curve scratch: read the record planes via 128-aligned
                # lane slices and transpose per block ((8, X) -> (X, 8)
                # lowers natively).
                lsl = pl.ds(pl.multiple_of(canch_f * 128, 128), MW)
                sxc_t = jnp.transpose(rec_ref[s, 0, :, lsl], (1, 0))
                zc_t = jnp.transpose(rec_ref[s, 1, :, lsl], (1, 0))
            else:
                sxc_t = curve_ref[s, 0, pl.ds(canch_m, CW), :]
                zc_t = curve_ref[s, 1, pl.ds(canch_m, CW), :]
            # Block-level slot gate (round 3): a slot with NO record in the
            # march window (slot 1 away from folds — the common case) used to
            # run the full march + fetch + exact pipeline against FAR records;
            # one scalar reduce skips all of it. Narrow-march blocks gate on
            # the NARROW window only (bit-exact: the narrow sweep can never
            # select a record outside it), which skips slots whose records
            # sit in the wide-but-not-narrow fringe — fold edges.
            any_rec = jnp.min(zc_t) < jnp.float32(_FAR * 0.5)
            if not config.big_grid and config.cw > 128 and MW // 128 < 4:
                offn = (canch_ref[t, blk] + jnp.maximum(mid, 0)) * 8
                zcn_g = curve_ref[s, 1, pl.ds(offn, 128), :]
                any_nar = jnp.min(zcn_g) < jnp.float32(_FAR * 0.5)
                any_rec = jnp.where(mid >= 0, any_nar, any_rec)

            def _march_tail(best_in, s, h1, cnt_acc,
                            sxc_t=sxc_t, zc_t=zc_t):
                """Exact pass for hypothesis 1 + gated 2nd-hypothesis pass."""
                if phases == "march_only":  # profiling: skip fetch+exact
                    return (jnp.minimum(best_in[0], h1),) + best_in[1:]
                best_out = march_one(h1)(best_in, s)
                if config.hyps == 2:
                    # Second-hypothesis gate: o2 differs from o1 only where a
                    # (y, pixel) has 2+ bracket columns — fold sheets. Blocks
                    # without any (the vast majority) skip the second fetch +
                    # exact pass entirely; fold blocks recompute the march
                    # terms (cheap relative to the pass they gate).
                    multi = jnp.max(cnt_acc) > 1.5

                    def hyp2_body(b, s=s, sxc_t=sxc_t, zc_t=zc_t):
                        def _sweep2(sx_w, zz_w, iota_w, Lw):
                            # Interval bracket test — see _sweep above.
                            sx_r = pltpu.roll(sx_w, Lw - 1, 0)
                            mn_w = jnp.minimum(sx_w, sx_r)
                            mx_w = jnp.maximum(sx_w, sx_r)
                            lastc = jax.lax.broadcasted_iota(
                                jnp.int32, mx_w.shape, 0) == Lw - 1
                            mx_w = jnp.where(lastc, jnp.float32(-_FAR), mx_w)
                            hyp2 = []
                            for y in range(8):
                                zz = zz_w[:, y : y + 1]
                                qxy = qx[y : y + 1, :]
                                hit = ((qxy >= mn_w[:, y : y + 1])
                                       & (qxy <= mx_w[:, y : y + 1]))
                                key = jnp.where(hit, zz, _FAR)
                                m1 = jnp.min(key, axis=0, keepdims=True)
                                o1 = jnp.min(
                                    jnp.where(key == m1, iota_w,
                                              jnp.float32(Lw)),
                                    axis=0, keepdims=True,
                                )
                                key2 = jnp.where(iota_w == o1, _FAR, key)
                                m2 = jnp.min(key2, axis=0, keepdims=True)
                                o2 = jnp.min(
                                    jnp.where(key2 == m2, iota_w,
                                              jnp.float32(Lw)),
                                    axis=0, keepdims=True,
                                )
                                hyp2.append(o2)
                            return jnp.concatenate(hyp2, axis=0)

                        # The 2nd-hypothesis resweep rides the same prep-
                        # centered narrow window as hypothesis 1 (prep's
                        # pair-base bound covers ALL crossings of the
                        # block, so the 2nd-lowest-z one is inside too).
                        if (config.big_grid or config.cw <= 128
                                or MW // 128 >= 4):
                            h2 = _sweep2(sxc_t, zc_t, iota_cw, MW)
                        else:
                            def n2(_):
                                off8 = (canch_ref[t, blk] + mid) * 8
                                sxn = curve_ref[s, 0, pl.ds(off8, 128), :]
                                zcn = curve_ref[s, 1, pl.ds(off8, 128), :]
                                h2n = _sweep2(sxn, zcn, iota_nw, 128)
                                sent = h2n >= jnp.float32(127.5)
                                h2n = h2n + (mid * 8).astype(jnp.float32)
                                return jnp.where(sent, jnp.float32(MW), h2n)

                            def w2(_):
                                return _sweep2(sxc_t, zc_t, iota_cw, MW)

                            h2 = jax.lax.cond(mid >= 0, n2, w2, 0)
                        return march_one(h2)(b, s)

                    best_out = jax.lax.cond(
                        multi, hyp2_body, lambda b: b, best_out
                    )
                return best_out

            def slot_body(best_in, s=s, sxc_t=sxc_t, zc_t=zc_t,
                          _march_tail=_march_tail):
                if MW // 128 < 4:
                    # Measured (round 3, cw=256 -> 2 chunks): a per-chunk
                    # lax.cond gate costs more than it saves when the active
                    # region straddles the chunk boundary (the anchor CENTRES
                    # it there). The round-3 narrow march fixes the shape
                    # mismatch instead: prep centres a 128-column window on
                    # the block's rigorously-bounded candidate pair span
                    # (`mid`), and only fold-heavy blocks (span > 126 cols)
                    # fall back to the full dense cw sweep.
                    def _sweep(sx_w, zz_w, iota_w, Lw):
                        # Interval form of the bracket test (round 4): the
                        # sign test f*f2 <= 0 with f = sx[c]-qx, f2 =
                        # sx[c+1]-qx is EXACTLY qx in [min, max] of the pair
                        # (float subtraction preserves sign, and the interval
                        # form cannot even underflow) — precomputing the
                        # (Lw, 8) min/max once per block drops the per-y hot
                        # ops from 2 subs + mul + cmp + and to 2 cmps + and
                        # (march measured as the flattest-profile leader).
                        # The last-column iota mask folds into mx = -FAR.
                        sx_r = pltpu.roll(sx_w, Lw - 1, 0)
                        mn_w = jnp.minimum(sx_w, sx_r)
                        mx_w = jnp.maximum(sx_w, sx_r)
                        lastc = jax.lax.broadcasted_iota(
                            jnp.int32, mx_w.shape, 0) == Lw - 1
                        mx_w = jnp.where(lastc, jnp.float32(-_FAR), mx_w)
                        hyp1 = []
                        counts = []
                        mins = []
                        for y in range(8):
                            zz = zz_w[:, y : y + 1]
                            qxy = qx[y : y + 1, :]       # (1, 128)
                            hit = ((qxy >= mn_w[:, y : y + 1])
                                   & (qxy <= mx_w[:, y : y + 1]))
                            key = jnp.where(hit, zz, _FAR)
                            m1 = jnp.min(key, axis=0, keepdims=True)
                            o1 = jnp.min(
                                jnp.where(key == m1, iota_w, jnp.float32(Lw)),
                                axis=0,
                                keepdims=True,
                            )
                            hyp1.append(o1)
                            if colfix_run:  # colfix flags real-bracket px
                                mins.append(m1)
                            if config.hyps == 2:
                                counts.append(jnp.sum(
                                    jnp.where(hit, 1.0, 0.0), axis=0,
                                    keepdims=True))
                        h1 = jnp.concatenate(hyp1, axis=0)   # (8, 128)
                        cnt = (jnp.concatenate(counts, axis=0)
                               if config.hyps == 2
                               else jnp.zeros((8, 128), jnp.float32))
                        m1c = (jnp.concatenate(mins, axis=0)
                               if colfix_run else None)
                        return h1, cnt, m1c

                    def _sweep_mxu(sx_w, zz_w, iota_w, Lw, lhs):
                        """Exclusive-hit MXU march (round 4, hyps=1 only).

                        With at most ONE real-keyed bracket interval per
                        (scanline, pixel) — every block away from fold
                        sheets — the dense sweep's per-y where/min-reduce
                        chains are equivalent to sums: o1 = sum_c hit*(c+1)
                        - 1 and cnt = sum_c hit, all 8 scanlines of both in
                        ONE (16, 8*Lw) @ (8*Lw, 128) bf16 matmul against the
                        block-diagonal ``lhs`` (hit in {0, 1} and c+1 <= 256
                        are bf16-exact; the MXU accumulates in f32, so
                        eligible blocks reproduce the dense answer exactly).
                        FAR-keyed giant intervals (the (FAR, real) pair
                        class, whose key can never beat a real record's in
                        the dense min) are masked out of ``hit`` to keep the
                        count exclusive; lanes with NO real-keyed hit return
                        column 0 where the dense sweep would return the
                        first FAR-keyed hit column — both fetch a record
                        whose exact tests reject the pixel, so coverage is
                        unchanged. Blocks whose count proves a multi-hit
                        lane (overlapping sheets: depth must arbitrate) fall
                        back to the dense sweep behind one block-level
                        branch."""
                        sx_r = pltpu.roll(sx_w, Lw - 1, 0)
                        mn_w = jnp.minimum(sx_w, sx_r)
                        mx_w = jnp.maximum(sx_w, sx_r)
                        lastc = jax.lax.broadcasted_iota(
                            jnp.int32, mx_w.shape, 0) == Lw - 1
                        mx_w = jnp.where(
                            lastc | (zz_w >= jnp.float32(_FAR * 0.5)),
                            jnp.float32(-_FAR), mx_w)
                        pieces = []
                        for y in range(8):
                            qxy = qx[y : y + 1, :]
                            hit = ((qxy >= mn_w[:, y : y + 1])
                                   & (qxy <= mx_w[:, y : y + 1]))
                            # f32 select, THEN convert: Mosaic cannot relayout
                            # the (8,128)-tiled i1 mask of an f32 compare onto
                            # a (16,128)-tiled bf16 select directly.
                            pieces.append(
                                jnp.where(hit, jnp.float32(1.0),
                                          jnp.float32(0.0))
                                .astype(jnp.bfloat16))
                        hitf = jnp.concatenate(pieces, axis=0)  # (8Lw, 128)
                        out = jax.lax.dot_general(
                            lhs, hitf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (16, 128)
                        o1s = out[0:8]
                        cnt = out[8:16]
                        h1_x = jnp.where(cnt >= 0.5, o1s - 1.0,
                                         jnp.float32(0.0))
                        multi = jnp.max(cnt) > 1.5
                        h1 = jax.lax.cond(
                            multi,
                            lambda _: _sweep(sx_w, zz_w, iota_w, Lw)[0],
                            lambda _: h1_x, 0)
                        return h1, jnp.zeros((8, 128), jnp.float32), None

                    if config.big_grid or config.cw <= 128:
                        if use_mxu:
                            h1, cnt_acc, m1k = _sweep_mxu(sxc_t, zc_t,
                                                          iota_cw, MW,
                                                          mxu_lhs_mw)
                        else:
                            h1, cnt_acc, m1k = _sweep(sxc_t, zc_t, iota_cw,
                                                      MW)
                        ret = _march_tail(
                            best_in, s, h1,
                            cnt_acc if config.hyps == 2 else None)
                        return (ret, h1, m1k) if colfix_run else ret

                    def narrow_fn(_):
                        off8 = (canch_ref[t, blk] + mid) * 8
                        sxn = curve_ref[s, 0, pl.ds(off8, 128), :]
                        zcn = curve_ref[s, 1, pl.ds(off8, 128), :]
                        if use_mxu:
                            h1n, cntn, m1n = _sweep_mxu(sxn, zcn, iota_nw,
                                                        128, mxu_lhs_nw)
                        else:
                            h1n, cntn, m1n = _sweep(sxn, zcn, iota_nw, 128)
                        sent = h1n >= jnp.float32(127.5)  # no-hit sentinel
                        h1n = h1n + (mid * 8).astype(jnp.float32)
                        return jnp.where(sent, jnp.float32(MW), h1n), cntn, m1n

                    def wide_fn(_):
                        if use_mxu:
                            return _sweep_mxu(sxc_t, zc_t, iota_cw, MW,
                                              mxu_lhs_mw)
                        return _sweep(sxc_t, zc_t, iota_cw, MW)

                    h1, cnt_acc, m1k = jax.lax.cond(mid >= 0, narrow_fn,
                                                    wide_fn, 0)
                    ret = _march_tail(best_in, s, h1,
                                      cnt_acc if config.hyps == 2 else None)
                    return (ret, h1, m1k) if colfix_run else ret
                # Chunked gated march (round 3): the dense (MW x 128) sign
                # test runs per 128-column chunk behind a scalar
                # range-intersection gate — a chunk whose real crossing-x
                # range misses the block's qx span has no true bracket pair
                # and is skipped (the anchor centres the active ~90-cell
                # region in ONE chunk, so typically 1 of MW/128 chunks runs).
                # The 64-px left slack keeps the (real, FAR) silhouette pair
                # class: a record left of the block can own stretched cells
                # reaching into it even with no crossing inside the block.
                qx0 = (blk * 128).astype(jnp.float32) + 0.5
                qx1 = qx0 + 127.0
                m1_acc = jnp.full((8, 128), _FAR, jnp.float32)
                o1_acc = jnp.full((8, 128), jnp.float32(MW), jnp.float32)
                cnt_acc = jnp.zeros((8, 128), jnp.float32)
                for m in range(MW // 128):
                    lo = m * 128
                    L = 136 if m < MW // 128 - 1 else 128
                    sub = sxc_t[lo : lo + L]          # (L, 8)
                    subz = zc_t[lo : lo + L]
                    real = sub < jnp.float32(_FAR * 0.5)
                    cmin = jnp.min(sub)
                    cmax = jnp.max(jnp.where(real, sub, jnp.float32(-_FAR)))
                    gate = (cmin <= qx1) & (cmax >= qx0 - 64.0)
                    iota_lf = jax.lax.broadcasted_iota(
                        jnp.int32, (L, 128), 0).astype(jnp.float32)

                    def chunk_body(carry, sub=sub, subz=subz,
                                   iota_lf=iota_lf, lo=lo, L=L):
                        m1_a, o1_a, cnt_a = carry
                        # Interval bracket test — see _sweep above; the
                        # partial-chunk row mask folds into mx = -FAR.
                        sub_r = pltpu.roll(sub, L - 1, 0)
                        mn_w = jnp.minimum(sub, sub_r)
                        mx_w = jnp.maximum(sub, sub_r)
                        rowbad = jax.lax.broadcasted_iota(
                            jnp.int32, mx_w.shape, 0) >= (128 if L == 136
                                                          else 127)
                        mx_w = jnp.where(rowbad, jnp.float32(-_FAR), mx_w)
                        m1s, o1s, cnts = [], [], []
                        for y in range(8):
                            zz = subz[:, y : y + 1]
                            qxy = qx[y : y + 1, :]
                            hit = ((qxy >= mn_w[:, y : y + 1])
                                   & (qxy <= mx_w[:, y : y + 1]))
                            key = jnp.where(hit, zz, _FAR)
                            m1 = jnp.min(key, axis=0, keepdims=True)
                            o1 = jnp.min(
                                jnp.where(key == m1, iota_lf, jnp.float32(L)),
                                axis=0, keepdims=True,
                            )
                            m1s.append(m1)
                            o1s.append(o1)
                            if config.hyps == 2:
                                cnts.append(jnp.sum(
                                    jnp.where(hit, 1.0, 0.0), axis=0,
                                    keepdims=True))
                        m1_c = jnp.concatenate(m1s, axis=0)   # (8, 128)
                        o1_c = jnp.concatenate(o1s, axis=0) + jnp.float32(lo)
                        better = m1_c < m1_a  # strict: earlier chunk keeps ties
                        m1_a = jnp.where(better, m1_c, m1_a)
                        o1_a = jnp.where(better, o1_c, o1_a)
                        if config.hyps == 2:
                            cnt_a = cnt_a + jnp.concatenate(cnts, axis=0)
                        return m1_a, o1_a, cnt_a

                    m1_acc, o1_acc, cnt_acc = jax.lax.cond(
                        gate, chunk_body, lambda c: c,
                        (m1_acc, o1_acc, cnt_acc))
                # o1_acc holds global window columns already; the chunked
                # march threads (h1, m1) for colfix exactly like the dense
                # sweep (round 5: the accumulated column-of-min and min key
                # ARE the sweep's outputs, so the fixup composes unchanged —
                # this is the big_grid d12 path, MW = 1024).
                ret = _march_tail(
                    best_in, s, o1_acc,
                    cnt_acc if config.hyps == 2 else None)
                return (ret, o1_acc, m1_acc) if colfix_run else ret

            if colfix_run:
                best, h1_s, m1_s = jax.lax.cond(
                    any_rec & (mid != jnp.int32(-2)), slot_body,
                    lambda b: (b, jnp.full((8, 128), jnp.float32(MW)),
                               jnp.full((8, 128), _FAR, jnp.float32)),
                    best)
                fix_slots.append((h1_s, m1_s))
            else:
                best = jax.lax.cond(any_rec & (mid != jnp.int32(-2)),
                                    slot_body, lambda b: b, best)

        if colfix_run:
            # ------- column-exhaustive hole fill (ScanConfig.colfix) -------
            # Blocks that still hold UNCOVERED pixels with a real marched
            # bracket re-test, per slot, EVERY scanned window row at a
            # (2K+1)-cell column fan around that slot's top-1 column — raw
            # (sx, sy, z) corner rows straight from the resident band
            # window, so no record-strip row limit and no realign. This is
            # where the strip-window + realign-cap hole classes die (see
            # ScanConfig.colfix and experiments/colfix_replay.py). Exact-
            # test-gated: only ADDS true covering cells. Corner 1/w and
            # u/v are analytic (same forms as _exact_cells).
            K = config.colfix
            nsub = CWF // 128
            NS2 = min(nsub, 2)       # gathered subtables (dynamic base)
            sxw_f = 2.0 / width
            syw_f = 2.0 / height
            qyf = qy_col * jnp.ones((8, 128), jnp.float32)
            need_minl_fx = mode in ("attrs", "wireframe")

            def invw_fx(x, y, z):
                return (m3r[0] * (x * sxw_f - 1.0)
                        + m3r[1] * (y * syw_f - 1.0) + m3r[2] * z + m3r[3])

            def zm_fx(x, y, z, iw_):
                num = (m2r[0] * (x * sxw_f - 1.0)
                       + m2r[1] * (y * syw_f - 1.0) + m2r[2] * z + m2r[3])
                den = jnp.where(jnp.abs(iw_) > 1e-30, iw_, 1.0)
                return num / den

            def fix_slot(best_in, h1f, m1v, offs):
                # ``offs``: the fan's corner-column offsets from the top-1
                # column (ascending ints, gaps allowed). Cells exist between
                # CONSECUTIVE offsets only — the round-5 cascade runs the
                # inner (-1..2) fan first and the outer corners in a second
                # gated call on blocks the inner fan left holed, saving the
                # wide-fan work where +-1 suffices (~86% of holes,
                # experiments/colfix_replay.py).
                NFo = len(offs)
                cells = [f for f in range(NFo - 1)
                         if offs[f + 1] == offs[f] + 1]
                hitok = m1v < jnp.float32(_FAR * 0.5)
                j0 = (jnp.clip(h1f, 0.0, jnp.float32(MW - 1))
                      .astype(jnp.int32) + off_f)
                # Dynamic 128-aligned 2-subtable gather window over the fan
                # (gather_rec's big-grid trick): fan columns outside the
                # 256-lane window around the block's min bracket mask their
                # cells out — a lost recovery only for bracket spans > ~256
                # columns (extreme folds), never false coverage.
                jmin = jnp.min(jnp.where(hitok, j0, jnp.int32(CWF)))
                base = jnp.clip(jmin >> 7, 0, max(nsub - NS2, 0))
                idxs = [j0 + o for o in offs]
                # window-local fan indices, precomputed ONCE per slot
                idls = [jnp.clip(ix - base * 128, 0, NS2 * 128 - 1)
                        for ix in idxs]
                id0 = [jnp.clip(il, 0, 127) for il in idls]
                id1 = [jnp.clip(il - 128, 0, 127) for il in idls]
                hi1 = [il >= 128 for il in idls]
                colok = [hitok & (ix >= 0) & (ix <= CWF - 1)
                         & (ix - base * 128 >= 0)
                         & (ix - base * 128 <= NS2 * 128 - 1)
                         for ix in idxs]
                cgs = [(canch_f * 128 + jnp.clip(ix, 0, CWF - 1))
                       .astype(jnp.float32) for ix in idxs]

                # union row bounds over ONLY the subtables the fan's valid
                # corners actually land in (round 5: the 4-8-column fan
                # rarely straddles a 128-lane boundary, and the unused
                # chunk's span — wide at folds — used to inflate the row
                # scan; cells from other chunks are masked by colok anyway,
                # and a chunk's own [kb, ke) provably bounds its covering
                # rows)
                use_t = []
                for tt in range(NS2):
                    u = jnp.zeros((8, 128), jnp.bool_)
                    for cc in range(NFo):
                        in_tt = hi1[cc] if tt == 1 else jnp.logical_not(
                            hi1[cc])
                        u = u | (colok[cc] & in_tt)
                    use_t.append(jnp.any(u))
                if config.big_grid:
                    # round-5 big_grid port: bounds pack w0c (10 bits, 8-row
                    # units) | kb (9) | ke (9) with kb/ke CHUNK-window-
                    # relative; rows here are GLOBAL grid rows (records and
                    # w0f = 0 already are in this variant). The two fan
                    # subtables generally have different window origins, so
                    # carry per-subtable global ranges for the row masks.
                    kbg, keg = [], []
                    kb_u = jnp.int32(1 << 20)
                    ke_u = jnp.int32(0)
                    for tt in range(NS2):
                        bnd_t = bounds_ref[t,
                                           i * nchunks + canch_f + base + tt]
                        w0c_t = (bnd_t & 0x3FF) * 8
                        kbt = w0c_t + ((bnd_t >> 10) & 0x1FF)
                        ket = w0c_t + ((bnd_t >> 19) & 0x1FF)
                        ne_t = (ket > kbt) & use_t[tt]
                        kbg.append(jnp.where(ne_t, kbt, jnp.int32(1 << 20)))
                        keg.append(jnp.where(ne_t, ket, jnp.int32(0)))
                        kb_u = jnp.minimum(kb_u, kbg[tt])
                        ke_u = jnp.maximum(ke_u, keg[tt])
                    # One rmax-row window per fan subtable, DMA'd fresh from
                    # HBM at a SHARED 8-aligned global origin (the per-chunk
                    # solve scratch holds only the last chunk by march
                    # time). Rows past g0 + rmax (distant-fold spans) are
                    # masked off below — a bounded missed-recovery class,
                    # never wrong data.
                    rpad_w = win_hbm.shape[2]
                    # clip in 8-row TILE units, then multiply: Mosaic must
                    # PROVE the DMA row offset divisible by 8, and a clip
                    # wrapped around the multiply hides the factorisation
                    # ("Failed to prove that a tile index ... is divisible")
                    g08 = jnp.clip(kb_u // 8, 0,
                                   max((rpad_w - config.rmax) // 8, 0))
                    g0 = g08 * 8
                    cpys = [pltpu.make_async_copy(
                        win_hbm.at[t, :, pl.ds(g0, config.rmax),
                                   pl.ds((canch_f + base + tt) * 128, 128)],
                        cfx_ref.at[tt], sem.at[tt]) for tt in range(NS2)]
                    for c_ in cpys:
                        c_.start()
                    for c_ in cpys:
                        c_.wait()
                    rb0 = jnp.maximum(kb_u // 8, g08)
                    rb1 = jnp.minimum(
                        jnp.minimum((ke_u + 8) // 8,
                                    g08 + config.rmax // 8),
                        rpad_w // 8)
                    rb1 = jnp.maximum(rb1, rb0)  # empty range -> no trips
                    nrow_cap = g08 + config.rmax // 8

                    def load_parts(b):
                        """[v][tt] -> (8, 128) global rows 8b..8b+7 from
                        the DMA'd fan-subtable windows."""
                        lb = jnp.clip(b - g08, 0, config.rmax // 8 - 1)
                        return [[cfx_ref[tt, v, pl.ds(lb * 8, 8), :]
                                 .reshape(8, 128)
                                 for tt in range(NS2)] for v in range(3)]
                else:
                    kbg = keg = None
                    kb_u = jnp.int32(config.rmax)
                    ke_u = jnp.int32(0)
                    for tt in range(NS2):
                        bnd_t = bounds_ref[t,
                                           i * nchunks + canch_f + base + tt]
                        kbt = bnd_t & 0xFFF
                        ket = (bnd_t >> 12) & 0xFFF
                        ne_t = (ket > kbt) & use_t[tt]
                        kb_u = jnp.where(ne_t, jnp.minimum(kb_u, kbt), kb_u)
                        ke_u = jnp.where(ne_t, jnp.maximum(ke_u, ket), ke_u)
                    rb0 = jnp.minimum(kb_u // 8, nrow_blocks - 1)
                    rb1 = jnp.minimum((ke_u + 8) // 8, nrow_blocks)  # bottom
                    # corners reach row ke_u, which may start the next block
                    nrow_cap = jnp.int32(nrow_blocks)

                    def load_parts(b):
                        """[v][tt] -> (8, 128) window rows 8b..8b+7 at the
                        dynamically-based (128-aligned) fan subtable tt."""
                        return [[load_block(v, b, canch_f + base + tt)
                                 for tt in range(NS2)] for v in range(3)]

                def grow_all(parts, j):
                    # broadcasts hoisted per (row, channel, subtable): the
                    # fan gathers share them
                    rows = [[jnp.broadcast_to(parts[v][tt][j : j + 1],
                                              (8, 128))
                             for tt in range(NS2)] for v in range(3)]
                    out = []
                    for cc in range(NFo):
                        vals = []
                        for v in range(3):
                            g = jnp.take_along_axis(rows[v][0], id0[cc],
                                                    axis=1)
                            if NS2 == 2:
                                g = jnp.where(
                                    hi1[cc],
                                    jnp.take_along_axis(rows[v][1], id1[cc],
                                                        axis=1), g)
                            vals.append(g)
                        out.append(tuple(vals))
                    return tuple(out)

                def fix_block(rb, carry):
                    b_acc, gtop, iwt, tops = carry
                    cur = load_parts(rb)
                    nxt = load_parts(jnp.minimum(rb + 1, nrow_cap - 1))
                    for j in range(8):
                        k = rb * 8 + j
                        gbot = (grow_all(cur, j + 1) if j < 7
                                else grow_all(nxt, 0))
                        kf = k.astype(jnp.float32)
                        r_cell = w0f + kf  # global grid row of the top corner
                        in_rng = (k >= kb_u) & (k < ke_u)
                        row_ok = (in_rng & (r_cell >= 0.0)
                                  & (r_cell <= jnp.float32(n_r - 2)))
                        if config.big_grid:
                            # per-subtable global scan ranges: the two fan
                            # chunks have different window origins, so a row
                            # valid for one may be garbage (clamped DMA
                            # rows) for the other — mask per corner.
                            in_tts = [jnp.logical_and(k >= kbg[tt],
                                                      k < keg[tt])
                                      for tt in range(NS2)]

                            def rowm(cc):
                                if NS2 == 1:
                                    return in_tts[0]
                                # logical form, not jnp.where: a bool-valued
                                # select lowers to an i8->i1 trunci Mosaic
                                # rejects ("Unsupported target bitwidth for
                                # truncation")
                                return ((hi1[cc] & in_tts[1])
                                        | (~hi1[cc] & in_tts[0]))
                        v_top = 1.0 - r_cell * inv_nrm1
                        v_bot = 1.0 - (r_cell + 1.0) * inv_nrm1
                        # Downward column-line edges, computed ONCE per fan
                        # corner column: cell f's left = lines[f], right =
                        # -lines[f+1] — exact negation keeps horizontally
                        # adjacent fan cells watertight (same guarantee
                        # _exact_cells gives the shared diagonal).
                        # Corner 1/w: the top row's values are the previous
                        # row's bottom values — carried, not recomputed
                        # (round 5; bit-exact, same expression).
                        lines = []
                        iwb = []
                        for cc in range(NFo):
                            x0, y0, z0 = gtop[cc]
                            x1, y1, z1 = gbot[cc]
                            lines.append((x1 - x0) * (qyf - y0)
                                         - (y1 - y0) * (qx - x0))
                            iwb.append(invw_fx(x1, y1, z1))
                        new_tops = []
                        for ci, f in enumerate(cells):
                            x00, y00, z00 = gtop[f]
                            x10, y10, z10 = gbot[f]
                            x01, y01, z01 = gtop[f + 1]
                            x11, y11, z11 = gbot[f + 1]
                            cg = cgs[f]
                            cell_ok = (row_ok & colok[f] & colok[f + 1]
                                       & (cg <= jnp.float32(n_c - 2)))
                            if config.big_grid:
                                cell_ok = cell_ok & rowm(f) & rowm(f + 1)
                            u0 = cg * inv_ncm1
                            u1 = (cg + 1.0) * inv_ncm1
                            base_id = (r_cell * jnp.float32(n_c - 1)
                                       + cg) * 2.0
                            diag_e = ((x01 - x10) * (qyf - y10)
                                      - (y01 - y10) * (qx - x10))
                            # vertically adjacent rows share the horizontal
                            # edge: this row's top = -(previous bottom),
                            # carried (round 5; exact negation, same
                            # watertightness argument as _exact_cells)
                            top_e = tops[ci]
                            bottom_e = ((x11 - x10) * (qyf - y10)
                                        - (y11 - y10) * (qx - x10))
                            new_tops.append(-bottom_e)
                            if config.edge_cull_threshold is not None:
                                zms = (zm_fx(x00, y00, z00, iwt[f]),
                                       zm_fx(x10, y10, z10, iwb[f]),
                                       zm_fx(x01, y01, z01, iwt[f + 1]),
                                       zm_fx(x11, y11, z11, iwb[f + 1]))
                            else:
                                zms = None
                            b_acc = _cell_fold(
                                b_acc, cell_ok, diag_e, top_e, bottom_e,
                                lines[f], -lines[f + 1],
                                z00, z10, z01, z11,
                                iwt[f], iwb[f], iwt[f + 1], iwb[f + 1],
                                u0, u1, v_top, v_bot, base_id,
                                inv_ncm1, inv_nrm1, need_minl_fx,
                                cull_thresh=config.edge_cull_threshold,
                                zms=zms)
                        gtop = gbot
                        iwt = tuple(iwb)
                        tops = tuple(new_tops)
                    return b_acc, gtop, iwt, tops

                gtop0 = grow_all(load_parts(rb0), 0)
                iwt0 = tuple(invw_fx(x0, y0, z0) for x0, y0, z0 in gtop0)
                tops0 = tuple(
                    (gtop0[f][0] - gtop0[f + 1][0])
                    * (qyf - gtop0[f + 1][1])
                    - (gtop0[f][1] - gtop0[f + 1][1])
                    * (qx - gtop0[f + 1][0])
                    for f in cells)
                best_out, _, _, _ = jax.lax.fori_loop(
                    rb0, rb1, fix_block, (best_in, gtop0, iwt0, tops0))
                return best_out

            # Round-5 cascade: at K >= 2 the inner (+-1-cell) fan runs
            # first; the outer cells run in a SECOND gated call only on
            # blocks the inner fan left uncovered-but-bracketed (the inner
            # fan closes ~86% of holes — colfix_replay.py — so ~2/3 of
            # fired blocks skip the wide-fan work). Coverage is the same
            # cell union as the single wide fan; winner differences are
            # limited to the near-tie class block gating already admits.
            inner = tuple(range(-min(K, 1), min(K, 1) + 2))
            for h1_s, m1_s in fix_slots:
                uncov_fx = best[2] >= jnp.float32(1.0e30)  # id sentinel
                go_fx = jnp.max(jnp.where(
                    uncov_fx & (m1_s < jnp.float32(_FAR * 0.5)),
                    1.0, 0.0)) > 0.5
                best = jax.lax.cond(
                    go_fx,
                    functools.partial(fix_slot, h1f=h1_s, m1v=m1_s,
                                      offs=inner),
                    lambda b: b, best)
            if K >= 2:
                outer = tuple(range(-K, 0)) + tuple(range(2, K + 2))
                for h1_s, m1_s in fix_slots:
                    uncov_fx = best[2] >= jnp.float32(1.0e30)
                    go_fx = jnp.max(jnp.where(
                        uncov_fx & (m1_s < jnp.float32(_FAR * 0.5)),
                        1.0, 0.0)) > 0.5
                    best = jax.lax.cond(
                        go_fx,
                        functools.partial(fix_slot, h1f=h1_s, m1v=m1_s,
                                          offs=outer),
                        lambda b: b, best)

        bzn, bar, bid, uw, vw, iw, bml = best
        # ONE divide per block resolves the deferred (znum, area) carry
        # (bar > 0 always: init 1.0, winners passed the area > 1e-12 gate).
        bz = bzn / bar
        cov = bz < _FAR
        den = jnp.where(jnp.abs(iw) > 1e-30, iw, 1.0)
        u = jnp.where(cov, uw / den, 0.0)
        v = jnp.where(cov, vw / den, 0.0)
        # analytic model z: rows 2/3 of the inverse MVP applied to pixel NDC.
        # The carried iw is scaled by the winner's doubled area (the deferred
        # division-free interpolation) — u/v cancel it through uw/vw, but this
        # numerator is unscaled, so restore the factor with bar (== that area).
        ndcx = qx * (2.0 / width) - 1.0
        ndcy = qy_col * jnp.ones((8, 128), jnp.float32) * (2.0 / height) - 1.0
        num = (m2r[0] * ndcx + m2r[1] * ndcy + m2r[2] * bz + m2r[3]) * bar
        zm = jnp.where(cov, num / den, 0.0)

        xsl = pl.ds(blk * 128, 128)
        if mode == "attrs":
            out_ref[0, jband, 0, :, xsl] = u
            out_ref[0, jband, 1, :, xsl] = v
            out_ref[0, jband, 2, :, xsl] = zm
            out_ref[0, jband, 3, :, xsl] = jnp.where(cov, 1.0, 0.0)
            out_ref[0, jband, 4, :, xsl] = bz
            # bml carries the min-lambda NUMERATOR; bar restores the
            # barycentric (0 stays 0 for uncovered lanes: 0/1).
            out_ref[0, jband, 5, :, xsl] = bml / bar
            for ch in range(6, 8):
                out_ref[0, jband, ch, :, xsl] = jnp.zeros((8, 128),
                                                          jnp.float32)
            return 0

        # ------------- pass-1 shade attrs capture (two-pass shade) ---------
        # The bilinear shade runs in a SECOND block loop after the march (see
        # _shade_pass below) so its per-block texture-window DMA can double-
        # buffer: block b+1's copy starts (origin from this scratch) while
        # block b's gathers run, hiding the previously serial start();wait()
        # (~0.65 ms/frame of exposed copy at 64x256 windows, 2025 blocks).
        if mode == "wireframe":
            # min-lambda numerator vs threshold * area (bar > 0).
            covw = cov & (bml <= common.WIREFRAME_EDGE_THRESHOLD * bar)
        else:
            covw = cov
        tx = jnp.clip(u * wt - 0.5, 0.0, wt - 1.0)
        ty = jnp.clip((1.0 - v) * ht - 0.5, 0.0, ht - 1.0)
        ix = jnp.floor(tx)
        iy = jnp.floor(ty)
        attrs_ref[0, :, xsl] = ix
        attrs_ref[1, :, xsl] = iy
        attrs_ref[2, :, xsl] = tx - ix
        attrs_ref[3, :, xsl] = ty - iy
        attrs_ref[4, :, xsl] = jnp.where(covw, 1.0, 0.0)
        # texture_z (quality merge): slot 5 carries the RASTER depth — the
        # cross-pass merge key — instead of the model z (debug_z shading is
        # not a texture_z mode; uncovered lanes stay at the FAR sentinel).
        attrs_ref[5, :, xsl] = jnp.where(covw, bz, _FAR) \
            if mode == "texture_z" else zm
        return 0

    # ---------------- pass 2: shade (texture gather + bilerp) -------------
    # Replaces the XLA quad-packed take (measured ~12.6 ms/frame: TPU gathers
    # cost ~6 ns per lookup in XLA). Per block: DMA the texture window
    # covering the block's (measured-small) uv footprint, then an aligned
    # 8-row loop with lane-dim subtable gathers. Pixels whose footprint
    # exceeds the window clamp to its edge (rare fold outliers). Round 3:
    # runs as a second block loop with DOUBLE-BUFFERED windows — block b+1's
    # copy (origin read from the pass-1 attrs scratch) overlaps block b's
    # gathers; buffer parity rides the texw row axis in 8-row tile units.
    TR, TXW = config.tex_rows, config.tex_cols
    wtp = tex_hbm.shape[1]
    nblk = wl // 128
    bigv = jnp.int32(1 << 20)

    def _tex_origin(blk):
        xsl = pl.ds(blk * 128, 128)
        ixi = attrs_ref[0, :, xsl].astype(jnp.int32)
        iyi = attrs_ref[1, :, xsl].astype(jnp.int32)
        covw = attrs_ref[4, :, xsl] > 0.5
        ty_min = jnp.min(jnp.where(covw, iyi, bigv))
        tyb = jnp.clip(ty_min // 8, 0, max(_ceil_to(ht, 8) // 8 - TR // 8, 0))
        tx_min = jnp.min(jnp.where(covw, ixi, bigv))
        txb = jnp.clip(tx_min // 128, 0, max(wtp // 128 - TXW // 128, 0))
        return tyb, txb

    def _tex_copy(tyb, txb, buf):
        return pltpu.make_async_copy(
            tex_hbm.at[pl.ds(tyb * 8, TR), pl.ds(txb * 128, TXW)],
            texw_ref.at[pl.ds(buf * TR, TR), :],
            sem.at[2 + buf],
        )

    def shade_block(blk, carry):
        tyb_c, txb_c = carry
        xsl = pl.ds(blk * 128, 128)
        ixi = attrs_ref[0, :, xsl].astype(jnp.int32)
        iyi = attrs_ref[1, :, xsl].astype(jnp.int32)
        fx = attrs_ref[2, :, xsl]
        fy = attrs_ref[3, :, xsl]
        covw = attrs_ref[4, :, xsl] > 0.5
        zm = attrs_ref[5, :, xsl]

        tyb_n, txb_n = _tex_origin(jnp.minimum(blk + 1, nblk - 1))
        par0 = jax.lax.rem(blk, 2) == 0
        has_next = blk + 1 < nblk

        @pl.when(has_next & par0)
        def _():
            _tex_copy(tyb_n, txb_n, 1).start()

        @pl.when(has_next & jnp.logical_not(par0))
        def _():
            _tex_copy(tyb_n, txb_n, 0).start()

        @pl.when(par0)
        def _():
            _tex_copy(tyb_c, txb_c, 0).wait()

        @pl.when(jnp.logical_not(par0))
        def _():
            _tex_copy(tyb_c, txb_c, 1).wait()

        trow0 = jnp.where(par0, 0, TR // 8)  # texw row offset, 8-row units

        # window-local indices (clamped; the +1 taps clamp to the texture edge
        # exactly like common.sample_texture_bilinear's quad duplication)
        wt_hi = jnp.minimum(jnp.int32(TXW - 1), wt - 1 - txb_c * 128)
        ixl = jnp.clip(ixi - txb_c * 128, 0, wt_hi)
        ixl1 = jnp.minimum(ixl + 1, wt_hi)
        ht_hi = jnp.minimum(jnp.int32(TR - 1), ht - 1 - tyb_c * 8)
        iyl = jnp.clip(iyi - tyb_c * 8, 0, ht_hi)
        iyl1 = jnp.minimum(iyl + 1, ht_hi)

        rlo = jnp.clip(jnp.min(jnp.where(covw, iyl, bigv)) // 8, 0, TR // 8)
        rhi = jnp.clip(
            (jnp.max(jnp.where(covw, iyl1, -1)) + 8) // 8, rlo, TR // 8
        )

        zero = jnp.zeros((8, 128), jnp.int32)
        nsub_t = TXW // 128
        # (Round-3 note: a per-row-block occupancy gate — jnp.any + lax.cond
        # per 8-row block — was measured 0.57 ms/frame SLOWER than scanning
        # rlo..rhi unconditionally; the cond breaks the row-loop pipeline.)

        def tex_row_body(rb, taps):
            c00, c01, c10, c11 = taps
            tb = pltpu.bitcast(
                texw_ref[pl.ds((trow0 + rb) * 8, 8), :], jnp.int32
            )  # (8, TXW)

            for j in range(8):
                row = tb[j : j + 1, :]  # (1, TXW)
                r_glob = rb * 8 + j

                def lane_gather(idxv):
                    sub = jnp.broadcast_to(row[:, 0:128], (8, 128))
                    g = jnp.take_along_axis(
                        sub, jnp.clip(idxv, 0, 127), axis=1
                    )
                    for tt in range(1, nsub_t):
                        subt = jnp.broadcast_to(
                            row[:, tt * 128 : (tt + 1) * 128], (8, 128)
                        )
                        g = jnp.where(
                            idxv >= tt * 128,
                            jnp.take_along_axis(
                                subt, jnp.clip(idxv - tt * 128, 0, 127), axis=1
                            ),
                            g,
                        )
                    return g

                g0 = lane_gather(ixl)
                g1 = lane_gather(ixl1)
                top = iyl == r_glob
                bot = iyl1 == r_glob
                c00 = jnp.where(top, g0, c00)
                c01 = jnp.where(top, g1, c01)
                c10 = jnp.where(bot, g0, c10)
                c11 = jnp.where(bot, g1, c11)
            return c00, c01, c10, c11

        c00, c01, c10, c11 = jax.lax.fori_loop(
            rlo, rhi, tex_row_body, (zero, zero, zero, zero)
        )

        def ch(x, s):
            return ((x >> s) & 0xFF).astype(jnp.float32)

        out_chans = []
        for s_ in (0, 8, 16, 24):
            topv = ch(c00, s_) + (ch(c01, s_) - ch(c00, s_)) * fx
            botv = ch(c10, s_) + (ch(c11, s_) - ch(c10, s_)) * fx
            out_chans.append(topv + (botv - topv) * fy)
        r_, g_, b_, a_ = out_chans
        if mode == "debug_z":
            grey = jnp.clip(zm, 0.0, 1.0) * 255.0
            r_, g_, b_ = grey, grey, grey
        # background: black, alpha 255 (reference clear colour)
        r_ = jnp.where(covw, r_, 0.0)
        g_ = jnp.where(covw, g_, 0.0)
        b_ = jnp.where(covw, b_, 0.0)
        a_ = jnp.where(covw, a_, 255.0)

        def q8(x):
            return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.int32)

        packed = (
            q8(r_) | (q8(g_) << 8) | (q8(b_) << 16) | (q8(a_) << 24)
        )
        out_ref[0, jband * 8:(jband + 1) * 8, xsl] = pltpu.bitcast(
            packed, jnp.uint32)
        if mode == "texture_z":
            # slot 5 = raster depth in this mode
            outz_ref[0, jband * 8:(jband + 1) * 8, xsl] = zm
        return tyb_n, txb_n

    def _shade_pass():
        ty0, tx0 = _tex_origin(0)
        _tex_copy(ty0, tx0, 0).start()
        jax.lax.fori_loop(0, nblk, shade_block, (ty0, tx0))

    def _active_body():
        _solve_phase()
        if phases in ("all", "march_only"):
            jax.lax.fori_loop(0, wl // 128, march_block, 0)
            if mode != "attrs":
                _shade_pass()
        elif mode == "attrs":  # solve-only profiling variants: blank output
            out_ref[0, jband] = jnp.zeros((8, 8, wl), jnp.float32)
        else:
            out_ref[0, jband * 8:(jband + 1) * 8, :] = jnp.zeros(
                (8, wl), jnp.uint32)

    if sparse_bands:
        @pl.when(act0)
        def _():
            _active_body()

        @pl.when(jnp.logical_not(act0))
        def _():
            # Unflagged bands: background + FAR merge keys, so the patch
            # merge keeps pass 1 everywhere the patch pass never looked.
            out_ref[0, jband * 8:(jband + 1) * 8, :] = jnp.zeros(
                (8, wl), jnp.uint32)
            outz_ref[0, jband * 8:(jband + 1) * 8, :] = jnp.full(
                (8, wl), _FAR, jnp.float32)
    else:
        _active_body()


def _exact_record(best, s, j_i, base, canch, cgf, qx, qy_col, gather_rec,
                  m2r, m3r, config: ScanConfig, width, height, w0f,
                  inv_ncm1, inv_nrm1, n_r, n_c, need_minl: bool = True,
                  anchor_y=None):
    """Fetch record s@j and its right neighbour, realign, run the exact
    edge tests on the sr-1 cells (ONE diagonal-selected triangle per cell);
    fold into the division-free (znum, area, id, attrs*area) winner carry
    (min znum/area via cross-multiplied compares, ties to lowest id)."""
    SR, OFF = config.sr, config.off
    NCH = 2 if config.pack_xy else 3  # strip channels: (pxy, z) or (sx,sy,z)
    j1 = j_i
    j2 = j_i + 1

    bw1 = gather_rec(s, 2, canch, j1, base)
    if config.dual_col:
        # Self-contained records (round 3): left + right column rows come
        # from ONE record — no neighbour-record fetch, no shear realign (and
        # none of its dmax cap: the right corners were captured at the left
        # record's OWN rows, killing the realign-cap hole class exactly).
        PR = NCH * 2
        if config.pack_xy:
            sxc1 = gather_rec(s, 0, canch, j1, base)
        rows = [
            tuple(gather_rec(s, 3 + j * PR + v, canch, j1, base)
                  for v in range(PR))
            for j in range(SR)
        ]
        if config.pack_xy:
            def _unp_d(xy, z, ref):
                x, y = _unpack2_xy(xy, _DELTA_QP)
                return (x + ref, y + anchor_y, z)

            strip1 = [_unp_d(r[0], r[1], sxc1) for r in rows]
            aligned2 = tuple(_unp_d(r[2], r[3], sxc1) for r in rows)
        else:
            strip1 = [r[0:3] for r in rows]
            aligned2 = tuple(r[3:6] for r in rows)
        return _exact_cells(
            best, strip1, aligned2, bw1, j1, cgf, qx, qy_col, m2r, m3r,
            config, width, height, w0f, inv_ncm1, inv_nrm1, n_r, n_c,
            need_minl)

    bw2 = gather_rec(s, 2, canch, j2, base)
    if config.pack_xy:
        # The packed strips are deltas against their column's crossing x
        # (plane 0) — two extra gathers buy the near-lossless 1/256-px
        # coding (vs 2*sr*3 unpacked strip gathers saved).
        sxc1 = gather_rec(s, 0, canch, j1, base)
        sxc2 = gather_rec(s, 0, canch, j2, base)
    strip1 = [
        tuple(gather_rec(s, 3 + j * NCH + v, canch, j1, base)
              for v in range(NCH))
        for j in range(SR)
    ]
    strip2 = [
        tuple(gather_rec(s, 3 + j * NCH + v, canch, j2, base)
              for v in range(NCH))
        for j in range(SR)
    ]

    # realign the neighbour strip: aligned2[k] = strip2[k - d], d = bw2 - bw1.
    # The delta range matters: capping |d| at 3 measurably loses fold cells
    # (scan_proto3 DMAX sweep: 99.03% -> 99.47% winner agreement); the
    # production config caps at dmax=5 (-0.22pp for ~0.9 ms/frame).
    # Round-3 zero-shear gate: away from folds the two columns' records
    # anchor on the SAME row (d == 0 for every valid lane — the common
    # case), and aligned2 is strip2 verbatim; one scalar reduce skips the
    # whole (2*dmax+1) x sr x 3 select pyramid, bit-identically (the
    # pyramid's delta=0 plane IS the passthrough). Lanes whose RIGHT record
    # is missing (bw2 = _NOBASE) are masked out of the gate reduce, and the
    # fast path NaN-poisons only their z rows — any NaN corner z fails the
    # zz-in-[-1,1] coverage test, reproducing the pyramid's no-delta-match
    # NaN rejection at sr selects instead of 3*sr per delta.
    dmax = SR - 1 if config.dmax is None else min(config.dmax, SR - 1)
    d = bw2 - bw1
    valid2 = bw2 > jnp.float32(_NOBASE + 1.0)
    both_valid = (bw1 > jnp.float32(_NOBASE + 1.0)) & valid2
    no_shear = jnp.max(jnp.abs(jnp.where(both_valid, d, 0.0))) < 0.5
    nanv = jnp.float32(jnp.nan)

    def _passthrough(s2):
        return tuple(
            tuple(r[:-1]) + (jnp.where(valid2, r[-1], nanv),) for r in s2
        )

    def _realign(s2):
        deltas = {
            delta: d == jnp.float32(delta) for delta in range(-dmax, dmax + 1)
        }
        aligned2 = []
        for k in range(SR):
            acc = (nanv * jnp.ones_like(bw1),) * NCH
            for delta in range(-dmax, dmax + 1):
                kk = k - delta
                if 0 <= kk < SR:
                    m = deltas[delta]
                    acc = tuple(
                        jnp.where(m, s2[kk][v], acc[v]) for v in range(NCH)
                    )
            aligned2.append(tuple(acc))
        return tuple(aligned2)

    aligned2 = jax.lax.cond(
        no_shear, _passthrough, _realign, tuple(tuple(r) for r in strip2)
    )

    if config.pack_xy:
        # Unpack ONCE per exact pass (after realign, so the pyramid's
        # selects ran on 2 planes); downstream sees (sx, sy, z) as before.
        # A NaN-poisoned z row keeps its rejection role; the unpacked x/y
        # of missing rows are bounded garbage the failed zz test ignores.
        # Deltas rebase on the fetched column crossing x (sxc1/sxc2 — the
        # realign shifts rows WITHIN a column, so each side keeps its own
        # reference) and the band scanline anchor.
        def _unp(row, ref):
            x, y = _unpack2_xy(row[0], _DELTA_QP)
            return (x + ref, y + anchor_y, row[1])

        strip1 = [_unp(r, sxc1) for r in strip1]
        aligned2 = tuple(_unp(r, sxc2) for r in aligned2)

    return _exact_cells(
        best, strip1, aligned2, bw1, j1, cgf, qx, qy_col, m2r, m3r, config,
        width, height, w0f, inv_ncm1, inv_nrm1, n_r, n_c, need_minl)


def _cell_fold(best, cell_ok, diag_e, top_e, bottom_e, left_e, right_e,
               z00, z10, z01, z11, i00, i10, i01, i11, u0, u1, v_top, v_bot,
               base_id, inv_ncm1, inv_nrm1, need_minl, cull_thresh=None,
               zms=None):
    """ONE cell's exact coverage test + division-free winner fold, given its
    five edge functions and corner (z, 1/w) values — the shared tail of
    ``_exact_cells`` (strip records) and the colfix window sweep. See
    ``_exact_cells`` for the derivation of the diagonal select, the deferred
    area division, and the 1/w-partial attribute fold. ``zms`` carries the
    four corner model-z values when ``cull_thresh`` (edge culling) is set."""
    bzn, bar, bid, buw, bvw, biw, bml = best
    d = diag_e >= 0.0
    w_a = jnp.where(d, diag_e, bottom_e)
    w_b = jnp.where(d, top_e, right_e)
    w_c = jnp.where(d, left_e, -diag_e)
    area = w_a + w_b + w_c
    ok = cell_ok & (area > 1e-12)
    if cull_thresh is not None:
        zm00, zm10, zm01, zm11 = zms
        zm_a = jnp.where(d, zm00, zm01)
        zm_b = zm10
        zm_c = jnp.where(d, zm01, zm11)
        spread = jnp.maximum(
            jnp.maximum(zm_a, zm_b), zm_c
        ) - jnp.minimum(jnp.minimum(zm_a, zm_b), zm_c)
        ok = ok & (spread <= jnp.float32(cull_thresh))
    # Inside-tests: the selected w_a >= 0 is implied by the selection
    # (d => diag_e >= 0; !d => -diag_e > 0). And/or form: Mosaic cannot
    # lower a SELECT with i1 branches (i8->i1 trunci).
    inside = ((d & (top_e >= 0.0) & (left_e >= 0.0))
              | (~d & (bottom_e >= 0.0) & (right_e >= 0.0)))
    z_a = jnp.where(d, z00, z01)
    z_c = jnp.where(d, z01, z11)
    znum = w_a * z_a + w_b * z10 + w_c * z_c
    cov = ok & inside & (znum >= -area) & (znum <= area)
    tid = base_id + jnp.where(d, 0.0, 1.0)
    # Depth compare without the divide: znum/area < bzn/bar, both
    # denominators > 0 (see _exact_cells' derivation comments).
    c_l = znum * bar
    c_r = bzn * area
    better = cov & ((c_l < c_r) | ((c_l == c_r) & (tid < bid)))
    iw_a = jnp.where(d, i00, i01)
    iw_c = jnp.where(d, i01, i11)
    p_a = w_a * iw_a
    p_b = w_b * i10
    p_c = w_c * iw_c
    iw = p_a + p_b + p_c
    uw = (jnp.where(d, u0, u1) * iw
          + inv_ncm1 * jnp.where(d, p_c, -p_b))
    vw = (jnp.where(d, v_top, v_bot) * iw
          + inv_nrm1 * jnp.where(d, -p_b, p_a))
    bzn = jnp.where(better, znum, bzn)
    bar = jnp.where(better, area, bar)
    bid = jnp.where(better, tid, bid)
    buw = jnp.where(better, uw, buw)
    bvw = jnp.where(better, vw, bvw)
    biw = jnp.where(better, iw, biw)
    if need_minl:  # wireframe/attrs only: the texture path skips it
        # min-lambda NUMERATOR (the area factor divides out with bar
        # at the block tail / threshold test).
        minl = jnp.minimum(w_a, jnp.minimum(w_b, w_c))
        bml = jnp.where(better, minl, bml)
    return bzn, bar, bid, buw, bvw, biw, bml


def _exact_cells(best, strip1, aligned2, bw1, j1, cgf, qx, qy_col, m2r, m3r,
                 config: ScanConfig, width, height, w0f, inv_ncm1, inv_nrm1,
                 n_r, n_c, need_minl):
    """The exact edge tests over the sr-1 cells of an (already fetched and
    row-aligned) left/right strip pair; folds winners into the division-free
    (znum, area, id, attrs*area) carry. Shared by the single-column
    (realigned neighbour record) and dual_col (self-contained record)
    fetch paths."""
    SR, OFF = config.sr, config.off
    # per-corner analytic 1/w = minv[3] . [ndcx, ndcy, ndcz, 1]
    sxw = 2.0 / width
    syw = 2.0 / height

    def invw_of(corner):
        csx, csy, cz = corner
        return (
            m3r[0] * (csx * sxw - 1.0)
            + m3r[1] * (csy * syw - 1.0)
            + m3r[2] * cz
            + m3r[3]
        )

    iw1 = [invw_of(strip1[k]) for k in range(SR)]
    iw2 = [invw_of(aligned2[k]) for k in range(SR)]

    # In-kernel edge culling (BASELINE config #4 semantics): per-corner model
    # z via rows 2/3 of the inverse MVP — the same reconstruction the shade
    # phase uses — culling cells whose corner depth spread exceeds the
    # threshold, exactly like RasterConfig.edge_cull_threshold
    # (raster_grid.py:268-270). Costs ~4 divides/cell only when enabled.
    if config.edge_cull_threshold is not None:
        def zm_of(corner, iw):
            csx, csy, cz = corner
            num = (
                m2r[0] * (csx * sxw - 1.0)
                + m2r[1] * (csy * syw - 1.0)
                + m2r[2] * cz
                + m2r[3]
            )
            den = jnp.where(jnp.abs(iw) > 1e-30, iw, 1.0)
            return num / den

        zm1 = [zm_of(strip1[k], iw1[k]) for k in range(SR)]
        zm2 = [zm_of(aligned2[k], iw2[k]) for k in range(SR)]

    cg = cgf + j1.astype(jnp.float32)          # global record col (8,128)
    u0 = cg * inv_ncm1
    u1 = (cg + 1.0) * inv_ncm1
    rg0 = w0f + bw1 - jnp.float32(OFF)         # global row of strip row 0
    valid_rec = bw1 > jnp.float32(_NOBASE + 1.0)
    col_ok = valid_rec & (cg <= jnp.float32(n_c - 2))

    bzn, bar, bid, buw, bvw, biw, bml = best
    qy = qy_col * jnp.ones_like(qx)

    prev_bottom = None
    for k in range(SR - 1):
        r_cell = rg0 + jnp.float32(k)
        cell_ok = col_ok & (r_cell >= 0.0) & (r_cell <= jnp.float32(n_r - 2))
        v_top = 1.0 - r_cell * inv_nrm1
        v_bot = 1.0 - (r_cell + 1.0) * inv_nrm1
        x00, y00, z00 = strip1[k]
        x10, y10, z10 = strip1[k + 1]
        x01, y01, z01 = aligned2[k]
        x11, y11, z11 = aligned2[k + 1]
        i00, i10, i01, i11 = iw1[k], iw1[k + 1], iw2[k], iw2[k + 1]
        base_id = (r_cell * jnp.float32(n_c - 1) + cg) * 2.0

        # Shared edge functions (round 3): the two triangles' common
        # diagonal and vertically-adjacent cells' common horizontal edge
        # are each computed ONCE and NEGATED for the other side — 4
        # cross-products per cell instead of 6, and GL-style watertight
        # shared edges (the two sides see exactly opposite signs, so a
        # pixel on the edge can never be double-covered or dropped by
        # independent-rounding disagreement). NaN corners poison both
        # users of a shared edge identically (same corner rows).
        diag_e = (x01 - x10) * (qy - y10) - (y01 - y10) * (qx - x10)
        left_e = (x10 - x00) * (qy - y00) - (y10 - y00) * (qx - x00)
        if prev_bottom is None:
            top_e = (x00 - x01) * (qy - y01) - (y00 - y01) * (qx - x01)
        else:
            top_e = -prev_bottom
        bottom_e = (x11 - x10) * (qy - y10) - (y11 - y10) * (qx - x10)
        right_e = (x01 - x11) * (qy - y11) - (y01 - y11) * (qx - x11)
        prev_bottom = bottom_e

        # ONE triangle per pixel (round 3, division-free exact): the cell's
        # two triangles share the diagonal with opposite signs, so they are
        # mutually exclusive — the diagonal's sign SELECTS the candidate
        # (d: tri0 = (c00, c10, c01), else tri1 = (c01, c10, c11)) and one
        # interpolation runs instead of two. The doubled signed area comes
        # free from the barycentric identity e_a + e_b + e_c = 2*area (for
        # covered pixels every term is >= 0, so the f32 sum has no
        # cancellation), and the per-triangle 1.0/area divide is DEFERRED:
        # the carry holds (znum, area) with cross-multiplied depth compares
        # (area, barea > 0), and the attr numerators keep their area factor
        # — it cancels in the downstream u = uw/iw ratio; the block tail
        # divides znum/area once. NaN corners poison the edges, so d falls
        # to tri1 whose own NaN sign tests fail — cov stays false. The
        # select / inside-test / depth-compare / attribute fold is the
        # shared ``_cell_fold`` (also the colfix window sweep's fold).
        (bzn, bar, bid, buw, bvw, biw, bml) = _cell_fold(
            (bzn, bar, bid, buw, bvw, biw, bml), cell_ok,
            diag_e, top_e, bottom_e, left_e, right_e,
            z00, z10, z01, z11, i00, i10, i01, i11,
            u0, u1, v_top, v_bot, base_id, inv_ncm1, inv_nrm1, need_minl,
            cull_thresh=config.edge_cull_threshold,
            zms=(None if config.edge_cull_threshold is None
                 else (zm1[k], zm1[k + 1], zm2[k], zm2[k + 1])))

    return bzn, bar, bid, buw, bvw, biw, bml


@functools.partial(
    jax.jit, static_argnames=("tex_hw", "width", "height", "n_r", "n_c",
                              "config", "mode", "interpret", "debug_records",
                              "phases")
)
def _raster_scan_pallas(win, texq, tex_hw, minv_rows, w0, bounds, canch,
                        mid, width, height, n_r, n_c, config: ScanConfig,
                        mode: str = "attrs", interpret: bool = False,
                        debug_records: bool = False, phases: str = "all",
                        bflag=None):
    """Run the fused scan kernel over a FRAME GROUP.

    Inputs carry a leading frame axis T (``win`` (T, 3, RPAD, CL), scalars
    (T, nbands)/(T, nblocks)/(T, 8)); the kernel grid is (T, nbands /
    _BANDS_PER_STEP) so a whole group is one dispatch (per-frame dispatches
    measurably lose ~18 ms/frame to host overhead through the remote-TPU
    tunnel). Returns (T, nbands, 8, 8, WL) f32 [u, v, zm, cov, z].

    With ``debug_records`` also returns slot 0's full record planes,
    (T, nbands, 1, nrec, 8, CL) — forensic hook for validating the compiled
    solve against a host-side replica."""
    T = win.shape[0]
    cl = win.shape[3]
    wl = _ceil_to(width, 128)
    nbands = -(-height // 8)
    ht, wt = tex_hw

    # Bands per grid step (round 4): the 2-bands/step merge is byte-identical
    # but measured SLOWER on chip (84.5-84.9 vs 86.7-87.3 fps — see
    # _BANDS_PER_STEP and ROADMAP "Measured dead ends"), so the default stays
    # 1. The machinery is kept: band scalars pad to the step multiple with
    # EMPTY work (zero bounds -> no records; mid = -2 -> march skipped), and
    # every consumer crops its rows to ``height``. debug_records keeps
    # 1 band/step (its forensic output shape is per-band); big_grid keeps
    # its own per-chunk protocol.
    if config.big_grid or debug_records:
        bps = 1
    elif bflag is not None:
        bps = max(1, _PATCH_BANDS_PER_STEP)
    else:
        bps = _BANDS_PER_STEP
    nb2 = _ceil_to(nbands, bps)
    if nb2 != nbands:
        nchunks_p = cl // 128
        nblocks_p = wl // 128
        pad_b = nb2 - nbands
        w0 = jnp.pad(w0, ((0, 0), (0, pad_b)))
        bounds = jnp.pad(
            bounds.reshape(T, nbands, nchunks_p),
            ((0, 0), (0, pad_b), (0, 0))).reshape(T, nb2 * nchunks_p)
        mid = jnp.pad(
            mid.reshape(T, nbands, nblocks_p),
            ((0, 0), (0, pad_b), (0, 0)),
            constant_values=-2).reshape(T, nb2 * nblocks_p)
        if bflag is not None:
            bflag = jnp.pad(jnp.asarray(bflag, jnp.int32),
                            ((0, 0), (0, pad_b)))

    if mode == "attrs":
        out_specs = pl.BlockSpec(
            (1, bps, 8, 8, wl), lambda t, i, *_: (t, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((T, nb2, 8, 8, wl), jnp.float32)
    elif mode == "texture_z":
        # Quality-merge path: rgba + the raster-z merge key, both in the
        # full-image row layout.
        out_specs = (
            pl.BlockSpec((1, 8 * bps, wl), lambda t, i, *_: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * bps, wl), lambda t, i, *_: (t, i, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((T, nb2 * 8, wl), jnp.uint32),
            jax.ShapeDtypeStruct((T, nb2 * 8, wl), jnp.float32),
        )
    else:
        # Full-image row layout: band i writes image rows [8i, 8i+8), so the
        # host-side assembly is a pure bitcast (no relayout copy).
        out_specs = pl.BlockSpec(
            (1, 8 * bps, wl), lambda t, i, *_: (t, i, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((T, nb2 * 8, wl), jnp.uint32)
    if debug_records:
        out_specs = (out_specs, pl.BlockSpec(
            (1, 1, 1, config.nrec, 8, cl),
            lambda t, i, *_: (t, i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (T, nbands, 1, config.nrec, 8, cl), jnp.float32))

    sparse = bflag is not None
    if sparse:
        assert mode == "texture_z" and not config.big_grid \
            and not debug_records and phases == "all", \
            "sparse-band rendering exists only for the texture_z patch pass"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if sparse else 5,
        grid=(T, nb2 // bps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=(
            # standard mode: 2x rmax rows = the double-buffered band window
            [pltpu.VMEM((3, config.rmax, 128) if config.big_grid
                        else (3, 2 * config.rmax, cl), jnp.float32),
             pltpu.VMEM((config.nbr, config.nrec, 8, cl), jnp.float32)]
            + ([] if config.big_grid
               else [pltpu.VMEM((config.nbr, 2, cl, 8), jnp.float32)])
            # pass-1 shade attrs (ix, iy, fx, fy, covw, zm) + the DOUBLE-
            # buffered texture window (two-pass shade, round 3)
            + [pltpu.VMEM((6, 8, wl), jnp.float32),
               pltpu.VMEM((2 * config.tex_rows, config.tex_cols), jnp.uint32),
               pltpu.SemaphoreType.DMA((4,))]
            # round-5 big_grid colfix: (2 fan subtables, 3 ch, rmax, 128)
            + ([pltpu.VMEM((2, 3, config.rmax, 128), jnp.float32)]
               if config.big_grid and config.colfix is not None else [])
        ),
    )
    kernel = functools.partial(
        _scan_kernel_steps, config=config, width=width, height=height,
        n_r=n_r, n_c=n_c, cl=cl, wl=wl, ht=ht, wt=wt, mode=mode,
        debug_records=debug_records, phases=phases, sparse_bands=sparse,
        bands_per_step=bps,
    )
    kwargs = {}
    if config.big_grid and not interpret:
        # d12's scratch (8.9 MB records) + the wide-march temporaries exceed
        # the compiler's default 16 MB scoped-VMEM budget (measured 20.1 MB
        # at 4K/d12); raise it for this variant only so the standard-config
        # kernel hash (and its compiled cache entries) stay untouched.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=30 * 1024 * 1024)
    elif not interpret:
        # The double-buffered band window (round 3) lifts the standard
        # variant's total scoped allocation to 16.06 MB at 1080p/d10 — just
        # past the 16 MB default; 20 MB covers it with headroom (v5e VMEM is
        # 128 MB; the 30 MB big_grid setting is already hardware-validated).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024)
    args = (w0, bounds, canch, mid, minv_rows)
    if sparse:
        args += (jnp.asarray(bflag, jnp.int32),)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*args, win, texq)


# ---------------------------------------------------------------------------
# Stage 3 (XLA): assembly + shade
# ---------------------------------------------------------------------------


def _shade_scan_impl(bands, texture_f32, width, height, mode: str):
    """(nbands, 8ch, 8, WL) -> (H, W, 4) uint8 via common.shade."""
    nbands = bands.shape[0]
    full = bands.transpose(0, 2, 1, 3).reshape(nbands * 8, 8, -1)
    full = full[:height, :, :width]
    u, v, zm, covf = full[:, 0], full[:, 1], full[:, 2], full[:, 3] > 0.5
    return common.shade(covf, u, v, zm, texture_f32, mode,
                        min_lam=full[:, 5])


def _shade_scan_batched_impl(bands, texture_f32, width, height, mode: str):
    return jax.vmap(
        lambda b: _shade_scan_impl(b, texture_f32, width, height, mode)
    )(bands)


_shade_scan_batched = jax.jit(
    _shade_scan_batched_impl, static_argnames=("width", "height", "mode")
)


def _shade_scan(bands, texture_f32, width, height, mode):
    """Single-frame convenience used by the forensic/profiling scripts."""
    return _shade_scan_batched(bands[None], texture_f32, width, height,
                               mode)[0]


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _assemble_rgba_batched(bands_u32, width, height):
    """(T, HPAD, WL) uint32 in-kernel-shaded output -> (T, H, W, 4) u8."""
    u8 = jax.lax.bitcast_convert_type(bands_u32, jnp.uint8)  # (..., 4) LSB=red
    return u8[:, :height, :width]


# ---------------------------------------------------------------------------
# Public API (mirrors raster_pallas)
# ---------------------------------------------------------------------------


def render_frame_scan(mvp, vertex_grid, uv_grid, texture_f32, width, height,
                      config: ScanConfig = ScanConfig(), mode: str = "texture",
                      interpret: bool = False):
    """Render one frame via the column-crossing-scan path -> (H, W, 4) uint8.

    ``uv_grid`` must be the standard grid-mesh parameterisation
    (u = col/(n_c-1), v = 1 - row/(n_r-1), meshgen.py / reference
    render.py:496-497): the kernel reconstructs UVs analytically instead of
    storing them in records.
    """
    return render_frames_scan(
        jnp.asarray(mvp, jnp.float32)[None], vertex_grid, uv_grid,
        texture_f32, width, height, config, mode, interpret,
    )[0]


@functools.partial(jax.jit, static_argnames=("width", "height", "config"))
def _prep_scan_batched(mvps, vertex_grid, width, height, config: ScanConfig):
    return jax.vmap(
        lambda m: _prep_scan_impl(m, vertex_grid, width, height, config)
    )(mvps)


# 16-frame groups keep the windows + outputs well under an HBM budget at 4K
# and amortise the per-dispatch host overhead (measured ~18 ms/frame lost to
# per-frame dispatches through the remote-TPU tunnel).
_FRAME_GROUP = 16
_WIN_HBM_BUDGET = 2 << 30


def _check_uv_grid(uv_grid):
    """Validate the analytic-UV assumption (u = col/(n_c-1), v = 1 - row/(n_r-1)).

    The kernel reconstructs UVs analytically instead of storing them in
    records; a mesh with a non-standard parameterisation would silently render
    with wrong texturing (ADVICE r2). Checks the four corner UVs — one tiny
    host transfer per call.
    """
    if uv_grid is None:
        return
    n_r, n_c = uv_grid.shape[0], uv_grid.shape[1]
    if n_r < 2 or n_c < 2:
        return
    import numpy as _np

    corners = _np.asarray(uv_grid[:: n_r - 1, :: n_c - 1], _np.float32)
    expect = _np.array(
        [[[0.0, 1.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 0.0]]], _np.float32
    )
    if not _np.allclose(corners, expect, atol=1e-5):
        raise ValueError(
            "render_frames_scan requires the standard grid-mesh UV "
            f"parameterisation (corner UVs {expect.tolist()}, got "
            f"{corners.tolist()}); use the tiled/grid rasterisers for "
            "custom UVs."
        )


def unpack_raw_frames(raw_np, width, height):
    """Host-side view of the kernel's raw packed-RGBA output.

    (T, HPAD, WL) uint32 -> (T, H, W, 4) uint8, zero-copy up to the crop (a
    device-side uint8 conversion costs a measured ~4.7 ms/frame of TPU
    relayout; a numpy view is free).
    """
    import numpy as _np

    raw_np = _np.asarray(raw_np)
    u8 = raw_np.view(_np.uint8).reshape(raw_np.shape[0], raw_np.shape[1],
                                        raw_np.shape[2], 4)
    return u8[:, :height, :width]


def render_frames_scan(mvps, vertex_grid, uv_grid, texture_f32, width, height,
                       config: ScanConfig = ScanConfig(),
                       mode: str = "texture", interpret: bool = False,
                       frame_batch: int = _FRAME_GROUP,
                       raw_u32: bool = False):
    """Batched frames via the scan path -> (T, H, W, 4) uint8.

    Frames render in groups: one vmapped prep dispatch, ONE kernel launch over
    the (frame, band) grid, one vmapped shade. ``mvps`` is padded to a group
    multiple so only one kernel shape ever compiles.

    With ``raw_u32`` the in-kernel-shaded output is returned as the kernel's
    native (T, HPAD, WL) uint32 device array (see ``unpack_raw_frames``) —
    the pipelined consumers (render_clip, bench) use this to skip the
    device-side uint8 relayout.
    """
    if config.row_edge:
        assert not raw_u32 or mode == "texture", \
            "row_edge raw output exists only for texture mode"
        return render_frames_scan_quality(
            mvps, vertex_grid, uv_grid, texture_f32, width, height, config,
            mode=mode, interpret=interpret, frame_batch=frame_batch,
            raw_u32=raw_u32)
    if config.patch and mode == "texture" \
            and jnp.asarray(texture_f32).ndim == 3 \
            and jnp.asarray(texture_f32).shape[-1] == 4:
        # Hole-driven sparse patch (round 4). Non-texture modes (debug_z,
        # wireframe, custom textures) fall through to the single pass: the
        # patch exists to close the production path's coverage holes.
        return render_frames_scan_patched(
            mvps, vertex_grid, uv_grid, texture_f32, width, height, config,
            interpret=interpret, frame_batch=frame_batch, raw_u32=raw_u32)
    _check_uv_grid(uv_grid)
    del uv_grid  # analytic (validated above; pinned by tests vs meshgen)
    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    mvps = jnp.asarray(mvps, jnp.float32)
    T = mvps.shape[0]

    import numpy as _np

    # Per-frame win tensor: (3, RPAD, CL) f32.
    rpad = max(_ceil_to(n_r, 8), config.rmax)
    win_bytes = 3 * rpad * _ceil_to(n_c, 128) * 4
    fb = max(1, min(frame_batch, _WIN_HBM_BUDGET // max(win_bytes, 1), T))
    pad = (-T) % fb
    if pad:
        mvps = jnp.concatenate([mvps, jnp.repeat(mvps[-1:], pad, axis=0)])

    # rows 2/3 of each inverse MVP in f64 on the host (TPU jit silently
    # degrades float64): the analytic z_model / inv_w source.
    mvps_np = _np.asarray(mvps, _np.float64)
    minv = _np.linalg.inv(mvps_np)
    minv_rows = jnp.asarray(
        _np.concatenate([minv[:, 2], minv[:, 3]], axis=1).astype(_np.float32)
    )  # (T+pad, 8)

    # Packed-RGBA texture for the in-kernel sampler (one dispatch, reused by
    # every group in this call).
    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    ht, wt = int(texture_f32.shape[0]), int(texture_f32.shape[1])
    rpad_t = max(_ceil_to(ht, 8), config.tex_rows)
    cpad_t = max(_ceil_to(wt, 128), config.tex_cols)
    in_kernel = mode in ("texture", "debug_z", "wireframe") \
        and texture_f32.ndim == 3 and texture_f32.shape[-1] == 4
    if in_kernel:
        texq = _pack_texture(texture_f32, rpad_t, cpad_t)
    else:
        texq = jnp.zeros((rpad_t, cpad_t), jnp.uint32)

    frames = []
    ovfs = []
    for s in range(0, T + pad, fb):
        win, w0, bounds, canch, mid, ovf = _prep_scan_batched(
            mvps[s:s + fb], vertex_grid, width, height, config
        )
        ovfs.append(ovf)
        bands = _raster_scan_pallas(
            win, texq, (ht, wt), minv_rows[s:s + fb], w0, bounds, canch, mid,
            width, height, n_r, n_c, config,
            mode if in_kernel else "attrs", interpret,
        )
        if in_kernel and raw_u32:
            frames.append(bands)
        elif in_kernel:
            frames.append(_assemble_rgba_batched(bands, width, height))
        else:
            frames.append(
                _shade_scan_batched(bands, texture_f32, width, height, mode)
            )
    out = jnp.concatenate(frames, axis=0) if len(frames) > 1 else frames[0]
    # Surface the depth-hull clipping diagnostic from the ACTUAL rendered
    # batches (ADVICE r2: it was silently dropped here, leaving only
    # render_clip's 3-view sampling). Checking after all dispatches keeps the
    # pipeline async: prep(last group) has long finished by now.
    ovf_max = max(int(_np.max(_np.asarray(o))) for o in ovfs)
    if ovf_max:
        from ..utils import log

        log(f"WARNING: scan depth-hull window clipped up to {ovf_max} "
            f"candidate row(s) in this batch (rmax={config.rmax}); raise "
            f"ScanConfig.rmax or expect misses at extreme depth relief.")
    return out[:T]


# ---------------------------------------------------------------------------
# Row-edge record family (round 3): two passes merged by depth
# ---------------------------------------------------------------------------

# Clip-space screen transpose for the row-edge pass: ndcx' = -ndcy,
# ndcy' = -ndcx (z, w unchanged), i.e. transposed-window x' = H - sy,
# y' = W - sx. The map flips screen orientation (det -1) and the grid
# transpose flips parameter orientation — composed, the projected triangles
# keep their original winding, so the kernel's area > 0 front-face rule
# accepts exactly the original front faces. Transposed pixel (i', j') IS
# original pixel (j', i'): x'_center = j' + 0.5 = H - sy => original row
# r = j'; y'_center = W - i' - 0.5 = W - sx => original col c = i'.
_ROW_EDGE_SWAP = ((0.0, -1.0, 0.0, 0.0),
                  (-1.0, 0.0, 0.0, 0.0),
                  (0.0, 0.0, 1.0, 0.0),
                  (0.0, 0.0, 0.0, 1.0))


def _scan_attrs_grouped(mvps, vertex_grid, width, height, config: ScanConfig,
                        interpret: bool, frame_batch: int):
    """Grouped attrs-mode scan render -> ((T, nbands, 8, 8, WL) f32, ovf).

    The building blocks of :func:`render_frames_scan` (vmapped prep + one
    kernel launch per frame group) without the in-kernel shade: the quality
    pipeline merges two passes' attributes BEFORE shading."""
    import numpy as _np

    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    mvps = jnp.asarray(mvps, jnp.float32)
    T = mvps.shape[0]
    rpad = max(_ceil_to(n_r, 8), config.rmax)
    win_bytes = 3 * rpad * _ceil_to(n_c, 128) * 4
    fb = max(1, min(frame_batch, _WIN_HBM_BUDGET // max(win_bytes, 1), T))
    pad = (-T) % fb
    if pad:
        mvps = jnp.concatenate([mvps, jnp.repeat(mvps[-1:], pad, axis=0)])
    mvps_np = _np.asarray(mvps, _np.float64)
    minv = _np.linalg.inv(mvps_np)
    minv_rows = jnp.asarray(
        _np.concatenate([minv[:, 2], minv[:, 3]], axis=1).astype(_np.float32))
    texq = jnp.zeros((config.tex_rows, config.tex_cols), jnp.uint32)
    outs = []
    ovfs = []
    for s in range(0, T + pad, fb):
        win, w0, bounds, canch, mid, ovf = _prep_scan_batched(
            mvps[s:s + fb], vertex_grid, width, height, config)
        ovfs.append(ovf)
        outs.append(_raster_scan_pallas(
            win, texq, (8, 128), minv_rows[s:s + fb], w0, bounds, canch,
            mid, width, height, n_r, n_c, config, "attrs", interpret))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    ovf_max = max(int(_np.max(_np.asarray(o))) for o in ovfs)
    return out[:T], ovf_max


def _scan_rgba_z_grouped(mvps, vertex_grid, texture_f32, width, height,
                         config: ScanConfig, interpret: bool,
                         frame_batch: int, gates=None):
    """Grouped texture_z render -> ((T, H8, WL) u32, (T, H8, WL) f32, ovf).

    The in-kernel-shaded fast form of a quality pass: rgba in the raw
    full-image row layout plus the raster-depth merge key. ``gates``
    (bflag, blkflag) from :func:`_patch_flags` restricts the render to the
    flagged bands/blocks (the sparse patch pass)."""
    import numpy as _np

    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    mvps = jnp.asarray(mvps, jnp.float32)
    T = mvps.shape[0]
    rpad = max(_ceil_to(n_r, 8), config.rmax)
    win_bytes = 3 * rpad * _ceil_to(n_c, 128) * 4
    fb = max(1, min(frame_batch, _WIN_HBM_BUDGET // max(win_bytes, 1), T))
    pad = (-T) % fb
    if pad:
        mvps = jnp.concatenate([mvps, jnp.repeat(mvps[-1:], pad, axis=0)])
    mvps_np = _np.asarray(mvps, _np.float64)
    minv = _np.linalg.inv(mvps_np)
    minv_rows = jnp.asarray(
        _np.concatenate([minv[:, 2], minv[:, 3]], axis=1).astype(_np.float32))
    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    ht, wt = int(texture_f32.shape[0]), int(texture_f32.shape[1])
    rpad_t = max(_ceil_to(ht, 8), config.tex_rows)
    cpad_t = max(_ceil_to(wt, 128), config.tex_cols)
    texq = _pack_texture(texture_f32, rpad_t, cpad_t)
    bflag_all = blk_all = None
    if gates is not None:
        bflag_all, blk_all = gates
        if pad:  # padded frames render nothing
            bflag_all = jnp.concatenate(
                [bflag_all, jnp.zeros((pad,) + bflag_all.shape[1:],
                                      bflag_all.dtype)])
            blk_all = jnp.concatenate(
                [blk_all, jnp.zeros((pad,) + blk_all.shape[1:],
                                    blk_all.dtype)])
    rgbas, zs, ovfs = [], [], []
    for s in range(0, T + pad, fb):
        win, w0, bounds, canch, mid, ovf = _prep_scan_batched(
            mvps[s:s + fb], vertex_grid, width, height, config)
        ovfs.append(ovf)
        bflag = None
        if gates is not None:
            cwf = min(config.cw + 128, win.shape[3])
            bounds, mid = _apply_patch_gates(
                bounds, mid, canch, blk_all[s:s + fb], cwf, win.shape[3])
            bflag = bflag_all[s:s + fb]
        rgba, z = _raster_scan_pallas(
            win, texq, (ht, wt), minv_rows[s:s + fb], w0, bounds, canch,
            mid, width, height, n_r, n_c, config, "texture_z", interpret,
            bflag=bflag)
        rgbas.append(rgba)
        zs.append(z)
    rgba = jnp.concatenate(rgbas, axis=0) if len(rgbas) > 1 else rgbas[0]
    z = jnp.concatenate(zs, axis=0) if len(zs) > 1 else zs[0]
    ovf_max = max(int(_np.max(_np.asarray(o))) for o in ovfs)
    return rgba[:T], z[:T], ovf_max


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _merge_row_edge_raw(rgba1, z1, rgba2, z2, width, height):
    """u32 depth-merge of two texture_z passes, in pass 1's raw row layout.

    ``rgba2``/``z2`` come from the transposed pass over the (height x width)
    image; transposed pixel (i', j') IS original pixel (j', i'). Padded
    regions keep pass 1 (z2 pads to the FAR sentinel); exact depth ties keep
    pass 1 (an exact cross-pass tie is the same triangle)."""
    h8, wl1 = rgba1.shape[1], rgba1.shape[2]
    r2 = rgba2[:, :width, :height].transpose(0, 2, 1)
    zz2 = z2[:, :width, :height].transpose(0, 2, 1)
    r2 = jnp.pad(r2, ((0, 0), (0, h8 - height), (0, wl1 - width)))
    zz2 = jnp.pad(zz2, ((0, 0), (0, h8 - height), (0, wl1 - width)),
                  constant_values=_FAR)
    return jnp.where(zz2 < z1, r2, rgba1)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _merge_row_edge(b1, b2, width, height):
    """Depth-merge the column pass with the transposed row-edge pass.

    ``b1``: (T, nb1, 8ch, 8, WL1) attrs of the standard pass over the
    (width x height) image. ``b2``: the transposed pass over the
    (height x width) image — its pixel (i', j') IS original pixel (j', i')
    (see ``_ROW_EDGE_SWAP``), and its analytic UVs map back as u = 1 - v',
    v = 1 - u' (the grid transpose swaps the parameter axes). Winner =
    lower raster depth; exact ties keep the column pass (across passes an
    exact tie is the same triangle, so the choice is invisible)."""
    T, nb1, wl1 = b1.shape[0], b1.shape[1], b1.shape[4]
    a1 = b1.transpose(0, 1, 3, 2, 4).reshape(T, nb1 * 8, 8, wl1)
    a1 = a1[:, :height, :, :width]                        # (T, H, ch, W)
    nb2, wl2 = b2.shape[1], b2.shape[4]
    a2 = b2.transpose(0, 1, 3, 2, 4).reshape(T, nb2 * 8, 8, wl2)
    a2 = a2[:, :width, :, :height].transpose(0, 3, 2, 1)  # (T, H, ch, W)
    a2m = jnp.concatenate([
        1.0 - a2[:, :, 1:2],   # u = 1 - v' (uncovered lanes: cov gates)
        1.0 - a2[:, :, 0:1],   # v = 1 - u'
        a2[:, :, 2:],
    ], axis=2)
    win2 = (a2[:, :, 3] > 0.5) & (a2[:, :, 4] < a1[:, :, 4])
    merged = jnp.where(win2[:, :, None], a2m, a1)
    merged = jnp.pad(merged, ((0, 0), (0, nb1 * 8 - height), (0, 0),
                              (0, wl1 - width)))
    return merged.reshape(T, nb1, 8, 8, wl1).transpose(0, 1, 3, 2, 4)


# ---------------------------------------------------------------------------
# Hole-driven sparse patch pass (round 4): pass 2 only where pass 1 holed
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "nbands2", "nblocks2"))
def _patch_flags(z1, width, height, nbands2: int, nblocks2: int):
    """Flag the transposed-pass work units that can fill pass-1 holes.

    A hole candidate is a background pixel (pass-1 raster z at the FAR
    sentinel) strictly INSIDE its screen column's covered span OR its screen
    row's covered span — at the supported poses a heightfield's silhouette
    encloses no true background, so every such pixel is a coverage miss
    (strip-window fold / slot overflow / realign-cap classes, ROADMAP.md
    forensics). Non-interval coverage at extreme poses merely overflags (the
    patch pass finds nothing there — never wrong output, only wasted work);
    holes touching the silhouette in BOTH directions are the one missed
    class (measured small: the hole patches live inside fold bands).

    Transposed band i' covers original screen columns [8i', 8i'+8); block b'
    covers original rows [128b', 128b'+128) (transposed pixel (i', j') IS
    original pixel (j', i')).

    :return: (bflag (T, nbands2) int32, blkflag (T, nbands2, nblocks2) bool).
    """
    T = z1.shape[0]
    z = z1[:, :height, :width]
    cov = z < jnp.float32(_FAR * 0.5)
    row = jnp.arange(height, dtype=jnp.int32)[None, :, None]
    big = jnp.int32(1 << 20)
    ymin = jnp.min(jnp.where(cov, row, big), axis=1, keepdims=True)
    ymax = jnp.max(jnp.where(cov, row, -1), axis=1, keepdims=True)
    col = jnp.arange(width, dtype=jnp.int32)[None, None, :]
    xmin = jnp.min(jnp.where(cov, col, big), axis=2, keepdims=True)
    xmax = jnp.max(jnp.where(cov, col, -1), axis=2, keepdims=True)
    hole = (~cov) & (((row > ymin) & (row < ymax))
                     | ((col > xmin) & (col < xmax)))
    hp = nblocks2 * 128
    wp = nbands2 * 8
    holep = jnp.pad(hole, ((0, 0), (0, hp - height), (0, wp - width)))
    f = holep.reshape(T, nblocks2, 128, nbands2, 8)
    blkflag = jnp.any(f, axis=(2, 4)).transpose(0, 2, 1)  # (T, nb2, nblk2)
    bflag = jnp.any(blkflag, axis=2).astype(jnp.int32)
    return bflag, blkflag


@functools.partial(jax.jit, static_argnames=("cwf", "cl"))
def _apply_patch_gates(bounds, mid, canch, blkflag, cwf: int, cl: int):
    """Restrict a prepped pass to the flagged blocks.

    ``mid = -2`` (the existing no-candidate sentinel) gates unflagged blocks
    out of the march/fetch/exact/shade pipeline — they write background +
    FAR, which the depth merge ignores. Solve chunks that no flagged block's
    fetch window can read get zeroed bounds (kb = ke = 0: the empty-chunk
    fast path), killing most of the solve/capture cost in sparsely-flagged
    bands. Both gates are exact for the flagged blocks: a block's march and
    record-fetch windows live inside [canch_f*128, canch_f*128 + cwf), and
    a NARROW-march block (``mid >= 0``, round 5) reads only the chunks at
    its prep-centered 128-column window — marched columns live in two
    128-subtables starting at b0 = canch_f + (mid*8 + off_f) // 128, and
    the fetch/colfix dynamic base can slide one subtable up, so marking
    [b0, b0+3) keeps every possible read real: bit-identical output to the
    wide marking, fewer live chunks (at cw=384 the wide window marked 4+
    chunks per flagged block, re-densifying the solve at d10's 57-90%
    narrow eligibility).
    """
    T, nbands2, nblocks2 = blkflag.shape
    mid_g = mid.reshape(T, nbands2, nblocks2)
    mid2 = jnp.where(blkflag.reshape(T, -1), mid, jnp.int32(-2))
    canch_f = (canch * 8) // 128                      # (T, nblocks2)
    off_f = canch * 8 - canch_f * 128                 # march->fetch col shift
    nch = cl // 128
    ch_i = jnp.arange(nch, dtype=jnp.int32)[None, None, None, :]
    narrow = blkflag & (mid_g >= 0)
    b0 = (canch_f[:, None, :]
          + (jnp.maximum(mid_g, 0) * 8 + off_f[:, None, :]) // 128)
    lo_w = canch_f[:, None, :]                        # (T, 1, nblocks2)
    lo = jnp.where(narrow, b0, lo_w)[..., None]
    hi = jnp.where(narrow, b0 + 3,
                   lo_w + (cwf // 128 + 1))[..., None]  # +1: dyn-base slack
    act = (blkflag & (mid_g != -2))[:, :, :, None]
    needed = jnp.any((ch_i >= lo) & (ch_i < hi) & act, axis=2)
    bounds2 = jnp.where(needed.reshape(T, -1), bounds, jnp.int32(0))
    return bounds2, mid2


def _patch_cfg2(config: ScanConfig, n_r, n_c, width, height):
    """Transposed-pass config for the patch: quality-grade knobs (the pass is
    sparse, so sr=12/off=5/uncapped realign/hyps=2 cost little) with the
    rotated-footprint texture window (see render_frames_scan_quality).

    Round 5: when pass 1 carries colfix, the transposed pass takes CHEAP
    strip knobs + a colfix of its own instead — colfix recovers the strip
    misses exhaustively, so the expensive sr=12/hyps=2 capture buys nothing.
    Measured ladder at 1080p/d10 (`--patch --colfix 3`,
    experiments/mid_ladder.py, post colfix-cascade + narrow-chunk gates):
    quality knobs 25.7 fps at 40.17/40.22 dB GL masked -> sr=8/off=3/
    hyps=1/dmax=4/colfix=3 27.4 at 40.19/40.75 -> **sr=6/off=2/colfix=1
    30.7 at 40.13/40.17** (shipped; colfix=2 is 28.5 at 40.19/40.60 for
    margin over speed).

    ``DEPTHRENDERER_PATCH_CFG2`` (comma-separated ``k=v`` ScanConfig
    overrides, ints / 'none') re-knobs the pass for on-chip A/Bs — the
    round-5 mid-ladder tuning harness; the shipped defaults stay here."""
    import os

    if config.colfix is not None:
        overrides = dict(sr=6, off=2, dmax=4, hyps=1,
                         nbr=max(config.nbr, 2), colfix=1,
                         tex_rows=192, tex_cols=384)
    else:
        overrides = dict(sr=max(config.sr, 12), off=max(config.off, 5),
                         dmax=None, hyps=2, nbr=max(config.nbr, 2),
                         tex_rows=192, tex_cols=384)
    env = os.environ.get("DEPTHRENDERER_PATCH_CFG2", "")
    for kv in (env.split(",") if env else []):
        k, v = kv.split("=")
        overrides[k.strip()] = (None if v.strip().lower() == "none"
                                else int(v))
    return suggest_scan_config(
        max(n_r, n_c), height, width,
        edge_cull_threshold=config.edge_cull_threshold, **overrides)


def render_frames_scan_patched(mvps, vertex_grid, uv_grid, texture_f32,
                               width, height, config: ScanConfig,
                               interpret: bool = False,
                               frame_batch: int = _FRAME_GROUP,
                               raw_u32: bool = False):
    """Hole-patched scan render (``ScanConfig.patch``) -> (T, H, W, 4) u8.

    Pass 1 is the UNCHANGED standard pass at ``config``'s knobs; its raster-z
    output flags the coverage holes (background strictly inside a column's
    covered span), and the transposed row-edge pass then runs ONLY on the
    flagged work (sparse bands in-kernel, ``mid = -2`` block gates, zeroed
    solve bounds) before the same u32 depth-merge the quality mode uses.
    Closes the strip-window/slot-overflow hole classes at a small fraction
    of the full quality mode's ~2.2x cost (holes cover ~1% of pixels).

    Replaces: the reference GL rasteriser's exact per-triangle coverage
    (``render.py:448``) — the patch makes the inverse-mapping scan's
    coverage match it where the column pass structurally misses.
    """
    _check_uv_grid(uv_grid)
    del uv_grid
    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    cfg1 = dataclasses.replace(config, patch=False)
    cfg2 = _patch_cfg2(config, n_r, n_c, width, height)
    import numpy as _np

    mvps = jnp.asarray(mvps, jnp.float32)
    S = _np.asarray(_ROW_EDGE_SWAP, _np.float64)
    mvps2 = _np.einsum("ij,tjk->tik", S,
                       _np.asarray(mvps, _np.float64)).astype(_np.float32)
    vgrid_t = jnp.transpose(vertex_grid, (1, 0, 2))
    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    tex_t = jnp.transpose(texture_f32, (1, 0, 2))
    T = int(mvps.shape[0])
    nbands2 = -(-width // 8)
    nblocks2 = _ceil_to(height, 128) // 128
    fb = max(1, min(frame_batch, _FRAME_GROUP))
    frames = []
    ovf1 = ovf2 = 0
    for s in range(0, T, fb):
        r1, z1, o1 = _scan_rgba_z_grouped(
            mvps[s:s + fb], vertex_grid, texture_f32, width, height,
            cfg1, interpret, fb)
        gates = _patch_flags(z1, width, height, nbands2, nblocks2)
        r2, z2, o2 = _scan_rgba_z_grouped(
            mvps2[s:s + fb], vgrid_t, tex_t, height, width, cfg2,
            interpret, fb, gates=gates)
        ovf1, ovf2 = max(ovf1, o1), max(ovf2, o2)
        frames.append(_merge_row_edge_raw(r1, z1, r2, z2, width, height))
    if ovf1 or ovf2:
        from ..utils import log

        log(f"WARNING: scan depth-hull window clipped up to "
            f"{max(ovf1, ovf2)} candidate row(s) in the patched passes "
            f"(rmax={config.rmax}/{cfg2.rmax}); raise ScanConfig.rmax or "
            f"expect misses at extreme depth relief.")
    out = jnp.concatenate(frames, axis=0) if len(frames) > 1 else frames[0]
    if raw_u32:
        return out
    return _assemble_rgba_batched(out, width, height)


def render_frames_scan_quality(mvps, vertex_grid, uv_grid, texture_f32,
                               width, height, config: ScanConfig,
                               mode: str = "texture",
                               interpret: bool = False,
                               frame_batch: int = _FRAME_GROUP,
                               raw_u32: bool = False):
    """Two-pass quality render (``ScanConfig.row_edge``) -> (T, H, W, 4) u8.

    Pass 1 is the standard column-crossing scan; pass 2 re-runs the SAME
    kernel on the transposed problem (transposed grid, ``_ROW_EDGE_SWAP`` @
    mvp, width/height swapped), so its records anchor on crossings of grid
    ROWS with vertical scanlines — exactly the cells the column pass misses
    when a pixel enters through a horizontal edge (the strip-window hole
    class, 55% of the residual holes; ROADMAP.md forensics). The passes are
    depth-merged in attribute space and shaded once with the ORIGINAL
    texture (the transposed pass's analytic UVs are remapped in the merge,
    so no texture transpose is needed). ~2.2x the single-pass cost.

    Replaces: the reference's GL rasteriser needs no such union — hardware
    coverage is exact per triangle (``render.py:448``); this closes the
    inverse-mapping scan's remaining structural hole classes instead."""
    _check_uv_grid(uv_grid)
    del uv_grid
    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    # Quality passes take the PRE-shrink texture windows (128x384; the fast
    # path's 64x256 saves 0.8 ms/frame at the price of rare fold-outlier
    # clamp mis-samples — a price the quality mode should not pay).
    cfg1 = dataclasses.replace(config, row_edge=False,
                               tex_rows=max(config.tex_rows, 128),
                               tex_cols=max(config.tex_cols, 384))
    # Transposed-pass config, suggested for the (height x width) output.
    # Single-column records suffice here: a cell this pass contributes was
    # missed by pass 1, and the sheared/realign-capped classes overlap the
    # long-row-edge cells this pass anchors exactly.
    # The transposed pass's per-block texture footprint rotates with it: a
    # pass-2 block spans ~8 px of original x by 128 px of original y, so in
    # the TRANSPOSED texture its window needs ~(8 + fold slack) ROWS by
    # ~(128 + slack) cols — the measured ~110-px slack that was horizontal
    # is now vertical, and the 1080p-class 64-row window clamps badly
    # (measured on chip: 1.19% merged flips vs 0.19% for the unwindowed
    # attrs pipeline). 128 rows cover it; the scratch stays at 2*128*256*4
    # = 256 KB.
    # Window sizing for the transposed orientation: a pass-2 block spans
    # ~8 px of original x by 128 px of original y, so its footprint in the
    # TRANSPOSED texture is ~(8 + fold slack ~110) rows by ~(128 + slack)
    # cols — plus up to 127 cols of 128-aligned origin misalignment.
    cfg2 = suggest_scan_config(
        max(n_r, n_c), height, width, sr=config.sr, off=config.off,
        dmax=config.dmax, hyps=config.hyps,
        edge_cull_threshold=config.edge_cull_threshold,
        tex_rows=192, tex_cols=384)
    import numpy as _np

    # Host-side in f64: the swap only permutes/negates rows, so it is exact —
    # but a DEVICE matmul would run at the TPU's default bf16 precision and
    # collapse the near-identical perspective rows 2/3 (measured: the f64
    # host inverse of the bf16-rounded product raises LinAlgError).
    mvps = jnp.asarray(mvps, jnp.float32)
    S = _np.asarray(_ROW_EDGE_SWAP, _np.float64)
    mvps2 = _np.einsum("ij,tjk->tik", S,
                       _np.asarray(mvps, _np.float64)).astype(_np.float32)
    vgrid_t = jnp.transpose(vertex_grid, (1, 0, 2))
    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    T = int(mvps.shape[0])
    frames = []
    ovf1 = ovf2 = 0
    in_kernel = mode == "texture" \
        and texture_f32.ndim == 3 and texture_f32.shape[-1] == 4
    if in_kernel:
        # Fast form: both passes shade IN-KERNEL (texture_z mode — pass 2
        # samples the transposed texture, bilinear-equivalent under the
        # parameter swap) and merge as u32 by the raster-depth key; no
        # attrs round-trip, no XLA shade.
        tex_t = jnp.transpose(texture_f32, (1, 0, 2))
        fb = max(1, min(frame_batch, _FRAME_GROUP))
        for s in range(0, T, fb):
            r1, z1, o1 = _scan_rgba_z_grouped(
                mvps[s:s + fb], vertex_grid, texture_f32, width, height,
                cfg1, interpret, fb)
            r2, z2, o2 = _scan_rgba_z_grouped(
                mvps2[s:s + fb], vgrid_t, tex_t, height, width, cfg2,
                interpret, fb)
            ovf1, ovf2 = max(ovf1, o1), max(ovf2, o2)
            frames.append(_merge_row_edge_raw(r1, z1, r2, z2, width, height))
    else:
        # Attrs form (debug_z / wireframe / non-RGBA textures): merge in
        # attribute space and shade once with the original texture. Chunk
        # the WHOLE pipeline per frame group: the two attrs tensors cost
        # ~166 MB/frame at 1080p/d10, so a whole-clip merge would exhaust
        # HBM at bench-sized clips (measured: 64 frames -> ~11 GB).
        assert not raw_u32, "raw output exists only for texture mode"
        fb = max(1, min(frame_batch, 8))
        for s in range(0, T, fb):
            b1, o1 = _scan_attrs_grouped(mvps[s:s + fb], vertex_grid, width,
                                         height, cfg1, interpret, fb)
            b2, o2 = _scan_attrs_grouped(mvps2[s:s + fb], vgrid_t, height,
                                         width, cfg2, interpret, fb)
            ovf1, ovf2 = max(ovf1, o1), max(ovf2, o2)
            merged = _merge_row_edge(b1, b2, width, height)
            frames.append(_shade_scan_batched(merged, texture_f32, width,
                                              height, mode))
    if ovf1 or ovf2:
        from ..utils import log

        log(f"WARNING: scan depth-hull window clipped up to "
            f"{max(ovf1, ovf2)} candidate row(s) in the quality passes "
            f"(rmax={config.rmax}/{cfg2.rmax}); raise ScanConfig.rmax or "
            f"expect misses at extreme depth relief.")
    out = jnp.concatenate(frames, axis=0) if len(frames) > 1 else frames[0]
    if in_kernel and raw_u32:
        return out
    if in_kernel:
        return _assemble_rgba_batched(out, width, height)
    return out


def render_frames_scan_traceable(mvps, vertex_grid, uv_grid, texture_f32,
                                 width, height,
                                 config: ScanConfig | None = None,
                                 mode: str = "texture", frame_batch: int = 0,
                                 interpret: bool = False):
    """Fully-traceable scan path for jit/shard_map contexts -> (T, H, W, 4) u8.

    Same signature shape as ``raster_grid.render_frames_grid`` so the sharded
    farm (``parallel/sharding.py``) can use the scan kernel per shard. All
    frames render as ONE group (the sharded callers already chunk views).
    Deviation from :func:`render_frames_scan`: the inverse MVP rows are
    computed in-trace in float32 (f64 is unavailable under TPU jit); the
    relative error of a well-conditioned 4x4 inverse at f32 is ~1e-6 —
    far below the 8-bit output quantisation.
    """
    del frame_batch  # one group; sharded callers chunk the view axis
    assert mode in ("texture", "debug_z", "wireframe"), mode
    if uv_grid is not None and not isinstance(uv_grid, jax.core.Tracer):
        _check_uv_grid(uv_grid)
    vertex_grid = jnp.asarray(vertex_grid, jnp.float32)
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    if config is None or not isinstance(config, ScanConfig):
        config = suggest_scan_config(n_r, width, height)
    if config.row_edge:
        # In-trace quality pipeline (round 4): the sharded farm's --quality
        # path. Both passes and the u32 depth-merge are traceable; only the
        # f64 host inverse of render_frames_scan_quality is unavailable under
        # jit, so (like this function's fast path) the inverse runs in-trace
        # f32 — ~1e-6 relative error, far below 8-bit output quantisation.
        assert mode == "texture", \
            "sharded row_edge supports texture mode only"
        return _scan_quality_traceable(mvps, vertex_grid, texture_f32,
                                       width, height, config, interpret)
    if config.patch:
        assert mode == "texture", \
            "sharded patch supports texture mode only"
        return _scan_patched_traceable(mvps, vertex_grid, texture_f32,
                                       width, height, config, interpret)
    mvps = jnp.asarray(mvps, jnp.float32)
    minv = jnp.linalg.inv(mvps)
    minv_rows = jnp.concatenate([minv[:, 2], minv[:, 3]], axis=1)  # (T, 8)

    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    ht, wt = int(texture_f32.shape[0]), int(texture_f32.shape[1])
    rpad_t = max(_ceil_to(ht, 8), config.tex_rows)
    cpad_t = max(_ceil_to(wt, 128), config.tex_cols)
    texq = _pack_texture(texture_f32, rpad_t, cpad_t)

    win, w0, bounds, canch, mid, _ = jax.vmap(
        lambda m: _prep_scan_impl(m, vertex_grid, width, height, config)
    )(mvps)
    bands = _raster_scan_pallas(
        win, texq, (ht, wt), minv_rows, w0, bounds, canch, mid,
        width, height, n_r, n_c, config, mode, interpret,
    )
    u8 = jax.lax.bitcast_convert_type(bands, jnp.uint8)
    return u8[:, :height, :width]


def _scan_quality_traceable(mvps, vertex_grid, texture_f32, width, height,
                            config: ScanConfig, interpret: bool):
    """Traceable (jit/shard_map-safe) row-edge quality render -> (T,H,W,4) u8.

    The in-trace form of :func:`render_frames_scan_quality`'s texture_z fast
    path: pass 1 (column records) + pass 2 (the transposed row-edge pass) are
    in-kernel shaded and u32 depth-merged. The clip-space swap
    ``_ROW_EDGE_SWAP @ mvp`` only permutes/negates rows, so it is applied by
    indexing (EXACT — a device matmul would round through bf16 and collapse
    the near-identical perspective rows 2/3; see CLAUDE.md precision rule).
    """
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    mvps = jnp.asarray(mvps, jnp.float32)
    # Row swap/negate (ndcx' = -ndcy, ndcy' = -ndcx) without a matmul.
    mvps2 = jnp.stack([-mvps[:, 1], -mvps[:, 0], mvps[:, 2], mvps[:, 3]],
                      axis=1)
    cfg1 = dataclasses.replace(config, row_edge=False,
                               tex_rows=max(config.tex_rows, 128),
                               tex_cols=max(config.tex_cols, 384))
    cfg2 = suggest_scan_config(
        max(n_r, n_c), height, width, sr=config.sr, off=config.off,
        dmax=config.dmax, hyps=config.hyps,
        edge_cull_threshold=config.edge_cull_threshold,
        tex_rows=192, tex_cols=384)
    vgrid_t = jnp.transpose(vertex_grid, (1, 0, 2))
    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    tex_t = jnp.transpose(texture_f32, (1, 0, 2))

    def one_pass(m, vg, tex, w, h, cfg):
        ht, wt = int(tex.shape[0]), int(tex.shape[1])
        rpad_t = max(_ceil_to(ht, 8), cfg.tex_rows)
        cpad_t = max(_ceil_to(wt, 128), cfg.tex_cols)
        texq = _pack_texture(tex, rpad_t, cpad_t)
        minv = jnp.linalg.inv(m)
        minv_rows = jnp.concatenate([minv[:, 2], minv[:, 3]], axis=1)
        win, w0, bounds, canch, mid, _ = jax.vmap(
            lambda mm: _prep_scan_impl(mm, vg, w, h, cfg))(m)
        return _raster_scan_pallas(
            win, texq, (ht, wt), minv_rows, w0, bounds, canch, mid,
            w, h, vg.shape[0], vg.shape[1], cfg, "texture_z", interpret)

    r1, z1 = one_pass(mvps, vertex_grid, texture_f32, width, height, cfg1)
    r2, z2 = one_pass(mvps2, vgrid_t, tex_t, height, width, cfg2)
    merged = _merge_row_edge_raw(r1, z1, r2, z2, width, height)
    u8 = jax.lax.bitcast_convert_type(merged, jnp.uint8)
    return u8[:, :height, :width]


def _scan_patched_traceable(mvps, vertex_grid, texture_f32, width, height,
                            config: ScanConfig, interpret: bool):
    """Traceable (jit/shard_map-safe) hole-patched render -> (T, H, W, 4) u8.

    The in-trace form of :func:`render_frames_scan_patched`: pass 1 at the
    caller's knobs, XLA hole flags from its raster z, then the SPARSE
    transposed pass (band flags + mid/bounds gates) and the u32 depth-merge.
    Like the other traceable paths the clip-space swap is applied by row
    indexing (exact) and the inverse MVP runs in-trace f32.
    """
    n_r, n_c = vertex_grid.shape[0], vertex_grid.shape[1]
    mvps = jnp.asarray(mvps, jnp.float32)
    mvps2 = jnp.stack([-mvps[:, 1], -mvps[:, 0], mvps[:, 2], mvps[:, 3]],
                      axis=1)
    cfg1 = dataclasses.replace(config, patch=False)
    cfg2 = _patch_cfg2(config, n_r, n_c, width, height)
    vgrid_t = jnp.transpose(vertex_grid, (1, 0, 2))
    texture_f32 = jnp.asarray(texture_f32, jnp.float32)
    tex_t = jnp.transpose(texture_f32, (1, 0, 2))

    def one_pass(m, vg, tex, w, h, cfg, gates=None):
        ht, wt = int(tex.shape[0]), int(tex.shape[1])
        rpad_t = max(_ceil_to(ht, 8), cfg.tex_rows)
        cpad_t = max(_ceil_to(wt, 128), cfg.tex_cols)
        texq = _pack_texture(tex, rpad_t, cpad_t)
        minv = jnp.linalg.inv(m)
        minv_rows = jnp.concatenate([minv[:, 2], minv[:, 3]], axis=1)
        win, w0, bounds, canch, mid, _ = jax.vmap(
            lambda mm: _prep_scan_impl(mm, vg, w, h, cfg))(m)
        bflag = None
        if gates is not None:
            cwf = min(cfg.cw + 128, win.shape[3])
            bounds, mid = _apply_patch_gates(bounds, mid, canch, gates[1],
                                             cwf, win.shape[3])
            bflag = gates[0]
        return _raster_scan_pallas(
            win, texq, (ht, wt), minv_rows, w0, bounds, canch, mid,
            w, h, vg.shape[0], vg.shape[1], cfg, "texture_z", interpret,
            bflag=bflag)

    r1, z1 = one_pass(mvps, vertex_grid, texture_f32, width, height, cfg1)
    nbands2 = -(-width // 8)
    nblocks2 = _ceil_to(height, 128) // 128
    gates = _patch_flags(z1, width, height, nbands2, nblocks2)
    r2, z2 = one_pass(mvps2, vgrid_t, tex_t, height, width, cfg2,
                      gates=gates)
    merged = _merge_row_edge_raw(r1, z1, r2, z2, width, height)
    u8 = jax.lax.bitcast_convert_type(merged, jnp.uint8)
    return u8[:, :height, :width]
