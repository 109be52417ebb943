"""Flag rate for the colfix pass: how many pixels/blocks would run it?

The in-kernel colfix gate is "pixel uncovered by the exact pass AND the march
found at least one hit". Pixel rate sets nothing (VREG ops are block-dense);
the BLOCK rate sets the cost: a block runs the fixup row sweep iff any of its
8x128 pixels is flagged. Estimated here host-side from the rendered default
frame's background mask + the marched-hit test on a random block sample.

Reads /tmp/frontal_forensic.npz (scan_default = the rendered frame).
"""

import os
import sys

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan
from experiments.colfix_replay import (cfg, slot_curves, march_hits, canch,
                                       mid, W, H)

d = np.load("/tmp/frontal_forensic.npz")
st = d["scan_default"]
# The shade pass writes opaque alpha everywhere; background pixels render
# BLACK (upper bound: genuinely-black texels also match — the in-kernel flag
# will use the true coverage sentinel instead).
uncov = (st[..., :3] == 0).all(-1)
print(f"scan-black (~uncovered) pixels: {uncov.mean()*100:.2f}%")

rng = np.random.default_rng(3)
nbands = H // 8
nblocks = W // 128
blocks = [(b, k) for b in range(nbands) for k in range(nblocks)]
sel = rng.choice(len(blocks), 120, replace=False)

fired = 0
flag_px = 0
tot_px = 0
for bi in sel:
    band, blk = blocks[bi]
    canch_m = int(canch[blk]) * 8
    mb = int(mid[band, blk])
    if mb >= 0:
        lo, hi = canch_m + mb * 8, canch_m + mb * 8 + 128
    else:
        lo, hi = canch_m, canch_m + cfg.cw
    block_fired = False
    for yy in range(8):
        py = band * 8 + yy
        if py >= H:
            continue
        qy = H - (py + 0.5)
        row_uncov = uncov[py, blk * 128 : blk * 128 + 128]
        if not row_uncov.any():
            continue
        sxc, zc = slot_curves(band, qy)
        jj = np.arange(lo, hi - 1)
        for px_l in np.nonzero(row_uncov)[0]:
            qx = blk * 128 + px_l + 0.5
            tot_px += 1
            hit = False
            for s in range(cfg.nbr):
                a, b_ = sxc[s][jj], sxc[s][jj + 1]
                if ((qx >= np.minimum(a, b_)) & (qx <= np.maximum(a, b_))).any():
                    hit = True
                    break
            if hit:
                flag_px += 1
                block_fired = True
                break  # block fires; no need to scan further pixels
        if block_fired:
            break
    fired += block_fired

print(f"sampled {len(sel)} blocks: {fired} fire the colfix gate "
      f"({fired/len(sel)*100:.0f}%)")
print(f"(uncovered pixels with a marched hit, until first per block: "
      f"{flag_px}/{tot_px})")
