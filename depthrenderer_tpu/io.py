"""Host-side asset I/O: colour images, depth maps, resizing and PNG output.

Capability parity with the reference's asset loaders (``DepthRenderer/utils.py:126-186``)
and frame conversion helpers (``utils.py:345-377``), with one deliberate deviation:

* The reference flips images vertically at load time to match OpenGL's bottom-up
  texture convention (``utils.py:139``) and un-flips at write time
  (``utils.py:366,377``). This framework is headless and keeps images **top-down
  (display-oriented) end to end**; the rasteriser handles the y-axis convention
  internally, so no flips are needed. The mathematical content (which texel maps to
  which mesh vertex) is identical.

PNG writing has no external dependencies beyond Pillow; see ``writers.py`` for the
async writer farm and ``_native`` for the optional C fast path.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(fp):
    """Load an image from disk as a numpy array (display-oriented, top row first).

    Reference: ``utils.py:126-141`` (which additionally flips for OpenGL; see module
    docstring for why this implementation does not).
    """
    img = Image.open(fp)
    return np.asarray(img)


def load_colour(fp, should_mask=False, mask_white=True):
    """Load a colour image as RGBA uint8.

    Greyscale inputs are broadcast to RGB; RGB inputs gain an opaque alpha channel
    equal to the image maximum; optional colour-key masking zeroes the alpha of
    pure-white or pure-black pixels. Reference: ``utils.py:144-166``.
    """
    colour_image = load_image(fp)

    if colour_image.ndim == 2:
        colour_image = np.stack([colour_image] * 3, axis=2)

    H, W, C = colour_image.shape

    if C == 3:
        alpha = colour_image.max() * np.ones((H, W, 1), dtype=colour_image.dtype)
        colour_image = np.concatenate((colour_image, alpha), axis=2)
    else:
        colour_image = colour_image.copy()

    if should_mask:
        mask_colour = [255, 255, 255] if mask_white else [0, 0, 0]
        mask = np.all(colour_image[:, :, :3] == mask_colour, axis=2)
        colour_image[mask, 3] = 0

    return colour_image


def load_depth(fp):
    """Load a depth map, min-max normalise it and quantise to uint8.

    The reference accepts 8- or 16-bit depth maps and always normalises to the
    [0, 255] uint8 range before meshing (``utils.py:169-186``); mesh generation then
    maps ``z = 1 - d/255`` so white (255) is nearest. The same quantisation is
    replicated here. Returns an ``(H, W)`` uint8 array (the reference tiles it to 3
    channels purely for its GL texture plumbing; channel 0 is what mesh generation
    reads, ``render.py:510``).
    """
    depth_map = load_image(fp)

    if depth_map.ndim == 3:
        depth_map = depth_map[..., 0]

    depth_map = depth_map.astype(np.float64)
    lo, hi = depth_map.min(), depth_map.max()
    if hi > lo:
        depth_map = (depth_map - lo) / (hi - lo)
    else:
        depth_map = np.zeros_like(depth_map)

    return (255 * depth_map).astype(np.uint8)


def resize(image, size, resample=Image.LANCZOS):
    """Resize an image to ``size`` (height, width, ...) using Lanczos resampling.

    Reference: ``__main__.py:15-20`` (which used the removed ``Image.ANTIALIAS``
    alias; ``LANCZOS`` is the exact modern equivalent).
    """
    height, width = size[:2]
    resized = Image.fromarray(image).resize((width, height), resample)
    return np.asarray(resized)


def save_image(frame, path, file_format="PNG"):
    """Write an (H, W, C) uint8 frame to disk.

    PNG output uses the native C encoder (``depthrenderer_tpu.native``) when the
    shared library is available — ~2x Pillow and GIL-free for the writer threads —
    falling back to Pillow otherwise.
    """
    frame = np.asarray(frame)
    if file_format.upper() == "PNG" and frame.ndim == 3 and frame.dtype == np.uint8 \
            and frame.shape[2] in (3, 4):
        try:
            from . import native

            if native.available():
                with open(path, "wb") as f:
                    f.write(native.png_encode(frame))
                return
        except Exception:
            pass  # fall through to Pillow
    Image.fromarray(frame).save(path, file_format)


def to_uint8(frame):
    """Convert a float frame in [0, 1] (or uint8 passthrough) to uint8."""
    frame = np.asarray(frame)
    if frame.dtype == np.uint8:
        return frame
    return np.clip(np.round(frame * 255.0), 0, 255).astype(np.uint8)


# -- frame-buffer conversion parity helpers (reference: utils.py:345-377) ----------


def read_frame_buffer(frame_buffer, size, mode="RGBA"):
    """Wrap raw frame-buffer bytes as a PIL image (reference: ``utils.py:345-355``)."""
    return Image.frombytes(mode, size, data=frame_buffer)


def process_frame_numpy(frame):
    """Frame -> numpy array. The reference additionally un-flips GL's bottom-up
    rows (``utils.py:358-366``); this framework's frames are already top-down, so
    this is a plain conversion kept for API parity."""
    return np.asarray(frame)


def process_frame_pillow(frame):
    """Frame -> PIL image (reference: ``utils.py:369-377``; same note as above)."""
    if isinstance(frame, Image.Image):
        return frame
    return Image.fromarray(np.asarray(frame))
