"""Small host-side utilities: logging, frame timing, array packing and Perlin noise.

Capability parity with the reference's ``DepthRenderer/utils.py`` helpers:
``log`` (``utils.py:12-17``), ``FrameTimer`` (``utils.py:523-538``),
``flatten_arrays``/``interweave_arrays`` (``utils.py:189-214``) and ``perlin``
(``utils.py:541-591``). The packing helpers and noise are re-implemented with
vectorised numpy/JAX-compatible semantics.
"""

from __future__ import annotations

import datetime
import time

import numpy as np


def log(message):
    """Print a message to stdout with a timestamp (reference: ``utils.py:12-17``)."""
    print(f"[{datetime.datetime.now()}] {message}", flush=True)


class FrameTimer:
    """Wall-clock frame timer (reference: ``utils.py:523-538``).

    Tracks the delta since the previous ``update()`` and the accumulated elapsed
    time, which the render loop uses to gate the target FPS.
    """

    def __init__(self):
        self.last_frame_time = time.time()
        self.delta = 0.0
        self.elapsed = 0.0

    def reset(self):
        self.last_frame_time = time.time()
        self.delta = 0.0
        self.elapsed = 0.0

    def update(self):
        now = time.time()
        self.delta = now - self.last_frame_time
        self.elapsed += self.delta
        self.last_frame_time = now


def flatten_arrays(arrays):
    """Flatten each array in ``arrays`` (reference: ``utils.py:189-196``)."""
    return tuple(np.ravel(a) for a in arrays)


def interweave_arrays(arrays):
    """Interleave N same-length flat arrays element-wise.

    ``interweave_arrays([[1, 3, 5], [2, 4, 6]]) -> [1, 2, 3, 4, 5, 6]``
    (reference: ``utils.py:199-214``). Implemented as a single stack+reshape
    instead of strided assignment.
    """
    arrays = [np.asarray(a) for a in arrays]
    return np.stack(arrays, axis=-1).reshape(-1)


def perlin(width, height, scale=5, seed=None):
    """2-D gradient (Perlin) noise with the classic fade ``6t^5 - 15t^4 + 10t^3``.

    Capability parity with the reference's ``perlin`` (``utils.py:541-591``), used by
    the optional depth-augmentation path (``__main__.py:23-35``). Deterministic for a
    given ``seed``. Returns a ``(height, width)`` float array.
    """
    xs = np.linspace(0, scale, width, endpoint=False)
    ys = np.linspace(0, scale, height, endpoint=False)
    x, y = np.meshgrid(xs, ys)

    rng = np.random.default_rng(seed)
    p = rng.permutation(256)
    p = np.concatenate([p, p])

    xi = x.astype(int)
    yi = y.astype(int)
    xf = x - xi
    yf = y - yi

    def fade(t):
        return 6 * t**5 - 15 * t**4 + 10 * t**3

    u = fade(xf)
    v = fade(yf)

    def gradient(h, gx, gy):
        vectors = np.array([[0, 1], [0, -1], [1, 0], [-1, 0]])
        g = vectors[h % 4]
        return g[..., 0] * gx + g[..., 1] * gy

    n00 = gradient(p[p[xi] + yi], xf, yf)
    n01 = gradient(p[p[xi] + yi + 1], xf, yf - 1)
    n11 = gradient(p[p[xi + 1] + yi + 1], xf - 1, yf - 1)
    n10 = gradient(p[p[xi + 1] + yi], xf - 1, yf)

    def lerp(a, b, t):
        return a + t * (b - a)

    x1 = lerp(n00, n10, u)
    x2 = lerp(n01, n11, u)
    return lerp(x1, x2, v)


def overlay_noise(image, **perlin_kwargs):
    """Overlay normalised Perlin noise on an image (reference: ``__main__.py:23-35``)."""
    height, width = image.shape[:2]

    noise = perlin(width, height, **perlin_kwargs)
    noise = (noise - noise.min()) / (noise.max() - noise.min())
    noise = 255 * noise
    noise = np.expand_dims(noise, -1)

    new_image = image.astype(np.float64) + noise
    new_image = new_image / new_image.max()
    return (255 * new_image).astype(np.uint8)


def psnr(a, b, max_value=255.0):
    """Peak signal-to-noise ratio in dB between two images (uint8 or float)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_value**2 / mse))
