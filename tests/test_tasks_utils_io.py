"""Tests for the task scheduler, packing/noise utilities and asset I/O."""

import numpy as np
import pytest

from depthrenderer_tpu import io as dio
from depthrenderer_tpu import tasks, utils


# -- tasks (reference: utils.py:217-342) ------------------------------------------


def test_task_plain():
    calls = []
    t = tasks.Task(lambda: calls.append(1))
    t()
    t()
    assert len(calls) == 2


def test_delayed_task():
    calls = []
    t = tasks.DelayedTask(lambda: calls.append(1), delay=2)
    t(), t()
    assert calls == []
    t()
    assert calls == [1]


def test_one_time_task():
    calls = []
    t = tasks.OneTimeTask(lambda: calls.append(1))
    t(), t(), t()
    assert calls == [1]
    t.reset()
    t()
    assert calls == [1, 1]


def test_recurring_task():
    calls = []
    t = tasks.RecurringTask(lambda: calls.append(t.call_count), frequency=2)
    for _ in range(5):
        t()
    assert calls == [0, 2, 4]


def test_recurring_task_frequency_validation():
    with pytest.raises(AssertionError):
        tasks.RecurringTask(lambda: None, frequency=0)


# -- utils ---------------------------------------------------------------------------


def test_interweave_arrays():
    out = utils.interweave_arrays([np.array([1, 3, 5]), np.array([2, 4, 6])])
    np.testing.assert_array_equal(out, [1, 2, 3, 4, 5, 6])


def test_flatten_arrays():
    a = np.arange(6).reshape(2, 3)
    b = np.arange(4).reshape(2, 2)
    fa, fb = utils.flatten_arrays([a, b])
    assert fa.shape == (6,) and fb.shape == (4,)


def test_perlin_deterministic_and_shaped():
    n1 = utils.perlin(32, 16, scale=4, seed=7)
    n2 = utils.perlin(32, 16, scale=4, seed=7)
    n3 = utils.perlin(32, 16, scale=4, seed=8)
    assert n1.shape == (16, 32)
    np.testing.assert_allclose(n1, n2)
    assert not np.allclose(n1, n3)
    assert np.abs(n1).max() <= np.sqrt(2) + 1e-6


def test_overlay_noise_dtype_and_range():
    img = np.full((16, 16, 1), 100, np.uint8)
    out = utils.overlay_noise(img, scale=4, seed=0)
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_psnr():
    a = np.zeros((8, 8), np.uint8)
    assert utils.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0] = 255
    assert 0 < utils.psnr(a, b) < 40


# -- io -------------------------------------------------------------------------------


def test_load_colour_rgb_to_rgba(tmp_path):
    img = np.zeros((8, 10, 3), np.uint8)
    img[:, :, 0] = 200
    p = tmp_path / "c.png"
    dio.save_image(img, p)
    out = dio.load_colour(p)
    assert out.shape == (8, 10, 4)
    assert (out[..., 3] == 200).all()  # alpha = image max (utils.py:158-159)


def test_load_colour_masking(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = [255, 255, 255]
    p = tmp_path / "c.png"
    dio.save_image(img, p)
    out = dio.load_colour(p, should_mask=True, mask_white=True)
    assert out[0, 0, 3] == 0
    assert out[1, 1, 3] == 255
    out_b = dio.load_colour(p, should_mask=True, mask_white=False)
    assert out_b[1, 1, 3] == 0 and out_b[0, 0, 3] == 255


def test_load_depth_normalisation(tmp_path):
    depth = np.array([[10, 20], [30, 40]], np.uint8)
    p = tmp_path / "d.png"
    dio.save_image(depth, p)
    out = dio.load_depth(p)
    assert out.dtype == np.uint8 and out.shape == (2, 2)
    assert out.min() == 0 and out.max() == 255


def test_load_depth_16bit(tmp_path):
    from PIL import Image

    depth16 = (np.arange(16, dtype=np.uint16).reshape(4, 4) * 4000)
    p = tmp_path / "d16.png"
    Image.fromarray(depth16, mode="I;16").save(p)
    out = dio.load_depth(p)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_resize():
    img = np.zeros((8, 8, 3), np.uint8)
    out = dio.resize(img, (16, 12))
    assert out.shape == (16, 12, 3)


def test_sample_assets_load():
    # The reference's sample pair must load through our pipeline.
    colour = dio.load_colour("/root/reference/samples/00000_colors.png")
    depth = dio.load_depth("/root/reference/samples/00000_depth.png")
    assert colour.shape == (480, 640, 4)
    assert depth.shape == (480, 640)
    assert depth.max() == 255
