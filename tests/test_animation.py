"""Animation transforms at known phases + stateful/batched equivalence."""

import numpy as np
import pytest

from depthrenderer_tpu import animation as anim
from depthrenderer_tpu.transforms import Axis


def test_rotate_axis_bounce_known_phase():
    a = anim.RotateAxisBounce(angle=np.pi / 4, axis=Axis.Y, speed=1.0, offset=0.0)
    # At t = 0.25: sin(2π·0.25) = 1 -> rotation by π/4 about Y.
    R = np.asarray(a.transform_at(0.25))
    assert R[0, 0] == pytest.approx(np.cos(np.pi / 4), abs=1e-5)
    assert R[0, 2] == pytest.approx(np.sin(np.pi / 4), abs=1e-5)
    # At t = 0.5: sin(π) = 0 -> identity.
    np.testing.assert_allclose(np.asarray(a.transform_at(0.5)), np.eye(4), atol=1e-5)


def test_translate_known_phase():
    a = anim.Translate(distance=2.0, axis=Axis.X, speed=1.0, offset=0.25)
    # t=0: sin(2π·0.25) = 1 -> dx = 2.
    T = np.asarray(a.transform_at(0.0))
    assert T[0, 3] == pytest.approx(2.0, abs=1e-5)
    a_y = anim.Translate(distance=1.5, axis=Axis.Y, speed=1.0, offset=0.0)
    T = np.asarray(a_y.transform_at(0.25))
    assert T[1, 3] == pytest.approx(1.5, abs=1e-5)
    assert T[0, 3] == 0.0 and T[2, 3] == 0.0


def test_rotate_xy_bounce_composition():
    a = anim.RotateXYBounce(angle=0.3, speed=1.0, offset=0.0)
    from depthrenderer_tpu import transforms

    t = 0.1
    phase = 2 * np.pi * t
    want = np.asarray(transforms.rotation(np.sin(phase) * 0.3, axis=Axis.Y)) @ np.asarray(
        transforms.rotation(np.cos(phase) * 0.3, axis=Axis.X)
    )
    np.testing.assert_allclose(np.asarray(a.transform_at(t)), want, atol=1e-5)


def test_compose_order_and_reset():
    r = anim.RotateAxisBounce(angle=0.2, axis=Axis.Z, speed=1.0)
    t = anim.Translate(distance=1.0, axis=Axis.X, speed=1.0, offset=0.25)
    c = anim.Compose([r, t])
    tt = 0.1
    want = np.asarray(r.transform_at(tt)) @ np.asarray(t.transform_at(tt))
    np.testing.assert_allclose(np.asarray(c.transform_at(tt)), want, atol=1e-5)

    # Stateful parity: update before read (reference __main__.py:143-148).
    c.update(0.1)
    np.testing.assert_allclose(c.transform, want, atol=1e-5)
    c.reset()
    assert c.elapsed == 0.0 and r.elapsed == 0.0


def test_batch_matches_stateful_loop():
    a = anim.default_sway(5.0)
    fps = 30.0
    num = 7
    times = np.asarray(anim.frame_times(num, fps))
    batched = np.asarray(a.batch(times))
    assert batched.shape == (num, 4, 4)

    stateful = anim.default_sway(5.0)
    for k in range(num):
        stateful.update(1.0 / fps)
        np.testing.assert_allclose(stateful.transform, batched[k], atol=1e-5)


def test_frame_times():
    times = np.asarray(anim.frame_times(3, 10.0))
    np.testing.assert_allclose(times, [0.1, 0.2, 0.3], atol=1e-6)
