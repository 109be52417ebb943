"""Unit tests for transform builders vs hand-computed values and reference semantics."""

import numpy as np
import pytest

from depthrenderer_tpu import transforms
from depthrenderer_tpu.transforms import Axis


def _np_perspective(fov_y, aspect, near=0.01, far=1000.0):
    # Independent re-statement of the reference's nonstandard projection
    # (utils.py:30-36): fov_y in degrees used directly as the focal scale.
    return np.array(
        [
            [fov_y / aspect, 0, 0, 0],
            [0, fov_y, 0, 0],
            [0, 0, (far + near) / (near - far), (2 * near * far) / (near - far)],
            [0, 0, -1, 0],
        ],
        dtype=np.float32,
    )


def test_perspective_matches_reference_form():
    got = np.asarray(transforms.perspective(18.0, 4.0 / 3.0))
    want = _np_perspective(18.0, 4.0 / 3.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_perspective_near_far():
    got = np.asarray(transforms.perspective(60.0, 1.0, near=0.1, far=10.0))
    assert got[2, 2] == pytest.approx((10.0 + 0.1) / (0.1 - 10.0))
    assert got[2, 3] == pytest.approx((2 * 0.1 * 10.0) / (0.1 - 10.0))
    assert got[3, 2] == -1.0 and got[3, 3] == 0.0


@pytest.mark.parametrize("axis", [Axis.X, Axis.Y, Axis.Z])
def test_rotation_orthonormal_and_angle(axis):
    angle = 0.7
    R = np.asarray(transforms.rotation(angle, axis=axis))
    np.testing.assert_allclose(R @ R.T, np.eye(4), atol=1e-6)
    # Trace of the 3x3 block = 1 + 2cos(angle).
    assert np.trace(R[:3, :3]) == pytest.approx(1 + 2 * np.cos(angle), abs=1e-6)


def test_rotation_y_known_values():
    R = np.asarray(transforms.rotation(np.pi / 2, axis=Axis.Y))
    # Reference convention (utils.py:68-72): R[0,2] = +sin.
    np.testing.assert_allclose(
        R[:3, :3],
        np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], dtype=np.float32),
        atol=1e-6,
    )


def test_rotation_degrees_flag():
    a = np.asarray(transforms.rotation(90.0, axis=Axis.Z, degrees=True))
    b = np.asarray(transforms.rotation(np.pi / 2, axis=Axis.Z))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_translation():
    T = np.asarray(transforms.translation(1.0, 2.0, 3.0))
    np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0])
    v = T @ np.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(v[:3], [1.0, 2.0, 3.0])


def test_scale_broadcast_sx():
    S = np.asarray(transforms.scale(2.0))
    np.testing.assert_allclose(np.diag(S), [2.0, 2.0, 2.0, 1.0])
    S2 = np.asarray(transforms.scale(2.0, 3.0, 4.0))
    np.testing.assert_allclose(np.diag(S2), [2.0, 3.0, 4.0, 1.0])


def test_vmappable_rotation():
    import jax
    import jax.numpy as jnp

    angles = jnp.linspace(0.0, 1.0, 5)
    Rs = jax.vmap(lambda a: transforms.rotation(a, axis=Axis.Y))(angles)
    assert Rs.shape == (5, 4, 4)
    np.testing.assert_allclose(
        np.asarray(Rs[3]), np.asarray(transforms.rotation(angles[3], axis=Axis.Y)), atol=1e-6
    )
