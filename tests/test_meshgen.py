"""Mesh generation vs tiny hand-computed grids and reference semantics."""

import numpy as np

from depthrenderer_tpu import meshgen
from depthrenderer_tpu.scene import Mesh, Texture


def test_density0_flat_quad():
    depth = np.zeros((4, 4), np.uint8)  # depth 0 everywhere -> z = 1
    verts, uvs, idx = meshgen.grid_mesh(depth, 0)
    verts, uvs, idx = np.asarray(verts), np.asarray(uvs), np.asarray(idx)

    assert verts.shape == (4, 3) and uvs.shape == (4, 2) and idx.shape == (6,)
    # Square depth map -> aspect factor 1: corners at (-1, 1), (1, 1), (-1, -1), (1, -1).
    np.testing.assert_allclose(
        verts[:, :2],
        [[-1, 1], [1, 1], [-1, -1], [1, -1]],
        atol=1e-6,
    )
    np.testing.assert_allclose(verts[:, 2], 1.0)
    np.testing.assert_allclose(uvs, [[0, 1], [1, 1], [0, 0], [1, 0]], atol=1e-6)
    # Index pattern (a, b, c), (c, b, d) with a=0, b=2, c=1, d=3 (render.py:525-532).
    np.testing.assert_array_equal(idx, [0, 2, 1, 1, 2, 3])


def test_aspect_correction():
    # Non-square depth map: y scaled by (h/w)·y - 0.5·(1 - h/w)·y (render.py:494).
    h, w = 30, 40
    depth = np.zeros((h, w), np.uint8)
    verts, _, _ = meshgen.grid_mesh(depth, 0)
    verts = np.asarray(verts)
    hw = h / w
    factor = hw - 0.5 * (1.0 - hw)
    np.testing.assert_allclose(verts[0, 1], factor * 1.0, rtol=1e-6)
    np.testing.assert_allclose(verts[2, 1], factor * -1.0, rtol=1e-6)


def test_depth_sampling_d1():
    # 3x3 grid over a 6x6 depth map; check the exact sampled texels.
    H = W = 6
    depth = (np.arange(H * W, dtype=np.uint8)).reshape(H, W)
    verts, _, _ = meshgen.grid_mesh(depth, 1)
    verts = np.asarray(verts)
    n = 3
    # Reference sampling (render.py:503-504) with top-down re-basing:
    #   u = int(j/n * W); v_gl = int((1 - i/n)*H - 1); row = H-1-v_gl.
    for i in range(n):
        for j in range(n):
            u = int(j / n * W)
            v_gl = int((1 - i / n) * H - 1)
            row = H - 1 - v_gl
            want = 1.0 - depth[row, u] / 255.0
            got = verts[i * n + j, 2]
            assert abs(got - want) < 1e-6, (i, j, got, want)


def test_grid_indices_ccw_structure():
    idx = np.asarray(meshgen.grid_indices(1)).reshape(-1, 3)
    assert idx.shape == (8, 3)  # 2x2 cells * 2 triangles
    n = 3
    # First cell: a=0, b=n, c=1, d=n+1.
    np.testing.assert_array_equal(idx[0], [0, n, 1])
    np.testing.assert_array_equal(idx[1], [1, n, n + 1])


def test_indices_front_facing_after_projection():
    # With identity view and the reference projection, all grid triangles must be
    # counter-clockwise (positive signed area) in window coordinates.
    from depthrenderer_tpu.ops import common
    from depthrenderer_tpu import transforms

    depth = np.zeros((8, 8), np.uint8)
    verts, _, idx = meshgen.grid_mesh(depth, 2)
    verts = np.asarray(verts)
    mvp = np.asarray(transforms.perspective(18.0, 1.0)) @ np.asarray(
        transforms.translation(dz=-10.0)
    )
    sx, sy, _, _ = common.project_vertices(verts, mvp, 64, 64)
    p = np.stack([np.asarray(sx), np.asarray(sy)], axis=1)
    t = np.asarray(idx).reshape(-1, 3)
    p0, p1, p2 = p[t[:, 0]], p[t[:, 1]], p[t[:, 2]]
    area2 = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (p1[:, 1] - p0[:, 1]) * (
        p2[:, 0] - p0[:, 0]
    )
    assert (area2 > 0).all()


def test_mesh_from_texture_and_redepth(checker_texture):
    tex = Texture(checker_texture)
    depth = np.linspace(0, 255, 16 * 16, dtype=np.uint8).reshape(16, 16)
    mesh = Mesh.from_texture(tex, depth, density=2)
    assert mesh.is_grid and mesh.grid_density == 2
    assert mesh.vertices.shape == (25, 3)
    assert mesh.num_triangles == 32

    depth2 = 255 - depth
    mesh2 = Mesh.from_copy_with_new_depth(mesh, depth2)
    np.testing.assert_allclose(mesh2.vertices[:, :2], mesh.vertices[:, :2])
    assert not np.allclose(mesh2.vertices[:, 2], mesh.vertices[:, 2])
    # Re-depth must equal building from scratch with the new map.
    mesh3 = Mesh.from_texture(tex, depth2, density=2)
    np.testing.assert_allclose(mesh2.vertices, mesh3.vertices, atol=1e-6)


def test_displacement_factor_mutation(checker_texture):
    # CLI parity: mesh.vertices[:, 2] *= displacement_factor (__main__.py:91).
    mesh = Mesh.from_texture(Texture(checker_texture),
                             np.full((8, 8), 128, np.uint8), density=1)
    before = mesh.vertices[:, 2].copy()
    mesh.vertices[:, 2] *= 4.0
    np.testing.assert_allclose(mesh.vertices[:, 2], before * 4.0)


def test_traced_indices_match_numpy():
    # The jitted path builds indices from iotas on-device (a trace-time numpy
    # constant was ~400 MB of HLO at density 12); values must be identical.
    from depthrenderer_tpu.meshgen import _grid_indices_traced, grid_indices

    for d in (0, 1, 3, 5):
        got = np.asarray(_grid_indices_traced(d))
        want = grid_indices(d)
        assert got.dtype == want.dtype == np.uint32
        assert (got == want).all()
