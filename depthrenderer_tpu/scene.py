"""Host-side scene objects: :class:`Texture`, :class:`Mesh` and :class:`Camera`.

These mirror the reference's scene-object model (``DepthRenderer/render.py:14-565``)
but hold plain numpy arrays instead of GL handles — there is no GPU upload step; the
renderer converts to device arrays when a frame function is jitted. The reference's
``to_gpu``/``bind``/``draw``/``cleanup`` lifecycle (``render.py:295-330``) therefore
collapses to nothing; ``cleanup`` methods are kept as no-ops for API parity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import meshgen
from .transforms import Axis
from .utils import log, FrameTimer


class Texture:
    """An RGBA texture (reference: ``render.py:333-372``).

    Sampling semantics replicated by the rasteriser: bilinear filtering with
    clamp-to-edge wrapping (the reference sets legacy ``GL_CLAMP``; modern drivers
    treat it as clamp-to-edge — ``render.py:357-360``).
    """

    def __init__(self, image):
        image = np.asarray(image)
        assert image.ndim == 3, (
            f"Image should be a numpy array with exactly three dimensions "
            f"(height, width, channels); got {image.ndim} dimensions."
        )
        if image.shape[2] == 3:
            alpha = np.full(image.shape[:2] + (1,), 255, dtype=image.dtype)
            image = np.concatenate([image, alpha], axis=2)
        self.image = image

    @property
    def shape(self):
        return self.image.shape

    def copy(self):
        return Texture(self.image.copy())

    def cleanup(self):  # API parity; nothing to free.
        pass


class Mesh:
    """A textured triangle mesh (reference: ``render.py:375-565``).

    ``vertices`` (V, 3), ``texture_coordinates`` (V, 2) and flat ``indices`` use the
    reference's layout. ``transform`` is the per-mesh model matrix. Meshes created by
    :meth:`from_texture` additionally record ``grid_density`` so the renderer can use
    the structured-grid fast path.
    """

    def __init__(self, texture: Texture, vertices, texture_coordinates, indices,
                 grid_density: Optional[int] = None):
        self.texture = texture
        # np.array (not asarray) so device-array sources become writable host copies
        # (CLI parity requires in-place mutation, e.g. vertices[:, 2] *= factor).
        self.vertices = np.array(vertices, dtype=np.float32)
        self.texture_coordinates = np.array(texture_coordinates, dtype=np.float32)
        self.indices = np.array(indices, dtype=np.uint32)
        self.transform = np.eye(4, dtype=np.float32)
        self.grid_density = grid_density

    @property
    def is_grid(self) -> bool:
        return self.grid_density is not None

    @property
    def num_triangles(self) -> int:
        return len(self.indices) // 3

    def cleanup(self):  # API parity; nothing to free.
        pass

    @staticmethod
    def from_texture(texture: Texture, depth_map=None, density=0, debug=False):
        """Create the depth-displaced grid mesh (reference: ``render.py:464-545``).

        With no depth map, all z values are 1 (a flat quad grid).
        """
        assert density % 1 == 0, f"Density must be a whole number, got {density}."
        assert density >= 0, f"Density must be a non-negative number, got {density}."

        if debug:
            log("Generating mesh...")
        timer = FrameTimer()

        if depth_map is None:
            n = meshgen.grid_vertex_count(density)
            depth_map = np.zeros((n, n), dtype=np.uint8)  # z = 1 everywhere.

        depth_map = np.asarray(depth_map)
        vertices, uvs, indices = meshgen.grid_mesh(depth_map, int(density))
        mesh = Mesh(texture, np.asarray(vertices), np.asarray(uvs), np.asarray(indices),
                    grid_density=int(density))

        if debug:
            log(f"Num. triangles: {mesh.num_triangles:,d}")
            log(f"Num. vertices: {len(mesh.vertices):,d}")
            timer.update()
            log(f"Mesh Generation Took {1000 * timer.delta:.2f} ms "
                f"({1e9 * timer.delta / max(1, len(mesh.indices)):.2f} ns per triangle)")

        return mesh

    @staticmethod
    def from_copy_with_new_depth(mesh: "Mesh", depth_map):
        """Copy a grid mesh, replacing only the z displacement from a new depth map
        (reference: ``render.py:547-565``)."""
        assert mesh.is_grid, "from_copy_with_new_depth requires a grid mesh."
        z = np.asarray(meshgen.grid_depth(np.asarray(depth_map), mesh.grid_density))

        vertices = mesh.vertices.copy()
        vertices[:, 2] = z.reshape(-1)

        out = Mesh(mesh.texture.copy(), vertices, mesh.texture_coordinates.copy(),
                   mesh.indices.copy(), grid_density=mesh.grid_density)
        out.transform = mesh.transform.copy()
        return out


class Camera:
    """A perspective camera (reference: ``render.py:14-180``).

    Holds the ``view`` matrix and the reference's nonstandard projection (``fov_y``
    in degrees used directly as the focal scale — ``render.py:85-92``). The
    interactive mouse/keyboard navigation of the reference has no headless
    counterpart; the same operations are exposed as plain methods (:meth:`zoom_in`,
    :meth:`zoom_out`, :meth:`reset_zoom`, :meth:`pan`, :meth:`rotate`).
    """

    def __init__(self, window_size, fov_y=60, near=0.01, far=1000.0, zoom_speed=10):
        self.window_size = tuple(window_size)
        self.fov_y = float(fov_y)
        self.original_fov_y = float(fov_y)
        self.near = float(near)
        self.far = float(far)
        self.zoom_speed = float(zoom_speed)
        self.near_zoom_rate = 1.05
        self.rotation_speed = 0.001

        self.view = np.eye(4, dtype=np.float32)
        self.projection = self._projection_matrix(self.fov_y)

    # -- projection ---------------------------------------------------------------

    def _projection_matrix(self, fov_y):
        fov_y = max(0.0, float(fov_y))
        n, f, a = self.near, self.far, self.aspect_ratio
        return np.array(
            [
                [fov_y / a, 0, 0, 0],
                [0, fov_y, 0, 0],
                [0, 0, (f + n) / (n - f), (2 * n * f) / (n - f)],
                [0, 0, -1, 0],
            ],
            dtype=np.float32,
        )

    @property
    def aspect_ratio(self):
        return self.window_width / self.window_height

    @property
    def window_width(self):
        return self.window_size[0]

    @property
    def window_height(self):
        return self.window_size[1]

    @property
    def view_projection_matrix(self):
        return self.projection @ self.view

    # -- zoom (reference: render.py:94-121) ---------------------------------------

    def zoom_in(self):
        if self.fov_y < self.zoom_speed:
            self.fov_y *= self.near_zoom_rate
        else:
            self.fov_y += self.zoom_speed
        self.projection = self._projection_matrix(self.fov_y)

    def zoom_out(self):
        if self.fov_y <= self.zoom_speed:
            self.fov_y *= 0.9
        else:
            self.fov_y -= self.zoom_speed
        self.projection = self._projection_matrix(self.fov_y)

    def reset_zoom(self):
        self.fov_y = self.original_fov_y
        self.projection = self._projection_matrix(self.fov_y)

    # -- navigation (headless equivalents of render.py:152-170) --------------------

    def pan(self, dx, dy):
        """Translate the view in the image plane, normalised by the window size."""
        t = np.eye(4, dtype=np.float32)
        t[0, 3] = dx / self.window_width
        t[1, 3] = dy / self.window_height
        self.view = self.view @ t

    def rotate(self, dx, dy):
        """Rotate the view by mouse-style deltas (reference: ``render.py:160-164``)."""
        cy, sy = np.cos(self.rotation_speed * dx), np.sin(self.rotation_speed * dx)
        cx, sx = np.cos(-self.rotation_speed * dy), np.sin(-self.rotation_speed * dy)
        rot_y = np.array(
            [[cy, 0, sy, 0], [0, 1, 0, 0], [-sy, 0, cy, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        )
        rot_x = np.array(
            [[1, 0, 0, 0], [0, cx, -sx, 0], [0, sx, cx, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        )
        self.view = self.view @ (rot_y @ rot_x)


__all__ = ["Texture", "Mesh", "Camera", "Axis"]
