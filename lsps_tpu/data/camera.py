"""Camera models and 2D<->3D joint projection, vectorized.

Reproduces the projection semantics of the reference importers
(reference: src/data/importers.py:84-123 for ICVL — y *not* flipped;
src/data/importers.py:826-863 and :1260-1297 for MSRA/NYU — y flipped,
i.e. image v grows downward while metric y grows upward).

All functions are vectorized over leading axes: input shape (..., 3).
They are written against the array namespace of their input, so they
work both on host numpy arrays and inside jitted JAX code.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _xp(a):
    # minimal array-namespace dispatch: jax arrays expose .__array_namespace__
    # via jnp ops transparently through operators; we only need where().
    import jax.numpy as jnp

    return jnp if type(a).__module__.startswith("jax") else np


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera with optional y-axis flip (NYU/MSRA convention)."""

    fx: float
    fy: float
    ux: float
    uy: float
    flip_y: bool = False
    depth_map_size: tuple = (320, 240)  # (width, height)

    # -- presets ----------------------------------------------------------
    @staticmethod
    def icvl() -> "Camera":
        # Intel Creative, see Qian et al. (reference importers.py:203)
        return Camera(241.42, 241.42, 160.0, 120.0, flip_y=False,
                      depth_map_size=(320, 240))

    @staticmethod
    def msra() -> "Camera":
        # reference importers.py:617 (+ flipped y at :826-863)
        return Camera(241.42, 241.42, 160.0, 120.0, flip_y=True,
                      depth_map_size=(320, 240))

    @staticmethod
    def post() -> "Camera":
        # POST full-body rig (reference importers.py:1399-1400; base-class
        # projection, no y flip)
        return Camera(568.2585063980484, 568.6191815994941,
                      317.5252035537242, 248.5884501249385, flip_y=False,
                      depth_map_size=(640, 480))

    @staticmethod
    def nyu() -> "Camera":
        # Kinect (reference importers.py:961, flipped y at :1260-1297)
        return Camera(588.03, 587.07, 320.0, 240.0, flip_y=True,
                      depth_map_size=(640, 480))

    # -- projections -------------------------------------------------------
    def img_to_3d(self, uvd):
        """(u, v, d[mm]) image coords -> metric 3D (x, y, z) in mm."""
        xp = _xp(uvd)
        u, v, d = uvd[..., 0], uvd[..., 1], uvd[..., 2]
        x = (u - self.ux) * d / self.fx
        if self.flip_y:
            y = (self.uy - v) * d / self.fy
        else:
            y = (v - self.uy) * d / self.fy
        return xp.stack([x, y, d], axis=-1)

    def to_img(self, xyz):
        """Metric 3D (mm) -> image coords (u, v, d).

        z == 0 maps to the principal point with d = 0 (reference
        importers.py:116-119).
        """
        xp = _xp(xyz)
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        safe_z = xp.where(z == 0.0, 1.0, z)
        u = xp.where(z == 0.0, self.ux, x / safe_z * self.fx + self.ux)
        if self.flip_y:
            v = xp.where(z == 0.0, self.uy, self.uy - y / safe_z * self.fy)
        else:
            v = xp.where(z == 0.0, self.uy, y / safe_z * self.fy + self.uy)
        d = xp.where(z == 0.0, 0.0, z)
        return xp.stack([u, v, d], axis=-1)

    # reference-parity aliases (importers.py:73-123)
    def joint_img_to_3d(self, uvd):
        return self.img_to_3d(uvd)

    def joint_3d_to_img(self, xyz):
        return self.to_img(xyz)

    # -- matrices ----------------------------------------------------------
    def intrinsics(self) -> np.ndarray:
        """3x3 intrinsic matrix (reference importers.py:139-150,865-876)."""
        k = np.zeros((3, 3), np.float32)
        k[0, 0] = self.fx
        k[1, 1] = -self.fy if self.flip_y else self.fy
        k[2, 2] = 1.0
        k[0, 2] = self.ux
        k[1, 2] = self.uy
        return k

    def projection(self) -> np.ndarray:
        """4x4 homogeneous projection (reference importers.py:125-137)."""
        p = np.zeros((4, 4), np.float32)
        p[0, 0] = self.fx
        p[1, 1] = -self.fy if self.flip_y else self.fy
        p[2, 2] = 1.0
        p[0, 2] = self.ux
        p[1, 2] = self.uy
        p[3, 2] = 1.0
        return p

    def depth_to_pcl(self, dpt, T, background_val=0.0) -> np.ndarray:
        """Back-project a cropped depth map to a metric point cloud.

        ``T`` is the 3x3 crop transform returned by the detector; points
        are mapped back through ``inv(T)`` to original image coords first
        (reference importers.py:160-177, 929-946, 1366-1383).
        """
        dpt = np.asarray(dpt)
        ys, xs = np.where(~np.isclose(dpt, background_val))
        pts = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs, np.float32)], 1)
        pts = (np.linalg.inv(np.asarray(T)) @ pts.T).T
        uv = pts[:, :2] / pts[:, 2:3]
        depth = dpt[ys, xs]
        row = (uv[:, 0] - self.ux) / self.fx * depth
        if self.flip_y:
            col = (self.uy - uv[:, 1]) / self.fy * depth
        else:
            col = (uv[:, 1] - self.uy) / self.fy * depth
        return np.column_stack((row, col, depth))
