"""Camera transforms for the 2D-supervision renderer.

Behavioural port of diff_render/diftet_6_subdiv/3_model/cameraop.py:19-34
(pixel2mesh convention: p' = R^T (p - cam_pos); image xy = (p' * proj)_xy /
(p' * proj)_z) and the NeRF-Blender camera preprocessing of
6_optim/optim_with_mask_subdiv_from_gridmov.py + 2_data/load_blender.py:45-52.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def perspective(points_bxpx3, camera_rot_bx3x3, camera_pos_bx3, camera_proj_3):
    """Transform world points to camera space + image plane.

    Returns (points_cam_bxpx3, xy_bxpx2).  `camera_proj_3` holds the three
    per-axis projection scales (fx, fy, 1) the reference keeps as a 3x1
    tensor (cameraop.py:28-32).
    """
    p = points_bxpx3 - camera_pos_bx3[:, None, :]
    # HIGHEST precision: the TPU default (bf16 multiply) injects ~1e-2
    # absolute jitter into camera-space coords, i.e. ~0.8 px of random
    # per-vertex noise at 128^2 — fatal once subdivided triangles shrink
    # to ~1 px (measured: test PSNR 30 -> 8 on a post-subdivision scene).
    p = jnp.matmul(
        p,
        jnp.swapaxes(camera_rot_bx3x3, 1, 2),
        precision=jax.lax.Precision.HIGHEST,
    )
    xyz = p * camera_proj_3.reshape(1, 1, 3)
    xy = xyz[..., :2] / xyz[..., 2:3]
    return p, xy


def pose_spherical(theta_deg: float, phi_deg: float, radius: float):
    """Camera-to-world pose on a sphere (load_blender.py:23-52 convention).

    Returns a (4, 4) numpy c2w matrix.
    """
    def trans_t(t):
        m = np.eye(4)
        m[2, 3] = t
        return m

    def rot_phi(phi):
        m = np.eye(4)
        c, s = np.cos(phi), np.sin(phi)
        m[1, 1], m[1, 2] = c, -s
        m[2, 1], m[2, 2] = s, c
        return m

    def rot_theta(th):
        m = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        m[0, 0], m[0, 2] = c, s
        m[2, 0], m[2, 2] = -s, c
        return m

    c2w = trans_t(radius)
    c2w = rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    c2w = (
        np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]])
        @ c2w
    )
    return c2w


def camera_from_blender(c2w_4x4: np.ndarray, focal: float, h: int, w: int):
    """Convert a NeRF-Blender camera-to-world matrix into the renderer's
    (rot, pos, proj) triple (preprocess_nerf_blender,
    2_data/load_blender.py:175-221).

    The camera keeps the OpenGL convention (looks down -z; camera z of
    visible points is negative — which is also what the rasterizer's
    depth-peel ordering and the (-1000, 0) render range assume).  The proj
    z-slot is -1 so the perspective divide x/(-z), y/(-z) lands in NDC
    with the correct orientation (load_blender.py:189-202).
    """
    c2w = np.asarray(c2w_4x4, dtype=np.float64)
    pos = c2w[:3, 3]
    rot = c2w[:3, :3].T
    proj = np.array([2.0 * focal / w, 2.0 * focal / h, -1.0])
    return (
        rot.astype(np.float32)[None],
        pos.astype(np.float32)[None],
        proj.astype(np.float32),
    )
