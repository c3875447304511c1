"""2D-supervision optimization pipeline (the diff_render app).

Behavioural port of diff_render/diftet_6_subdiv/6_optim/
optim_with_mask_subdiv_from_gridmov.py:

  * per step: random training view(s) + random pixel subset
    (`pixelsampling` fraction, :201-206), render, and the loss stack
    L1(color)*w_im + L1(mask)*w_mask + mean(alpha)*w_occ
    [+ mean|mov|*w_pmov + sum(vol_var^2)*w_tetvar when the grid moves]
    + dot(per-channel feature-Laplacian sums, weights_vector)  (:241-272).
  * two Adam groups — features at `lr`, grid motion at `lr2`
    (:141-144; defaults 5e-2 / 5e-4, betas (0.5, 0.999)).
  * periodic tet carving every `delete_every` steps (:179-184).
  * staged schedule: per sublevel a {mov, fix} pair of stages, then 1->8
    subdivision (:486-521); every stage re-jits against the new topology
    (static shapes per stage — the XLA-native version of the reference's
    topology rebuild).
  * test-time PSNR/MSE over full images (:330-384).

Data: `load_blender` reads a NeRF-synthetic scene from disk;
`make_synthetic_scene` renders a procedural GT (colored blob mesh through
this same renderer) so the pipeline is fully self-contained.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .camera import camera_from_blender, pose_spherical
from .scene import TetScene

DEFAULT_WEIGHTS: Dict[str, float] = {
    # expconfig.py:106-145 argparse defaults (mask weighted ABOVE image)
    "weights_im_loss": 1.0,
    "weights_mask_loss": 2.0,
    "weights_mask_reg": 0.01,
    "weights_point_mov": 0.01,
    "weights_tetvariance": 0.0,
    # per-channel feature-Laplacian weights [rgb(3)=color_reg, alpha=
    # occ_lap]; both default 0 (optim...py:447-452)
    "weights_vector": (0.0, 0.0, 0.0, 0.0),
    # with grid motion: + 3 mov channels at weights_point_mov
    "weights_vector_with_gridmov": (0.0, 0.0, 0.0, 0.0, 0.01, 0.01, 0.01),
}


def pixel_grid(height: int, width: int) -> np.ndarray:
    """(H*W, 2) NDC pixel centers, y up (3_model/deftet.py:166-191)."""
    x = (np.arange(width) + 0.5) / width * 2.0 - 1.0
    y = -((np.arange(height) + 0.5) / height * 2.0 - 1.0)
    ym, xm = np.meshgrid(y, x, indexing="ij")
    return np.stack([xm, ym], axis=2).reshape(-1, 2).astype(np.float32)


# --------------------------------------------------------------------------
# Data
# --------------------------------------------------------------------------
def load_blender(
    basedir: str, half_res: bool = True, splits=("train", "val", "test")
):
    """NeRF-synthetic loader (2_data/load_blender.py:55-115).

    Returns (images (N,H,W,4) float in [0,1], poses (N,4,4), (H, W, focal),
    split index lists).
    """
    import imageio.v2 as imageio

    all_imgs, all_poses, counts = [], [], [0]
    meta = None
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as f:
            meta = json.load(f)
        imgs, poses = [], []
        for frame in meta["frames"]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(len(splits))]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    h, w = imgs.shape[1:3]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
    if half_res:
        imgs = imgs[:, ::2, ::2]
        h, w, focal = h // 2, w // 2, focal / 2.0
    return imgs, poses, (h, w, focal), i_split


def make_synthetic_scene(
    n_views: int = 8,
    height: int = 64,
    width: int = 64,
    radius: float = 3.5,
    seed: int = 0,
    coef: float = 2.5,
):
    """Procedural GT: render a colored blob through this same renderer.

    A stand-in for the (non-redistributable) NeRF-synthetic scenes with an
    identical interface: (images (N,H,W,4), poses (N,4,4), (H,W,focal),
    splits).
    """
    from ..data.shapes import random_shape

    verts, faces = random_shape(seed, level=2)
    verts = (verts * coef).astype(np.float32)
    # color by position
    color_logits = np.tanh(verts * 3.0) * 3.0
    focal = 0.5 * width / np.tan(0.5 * 0.69)

    grid = pixel_grid(height, width)
    from .camera import perspective
    from .composite import peel2mask, vertex2face
    from .raster import deftet_sparse_render

    verts_j = jnp.asarray(verts)
    faces_j = jnp.asarray(faces)
    feat = np.concatenate(
        [np.full((verts.shape[0], 1), 8.0, np.float32), color_logits],
        axis=1,
    )
    face_feat = vertex2face(
        jax.nn.sigmoid(jnp.asarray(feat))[None], faces_j
    )
    pix = jnp.asarray(grid)[None]
    rng_px2 = jnp.concatenate(
        [jnp.full_like(pix[..., :1], -1000.0),
         jnp.zeros_like(pix[..., :1])], axis=-1,
    )

    # One compiled program reused across views — per-op eager dispatch
    # over a remote TPU tunnel costs minutes at 100 views.
    @jax.jit
    def render_view(rot, pos, proj):
        cam, xy = perspective(verts_j[None], rot, pos, proj)
        face_z = vertex2face(cam[..., 2:3], faces_j)[..., 0]
        face_img = vertex2face(xy, faces_j)
        layers, _ = deftet_sparse_render(
            pix, rng_px2, face_z, face_img, face_feat, k=4
        )
        color, vis, _ = peel2mask(layers)
        return jnp.concatenate([color, vis], axis=-1)

    images, poses = [], []
    for i in range(n_views):
        theta = 360.0 * i / n_views
        c2w = pose_spherical(theta, -30.0, radius)
        poses.append(c2w)
        rot, pos, proj = camera_from_blender(c2w, focal, height, width)
        img = np.asarray(
            render_view(jnp.asarray(rot), jnp.asarray(pos),
                        jnp.asarray(proj))
        ).reshape(height, width, 4)
        images.append(img)
    images = np.stack(images).astype(np.float32)
    poses = np.stack(poses).astype(np.float32)
    # Interleaved holdout (every 4th view) rather than a contiguous tail:
    # the views live on one azimuth circle, so a contiguous 25% tail is a
    # never-seen 90-degree arc — an extrapolation test no NeRF-synthetic
    # benchmark imposes (their train/test views share the same pose
    # distribution).  Interleaving keeps test views within the trained
    # azimuth coverage.
    idx = np.arange(n_views)
    if n_views >= 4:
        i_test = idx[::4]
        # A distinct half-density val subset (offset 2 mod 8 — disjoint
        # from the test residues 0 mod 4) so in-pipeline decisions (the
        # carve-escalation PSNR guard) never consult test views.
        i_val = idx[2::8]
        i_train = np.setdiff1d(idx, np.concatenate([i_test, i_val]))
    else:
        i_train, i_test = idx[: max(1, n_views - 1)], idx[-1:]
        i_val = i_test
    splits = [i_train, i_val, i_test]
    return images, poses, (height, width, focal), splits


def protocol_scene_mesh(
    seed: int = 0,
    n_shapes: int = 3,
    coef: float = 2.5,
    half_extent: Optional[float] = None,
):
    """The procedural GT mesh behind `make_nerf_protocol_scene`.

    Returns (verts (V,3) float32 world-scale, faces (F,3) int32,
    feat_logits (V,4) float32 [alpha, rgb]) — exposed so probes can test
    against the exact geometry/colors the cached protocol scenes were
    rendered from.  The rng draw order here is load-bearing: it must
    match what make_nerf_protocol_scene historically did, or cached
    scene images (e.g. /tmp/render_q8/scene_cache.npz) stop
    corresponding to the returned mesh.

    ``half_extent`` sets the world half-width the mesh union is scaled
    into.  It MUST match the reconstruction grid's world box: quartet
    .tet grids (e.g. the reference's cube_40_tet.tet) center to
    [-0.5, 0.5] so their world box is coef * 0.5 = 1.25, while the Kuhn
    lattice spans [-1, 1] (world box coef * 1.0).  The historical
    default (None -> 0.95 * coef) assumed the lattice; the round-3 q8
    campaign ran it against the .tet grid, leaving 73% of GT mesh
    vertices OUTSIDE the reconstruction volume — an unrepresentable
    scene and the root cause of its 7.6-PSNR deficit vs the reference
    artifact.  Campaign drivers must pass the grid-derived extent.
    """
    from ..data.shapes import random_shape

    rng = np.random.default_rng(seed)

    verts_list, faces_list, offset = [], [], 0
    for s in range(n_shapes):
        v, f = random_shape(seed * 31 + s, level=3)
        scale = 0.45 + 0.25 * rng.random()
        center = rng.uniform(-0.45, 0.45, size=3)
        center[2] = abs(center[2]) * 0.5  # keep the union near the origin
        v = v * scale + center
        verts_list.append(v)
        faces_list.append(np.asarray(f) + offset)
        offset += v.shape[0]
    verts = np.concatenate(verts_list).astype(np.float32)
    # recenter + fit the union into the tet-grid's world box
    verts -= (verts.max(0) + verts.min(0)) / 2.0
    verts *= 0.95 / np.abs(verts).max()
    faces = np.concatenate(faces_list).astype(np.int32)
    scale = coef if half_extent is None else half_extent / 0.95
    verts = (verts * scale).astype(np.float32)
    # position-varying colors, distinct phase per shape
    phase = np.concatenate(
        [np.full((v.shape[0], 3), rng.uniform(-1.5, 1.5, 3), np.float32)
         for v in verts_list]
    )
    color_logits = np.tanh(np.sin(verts * 2.5 + phase) * 2.0) * 3.0
    feat = np.concatenate(
        [np.full((verts.shape[0], 1), 8.0, np.float32), color_logits], axis=1
    )
    return verts, faces, feat


def make_nerf_protocol_scene(
    n_train: int = 100,
    n_test_pool: int = 200,
    testskip: int = 8,
    n_val: int = 8,
    height: int = 400,
    width: int = 400,
    radius: float = 4.0,
    seed: int = 0,
    coef: float = 2.5,
    camera_angle_x: float = 0.6911112,
    elevation_range: Tuple[float, float] = (-80.0, -5.0),
    pix_chunk: int = 20000,
    n_shapes: int = 3,
    gt_k: int = 16,
    half_extent: Optional[float] = None,
):
    """Procedural GT at the NeRF-synthetic capture protocol.

    ``half_extent``: world half-width the scene is scaled into — MUST
    match the reconstruction grid's world box (see protocol_scene_mesh).

    Matches the protocol of the reference's training data loader
    (2_data/load_blender.py): 400x400 frames (the half-res of the 800^2
    captures, :101-113), RGBA images whose consumer composites onto a
    white background, camera_angle_x-derived focal (:91-92), spherical
    poses with varying elevation (the blender train split samples random
    upper-hemisphere poses; pose_spherical :45-52), 100 train views, and
    a 200-pose test pool consumed every ``testskip`` (the loader's
    testskip knob, :70-74).  The scene content is procedural (no
    NeRF-synthetic data ships on this machine): a union of ``n_shapes``
    random closed meshes with position-varying vertex colors, rendered
    to GT through this renderer at a deep peel budget.

    Returns the `load_blender` interface: (images (N,H,W,4), poses,
    (H,W,focal), [i_train, i_val, i_test]).
    """
    verts, faces, feat = protocol_scene_mesh(seed, n_shapes, coef,
                                             half_extent)
    focal = 0.5 * width / np.tan(0.5 * camera_angle_x)

    # pose rng continues from where the mesh builder's draws left off —
    # same stream, same order as the original inline implementation
    rng = np.random.default_rng(seed)
    rng.random()          # historical draw order: per-shape scale,
    rng.uniform(-0.45, 0.45, size=3)  # center, then phases (n_shapes x)
    for _ in range(n_shapes - 1):
        rng.random()
        rng.uniform(-0.45, 0.45, size=3)
    for _ in range(n_shapes):
        rng.uniform(-1.5, 1.5, 3)

    def draw_poses(n):
        thetas = rng.uniform(-180.0, 180.0, size=n)
        phis = rng.uniform(elevation_range[0], elevation_range[1], size=n)
        return [pose_spherical(t, p, radius) for t, p in zip(thetas, phis)]

    train_poses = draw_poses(n_train)
    val_poses = draw_poses(n_val)
    test_poses = draw_poses(n_test_pool)[::testskip]
    poses = np.stack(train_poses + val_poses + test_poses).astype(np.float32)
    i_train = np.arange(n_train)
    i_val = np.arange(n_train, n_train + n_val)
    i_test = np.arange(n_train + n_val, poses.shape[0])

    from .camera import perspective
    from .composite import peel2mask, vertex2face
    from .raster import deftet_sparse_render

    verts_j = jnp.asarray(verts)
    faces_j = jnp.asarray(faces)
    face_feat = vertex2face(jax.nn.sigmoid(jnp.asarray(feat))[None], faces_j)

    grid = pixel_grid(height, width)
    n_pix = grid.shape[0]
    pad = (-n_pix) % pix_chunk
    grid_p = np.concatenate([grid, np.zeros((pad, 2), np.float32)])
    chunks = grid_p.reshape(-1, pix_chunk, 2)

    @jax.jit
    def render_chunk(pix_1xpx2, rot, pos, proj):
        rng_px2 = jnp.concatenate(
            [jnp.full_like(pix_1xpx2[..., :1], -1000.0),
             jnp.zeros_like(pix_1xpx2[..., :1])], axis=-1,
        )
        cam, xy = perspective(verts_j[None], rot, pos, proj)
        face_z = vertex2face(cam[..., 2:3], faces_j)[..., 0]
        face_img = vertex2face(xy, faces_j)
        layers, _ = deftet_sparse_render(
            pix_1xpx2, rng_px2, face_z, face_img, face_feat, k=gt_k
        )
        color, vis, _ = peel2mask(layers)
        return jnp.concatenate([color, vis], axis=-1)

    images = []
    for c2w in poses:
        rot, pos, proj = camera_from_blender(c2w, focal, height, width)
        rot, pos, proj = jnp.asarray(rot), jnp.asarray(pos), jnp.asarray(proj)
        parts = [np.asarray(render_chunk(jnp.asarray(ch)[None], rot, pos,
                                         proj))[0]
                 for ch in chunks]
        img = np.concatenate(parts, axis=0)[:n_pix]
        images.append(img.reshape(height, width, 4))
    images = np.stack(images).astype(np.float32)
    return images, poses, (height, width, focal), [i_train, i_val, i_test]


# --------------------------------------------------------------------------
# Optimization
# --------------------------------------------------------------------------
@dataclasses.dataclass
class RenderOptConfig:
    """Defaults from 6_optim/expconfig.py:12 + argparse defaults."""

    tet_res: int = 40
    # Optional quartet-format .tet grid file; overrides tet_res.  The
    # reference's diff_render scenes run on quartet-generated grids
    # (e.g. cube_40_tet.tet behind the shipped lego artifact), not the
    # regular Kuhn lattice — see dataloder_helper.py:36-43.
    tet_file: Optional[str] = None
    coef: float = 2.5
    sublevels: int = 2
    steps_fix: int = 3000         # optfix
    steps_mov: int = 2000         # optmov
    pixel_sampling: float = 0.04
    lr_feat: float = 5e-2
    lr_mov: float = 5e-4
    delete_every: int = 1000       # deletenum (expconfig.py:71-74)
    delete_threshold: float = 1e-3  # deletethres (expconfig.py:75-78)
    carve_dilation: int = 3        # neighbourlayer (3_model/deftet.py:35)
    subdiv_threshold: Optional[float] = None
    # Depth-peel layer budget.  kaolin's deftet_sparse_render defaults to
    # knum=300 and the reference never overrides it — peeling must reach
    # every face on the ray: faces beyond the budget get NO gradient, so
    # junk behind layer k never clears and the peel exhausts at eval
    # (round-1's k=10 artifact: speckle holes + silhouette haze).  At
    # res-40 a ray crosses ~100-150 faces; raster cost is scan-dominated,
    # so larger k is cheap (k 10->30 measured +11% step time).
    k: int = 300
    raster_chunk: int = 1024
    # Screen-space candidate binning (raster.deftet_sparse_render
    # bin_cand): -1 = auto from the face count, 0 = off.  Cuts the
    # O(pixels x faces) hit scan to O(pixels x bin_cand) by culling
    # faces per thin pixel-strip tile; `bin_pixel_chunk` is the strip
    # size (smaller strips = tighter bboxes = fewer candidates, more
    # scan launches).
    bin_cand: int = -1
    # Thin strips matter: a training tile of `bin_pixel_chunk` sorted
    # pixels spans bin_pixel_chunk/n_sampled of the screen's rows, and
    # the per-tile candidate count scales with that strip height.
    bin_pixel_chunk: int = 512
    # Train on whole random WxW screen tiles instead of iid pixels
    # (0 = iid, the reference's pixelsampling semantics).  Same pixel
    # budget per step, but each bin tile is a compact screen block: at
    # 1.5M faces a 16x16 block overlaps ~25k faces worst-case vs ~10x
    # more for the pixel strip the iid sample forces — the q8 campaign's
    # ~3.6 s/step at sub2 was almost entirely this scan.  Random-crop
    # training is standard for differentiable rendering; gradients stay
    # unbiased (every pixel is equally likely per step).
    tile_sampling: int = 16
    # Pixel-chunk size for FULL-FRAME renders (PSNR eval / turntable
    # export).  Training steps render only the sampled pixel subset; a
    # full frame in one chunk multiplies the raster's live
    # (pixels, face_chunk) tile by ~16x and, at multi-million-face
    # post-subdivision scenes, has crashed the remote TPU worker — keep
    # eval frames tiled.
    # (replay memory scales with pix_chunk x k; 16384 x k=300 stays
    # under ~250 MB while cutting host round trips per frame to ~10)
    eval_pix_chunk: int = 16384
    # Host-binned full-frame fast path (render/frame.py): screen tile
    # width in pixels; 0 disables (falls back to the pixel-chunked
    # in-jit path).  Only budgets adapt per tile — the render is exact.
    frame_tile: int = 16
    # Below this face count the in-jit path's single compile beats the
    # host-binned path's per-bucket executables.
    frame_min_faces: int = 8192
    # Post-subdivision tet budget (0 = unlimited = exact reference
    # semantics).  The reference subdivides EVERY alive tet between
    # sublevels (subdivision(None), optim...py:518-521) and relies on the
    # in-stage carving to bound the 8x growth; with a lax delete
    # threshold that overflows a 16GB chip near ~2M tets (repeated remote
    # TPU worker crashes at 1.89M).  When the all-tet split would exceed
    # the budget, carve_and_subdivide escalates: harder carve thresholds
    # (guarded by a quick held-out PSNR check), then surface-band
    # selective subdivision, then no subdivision at all.
    tet_budget: int = 1_000_000
    presubdiv_psnr_drop: float = 0.3  # max quick-PSNR loss a harder carve may cost
    seed: int = 0


def _white_composite(images_nxhxwx4: np.ndarray):
    rgb = images_nxhxwx4[..., :3]
    mask = images_nxhxwx4[..., 3:4]
    return rgb * mask + (1.0 - mask), mask


def project_faces_np(scene: TetScene, params, cam) -> np.ndarray:
    """Host-side (F, 3, 2) screen-space faces for one camera — numpy twin
    of camera.perspective (eager per-op dispatch over a remote TPU tunnel
    costs ~minutes per view)."""
    pts = np.asarray(scene.points_px3) + np.asarray(params["mov"])
    pts = scene.coef * pts
    rot, pos, proj = cam
    p = (pts - np.asarray(pos)[0]) @ np.asarray(rot)[0].T
    xyz = p * np.asarray(proj).reshape(1, 3)
    img = xyz[:, :2] / xyz[:, 2:3]
    return img[scene.faces_fx3]


def _tile_mode(cfg: RenderOptConfig, h: int, w: int, n_pix: int):
    """(tile_width, n_tiles) when tile sampling applies, else (0, 0)."""
    t = cfg.tile_sampling
    if t and h % t == 0 and w % t == 0 and n_pix >= t * t:
        return t, max(1, n_pix // (t * t))
    return 0, 0


def calibrate_bin_cand(
    scene: TetScene,
    params,
    cams,
    views,
    grid: np.ndarray,
    n_pix: int,
    cfg: RenderOptConfig,
    margin: float = 1.5,
    hw: Optional[Tuple[int, int]] = None,
) -> int:
    """Measured candidate budget for binned training renders.

    Projects the scene's faces through a few training cameras, samples a
    training-sized pixel subset, and returns margin x the worst per-tile
    bbox-overlap count (rounded to 512) — the budget that makes the
    binned raster exact for tiles like these.  Returns 0 (binning off)
    when culling can't win (small scenes or budget ~ face count).

    Uses its own seed-derived rng (NOT the training stream) so the
    training view/pixel sequence is identical between bin_cand=-1 and
    bin_cand=0/explicit runs with the same seed — A/B comparisons of the
    binning feature stay reproducible.
    """
    from .raster import bin_overlap_max_np

    f = int(scene.faces_fx3.shape[0])
    if cfg.bin_cand == 0 or f <= 4096:
        return 0
    if cfg.bin_cand > 0:
        return cfg.bin_cand
    rng = np.random.default_rng(cfg.seed ^ 0x5EEDCA1B)
    t, n_tiles = _tile_mode(cfg, *(hw or (0, 1)), n_pix)
    if t:
        from .frame import tile_pixel_layout

        layout, _ = tile_pixel_layout(hw[0], hw[1], t)
    worst = 0
    for v in views:
        face_img = project_faces_np(scene, params, cams[int(v)])
        if t:
            tiles = rng.choice(layout.shape[0], size=n_tiles, replace=False)
            pick = layout[tiles].reshape(-1)
            worst = max(
                worst,
                bin_overlap_max_np(face_img, grid[pick], t * t,
                                   sort=False),
            )
        else:
            pick = rng.choice(grid.shape[0], size=min(n_pix, grid.shape[0]),
                              replace=False)
            worst = max(
                worst,
                bin_overlap_max_np(face_img, grid[pick],
                                   cfg.bin_pixel_chunk),
            )
    # Round UP coarsely: ``bin_cand`` is a static jit argument, so every
    # distinct value is a separate executable (and a separate persistent-
    # cache entry).  A 512 quantum let re-calibrations of the same scene
    # land on near-identical budgets (16896 vs 15872) and recompile the
    # whole render step for a 6% budget delta; a 4096 quantum above 8k
    # costs <= 25% extra scan work but makes repeat calibrations
    # executable-stable.
    quantum = 4096 if worst * margin > 8192 else 512
    cand = -(-int(worst * margin) // quantum) * quantum
    cand = max(cand, 2048)
    if cand >= f:
        return 0
    return cand


def _pow2ceil(n: int) -> int:
    return 1 << (max(int(n), 1) - 1).bit_length()


def calibrate_peel_k(
    scene: TetScene,
    params,
    cams,
    views,
    grid: np.ndarray,
    n_pix: int,
    cfg: RenderOptConfig,
    margin: float = 1.25,
    hw: Optional[Tuple[int, int]] = None,
    raw: bool = False,
) -> int:
    """Measured peel depth for training renders.

    The k-deep top-k merge is the rasterizer's dominant TPU cost (~150x
    the coverage scan's traffic floor at k=120, scaling ~linearly in k),
    while carved scenes rarely stack more than a few dozen faces per
    pixel.  This counts the TRUE max per-pixel coverage through a few
    training cameras (device counting scan, raster.hit_count_max) and
    returns margin x that, pow2-rounded, capped at cfg.k.  k >= the
    real max is EXACT (extra slots are sentinels); at the cap it
    truncates exactly like the fixed-k path.
    """
    from .raster import hit_count_max
    from .scene import _face_arrays_jit

    if cfg.k <= 8:
        return cfg.k
    rng = np.random.default_rng(cfg.seed ^ 0x9E37A1)
    t, n_tiles = _tile_mode(cfg, *(hw or (0, 1)), n_pix)
    if t:
        from .frame import tile_pixel_layout

        layout, _ = tile_pixel_layout(hw[0], hw[1], t)
    worst = 0
    for v in views:
        rot, pos, proj = cams[int(v)]
        face_z, face_img, _ = _face_arrays_jit(
            jnp.asarray(scene.points_px3), params["mov"], params["feat"],
            jnp.asarray(scene.faces_fx3), scene.coef,
            jnp.asarray(rot), jnp.asarray(pos), jnp.asarray(proj),
        )
        if t:
            tiles = rng.choice(layout.shape[0], size=n_tiles, replace=False)
            pick = layout[tiles].reshape(-1)
        else:
            pick = rng.choice(grid.shape[0], size=min(n_pix, grid.shape[0]),
                              replace=False)
        pix = grid[pick]
        pixrange = np.concatenate(
            [pix,
             np.full((pix.shape[0], 1), -1000.0, np.float32),
             np.zeros((pix.shape[0], 1), np.float32)], axis=1
        )  # same (-1000, 0) z range as TetScene.render
        worst = max(
            worst,
            int(np.asarray(hit_count_max(
                jnp.asarray(pixrange), face_z, face_img,
            ))),
        )
    if raw:
        return worst
    return min(cfg.k, max(8, _pow2ceil(int(worst * margin))))


def make_render_step(
    scene: TetScene,
    weights: Dict[str, float],
    gridmov: bool,
    cfg: RenderOptConfig,
    opt_feat: optax.GradientTransformation,
    opt_mov: optax.GradientTransformation,
    pixel_chunk: Optional[int] = None,
    bin_sort: bool = True,
):
    """Jitted optimization step for the current (static) topology.

    ``pixel_chunk``/``bin_sort`` override the raster's pixel tiling —
    tile-sampled training passes its tile size with bin_sort=False so
    each sampled screen block is one bin tile."""
    w_vec = jnp.asarray(
        weights["weights_vector_with_gridmov" if gridmov else
                "weights_vector"]
    )
    pixel_chunk = pixel_chunk or cfg.bin_pixel_chunk

    def loss_fn(params, pix_1xpx2, rot, pos, proj, gt_color, gt_mask):
        color, mask = scene.render(
            params, pix_1xpx2, rot, pos, proj, k=cfg.k,
            chunk=cfg.raster_chunk, pixel_chunk=pixel_chunk,
            bin_cand=cfg.bin_cand, bin_sort=bin_sort,
        )[:2]
        loss_im = jnp.mean(jnp.abs(color - gt_color))
        loss_mask = jnp.mean(jnp.abs(mask - gt_mask))
        feat = jax.nn.sigmoid(params["feat"])
        alpha, rgb = feat[:, :1], feat[:, 1:]
        loss_occ = jnp.mean(alpha)
        total = (
            loss_im * weights["weights_im_loss"]
            + loss_mask * weights["weights_mask_loss"]
            + loss_occ * weights["weights_mask_reg"]
        )
        lap_inputs = [rgb, alpha]
        if gridmov:
            loss_mov = jnp.mean(jnp.abs(params["mov"]))
            tet_pos = scene.world_points(params)[None][
                :, jnp.asarray(scene.tets_tx4)
            ]
            from ..losses.geometry import volume_variance

            var = volume_variance(tet_pos, pow=2)
            total = (
                total
                + weights["weights_point_mov"] * loss_mov
                + weights["weights_tetvariance"] * jnp.sum(var**2)
            )
            lap_inputs.append(params["mov"])
        lap = scene.feature_laplacian(
            jnp.concatenate(lap_inputs, axis=-1)
        )  # (P, D)
        total = total + jnp.dot(jnp.sum(lap, axis=0), w_vec)
        return total, {
            "loss_im": loss_im, "loss_mask": loss_mask, "loss_occ": loss_occ
        }

    def step(params, opt_state_feat, opt_state_mov, pix, rot, pos, proj,
             gt_color, gt_mask):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pix, rot, pos, proj, gt_color, gt_mask
        )
        up_f, opt_state_feat = opt_feat.update(
            {"feat": grads["feat"]}, opt_state_feat
        )
        params = {**params, "feat": params["feat"] + up_f["feat"]}
        if gridmov:
            up_m, opt_state_mov = opt_mov.update(
                {"mov": grads["mov"]}, opt_state_mov
            )
            params = {**params, "mov": params["mov"] + up_m["mov"]}
        aux["total"] = total
        return params, opt_state_feat, opt_state_mov, aux

    return jax.jit(step)


def optimize_stage(
    scene: TetScene,
    params: Dict[str, jnp.ndarray],
    images: np.ndarray,
    poses: np.ndarray,
    hwf: Tuple[int, int, float],
    i_train: np.ndarray,
    cfg: RenderOptConfig,
    gridmov: bool,
    steps: int,
    weights: Optional[Dict[str, float]] = None,
    log_every: int = 200,
    log: Optional[Callable[[str], None]] = print,
    lr_div: float = 1.0,
    deadline: Optional[float] = None,
    video_path: Optional[str] = None,
    video_every: int = 200,
    cal_margin: float = 1.5,
):
    """One {mov | fix} stage; re-jits whenever carving changes topology.

    Returns (params, history, info) where ``info`` records the binning
    audit: the calibrated candidate budget, and ``bin_overflow_final`` —
    the end-of-stage overlap excess re-measured on the FINAL params via
    the host oracle (0 = every training render this stage was provably
    exact; >0 = late-stage gradients flowed through a face-dropping
    raster and the caller should escalate ``cal_margin``).

    ``video_path`` (optional .mp4/.gif) writes a convergence video of the
    first train view, one frame per ``video_every`` steps plus the final
    state — the reference's per-stage training videos
    (optim_with_mask_subdiv_from_gridmov.py:330-384).

    ``lr_div`` divides both Adam learning rates — the reference decays
    lr per sublevel (lr_fix/(i+1), lr_mov/(i+1),
    optim_with_mask_subdiv_from_gridmov.py:493-499); run_pipeline passes
    sublevel+1.  Without it the sub1+ grid-motion stages run at 2-3x the
    reference lr, which destabilizes held-out PSNR (the round-1 mov-stage
    regressions).

    ``deadline`` (a ``time.monotonic()`` timestamp) ends the stage early
    when wall-clock runs out — used by budgeted campaign drivers so a
    long schedule degrades to fewer steps instead of a killed process.
    """
    import time as _time
    weights = weights or DEFAULT_WEIGHTS
    h, w, focal = hwf
    gt_color, gt_mask = _white_composite(images)
    grid = pixel_grid(h, w)
    rng = np.random.default_rng(cfg.seed + (1 if gridmov else 0))

    cams = [camera_from_blender(poses[i], focal, h, w) for i in
            range(len(poses))]

    opt_feat = optax.adam(cfg.lr_feat / lr_div, b1=0.5, b2=0.999)
    opt_mov = optax.adam(cfg.lr_mov / lr_div, b1=0.5, b2=0.999)
    osf = opt_feat.init({"feat": params["feat"]})
    osm = opt_mov.init({"mov": params["mov"]})

    n_pix = max(1, int(cfg.pixel_sampling * h * w))
    tile_w, n_tiles = _tile_mode(cfg, h, w, n_pix)
    if tile_w:
        from .frame import tile_pixel_layout

        tile_layout, _ = tile_pixel_layout(h, w, tile_w)
        if log:
            log(f"[tiles] sampling {n_tiles} {tile_w}x{tile_w} blocks "
                f"per step ({n_tiles * tile_w * tile_w} px)")

    def _calibrated_cfg():
        cand = calibrate_bin_cand(
            scene, params, cams, i_train[:3], grid, n_pix, cfg,
            margin=cal_margin, hw=(h, w),
        )
        k_cal = calibrate_peel_k(
            scene, params, cams, i_train[:2], grid, n_pix, cfg,
            margin=max(1.25, cal_margin - 0.25), hw=(h, w),
        )
        if log and (cand != cfg.bin_cand or k_cal != cfg.k):
            log(f"[bin] candidate budget {cand or 'off'}, peel k {k_cal} "
                f"(faces {scene.faces_fx3.shape[0]})")
        return dataclasses.replace(cfg, bin_cand=cand, k=k_cal)

    cal_cfg = _calibrated_cfg()
    step_kw = dict(
        pixel_chunk=(tile_w * tile_w if tile_w else None),
        bin_sort=not tile_w,
    )
    step_fn = make_render_step(scene, weights, gridmov, cal_cfg,
                               opt_feat, opt_mov, **step_kw)
    history = []
    video_frames = []

    def _snap():
        color, _ = render_full_image(
            scene, params, poses[int(i_train[0])], hwf, cfg
        )
        video_frames.append(
            (np.clip(color, 0.0, 1.0) * 255).astype(np.uint8)
        )

    for i in range(steps):
        if deadline is not None and _time.monotonic() > deadline:
            if log:
                log(f"[{'mov' if gridmov else 'fix'}] deadline hit at "
                    f"step {i}/{steps}; ending stage early")
            break
        if (i > 0 and (i % cfg.delete_every == cfg.delete_every - 1)
                and i < steps - 1):
            # i < steps-1: a carve on the stage's LAST step would pay a
            # full re-jit (up to ~16 min on the remote service) for one
            # remaining step; the next stage recalibrates anyway.
            carved = scene.carve(params, cfg.delete_threshold,
                                 neighbor_levels=cfg.carve_dilation)
            # Vertices drift via params['mov'] during the stage, so the
            # stage-start overlap bound can be exceeded mid-stage even
            # with unchanged topology — recalibrate at every carve
            # boundary and re-jit when either changed.
            new_cfg = _calibrated_cfg()
            if carved or new_cfg.bin_cand != cal_cfg.bin_cand:
                cal_cfg = new_cfg
                step_fn = make_render_step(
                    scene, weights, gridmov, cal_cfg, opt_feat, opt_mov,
                    **step_kw,
                )
        view = int(i_train[rng.integers(len(i_train))])
        if tile_w:
            tiles = rng.choice(tile_layout.shape[0], size=n_tiles,
                               replace=False)
            pick = tile_layout[tiles].reshape(-1)
        else:
            pick = rng.choice(h * w, size=n_pix, replace=False)
        pix = jnp.asarray(grid[pick])[None]
        gc = jnp.asarray(
            gt_color[view].reshape(-1, 3)[pick]
        )[None]
        gm = jnp.asarray(gt_mask[view].reshape(-1, 1)[pick])[None]
        rot, pos, proj = cams[view]
        params, osf, osm, aux = step_fn(
            params, osf, osm, pix,
            jnp.asarray(rot), jnp.asarray(pos), jnp.asarray(proj), gc, gm,
        )
        if log and (i % log_every == 0):
            log(
                f"[{'mov' if gridmov else 'fix'} {i}/{steps}] "
                f"total={float(aux['total']):.4f} "
                f"im={float(aux['loss_im']):.4f} "
                f"mask={float(aux['loss_mask']):.4f}"
            )
        history.append(float(aux["total"]))
        if video_path and (i % video_every == 0):
            _snap()
    if video_path:
        _snap()
        write_video(video_frames, video_path, fps=8)
    overflow_final = 0
    peel_overflow_final = 0
    if cal_cfg.k < cfg.k and gridmov:
        # Same drift tripwire for the calibrated peel depth: re-count on
        # the final params; hits past cal_cfg.k mean late-stage renders
        # truncated deeper layers (the fixed-k path would too once past
        # cfg.k — this audits the calibrated budget specifically).
        worst_k = calibrate_peel_k(
            scene, params, cams, i_train[:2], grid, n_pix, cfg,
            hw=(h, w), raw=True,
        )
        peel_overflow_final = max(worst_k - cal_cfg.k, 0)
        if peel_overflow_final and log:
            log(f"[peel] WARNING: end-of-stage coverage {worst_k} exceeds "
                f"the calibrated peel depth {cal_cfg.k}")
    if cal_cfg.bin_cand and gridmov:
        # Silent-approximation tripwire: vertices moved since the last
        # calibration, so re-measure the overlap bound on the FINAL
        # params — an overflow here means late-stage gradients flowed
        # through a face-dropping raster.  (Fix stages only move
        # features, so their stage-start/carve-time calibration stays
        # exact by construction and overflow is 0 without re-probing.)
        from .raster import bin_overlap_max_np

        def _probe_pick():
            if tile_w:
                tiles = rng.choice(tile_layout.shape[0], size=n_tiles,
                                   replace=False)
                return tile_layout[tiles].reshape(-1)
            return rng.choice(h * w, size=n_pix, replace=False)

        worst = max(
            bin_overlap_max_np(
                project_faces_np(scene, params, cams[int(v)]),
                grid[_probe_pick()],
                tile_w * tile_w if tile_w else cfg.bin_pixel_chunk,
                sort=not tile_w,
            )
            for v in i_train[:2]
        )
        overflow_final = max(worst - cal_cfg.bin_cand, 0)
        if overflow_final and log:
            log(f"[bin] WARNING: end-of-stage overlap {worst} exceeds the "
                f"calibrated budget {cal_cfg.bin_cand}; late-stage "
                f"training renders were approximate")
    info = {
        "bin_cand": int(cal_cfg.bin_cand),
        "bin_overflow_final": int(overflow_final),
        "cal_margin": float(cal_margin),
        "peel_k": int(cal_cfg.k),
        "peel_overflow_final": int(peel_overflow_final),
    }
    return params, history, info


def calibrate_eval_bin_cand(
    scene: TetScene,
    params,
    cam,
    grid: np.ndarray,
    pixel_chunk: int,
) -> int:
    """Exact candidate budget for a full-frame render of one pose.

    The former auto heuristic (F//4 clamped to 65536) sits at/below the
    measured worst per-strip overlap on post-subdivision scenes, and
    candidate overflow silently drops the highest-indexed faces — so
    reported test PSNR could be computed on an approximate render with
    no warning.  This measures the true worst overlap for exactly these
    pixels via the host oracle and rounds UP to a multiple of 8192
    (vertices don't move during eval, so the bound is exact; rounding
    buckets the jit cache across poses/frames).
    """
    from .raster import bin_overlap_max_np

    f = int(scene.faces_fx3.shape[0])
    if f <= 4096:
        return 0
    face_img = project_faces_np(scene, params, cam)
    worst = bin_overlap_max_np(face_img, grid, pixel_chunk)
    cand = -(-max(worst, 1) // 8192) * 8192
    return 0 if cand >= f else cand


class _ReadyFrame:
    """Trivial pending-frame wrapper for the already-synchronous path."""

    def __init__(self, color_vis):
        self._cv = color_vis

    def resolve(self):
        return self._cv


def dispatch_full_image(
    scene: TetScene,
    params,
    pose_4x4: np.ndarray,
    hwf,
    cfg: RenderOptConfig,
    pix_chunk: int = 0,
    k_hint: int | None = None,
):
    """Dispatch a full-frame render; returns an object with
    ``.resolve() -> (color, vis)``.  On the host-binned frame path the
    device work is queued asynchronously, so multi-view callers can
    overlap view i+1's host binning with view i's device render.

    ``k_hint`` (a previous view's ``.k_used``) lets the binned path skip
    its per-frame counting dispatch + sync; resolve() audits the fused
    coverage counts and re-renders if the hint was too shallow (output
    identical either way)."""
    h, w, focal = hwf
    pix_chunk = pix_chunk or cfg.eval_pix_chunk
    rot, pos, proj = camera_from_blender(pose_4x4, focal, h, w)
    n_faces = int(scene.faces_fx3.shape[0])
    if cfg.frame_tile and n_faces >= cfg.frame_min_faces:
        from .frame import dispatch_frame_binned
        from .scene import _face_arrays_jit

        face_z, face_img, face_feat = _face_arrays_jit(
            jnp.asarray(scene.points_px3), params["mov"], params["feat"],
            jnp.asarray(scene.faces_fx3), scene.coef,
            jnp.asarray(rot), jnp.asarray(pos), jnp.asarray(proj),
        )
        face_img_np = project_faces_np(scene, params, (rot, pos, proj))
        return dispatch_frame_binned(
            face_z, face_img, face_feat, face_img_np, h, w,
            k=cfg.k, chunk=cfg.raster_chunk, tile=cfg.frame_tile,
            k_hint=k_hint,
        )
    return _ReadyFrame(
        _render_full_image_chunked(
            scene, params, (rot, pos, proj), h, w, cfg, pix_chunk
        )
    )


def render_full_image(
    scene: TetScene,
    params,
    pose_4x4: np.ndarray,
    hwf,
    cfg: RenderOptConfig,
    pix_chunk: int = 0,
):
    """Full-frame render in pixel chunks; returns (H, W, 3) + (H, W, 1)."""
    return dispatch_full_image(
        scene, params, pose_4x4, hwf, cfg, pix_chunk
    ).resolve()


def _render_full_image_chunked(
    scene: TetScene, params, cam, h, w, cfg: RenderOptConfig,
    pix_chunk: int,
):
    rot, pos, proj = cam
    grid = pixel_grid(h, w)
    bin_cand = cfg.bin_cand
    if bin_cand < 0:
        bin_cand = calibrate_eval_bin_cand(
            scene, params, (rot, pos, proj), grid, pixel_chunk=2048
        )
    # Frames are rendered in device-call chunks: the differentiable
    # replay materializes (pix, k, 3, C)-shaped gathers, so a whole
    # 400^2 frame at k=120 in one call is a ~20 GB allocation.  Within
    # each chunk the raster's internal binning still culls the face
    # list per thin pixel strip.
    colors, masks = [], []
    for s in range(0, grid.shape[0], pix_chunk):
        pix = jnp.asarray(grid[s: s + pix_chunk])[None]
        c, m = scene.render(
            params, pix, jnp.asarray(rot), jnp.asarray(pos),
            jnp.asarray(proj), k=cfg.k, chunk=cfg.raster_chunk,
            pixel_chunk=2048, bin_cand=bin_cand,
        )[:2]
        colors.append(np.asarray(c[0]))
        masks.append(np.asarray(m[0]))
    color = np.concatenate(colors).reshape(h, w, 3)
    mask = np.concatenate(masks).reshape(h, w, 1)
    return color, mask


def evaluate_psnr(
    scene: TetScene, params, images, poses, hwf, i_test, cfg: RenderOptConfig
):
    """Mean test MSE + PSNR (optim...py:330-384)."""
    gt_color, _ = _white_composite(images)
    # dispatch every view first (device renders pipeline behind the
    # host binning of later views), then fetch.  View 0 calibrates the
    # peel depth; later views reuse it as an audited k_hint (one fused
    # dispatch each instead of count + sync + render).
    pending, hint = [], None
    for i in i_test:
        pf = dispatch_full_image(
            scene, params, poses[i], hwf, cfg, k_hint=hint
        )
        hint = getattr(pf, "k_used", None)
        pending.append(pf)
    mses = [
        float(np.mean((p.resolve()[0] - gt_color[i]) ** 2))
        for p, i in zip(pending, i_test)
    ]
    mse = float(np.mean(mses))
    psnr = float(-10.0 * np.log10(max(mse, 1e-10)))
    return mse, psnr


def write_video(frames_u8, path: str, fps: int = 8) -> str:
    """Write frames to ``path`` — mp4 (OpenCV mp4v; this image ships no
    ffmpeg CLI) or GIF (imageio) by extension.  Matches the reference's
    imageio.mimwrite mp4 export (optim...py:330-384).  Returns the path
    actually written (falls back to .gif if the mp4 encoder is
    unavailable)."""
    frames_u8 = [np.ascontiguousarray(f) for f in frames_u8]
    if path.endswith(".mp4"):
        try:
            import cv2

            h, w = frames_u8[0].shape[:2]
            vw = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
            if vw.isOpened():
                for f in frames_u8:
                    vw.write(f[..., ::-1])  # RGB -> BGR
                vw.release()
                return path
        except ImportError:
            pass
        path = path[:-4] + ".gif"
    import imageio.v2 as imageio

    imageio.mimwrite(path, list(frames_u8), fps=fps)
    return path


def export_turntable(
    scene: TetScene,
    params,
    hwf,
    cfg: RenderOptConfig,
    path: str,
    n_frames: int = 24,
    radius: float = 3.5,
    phi: float = -30.0,
    fps: int = 8,
):
    """Render a circular camera path and write it as a video — mp4 or
    GIF by extension (the video export of optim...py:330-384).  Returns
    the frame array (N, H, W, 3) uint8."""
    pending, hint = [], None
    for i in range(n_frames):
        pf = dispatch_full_image(
            scene, params, pose_spherical(360.0 * i / n_frames, phi,
                                          radius), hwf, cfg,
            k_hint=hint,
        )
        hint = getattr(pf, "k_used", None)
        pending.append(pf)
    frames = np.stack(
        [
            (np.clip(p.resolve()[0], 0.0, 1.0) * 255).astype(np.uint8)
            for p in pending
        ]
    )
    write_video(frames, path, fps=fps)
    return frames


def carve_and_subdivide(
    scene: TetScene,
    params,
    images,
    poses,
    hwf,
    i_quick,
    cfg: RenderOptConfig,
    log: Optional[Callable[[str], None]] = print,
):
    """Budget-bounded sublevel transition: carve, then 1->8 subdivide.

    Reference semantics (carve at ``delete_threshold``, subdivide all
    alive tets) whenever the result fits ``cfg.tet_budget``; otherwise
    escalate in order of increasing quality risk:

    1. harder carve thresholds (20x / 50x / 100x ``delete_threshold``,
       dilation 1 — the default 1e-3 gives 0.02 / 0.05 / 0.1), accepted
       only if PSNR on the ``i_quick`` views drops < ``presubdiv_psnr_drop``
       vs the reference-carved state;
    2. selective subdivision of the surface band only (tets whose min
       corner alpha < 0.9 — carving already removed the empty band, so
       min<0.9 selects the occupancy-transition region);
    3. no subdivision (keep the current level).

    Returns the (possibly new) params pytree; mutates ``scene``.
    """
    log = log or (lambda m: None)
    scene.carve(
        params, cfg.delete_threshold, neighbor_levels=cfg.carve_dilation
    )
    budget = cfg.tet_budget
    if not budget or scene.n_tets * 8 <= budget:
        return scene.subdivide(params, cfg.subdiv_threshold)

    log(f"[subdiv] {scene.n_tets} alive tets would exceed the "
        f"{budget} post-subdivision budget; escalating carve")

    def quick_psnr():
        _, p = evaluate_psnr(scene, params, images, poses, hwf, i_quick, cfg)
        return p

    base_psnr = quick_psnr()
    tets_ref = scene.tets_tx4.copy()

    def restore():
        scene.tets_tx4 = tets_ref.copy()
        scene.refresh_topology()

    for mult in (20.0, 50.0, 100.0):
        thr = cfg.delete_threshold * mult
        restore()
        scene.carve(params, thr, neighbor_levels=1)
        if scene.n_tets * 8 > budget:
            log(f"[subdiv] carve thr={thr}: {scene.n_tets} tets, still "
                f"over budget")
            continue
        psnr = quick_psnr()
        log(f"[subdiv] carve thr={thr}: {scene.n_tets} tets, quick PSNR "
            f"{psnr:.2f} (base {base_psnr:.2f})")
        if base_psnr - psnr <= cfg.presubdiv_psnr_drop:
            return scene.subdivide(params, cfg.subdiv_threshold)
        break  # harder carving only loses more quality

    # selective: split only the occupancy-transition band
    restore()
    alpha = 1.0 / (1.0 + np.exp(-np.asarray(params["feat"][:, 0])))
    flagged = int((alpha[scene.tets_tx4].min(axis=1) < 0.9).sum())
    est = 8 * flagged + (scene.n_tets - flagged)
    if est <= budget:
        log(f"[subdiv] selective surface-band split: {flagged} of "
            f"{scene.n_tets} tets -> ~{est}")
        return scene.subdivide(params, 0.9)

    log(f"[subdiv] even selective split (~{est}) exceeds the budget; "
        f"keeping the current level ({scene.n_tets} tets)")
    return params


def run_pipeline(
    images: np.ndarray,
    poses: np.ndarray,
    hwf,
    i_split,
    cfg: Optional[RenderOptConfig] = None,
    weights: Optional[Dict[str, float]] = None,
    log: Optional[Callable[[str], None]] = print,
):
    """Full staged schedule (optim...py:486-521): per sublevel run a
    {mov, fix} stage pair, then subdivide.  Returns (scene, params,
    per-stage PSNR records)."""
    from ..tetgrid import build_tet_grid
    from ..tetgrid.grid import read_tet_file

    cfg = cfg or RenderOptConfig()
    i_train, i_val, i_test = i_split
    if cfg.tet_file:
        grid = read_tet_file(cfg.tet_file)
    else:
        grid = build_tet_grid(cfg.tet_res)
    scene = TetScene.from_grid(grid, coef=cfg.coef)
    params = scene.init_params()
    records: List[Dict] = []

    cal_margin = 1.5
    for sub in range(cfg.sublevels + 1):
        for gridmov, steps in ((True, cfg.steps_mov), (False, cfg.steps_fix)):
            if steps <= 0:
                continue
            params, _, stage_info = optimize_stage(
                scene, params, images, poses, hwf, i_train, cfg,
                gridmov=gridmov, steps=steps, weights=weights, log=log,
                lr_div=float(sub + 1), cal_margin=cal_margin,
            )
            if (stage_info["bin_overflow_final"]
                    or stage_info["peel_overflow_final"]):
                # late-stage drift beat the margin once — give every
                # later calibration more headroom
                cal_margin *= 2.0
            mse, psnr = evaluate_psnr(
                scene, params, images, poses, hwf, i_test, cfg
            )
            records.append(
                {"sublevel": sub, "stage": "mov" if gridmov else "fix",
                 "mse": mse, "psnr": psnr, "n_tets": scene.n_tets,
                 **stage_info}
            )
            if log:
                log(f"[sub {sub} {'mov' if gridmov else 'fix'}] "
                    f"mse={mse:.5f} psnr={psnr:.2f} tets={scene.n_tets}")
        if sub < cfg.sublevels:
            params = carve_and_subdivide(
                scene, params, images, poses, hwf, i_val[:4], cfg, log=log
            )
    return scene, params, records
