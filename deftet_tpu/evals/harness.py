"""Inference + metric harness (reference: eval.py:171-349).

Per batch:
  * encode input points (fixed noise seed at eval, parallel.py:119-122),
  * decode positions over the grid,
  * full-grid occupancy probabilities in chunks (split_decode_occ,
    pc_model.py:332-366) -> threshold -> predicted occupancy,
  * predicted surface = boundary faces of the *predicted* occupancy
    (deftet.py:114 + eval.py:236-237),
  * metrics: occupancy IoU on SDF sample points (check via point-in-tet
    paste, eval.py:239-241), F-score / Chamfer / Chamfer-L1 on resampled
    surface points (eval.py:244-255), two-sided point-to-mesh Hausdorff
    (eval.py:256-260).

Everything is masked/static-shape: the predicted surface keeps a top-k
boundary working set, and surface resampling draws faces from an
area*mask-weighted categorical — the static equivalent of kaolin
sample_points on the extracted mesh.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..losses import boundary_faces_from_occupancy, select_boundary_subset
from ..losses.geometry import gather_tet_soa, tet_centers_soa
from ..ops.point_tet import paste_occupancy, points_in_tets_soa
from ..train.statics import GridStatics
from .metrics import (
    chamfer_distance,
    chamfer_distance_l1,
    f_score,
    hausdorff_distance,
    iou,
)


def sample_mesh_points(
    key: jax.Array,
    face_pos_bxfx3x3: jnp.ndarray,
    face_mask_bxf: jnp.ndarray,
    n_points: int,
):
    """Area-weighted point sampling on a masked triangle soup.

    The static-shape equivalent of kaolin ``sample_points``
    (mesh_utils.py:56-92 reimplements it the same way: categorical over
    face areas, then sqrt-uv barycentric).
    """
    a = face_pos_bxfx3x3[:, :, 0]
    b = face_pos_bxfx3x3[:, :, 1]
    c = face_pos_bxfx3x3[:, :, 2]
    cross = jnp.cross(b - a, c - a)
    area = 0.5 * jnp.sqrt(jnp.sum(cross * cross, axis=-1) + 1e-20)
    w = area * face_mask_bxf + 1e-20
    logits = jnp.log(w)
    k_face, k_uv = jax.random.split(key)
    face_id = jax.random.categorical(
        k_face, logits[:, None, :], axis=-1,
        shape=(face_pos_bxfx3x3.shape[0], n_points),
    )  # (B, n)
    tri = jnp.take_along_axis(
        face_pos_bxfx3x3, face_id[..., None, None], axis=1
    )  # (B, n, 3, 3)
    u = jnp.sqrt(
        jax.random.uniform(k_uv, face_id.shape + (1,))
    )
    v = jax.random.uniform(jax.random.fold_in(k_uv, 1), face_id.shape + (1,))
    return (
        (1 - u) * tri[..., 0, :]
        + (u * (1 - v)) * tri[..., 1, :]
        + u * v * tri[..., 2, :]
    )


def decode_occ_full_grid(
    model, variables, centers_soa, pyramid, chunk: int = 100_000, cam=None
):
    """Chunked full-grid occupancy probabilities (split_decode_occ,
    pc_model.py:332-366).  `centers_soa` = (cx, cy, cz) each (B, T) —
    the (B, T, 3) stack is only materialized per chunk (a full stack
    pads ~40x on TPU and OOMs at production grid sizes)."""
    cx, cy, cz = centers_soa
    b, t = cx.shape
    pad = (-t) % chunk

    def pad_c(c):
        return jnp.pad(c, ((0, 0), (0, pad)))

    n_chunks = (t + pad) // chunk
    tiles = tuple(
        pad_c(c).reshape(b, n_chunks, chunk).swapaxes(0, 1)
        for c in (cx, cy, cz)
    )

    def one(tile):
        tile_bxcx3 = jnp.stack(tile, axis=-1)
        return model.apply(
            variables, tile_bxcx3, pyramid,
            train=False, cam_bx4x4=cam, method=model.decode_occ,
        )

    logits = jax.lax.map(one, tiles)  # (n_chunks, B, chunk)
    return logits.swapaxes(0, 1).reshape(b, -1)[:, :t]


def adjacency_for(statics: GridStatics, config: TrainConfig, lattice_offsets):
    """(adjacency object, lattice_res) — the stencil fast path when the
    regular-grid offsets are provided (train.statics.lattice_offsets)."""
    from ..nn import LatticeAdjacency, VertexAdjacency

    if lattice_offsets is not None:
        return (
            LatticeAdjacency(
                offsets=lattice_offsets, degree=statics.vert_degree
            ),
            config.res,
        )
    return (
        VertexAdjacency(
            idx=statics.vert_adj_idx,
            mask=statics.vert_adj_mask,
            degree=statics.vert_degree,
        ),
        0,
    )


def tet_soa_for(tet_pos, statics: GridStatics, config: TrainConfig, tet_lattice):
    """Full-grid SoA corners: lattice slices when available, else
    incidence gathers (losses.geometry.gather_tet_soa_lattice)."""
    if tet_lattice is not None:
        from ..losses.geometry import gather_tet_soa_lattice

        return gather_tet_soa_lattice(tet_pos, config.res, tet_lattice)
    return gather_tet_soa(
        tet_pos, statics.tet_tx4,
        vert_tet_inc=(statics.vert_tet_inc_idx, statics.vert_tet_inc_mask),
    )


def extract_predicted_surface(
    model, state, batch, statics: GridStatics, config: TrainConfig,
    lattice_offsets=None, tet_lattice=None,
):
    """(verts (B, N, 3), faces (B, K, 3), mask (B, K)) of the predicted
    surface — tet positions + boundary faces of thresholded occupancy
    (eval.py:236-237); used for --save_vis OBJ dumps."""
    import numpy as np

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    surface = batch["surface_points"]
    bsz = surface.shape[0]
    if config.use_disn:
        inp, cam = batch["imgs"], batch["cam_matrix"]
    else:
        inp, cam = surface[:, : config.n_point], None
    init_pos = jnp.broadcast_to(
        statics.init_pos_nx3[None], (bsz,) + statics.init_pos_nx3.shape
    )
    pos_mask = jnp.broadcast_to(
        statics.pos_mask_nx3[None], (bsz,) + statics.pos_mask_nx3.shape
    )
    pyr_pos, pyr_occ = model.apply(
        variables, inp, train=False, method=model.encode
    )
    adj, lat_res = adjacency_for(statics, config, lattice_offsets)
    _, tet_pos, _ = model.apply(
        variables, init_pos, pyr_pos, pos_mask,
        train=False, adj=adj, lattice_res=lat_res, cam_bx4x4=cam,
        method=model.decode_pos,
    )
    soa = tet_soa_for(tet_pos, statics, config, tet_lattice)
    logits = decode_occ_full_grid(
        model, variables, tet_centers_soa(soa), pyr_occ,
        chunk=min(100_000, statics.n_tets), cam=cam,
    )
    pred_occ = (jax.nn.sigmoid(logits) > config.occ_threshold).astype(
        jnp.float32
    )
    faces_b, mask_b = boundary_faces_from_occupancy(
        pred_occ, statics.face_fx3, statics.face_tet_fx2
    )
    budget = config.resolved_max_boundary_faces() or faces_b.shape[1]
    work_faces, work_mask = select_boundary_subset(faces_b, mask_b, budget)
    return (
        np.asarray(tet_pos), np.asarray(work_faces), np.asarray(work_mask)
    )


def save_predicted_surface_objs(
    model, state, batch, statics, config, out_prefix: str,
    lattice_offsets=None, tet_lattice=None,
):
    """Dump one OBJ per batch element (the --save_vis behaviour of
    train_multigpu.py:183 / deftet.py:72-80)."""
    from ..utils import save_obj

    verts, faces, mask = extract_predicted_surface(
        model, state, batch, statics, config,
        lattice_offsets=lattice_offsets, tet_lattice=tet_lattice,
    )
    paths = []
    for i in range(verts.shape[0]):
        keep = mask[i] > 0
        path = f"{out_prefix}_{i}.obj"
        save_obj(path, verts[i], faces[i][keep])
        paths.append(path)
    return paths


def make_inference_step(model, config: TrainConfig, lattice_offsets=None,
                        tet_lattice=None):
    """Jitted eval-forward: predicted occupancy + surface + all metrics."""

    def infer(state, batch, rng, statics: GridStatics):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        surface = batch["surface_points"]
        bsz = surface.shape[0]
        if config.use_disn:
            inp, cam = batch["imgs"], batch["cam_matrix"]
        else:
            cam = None
            inp = surface[:, : config.n_point]
            if config.add_input_noise:
                inp = inp + config.input_noise * jax.random.normal(
                    jax.random.PRNGKey(config.seed), inp.shape, inp.dtype
                )

        init_pos = jnp.broadcast_to(
            statics.init_pos_nx3[None], (bsz,) + statics.init_pos_nx3.shape
        )
        pos_mask = jnp.broadcast_to(
            statics.pos_mask_nx3[None], (bsz,) + statics.pos_mask_nx3.shape
        )
        pyr_pos, pyr_occ = model.apply(
            variables, inp, train=False, method=model.encode
        )
        adj, lat_res = adjacency_for(statics, config, lattice_offsets)
        _, tet_pos, _ = model.apply(
            variables, init_pos, pyr_pos, pos_mask,
            train=False, adj=adj, lattice_res=lat_res, cam_bx4x4=cam,
            method=model.decode_pos,
        )
        soa = tet_soa_for(tet_pos, statics, config, tet_lattice)
        centers_soa = tet_centers_soa(soa)

        # ---- full-grid occupancy + threshold ---------------------------
        logits = decode_occ_full_grid(
            model, variables, centers_soa, pyr_occ,
            chunk=min(100_000, statics.n_tets), cam=cam,
        )
        pred_occ = (jax.nn.sigmoid(logits) > config.occ_threshold).astype(
            jnp.float32
        )

        # ---- predicted surface -----------------------------------------
        faces_b, mask_b = boundary_faces_from_occupancy(
            pred_occ, statics.face_fx3, statics.face_tet_fx2
        )
        budget = config.resolved_max_boundary_faces() or faces_b.shape[1]
        work_faces, work_mask = select_boundary_subset(
            faces_b, mask_b, budget
        )
        bidx = jnp.arange(bsz)[:, None, None]
        face_pos = tet_pos[bidx, work_faces]  # (B, K, 3, 3)

        # ---- occupancy IoU on SDF sample points (eval.py:239-241) ------
        sdf_pts = batch["sdf_points"]
        gt_inside = (batch["sdf"] > 0).astype(jnp.float32)
        cond = points_in_tets_soa(soa, sdf_pts)
        pred_inside = paste_occupancy(pred_occ, cond) * (cond >= 0)
        occ_iou = jax.vmap(lambda p, t: iou(p, t, thresh=0.5))(
            pred_inside, gt_inside
        )
        # Reference-parity selection metric: paste the occupancy
        # *probability* onto the SDF points and sweep IoU over the
        # threshold list [0.1..0.5]; max over thresholds drives
        # best-checkpoint selection (train_multigpu.py:103,385-413).
        prob_at_pts = paste_occupancy(jax.nn.sigmoid(logits), cond) * (
            cond >= 0
        )
        sweep = {
            f"val_iou_{t:.1f}": jnp.mean(
                jax.vmap(lambda p, g, t=t: iou(p, g, thresh=t))(
                    prob_at_pts, gt_inside
                )
            )
            for t in (0.1, 0.2, 0.3, 0.4, 0.5)
        }
        val_iou_max = jnp.stack(list(sweep.values())).max()

        # ---- surface metrics -------------------------------------------
        # Reference parity needs ~100k points per side (eval.py:244):
        # point-to-point F-score/Chamfer have a sampling-density floor
        # (two 5k samplings of the SAME mesh: F@0.01=0.48), so the count
        # is a measurement parameter, not a speed knob.
        n_res = config.eval_points or config.num_sample_points
        gt_face_mask = (
            jnp.arange(batch["faces"].shape[1])[None, :]
            < batch["n_faces"][:, None]
        ).astype(jnp.float32)
        k_pred, k_gt = jax.random.split(rng)
        pred_pts = sample_mesh_points(k_pred, face_pos, work_mask, n_res)
        if n_res <= surface.shape[1]:
            gt_pts = surface[:, :n_res]
        else:
            # budget exceeds the shard's pre-sampled points: resample the
            # GT watertight mesh directly (same area-weighted sampler the
            # offline pipeline / kaolin sample_points use)
            gt_tri = batch["verts"][
                jnp.arange(bsz)[:, None, None],
                batch["faces"].astype(jnp.int32),
            ]
            gt_pts = sample_mesh_points(k_gt, gt_tri, gt_face_mask, n_res)
        fs = f_score(gt_pts, pred_pts, radius=0.01)
        fs_ext = f_score(gt_pts, pred_pts, radius=0.01, extend=True)
        ch = chamfer_distance(pred_pts, gt_pts)
        ch_l1 = chamfer_distance_l1(pred_pts, gt_pts)

        # predicted surface as an indexed soup: verts = flattened corners
        kf = face_pos.shape[1]
        pred_verts = face_pos.reshape(bsz, kf * 3, 3)
        pred_faces = jnp.broadcast_to(
            jnp.arange(kf * 3, dtype=jnp.int32).reshape(1, kf, 3),
            (bsz, kf, 3),
        )
        haus_avg, haus_max = hausdorff_distance(
            pred_verts, pred_faces, work_mask,
            batch["verts"], batch["faces"].astype(jnp.int32), gt_face_mask,
            pred_pts, gt_pts,
        )

        return {
            "occ_iou": jnp.mean(occ_iou),
            "val_iou_max": val_iou_max,
            **sweep,
            "f_score": jnp.mean(fs),
            "f_score_extend": jnp.mean(fs_ext),
            "chamfer": jnp.mean(ch),
            "chamfer_l1": jnp.mean(ch_l1),
            "hausdorff": jnp.mean(haus_avg),
            "hausdorff_max": jnp.mean(haus_max),
            "n_boundary": jnp.mean(jnp.sum(mask_b, axis=1)),
            # >0 means the static budget truncated the predicted surface
            # to a spatially biased first-k prefix — raise
            # max_boundary_faces if this shows up in eval reports
            "boundary_overflow": jnp.mean(
                jnp.maximum(jnp.sum(mask_b, axis=1) - budget, 0.0)
            ),
        }

    return jax.jit(infer)
