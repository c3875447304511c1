"""Jitted train / eval steps: the full DefTet loss pipeline as one pure fn.

This is the TPU re-architecture of ParallelWrapper.forward (parallel.py:
93-299) + the loss weighting of Engine.train (train_multigpu.py:243-276).
One SPMD program replaces DataParallel scatter/gather: the batch dim is
sharded across the ``data`` mesh axis, everything else is replicated, and
XLA inserts the gradient psum.

Semantics preserved from the reference (file:line cited inline):
  * input noise sigma 0.005 on the first n_point surface points
    (parallel.py:119-127),
  * occupancy ground truth = check_sign of GT mesh at *deformed* tet
    centers (deftet.py:33-49), no gradient,
  * boundary faces from GT center occupancy, orientation flipped when the
    first owner is occupied (deftet.py:186-195),
  * random center subsample for the occupancy BCE (pc_model.py:283-294) —
    one shared index set per step, like the reference's single randperm,
  * loss = lambda_occ * occ + lambda_def * (area*l_area + edge*l_edge +
    lap*l_lap + surf*l_surf + delta*l_delta + normal*l_normal +
    amips*l_amips + chamfer*l_surf_chamfer) (train_multigpu.py:255-270).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.ad_checkpoint import checkpoint_name

from ..config import TrainConfig
from ..evals.metrics import iou
from ..losses import (
    boundary_info_from_occupancy,
    delta_loss,
    occupancy_bce,
    surface_align_losses,
)
from ..losses.geometry import (
    amips_energy_soa,
    edge_length_soa,
    gather_tet_soa,
    tet_centers_soa,
    volume_variance_soa,
)
from ..ops.check_sign import check_sign
from ..ops.voxelize import occupancy_from_grid_soa
from .statics import GridStatics


class TrainState(NamedTuple):
    params: Any        # trainable variables
    batch_stats: Any   # BatchNorm running statistics
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Adam + optional global-norm clip (train_multigpu.py:119-143,275)."""
    chain = []
    if config.grad_norm:
        chain.append(optax.clip_by_global_norm(config.grad_norm_clip))
    decay_steps = getattr(config, "lr_decay_steps", 0)
    if decay_steps > 0:
        lr = optax.cosine_decay_schedule(
            config.lr, decay_steps,
            alpha=getattr(config, "lr_final_scale", 0.1),
        )
    else:
        lr = config.lr
    chain.append(optax.adam(lr))
    return optax.chain(*chain)


def create_train_state(
    model, config: TrainConfig, statics: GridStatics, rng: jax.Array,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Init params on a tiny shape-compatible call + build the optimizer."""
    if getattr(config, "use_disn", False):
        s = config.disn_image_size
        dummy_inp = jnp.zeros((1, s, s, 3), jnp.float32)
    else:
        dummy_inp = jnp.zeros((1, config.n_point, 3), jnp.float32)
    dummy_p = statics.init_pos_nx3[None]
    dummy_c = jnp.zeros((1, 8, 3), jnp.float32)
    # jit the init: flax init traces eagerly otherwise, dispatching every
    # op separately (minutes of round-trips on a remote TPU backend).
    init_fn = jax.jit(
        lambda r, a, b, c: model.init(r, a, b, c, train=False)
    )
    variables = init_fn(rng, dummy_inp, dummy_p, dummy_c)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config)
    opt_state = tx.init(params)
    return (
        TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32)),
        tx,
    )


def _center_subsample_idx(key: jax.Array, n_tets: int, k: int) -> jnp.ndarray:
    """k random tet indices (pc_model.py:283-294 uses randperm; uniform
    sampling WITH replacement is statistically equivalent at k << T and
    avoids a top_k/sort over the full tet axis, which dominates XLA
    compile time at T ~ 10^6)."""
    if k >= n_tets:
        return jnp.arange(n_tets, dtype=jnp.int32)
    return jax.random.randint(key, (k,), 0, n_tets, dtype=jnp.int32)


def _network_forward(
    module, inp, init_pos_bxnx3, tet_tx4, center_idx_k, pos_mask_bxnx3,
    adj, lattice_res: int, train: bool, cam_bx4x4=None,
):
    """Single-apply forward over all submodules (one BatchNorm mutation).

    Mirrors the encode → decode_pos → decode_occ sequence of
    parallel.py:128-220 with the tet-center computation of
    pc_model.py:276-281 inlined.  `adj` arrives as a jit argument so the
    adjacency arrays are not compile-time constants.  `inp` is surface
    points, or images when the module is in DISN mode (then `cam_bx4x4`
    carries the per-view camera matrices).
    """
    pyr_pos, pyr_occ = module.encode(inp, train=train)
    pred_delta, tet_pos, ori_delta = module.decode_pos(
        init_pos_bxnx3, pyr_pos, pos_mask_bxnx3, train=train, adj=adj,
        lattice_res=lattice_res, cam_bx4x4=cam_bx4x4,
    )
    # Subsampled tet centers only — the full (B, T, 4, 3) corner tensor is
    # never materialized (its tiny trailing dims pad ~40x on TPU); the
    # full-grid per-tet work happens outside in SoA form.
    sub_soa = gather_tet_soa(tet_pos, tet_tx4[center_idx_k])
    sub_centers = jnp.stack(tet_centers_soa(sub_soa), axis=-1)  # (B, K, 3)
    logits = module.decode_occ(
        sub_centers, pyr_occ, train=train, cam_bx4x4=cam_bx4x4
    )  # (B, K)
    return pred_delta, tet_pos, logits


def forward_losses(
    model,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    statics: GridStatics,
    config: TrainConfig,
    rng: jax.Array,
    train: bool = True,
    lattice_offsets=None,
    tet_lattice=None,
    face_lattice=None,
):
    """Full forward. Returns ((total, aux-terms), mutated-variables).

    ``face_lattice`` (tetgrid.lattice_faces.FaceLattice) activates the
    shifted-slice boundary/edge fast paths; it requires statics built
    from the class-major lattice topology (build_grid_statics does this
    automatically for regular grids)."""
    k_noise, k_drop, k_centers, k_surf = jax.random.split(rng, 4)
    surface = batch["surface_points"]
    b = surface.shape[0]

    # --- encoder input: n_point surface points (+ noise), or images in
    # DISN mode (parallel.py:118-130's use_point switch) -------------------
    cam = None
    if getattr(config, "use_disn", False):
        inp = batch["imgs"]
        cam = batch["cam_matrix"]
    else:
        inp = surface[:, : config.n_point]
        if config.add_input_noise:
            inp = inp + config.input_noise * jax.random.normal(
                k_noise, inp.shape, inp.dtype
            )

    init_pos = jnp.broadcast_to(
        statics.init_pos_nx3[None], (b,) + statics.init_pos_nx3.shape
    )
    # use_init_pos_mask=False lets box-boundary vertices deform too
    # (config.py use_init_pos_mask; default on, as in the reference).
    mask_src = (
        statics.pos_mask_nx3
        if getattr(config, "use_init_pos_mask", True)
        else jnp.ones_like(statics.pos_mask_nx3)
    )
    pos_mask = jnp.broadcast_to(mask_src[None], (b,) + mask_src.shape)
    n_tets = statics.n_tets
    k = min(config.occ_sample, n_tets)
    center_idx = _center_subsample_idx(k_centers, n_tets, k)

    # Shared lattice-vs-gather dispatch (evals.harness) so train and
    # eval can never diverge on the fast-path condition.
    from ..evals.harness import adjacency_for

    adj, _lat_res = adjacency_for(statics, config, lattice_offsets)
    rngs = {"dropout": k_drop} if train else {}
    out = model.apply(
        variables,
        inp,
        init_pos,
        statics.tet_tx4,
        center_idx,
        pos_mask,
        adj,
        config.res if lattice_offsets is not None else 0,
        train,
        cam,
        method=_network_forward,
        rngs=rngs,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        (pred_delta, tet_pos, logits), mutated = out
    else:
        pred_delta, tet_pos, logits = out
        mutated = {}

    # Full-grid per-tet geometry in SoA form: every array is (B, T) with
    # the big T axis in the TPU lane dimension.  On the regular grid the
    # corners come from shifted slices of the vertex lattice (zero
    # gathers, see gather_tet_soa_lattice); otherwise incidence gathers.
    from ..evals.harness import tet_soa_for

    soa = tet_soa_for(tet_pos, statics, config, tet_lattice)
    cx, cy, cz = tet_centers_soa(soa)

    # --- GT occupancy at deformed tet centers (no grad, deftet.py:33-49).
    # "grid": one trilinear read of the offline occupancy texture (O(T));
    # "check_sign": exact per-step ray parity like the reference (O(T*F)).
    if config.occ_source == "grid" and "occ_grid" in batch:
        center_occ = occupancy_from_grid_soa(
            batch["occ_grid"], cx, cy, cz,
            interp=getattr(config, "occ_grid_interp", "trilinear"),
        )
    else:
        centers = jnp.stack([cx, cy, cz], axis=-1)
        center_occ = check_sign(
            batch["verts"], batch["faces"], centers,
            n_valid_faces=batch["n_faces"],
        )  # (B, T) float {0,1}
    # Named so the remat policy saves the (B, T) labels instead of
    # re-reading the occupancy texture (or re-running check_sign's
    # O(T x F) parity scan) in the backward pass.
    center_occ = checkpoint_name(center_occ, "center_occ")

    # --- geometric regularizers (terms with a zero weight are skipped at
    # trace time — they never enter the compiled program) ------------------
    b_zero = jnp.zeros((b,))
    use_def = config.lambda_def > 0.0

    def want(lam: float) -> bool:
        return use_def and lam != 0.0

    vol = (
        volume_variance_soa(soa, pow=config.pow)
        if want(config.lambda_area) else b_zero
    )
    amips = (
        amips_energy_soa(soa, statics.rest_inverse_tx3x3)
        if want(config.lambda_amips) else b_zero
    )
    edge = (
        edge_length_soa(soa, pow=config.pow)
        if want(config.lambda_edge) else b_zero
    )
    lap = (
        jnp.sum((adj.matmul(pred_delta) - pred_delta) ** 2, axis=(-1, -2))
        if want(config.lambda_lap) else b_zero
    )
    d_loss = delta_loss(pred_delta) if want(config.lambda_delta) else b_zero

    # --- surface alignment over GT-occupancy boundary faces ----------------
    if want(config.lambda_surf) or want(config.lambda_surf_chamfer) or want(
        config.lambda_normal
    ):
        if (
            face_lattice is not None
            and statics.face_fx3.shape[0] == 12 * face_lattice.res**3
        ):
            from ..ops.lattice import lattice_boundary_info

            boundary_mask, boundary_sign = lattice_boundary_info(
                center_occ, face_lattice
            )
        else:
            face_lattice = None  # statics not class-major: gather paths
            boundary_mask, boundary_sign = boundary_info_from_occupancy(
                center_occ, statics.face_tet_fx2
            )
        gt_surface = surface[:, : config.num_sample_points]
        edge_topo = (
            statics.edge_face_idx, statics.edge_face_mask,
            statics.face_edge_ids, statics.vert_face_inc_idx,
            statics.vert_face_inc_mask,
        )
        budget = config.resolved_max_boundary_faces()
        chamfer, analytic, normal = surface_align_losses(
            k_surf, tet_pos, statics.face_fx3, boundary_mask,
            boundary_sign, gt_surface, edge_topo,
            per_face_samples=config.per_face_samples,
            max_boundary_faces=budget,
            with_chamfer=want(config.lambda_surf_chamfer),
            with_analytic=want(config.lambda_surf),
            with_normal=want(config.lambda_normal),
            samples_cap=getattr(config, "chamfer_samples_cap", 0),
            face_lattice=face_lattice,
        )
        if budget > 0:
            # Mean boundary-face count past the static compaction budget
            # (same units as the eval harness's boundary_overflow): >0
            # means the surface losses saw a uniformly truncated first-k
            # subset this step.  budget 0 = no compaction, no overflow.
            n_boundary = jnp.sum(boundary_mask > 0, axis=1)
            boundary_overflow = jnp.mean(
                jnp.maximum(n_boundary - budget, 0).astype(jnp.float32)
            )
        else:
            boundary_overflow = jnp.zeros(())
    else:
        chamfer = analytic = normal = b_zero
        boundary_overflow = None

    # --- occupancy BCE on the subsampled centers ---------------------------
    gt_occ = center_occ[:, center_idx]
    occ = occupancy_bce(logits, gt_occ)

    # --- weighted total (train_multigpu.py:255-270) ------------------------
    terms = {
        "volume": jnp.mean(vol),
        "edge": jnp.mean(edge),
        "lap": jnp.mean(lap),
        "surface_align": jnp.mean(analytic),
        "delta": jnp.mean(d_loss),
        "normal": jnp.mean(normal),
        "amips": jnp.mean(amips),
        "surf_chamfer": jnp.mean(chamfer),
        "occ": occ,
    }
    deform = (
        terms["volume"] * config.lambda_area
        + terms["edge"] * config.lambda_edge
        + terms["lap"] * config.lambda_lap
        + terms["surface_align"] * config.lambda_surf
        + terms["delta"] * config.lambda_delta
        + terms["normal"] * config.lambda_normal
        + terms["amips"] * config.lambda_amips
        + terms["surf_chamfer"] * config.lambda_surf_chamfer
    )
    total = jnp.zeros(())
    if config.lambda_occ > 0.0:
        total = total + occ * config.lambda_occ
    # finetune_occ drops the deform term from the total so only the
    # occupancy objective trains (train_multigpu.py:269; position decoder
    # still receives BCE gradient through the deformed tet centers,
    # exactly like the reference).
    if config.lambda_def > 0.0 and not getattr(config, "finetune_occ", False):
        total = total + deform * config.lambda_def
    terms["occ_iou"] = iou(
        logits, gt_occ, thresh=config.iou_logit_threshold
    )
    if boundary_overflow is not None:
        terms["boundary_overflow"] = boundary_overflow
    return (total, (terms, mutated))


def make_train_step(model, tx, config: TrainConfig, lattice_offsets=None,
                    tet_lattice=None, face_lattice=None):
    """Build the jitted SPMD train step.

    `statics` is a runtime argument, NOT a closure capture: closed-over
    arrays become compile-time constants, and ~100MB of topology constants
    makes XLA compilation pathologically slow at res >= 50.
    donate_argnums=(0,) reuses the state buffers in place.
    """

    accum = max(int(getattr(config, "grad_accum", 1)), 1)

    remat = bool(getattr(config, "remat", False))

    def train_step(state: TrainState, batch, rng, statics: GridStatics):
        def grads_for(params, bstats, mb, mb_rng):
            def loss_fn(params):
                variables = {"params": params}
                if bstats:
                    variables["batch_stats"] = bstats
                total, (terms, mutated) = forward_losses(
                    model, variables, mb, statics, config, mb_rng,
                    train=True, lattice_offsets=lattice_offsets,
                    tet_lattice=tet_lattice, face_lattice=face_lattice,
                )
                return total, (terms, mutated)

            if remat:
                # Save exactly the named no-grad descriptors (argmin
                # indices, compaction selects, occupancy labels): they are
                # KB-to-MB sized, but rebuilding them in the backward
                # re-runs the O(P x M) / O(P x F) scans — the most
                # expensive parts of the forward.  Everything else
                # (activations, geometry SoA) is rematerialized as usual.
                loss_fn = jax.checkpoint(
                    loss_fn,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "nn_argmin_idx", "tri_argmin_idx",
                        "boundary_compact_idx", "boundary_compact_valid",
                        "center_occ",
                    ),
                )
            (total, (terms, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            terms["total"] = total
            return grads, terms, mutated.get("batch_stats", bstats)

        if accum == 1:
            grads, terms, new_stats = grads_for(
                state.params, state.batch_stats, batch, rng
            )
        else:
            # microbatch scan: grads summed in a params-sized accumulator,
            # BatchNorm stats threaded sequentially (the sequential-train
            # semantics); XLA frees each microbatch's activations between
            # scan iterations, so peak memory is the microbatch's.
            micro = jax.tree.map(
                lambda v: v.reshape(
                    (accum, v.shape[0] // accum) + v.shape[1:]
                ),
                batch,
            )

            def body(carry, inp):
                g_acc, bstats = carry
                mb, i = inp
                grads, terms, bstats = grads_for(
                    state.params, bstats, mb, jax.random.fold_in(rng, i)
                )
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, bstats), terms

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, new_stats), terms_stack = jax.lax.scan(
                body, (zeros, state.batch_stats),
                (micro, jnp.arange(accum)),
            )
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            terms = jax.tree.map(lambda t: jnp.mean(t, axis=0), terms_stack)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, new_stats, opt_state, state.step + 1),
            terms,
        )

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, config: TrainConfig, lattice_offsets=None,
                   tet_lattice=None, face_lattice=None):
    """Jitted validation step: loss terms + occupancy IoU, no grad."""

    def eval_step(state: TrainState, batch, rng, statics: GridStatics):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        total, (terms, _) = forward_losses(
            model, variables, batch, statics, config, rng, train=False,
            lattice_offsets=lattice_offsets, tet_lattice=tet_lattice,
            face_lattice=face_lattice,
        )
        terms["total"] = total
        return terms

    return jax.jit(eval_step)
