"""Declarative config + experiment persistence.

TPU-native replacement for the reference's Option/ConfigBuilder/Experiment
stack (config.py:10-614, utils/experiment.py:33-495): a typed dataclass
whose field names mirror the reference's option names, compiled into argparse
(bools expand to ``--x`` / ``--no_x`` pairs exactly like experiment.py:
150-170) and JSON round-tripped into the experiment directory so that eval
can replay a training config (experiment.py:346-372).
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os
import uuid
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # -- grid / model (config.py 'res', pc_model.py:50,86-104) --------------
    res: int = 20
    use_two_encoder: bool = True
    scale_pvcnn: bool = True
    scale_pos: bool = True
    train_def: bool = True
    use_point: bool = True
    # Network dims, ';'/',' encoded for JSON + argparse friendliness.
    # Defaults mirror pc_model.py:50 (PVCNN blocks (ch, reps, voxel_res))
    # and :86-104 (decoder widths; entries < 1 are dropout rates).
    encoder_blocks: str = "64,1,32;128,2,16;512,1,8"
    gcn_hidden: str = "256,256,128"
    pos_mlp_hidden: str = "128,0.2,64"
    occ_mlp_hidden: str = "256,0.2,256,0.2,128,0.2,64"

    # -- input pipeline (parallel.py:119-127, dataloader.py:199-207) -------
    n_point: int = 5000            # encoder input points
    add_input_noise: bool = True   # sigma 0.005
    input_noise: float = 0.005
    batch_size: int = 8
    num_sample_points: int = 5000  # GT surface points used by surface losses

    # -- optimization (train_multigpu.py:119-143) ---------------------------
    lr: float = 1e-3
    # Optional cosine decay lr -> lr * lr_final_scale over lr_decay_steps
    # optimizer updates.  0 decay steps = constant lr (reference parity:
    # the reference's Adam has no schedule, train_multigpu.py:119).
    lr_decay_steps: int = 0
    lr_final_scale: float = 0.1
    epochs: int = 100
    grad_norm: bool = True
    grad_norm_clip: float = 40.0

    # -- loss weights (config.py:116-171) -----------------------------------
    lambda_occ: float = 10.0
    lambda_def: float = 1.0
    lambda_surf: float = 1.0
    lambda_surf_chamfer: float = 1.0
    lambda_normal: float = 100.0
    lambda_edge: float = 0.0
    lambda_delta: float = 10.0
    lambda_amips: float = 10.0
    lambda_lap: float = 10.0
    lambda_area: float = 10000.0
    pow: int = 4

    # -- occupancy decoding (pc_model.py:283-294, parallel.py:150-158) ------
    # GT-occupancy oracle for tet centers: "grid" reads the precomputed
    # occupancy texture (O(T) trilinear sample — the TPU-first default);
    # "check_sign" runs the exact per-step ray-parity test like the
    # reference (O(T * F_gt)).
    occ_source: str = "grid"
    # Texture read mode for occ_source="grid": "nearest" is one gather
    # (the default; labels are thresholded to {0,1} either way),
    # "trilinear" is the 8-corner stencil (sub-half-voxel smoother, ~11%
    # slower full step at res-50).
    occ_grid_interp: str = "nearest"
    # Occupancy-texture resolution baked into dataset shards.  -1 = auto:
    # max(64, 2*res), keeping the texture voxel at or below half the
    # tet-center spacing so near-surface GT labels track exact check_sign
    # at any grid res (at res-70 the old fixed 64^3 voxel was coarser
    # than the tet spacing).
    occ_grid_res: int = -1

    def resolved_occ_grid_res(self) -> int:
        if self.occ_grid_res < 0:
            return max(64, 2 * self.res)
        return self.occ_grid_res
    occ_sample: int = 10000        # random tet centers per step (use_mask)
    # Surface sample count for the inference metrics (F-score / Chamfer /
    # Hausdorff).  0 = num_sample_points (cheap, used for per-validation
    # monitoring during training).  The reference evaluates with 100k
    # points per side (eval.py:244, dataloader.py:68-89); point-to-point
    # metrics have a sampling-density floor (~0.5 sqrt(area/n)), so small
    # counts cap the reportable F-score far below the true surface
    # quality — two independent 5k samplings of the SAME mesh measure
    # F@0.01 = 0.48 / chamfer 0.011, vs 1.0 / 0.0025 at 100k.
    # deftet-eval defaults this to 100_000.
    eval_points: int = 0
    occ_threshold: float = 0.4     # pred_threshold
    iou_logit_threshold: float = 0.1  # parallel.py:238 thresh=.1 on logits

    # -- surface losses ------------------------------------------------------
    per_face_samples: int = 20     # mesh_utils.py:290-299
    # Cap on TOTAL chamfer samples (per batch element): the per-face count
    # shrinks so budget_faces * per_face <= cap.  The chamfer estimator's
    # expectation is per-face-count independent (uniform face x uniform
    # barycentric); the reference's unconditional 20/face costs 800k NN
    # queries vs 5k GT points at res-50.  0 = uncapped (exact reference
    # behavior).
    chamfer_samples_cap: int = 200_000
    # Static budget of boundary faces for the chamfer/analytic/normal
    # surface terms.  -1 = auto (8 r^2, capped at the face count): a
    # closed surface at grid res r has O(r^2) boundary faces — measured
    # steady-state boundary counts are ~5.6 r^2 (res-50 train: 14.0k;
    # res-70 extraction: 28.8k), so 8 r^2 is lossless at convergence
    # while keeping the surface-loss working set ~r times smaller than
    # the full face set; every descriptor-bound site (compaction
    # scatters, the work-pos gather VJP, NN/tri kernel tiles) scales
    # with this budget.  Overflow (early-training noisy occupancy)
    # truncates uniformly and is visible in the `boundary_overflow`
    # metric.  0 = all interior faces (no compaction).
    max_boundary_faces: int = -1

    def resolved_max_boundary_faces(self) -> int:
        if self.max_boundary_faces < 0:
            # cap at an interior-face-count upper bound (2 faces per tet,
            # 6 tets per cell) so the docstring's "capped at the face
            # count" holds even at res 1
            return min(8 * self.res * self.res, 12 * self.res**3)
        return self.max_boundary_faces
    timing: bool = False

    # -- DISN image branch (config.py:465, pc_model.py:73-111) --------------
    # use_disn swaps the PVCNN point encoders for VGG image encoders and
    # the GCN/MLP decoders for DISN global+local SDF decoders; batches
    # must carry `imgs` (B, H, W, 3) + `cam_matrix` (B, 4, 4) row-vector
    # world->screen matrices (the data pipeline renders them offline).
    use_disn: bool = False
    disn_image_size: int = 64      # DISNEncoder(image_size=64)
    disn_local_feature_size: int = 64
    disn_encoding_dim: int = 1000  # VGG classifier width (global feature)
    disn_width: float = 1.0        # VGG width multiplier (1.0 = VGG-16-D)

    # -- lap (refinement) layer (config.py:525-542, pc_model.py:231-254) ----
    # Second position decoder refining the first head's output.  The
    # reference's companion lap_v_loss is identically zero (deftet.py:107)
    # and its train-mode pred_occ is unused; the flags below are accepted
    # for config-replay parity.
    use_lap_layer: bool = False
    lap_threshold: float = 0.4
    lambda_lap_v_loss: float = 10.0

    # -- training schedule extras (train_multigpu.py:145-156, config.py) ----
    pretrain: str = ""             # experiment dir to warm-start params from
    # Gradient accumulation: split the batch into `grad_accum` sequential
    # microbatches inside the jitted step (lax.scan), average grads, one
    # optimizer update.  Peak activation memory drops to the microbatch
    # size: the paper config (res 70, batch 8 — README.md:59, where the
    # reference's DataParallel puts bs-1 on each of 8 GPUs) runs on ONE
    # chip with grad_accum=8.  batch_size must be divisible by it.
    grad_accum: int = 1
    # Rematerialization: wrap the per-(micro)batch loss in jax.checkpoint
    # so the backward pass recomputes activations instead of storing
    # them (~+1 forward of FLOPs for a large activation-memory cut).
    # The alternative memory lever to grad_accum — e.g. the paper config
    # (res 70, batch 8) can run grad_accum=2 + remat instead of
    # grad_accum=8, keeping per-microbatch work wide.
    remat: bool = False
    finetune_occ: bool = False     # drop deform loss from the total; the
    # pos decoder still gets BCE gradient via deformed centers
    # (exact reference behavior, train_multigpu.py:269)
    print_every: int = 1000        # step-cadence stdout metrics
    save_vis_every: int = 10000    # step-cadence OBJ dumps (with save_vis)
    use_init_pos_mask: bool = True  # freeze box-boundary vertices
    use_graph_attention: bool = False  # asserted off (gcn_decoder.py:267)

    # -- runtime -------------------------------------------------------------
    seed: int = 1
    experiment_id: str = ""
    logdir: str = "experiments"
    dataset_root: str = "data_cache"
    # Real-mesh ingestion: when set, train on OBJ meshes under this
    # directory tree (watertighted + sampled offline,
    # dataloader.py:118-207) instead of the procedural shape family.
    mesh_dir: str = ""
    watertight_res: int = 100      # MakeSurfaceMesh voxelization res
    n_shapes: int = 32
    val_every: int = 1
    # Best-checkpoint selection metric: run the full inference path on the
    # val split and select by max IoU over the probability-threshold sweep
    # [0.1..0.5] on SDF sample points (train_multigpu.py:103,385-419).
    # Off -> select by the cheap training-style occ_iou instead.
    val_inference: bool = True
    save_vis: bool = False
    # precision: "bf16" runs encoder/decoder matmuls in bfloat16.
    precision: str = "bf16"

    def parsed_blocks(self):
        return tuple(
            tuple(int(x) for x in group.split(","))
            for group in self.encoder_blocks.split(";")
            if group
        )

    @staticmethod
    def _parse_hidden(spec: str):
        return tuple(
            int(float(x)) if float(x) >= 1 else float(x)
            for x in spec.split(",")
            if x
        )

    def parsed_gcn_hidden(self):
        return self._parse_hidden(self.gcn_hidden)

    def parsed_pos_mlp_hidden(self):
        return self._parse_hidden(self.pos_mlp_hidden)

    def parsed_occ_mlp_hidden(self):
        return self._parse_hidden(self.occ_mlp_hidden)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        raw = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        # Unknown keys are ignored (schema-drift tolerance, the role of the
        # reference's per-option load_value overrides, experiment.py:81).
        return cls(**{k: v for k, v in raw.items() if k in fields})

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_json(f.read())


# Reference options that are argparse-only dead weight THERE too (never
# read by any live code path — baseline switches, DDP/apex stubs, unused
# ablations; SURVEY.md P14).  Accepted and ignored so reference-style
# invocations and saved configs replay cleanly.
REFERENCE_COMPAT_FLAGS = (
    "point_cloud", "loader_workers", "data_root", "shape_train_gt_root",
    "shape_train_ori_gt_root", "dataset_dir", "use_all", "expid", "device",
    "lambda_prob_d", "detach", "sample_box", "z_window_radius",
    "use_surface_prob_loss", "use_old_intersection_test", "use_surface_dis",
    "optimize_network", "upsample", "upsample_layer", "upsample_gt_occ",
    "use_pos_encoding", "use_vert_feat", "use_init_boundary",
    "alternate_training", "def_epochs", "occ_epochs",
    "use_learned_def_mask", "c_dim", "use_vertex_loss", "use_l2_chamfer",
    "occ_detach_def", "use_init_correspondence", "expand_boundary",
    "use_pvcnn_pos_decoder", "use_pvcnn_decoder", "use_gcn_pos_decoder",
    "use_pvcnn_occ_decoder", "use_dvr_pos_decoder", "use_dvr_occ_decoder",
    "baseline", "upscale", "use_apex", "finetune_pos", "full_scene",
    "voxel_baseline", "voxel_baseline_res", "mesh_baseline",
    "meshrcnn_baseline", "disn_baseline", "meshrcnn_threshold",
    "pretrain_voxel", "occnet_baseline", "dmc_baseline", "use_distributed",
    "add_geo_feat", "optimize_part", "use_img_conv", "use_dvr_decoder",
    "use_projection", "train_car", "pretrain_occ", "adaptive_sample",
    "use_occ_encoder", "pos_pretrain_path", "predict_color",
    "resize_input_shape", "resize_local_feature_shape", "local_rank",
    "categories",
)


def add_config_args(
    parser: argparse.ArgumentParser, cls=TrainConfig
) -> argparse.ArgumentParser:
    """Compile the dataclass into argparse flags.

    Bools become ``--name`` / ``--no_name`` pairs with a None default so
    that only explicitly-passed flags override (experiment.py:150-170).
    Reference-only dead flags (REFERENCE_COMPAT_FLAGS) are accepted and
    ignored.
    """
    for f in dataclasses.fields(cls):
        name = f.name
        if f.type == "bool" or isinstance(f.default, bool):
            group = parser.add_mutually_exclusive_group()
            group.add_argument(
                f"--{name}", dest=name, action="store_true", default=None
            )
            group.add_argument(
                f"--no_{name}", dest=name, action="store_false", default=None
            )
        else:
            parser.add_argument(
                f"--{name}", type=type(f.default), default=None
            )
    compat = parser.add_argument_group("reference compatibility (ignored)")
    for name in REFERENCE_COMPAT_FLAGS:
        compat.add_argument(
            f"--{name}", nargs="?", const=True, default=None,
            help=argparse.SUPPRESS,
        )
        compat.add_argument(
            f"--no_{name}", action="store_true", default=None,
            help=argparse.SUPPRESS,
        )
    return parser


def config_from_args(
    args: argparse.Namespace, base: Optional[TrainConfig] = None
) -> TrainConfig:
    cfg = base or TrainConfig()
    for f in dataclasses.fields(TrainConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    return cfg


class Experiment:
    """Timestamped experiment directory with config + state persistence.

    Mirrors utils/experiment.py:281-495: ``new`` creates
    ``{logdir}/{timestamp}_{id}/`` holding ``config.json`` plus an
    append-only ``state.json`` (epoch / best metric / global step); ``load``
    replays a saved config for eval.
    """

    CONFIG = "config.json"
    STATE = "state.json"

    def __init__(self, path: str, config: TrainConfig):
        self.path = path
        self.config = config

    @classmethod
    def new(cls, config: TrainConfig) -> "Experiment":
        ident = config.experiment_id or uuid.uuid4().hex[:8]
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        path = os.path.join(config.logdir, f"{stamp}_{ident}")
        os.makedirs(path, exist_ok=True)
        config.save(os.path.join(path, cls.CONFIG))
        exp = cls(path, config)
        exp.write_state({"epoch": 0, "best_iou": 0.0, "global_step": 0})
        return exp

    @classmethod
    def load(cls, path: str) -> "Experiment":
        config = TrainConfig.load(os.path.join(path, cls.CONFIG))
        return cls(path, config)

    def file_path(self, name: str) -> str:
        return os.path.join(self.path, name)

    def write_state(self, state: dict) -> None:
        with open(self.file_path(self.STATE), "w") as f:
            json.dump(state, f, indent=2)

    def read_state(self) -> dict:
        with open(self.file_path(self.STATE)) as f:
            return json.load(f)
