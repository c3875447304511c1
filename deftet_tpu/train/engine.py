"""Training engine: epoch loop, validation, checkpointing, logging.

TPU re-architecture of Engine (train_multigpu.py:36-466).  Differences by
design, not omission:

  * nn.DataParallel scatter/gather -> one jitted SPMD step over a
    ``jax.sharding.Mesh`` (batch dim sharded on the ``data`` axis,
    params/statics replicated; XLA inserts the gradient psum).
  * ragged GT mesh lists sharded per device (parallel.py:162-171) ->
    statically padded (verts, faces, n_faces) batches that shard like any
    other tensor.
  * tensorboardX scalars -> append-only JSONL metrics file (the experiment
    dir remains the unit of observability, train_multigpu.py:55-57).
  * per-component .pth checkpoints -> one orbax pytree per save with the
    same best-val-IoU selection (train_multigpu.py:415-466).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Experiment, TrainConfig
from ..nn import DeformableTetNetwork, VertexAdjacency
from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import restore_checkpoint, save_checkpoint
from .statics import (
    GridStatics,
    build_grid_statics,
    lattice_offsets,
    lattice_tet_offsets,
)
from .step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def _nullcontext():
    return contextlib.nullcontext()


class Engine:
    """Owns model/state/step-functions for one experiment."""

    def __init__(
        self,
        config: TrainConfig,
        experiment: Optional[Experiment] = None,
        statics: Optional[GridStatics] = None,
        mesh=None,
    ):
        self.config = config
        self.experiment = experiment or Experiment.new(config)
        if statics is not None:
            self.statics = statics
            self._lattice_offsets = None
            self._tet_lattice = None
            self._face_lattice = None
        else:
            from ..tetgrid import build_tet_grid
            from ..tetgrid.lattice_faces import face_lattice_info

            grid = build_tet_grid(config.res)
            self.statics = build_grid_statics(config.res, grid=grid)
            # Regular grid -> stencil fast paths (GCN/Laplacian neighbor
            # mean; slice-based tet-corner reads; class-major boundary /
            # edge-reduction shifts).
            self._lattice_offsets = lattice_offsets(grid)
            self._tet_lattice = lattice_tet_offsets(grid)
            self._face_lattice = face_lattice_info(grid)
        self.mesh = mesh if mesh is not None else make_mesh(
            batch_size=config.batch_size
        )

        adj = VertexAdjacency(
            idx=self.statics.vert_adj_idx,
            mask=self.statics.vert_adj_mask,
            degree=self.statics.vert_degree,
        )
        assert not config.use_graph_attention, (
            "use_graph_attention is asserted off (gcn_decoder.py:267)"
        )
        self.model = DeformableTetNetwork(
            adj=adj,
            blocks=config.parsed_blocks(),
            use_lap_layer=config.use_lap_layer,
            dtype=jnp.bfloat16 if config.precision == "bf16" else None,
            use_two_encoder=config.use_two_encoder,
            scale_pos=config.scale_pos,
            scale_pvcnn=config.scale_pvcnn,
            train_def=config.train_def,
            gcn_hidden=config.parsed_gcn_hidden(),
            pos_mlp_hidden=config.parsed_pos_mlp_hidden(),
            occ_mlp_hidden=config.parsed_occ_mlp_hidden(),
            use_disn=config.use_disn,
            disn_image_size=config.disn_image_size,
            disn_local_feature_size=config.disn_local_feature_size,
            disn_encoding_dim=config.disn_encoding_dim,
            disn_width=config.disn_width,
        )
        rng = jax.random.PRNGKey(config.seed)
        self.state, self.tx = create_train_state(
            self.model, config, self.statics, rng
        )
        if config.pretrain:
            # warm start from another experiment's best checkpoint
            # (train_multigpu.py:145-156) — params + BN stats only, fresh
            # optimizer state.
            from .checkpoint import restore_checkpoint

            # structure-free restore (target=None), then take only
            # params/BN stats — the source run may have used a different
            # optimizer chain, whose opt_state we neither need nor match.
            restored = restore_checkpoint(
                os.path.join(config.pretrain, "ckpt"), "best", target=None
            )
            self.state = TrainState(
                jax.tree.map(
                    lambda cur, new: jnp.asarray(new, cur.dtype),
                    self.state.params, restored["params"],
                ),
                jax.tree.map(
                    lambda cur, new: jnp.asarray(new, cur.dtype),
                    self.state.batch_stats, restored["batch_stats"],
                ),
                self.state.opt_state, self.state.step,
            )
        # Replicate params + statics across the mesh so the sharded batch
        # is the only distributed input.
        self.state = TrainState(*replicate(tuple(self.state), self.mesh))
        self.statics = GridStatics(*replicate(tuple(self.statics), self.mesh))
        self._train_step = make_train_step(
            self.model, self.tx, config,
            lattice_offsets=self._lattice_offsets,
            tet_lattice=self._tet_lattice,
            face_lattice=self._face_lattice,
        )
        self._eval_step = make_eval_step(
            self.model, config, lattice_offsets=self._lattice_offsets,
            tet_lattice=self._tet_lattice,
            face_lattice=self._face_lattice,
        )
        self._infer_step = None  # built lazily (full-grid occ decode)
        self._rng = jax.random.PRNGKey(config.seed + 1)
        from ..utils import TimingRegistry

        self.timing = TimingRegistry(enabled=config.timing)
        self.global_step = 0
        self.best_iou = 0.0
        self.epoch = 0
        self._metrics_path = self.experiment.file_path("metrics.jsonl")

    # ------------------------------------------------------------------ util
    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _log(self, record: Dict) -> None:
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _prep_batch(self, batch: Dict[str, np.ndarray]):
        def numeric(v) -> bool:
            if isinstance(v, (str, list)):
                return False
            dt = getattr(v, "dtype", None)
            return dt is None or np.issubdtype(dt, np.number) or np.issubdtype(
                dt, np.bool_
            )

        return shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if numeric(v)},
            self.mesh,
        )

    # ----------------------------------------------------------------- train
    def train_epoch(self, batches: Iterator[Dict[str, np.ndarray]]) -> Dict:
        """One epoch; returns mean loss terms (train_multigpu.py:161-319)."""
        dev_sums = None  # device-side accumulation: no per-step sync
        n = 0
        t0 = time.perf_counter()
        for batch in batches:
            with self.timing.region(
                "train_step", block_on_fn=lambda: terms["total"]
            ) if self.timing.enabled else _nullcontext():
                state, terms = self._train_step(
                    self.state, self._prep_batch(batch), self._next_rng(),
                    self.statics,
                )
                if self.timing.enabled:
                    float(terms["total"])  # honest sync for timing
            self.state = state
            self.global_step += 1
            n += 1
            want_log = self.global_step % 10 == 0 or n == 1
            want_print = (
                self.config.print_every
                and self.global_step % self.config.print_every == 0
            )
            if want_log or want_print:
                host_terms = {
                    k: float(v) for k, v in terms.items()
                }
                if want_log:
                    self._log(
                        {"kind": "train", "step": self.global_step,
                         **host_terms}
                    )
                if want_print:
                    # step-cadence progress line (train_multigpu.py:302-313)
                    print(
                        f"step {self.global_step} "
                        f"total={host_terms.get('total', 0.0):.4f} "
                        f"occ={host_terms.get('occ', 0.0):.4f} "
                        f"occ_iou={host_terms.get('occ_iou', 0.0):.4f}",
                        flush=True,
                    )
            if (
                self.config.save_vis
                and self.config.save_vis_every
                and self.global_step % self.config.save_vis_every == 0
            ):
                from ..evals.harness import save_predicted_surface_objs

                save_predicted_surface_objs(
                    self.model, self.state, self._prep_batch(batch),
                    self.statics, self.config,
                    self.experiment.file_path(f"vis_{self.global_step}"),
                    lattice_offsets=self._lattice_offsets,
                    tet_lattice=self._tet_lattice,
                )
            # accumulate on device — float(v) here would force a full
            # device sync EVERY step (measured ~2x wall at res-50)
            dev_sums = (
                dict(terms) if dev_sums is None
                else {k: dev_sums[k] + v for k, v in terms.items()}
            )
        self.epoch += 1
        means = {
            k: float(v) / max(n, 1) for k, v in (dev_sums or {}).items()
        }
        means["steps_per_sec"] = n / max(time.perf_counter() - t0, 1e-9)
        return means

    # ------------------------------------------------------------------ eval
    def validate(self, batches: Iterator[Dict[str, np.ndarray]]) -> Dict:
        """Mean validation terms incl. occupancy IoU
        (train_multigpu.py:321-413).  With config.save_vis, dumps the
        first batch's predicted surfaces as OBJs (the --save_vis flow of
        train_multigpu.py:183)."""
        sums: Dict[str, float] = {}
        n = 0
        for batch in batches:
            if n == 0 and self.config.save_vis:
                from ..evals.harness import save_predicted_surface_objs

                save_predicted_surface_objs(
                    self.model, self.state, self._prep_batch(batch),
                    self.statics, self.config,
                    self.experiment.file_path(
                        f"vis_{self.global_step}"
                    ),
                    lattice_offsets=self._lattice_offsets,
                    tet_lattice=self._tet_lattice,
                )
            terms = self._eval_step(
                self.state, self._prep_batch(batch), self._next_rng(),
                self.statics,
            )
            for k, v in terms.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            raise ValueError(
                "validate() received no batches — check that the validation "
                "split has at least batch_size examples"
            )
        means = {k: v / n for k, v in sums.items()}
        self._log({"kind": "val", "step": self.global_step, **means})
        return means

    def validate_inference(self, batches: Iterator[Dict[str, np.ndarray]]):
        """Full-inference-path validation: the reference's selection metric
        (train_multigpu.py:321-413) — occupancy probabilities pasted onto
        SDF sample points, IoU swept over thresholds 0.1-0.5, plus the
        surface metrics.  Returns means incl. ``val_iou_max``; ``None`` if
        the val batches carry no SDF samples."""
        sums: Dict[str, float] = {}
        n = 0
        for batch in batches:
            if "sdf_points" not in batch:
                return None
            if self._infer_step is None:
                from ..evals.harness import make_inference_step

                self._infer_step = make_inference_step(
                    self.model, self.config,
                    lattice_offsets=self._lattice_offsets,
                    tet_lattice=self._tet_lattice,
                )
            terms = self._infer_step(
                self.state, self._prep_batch(batch), self._next_rng(),
                self.statics,
            )
            for k, v in terms.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return None
        means = {k: v / n for k, v in sums.items()}
        self._log({"kind": "val_inference", "step": self.global_step, **means})
        return means

    # ------------------------------------------------------------ checkpoint
    def save(self, best: bool = False) -> None:
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        ckdir = self.experiment.file_path("ckpt")
        save_checkpoint(ckdir, "last", tree)
        if best:
            save_checkpoint(ckdir, "best", tree)
        self.experiment.write_state(
            {
                "epoch": self.epoch,
                "best_iou": self.best_iou,
                "global_step": self.global_step,
            }
        )
        if self.timing.enabled:
            self.timing.save(self.experiment.file_path("timing.json"))

    def restore(self, name: str = "last") -> None:
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        ckdir = self.experiment.file_path("ckpt")
        restored = restore_checkpoint(ckdir, name, target=tree)
        self.state = TrainState(
            restored["params"],
            restored["batch_stats"],
            restored["opt_state"],
            restored["step"],
        )
        st = self.experiment.read_state()
        self.epoch = int(st.get("epoch", 0))
        self.best_iou = float(st.get("best_iou", 0.0))
        self.global_step = int(st.get("global_step", 0))

    # ------------------------------------------------------------------- fit
    def fit(self, train_iter_fn, val_iter_fn, epochs: Optional[int] = None):
        """Full loop with best-IoU checkpoint selection
        (train_multigpu.py:472-501)."""
        epochs = epochs if epochs is not None else self.config.epochs
        history = []
        for _ in range(epochs):
            train_means = self.train_epoch(train_iter_fn())
            record = {"epoch": self.epoch, "train": train_means}
            if self.epoch % self.config.val_every == 0:
                val_means = self.validate(val_iter_fn())
                record["val"] = val_means
                # Selection metric: threshold-swept SDF-point IoU through
                # the full inference path (reference parity); the cheap
                # occ_iou stays as the fallback when no SDF samples exist.
                inf_means = (
                    self.validate_inference(val_iter_fn())
                    if self.config.val_inference else None
                )
                if inf_means is not None:
                    record["val_inference"] = inf_means
                    val_iou = inf_means["val_iou_max"]
                else:
                    val_iou = val_means.get("occ_iou", 0.0)
                is_best = val_iou > self.best_iou
                if is_best:
                    self.best_iou = val_iou
                self.save(best=is_best)
            history.append(record)
        return history
