"""End-to-end training-slice tests (SURVEY.md §7 build step 5).

A tiny procedural shape + res-4 grid + mini network; verifies on the
8-virtual-device CPU mesh that:
  * the jitted SPMD train step runs and every loss term is finite,
  * total loss and occupancy BCE decrease over a few dozen steps,
  * occupancy IoU rises above its initial value,
  * checkpoint save/restore round-trips the state,
  * the same step executes with batch dim sharded across all 8 devices.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deftet_tpu.config import Experiment, TrainConfig
from deftet_tpu.data import ShapeDataset, batch_iterator, build_dataset
from deftet_tpu.train import Engine

TINY = dict(
    res=4,
    n_point=128,
    num_sample_points=256,
    occ_sample=128,
    per_face_samples=4,
    batch_size=2,
    encoder_blocks="8,1,8;16,1,4",
    gcn_hidden="16,16,8",
    pos_mlp_hidden="8",
    occ_mlp_hidden="16,0.2,8",
    lr=1e-3,
    epochs=1,
    n_shapes=4,
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    paths = build_dataset(
        str(root), n_shapes=4, n_surface=512, n_sdf=256, seed=0, level=1
    )
    return ShapeDataset(paths)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    logdir = tmp_path_factory.mktemp("exp")
    cfg = TrainConfig(logdir=str(logdir), **TINY)
    return Engine(cfg)


def _batches(dataset, cfg, seed=0):
    return batch_iterator(
        dataset, cfg.batch_size, rng=np.random.default_rng(seed)
    )


def test_train_step_runs_and_losses_finite(engine, tiny_dataset):
    batch = next(_batches(tiny_dataset, engine.config))
    state, terms = engine._train_step(
        engine.state, engine._prep_batch(batch), jax.random.PRNGKey(0),
        engine.statics,
    )
    engine.state = state
    for k, v in terms.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(terms["total"]) > 0.0
    # surface losses on by default -> the compaction-budget overflow
    # fraction is reported (and a tiny grid never overflows 8 r^2)
    assert float(terms["boundary_overflow"]) == 0.0


def test_loss_decreases_and_iou_rises(engine, tiny_dataset):
    cfg = engine.config
    first, last = None, None
    first_iou, last_iou = None, None
    for epoch in range(30):
        means = engine.train_epoch(_batches(tiny_dataset, cfg, seed=epoch))
        if first is None:
            first, first_iou = means["occ"], means["occ_iou"]
        last, last_iou = means["occ"], means["occ_iou"]
    assert last < first, f"occ BCE did not decrease: {first} -> {last}"
    assert last_iou >= first_iou, f"IoU fell: {first_iou} -> {last_iou}"
    # the occupancy head must be learning something non-trivial
    assert last_iou > 0.3, f"final IoU too low: {last_iou}"


def test_validate_and_metrics_log(engine, tiny_dataset):
    means = engine.validate(_batches(tiny_dataset, engine.config))
    assert "occ_iou" in means and np.isfinite(means["occ_iou"])
    with open(engine._metrics_path) as f:
        lines = [json.loads(ln) for ln in f]
    assert any(rec["kind"] == "val" for rec in lines)
    assert any(rec["kind"] == "train" for rec in lines)


def test_checkpoint_round_trip(engine, tiny_dataset):
    engine.best_iou = 0.5
    engine.save(best=True)
    params_before = jax.tree_util.tree_map(
        np.asarray, engine.state.params
    )
    # perturb then restore
    engine.state = engine.state._replace(
        params=jax.tree_util.tree_map(lambda x: x * 0.0, engine.state.params)
    )
    engine.restore("best")
    params_after = jax.tree_util.tree_map(np.asarray, engine.state.params)
    flat_b = jax.tree_util.tree_leaves(params_before)
    flat_a = jax.tree_util.tree_leaves(params_after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(b, a)
    assert engine.best_iou == 0.5


def test_data_parallel_8_devices(tiny_dataset, tmp_path):
    """Same step, batch sharded over all 8 virtual devices."""
    assert jax.device_count() == 8
    cfg = TrainConfig(
        logdir=str(tmp_path), **{**TINY, "batch_size": 8}
    )
    eng = Engine(cfg)
    items = [tiny_dataset[i % len(tiny_dataset)] for i in range(8)]
    batch = {
        k: np.stack([it[k] for it in items]) for k in items[0]
    }
    sharded = eng._prep_batch(batch)
    # verify the batch really is sharded across devices
    sp = sharded["surface_points"]
    assert len(sp.sharding.device_set) == 8
    state, terms = eng._train_step(
        eng.state, sharded, jax.random.PRNGKey(0), eng.statics
    )
    assert np.isfinite(float(terms["total"]))


def _stacked_batch(dataset, n):
    items = [dataset[i % len(dataset)] for i in range(n)]
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _engines_on_meshes(tiny_dataset, tmp_path, meshes, batch_size,
                       **cfg_over):
    """Engines with identical params (same seed) on different meshes."""
    engines = []
    for i, mesh in enumerate(meshes):
        cfg = TrainConfig(
            logdir=str(tmp_path / f"m{i}"), seed=7,
            **{**TINY, "batch_size": batch_size, **cfg_over},
        )
        engines.append(Engine(cfg, mesh=mesh))
    return engines


def _loss_and_grads(e, batch, rng):
    """Loss terms + gradient pytree of the full training objective, run
    as one jitted SPMD program on the engine's mesh (batch sharded,
    params replicated — the layout `make_train_step` uses)."""
    from deftet_tpu.train.step import forward_losses

    def loss_fn(params):
        variables = {"params": params}
        if e.state.batch_stats:
            variables["batch_stats"] = e.state.batch_stats
        total, (terms, _) = forward_losses(
            e.model, variables, batch, e.statics, e.config, rng,
            train=True, lattice_offsets=e._lattice_offsets,
            tet_lattice=e._tet_lattice, face_lattice=e._face_lattice,
        )
        return total, terms

    (total, terms), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(e.state.params)
    terms = dict(terms)
    terms["total"] = total
    return terms, grads


def _assert_grads_close(g_ref, g_test, rtol, atol):
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_test = jax.tree_util.tree_leaves(g_test)
    assert len(flat_ref) == len(flat_test) and flat_ref
    for (path, a), b in zip(flat_ref, flat_test):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=rtol, atol=atol,
            err_msg=f"grad {jax.tree_util.keystr(path)} diverges",
        )


def test_sharded_equals_single_device(tiny_dataset, tmp_path):
    """The correctness contract of data parallelism: the SAME batch with
    the SAME rng produces the same losses and the same gradients on
    1 device as on the 8-device data mesh (the implicit NCCL-allreduce
    contract of train_multigpu.py:136-140).  f32 so the only differences
    are collective reduction order.  Gradients — not post-Adam params —
    are the contract: Adam's first-step normalization rescales every
    element to ~lr, amplifying reduction-order noise on near-zero
    gradient elements to full lr-sized param differences."""
    from jax.sharding import Mesh

    assert jax.device_count() == 8
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    mesh8 = Mesh(np.asarray(jax.devices()), ("data",))
    e1, e8 = _engines_on_meshes(
        tiny_dataset, tmp_path, [mesh1, mesh8], batch_size=8,
        precision="f32",
    )
    batch = _stacked_batch(tiny_dataset, 8)
    rng = jax.random.PRNGKey(3)

    b8 = e8._prep_batch(batch)
    assert len(b8["surface_points"].sharding.device_set) == 8

    t1, g1 = _loss_and_grads(e1, e1._prep_batch(batch), rng)
    t8, g8 = _loss_and_grads(e8, b8, rng)

    for k in t1:
        np.testing.assert_allclose(
            float(t1[k]), float(t8[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"loss term {k} diverges between 1 and 8 devices",
        )
    _assert_grads_close(g1, g8, rtol=2e-3, atol=1e-5)


def test_2d_mesh_equals_1d_mesh(tiny_dataset, tmp_path):
    """A 2-D (data x space) mesh — surface-point axis sharded on `space`
    — must reduce to the same losses/gradients as the 1-D data mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh1d = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    mesh2d = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "space"))
    e1, e2 = _engines_on_meshes(
        tiny_dataset, tmp_path, [mesh1d, mesh2d], batch_size=4,
        precision="f32",
    )
    batch = _stacked_batch(tiny_dataset, 4)
    rng = jax.random.PRNGKey(5)

    b1 = e1._prep_batch(batch)
    b2 = e2._prep_batch(batch)
    b2["surface_points"] = jax.device_put(
        b2["surface_points"], NamedSharding(mesh2d, P("data", "space", None))
    )
    t1, g1 = _loss_and_grads(e1, b1, rng)
    t2, g2 = _loss_and_grads(e2, b2, rng)
    for k in t1:
        np.testing.assert_allclose(
            float(t1[k]), float(t2[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"loss term {k} diverges between 1-D and 2-D meshes",
        )
    _assert_grads_close(g1, g2, rtol=2e-3, atol=1e-5)


def test_sharded_training_loss_decreases(tiny_dataset, tmp_path):
    """~20 pjit steps on the full 8-device 2-D (data x space) mesh must
    actually LEARN (total loss + occ BCE drop) — gradient equality at
    one point (the tests above) doesn't prove the optimizer/collective
    wiring holds up over a trajectory (round-4 verdict ask #8)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.device_count() == 8
    mesh2d = Mesh(np.asarray(jax.devices()).reshape(4, 2),
                  ("data", "space"))
    (eng,) = _engines_on_meshes(
        tiny_dataset, tmp_path, [mesh2d], batch_size=4
    )
    batch = _stacked_batch(tiny_dataset, 4)
    first = last = first_occ = last_occ = None
    for i in range(20):
        b = eng._prep_batch(batch)
        b["surface_points"] = jax.device_put(
            b["surface_points"],
            NamedSharding(mesh2d, P("data", "space", None)),
        )
        eng.state, terms = eng._train_step(
            eng.state, b, jax.random.PRNGKey(i), eng.statics
        )
        tot, occ = float(terms["total"]), float(terms["occ"])
        assert np.isfinite(tot)
        if first is None:
            first, first_occ = tot, occ
        last, last_occ = tot, occ
    assert last < first, f"total did not decrease: {first} -> {last}"
    assert last_occ < first_occ, (
        f"occ BCE did not decrease: {first_occ} -> {last_occ}"
    )


def test_sharded_equivalence_default_precision(tiny_dataset, tmp_path):
    """Same contract at the shipping bf16 config, at bf16 tolerance."""
    from jax.sharding import Mesh

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    mesh8 = Mesh(np.asarray(jax.devices()), ("data",))
    e1, e8 = _engines_on_meshes(
        tiny_dataset, tmp_path, [mesh1, mesh8], batch_size=8,
    )
    batch = _stacked_batch(tiny_dataset, 8)
    rng = jax.random.PRNGKey(3)
    _, t1 = e1._train_step(e1.state, e1._prep_batch(batch), rng, e1.statics)
    _, t8 = e8._train_step(e8.state, e8._prep_batch(batch), rng, e8.statics)
    for k in t1:
        np.testing.assert_allclose(
            float(t1[k]), float(t8[k]), rtol=2e-2, atol=1e-4,
            err_msg=f"loss term {k} diverges (bf16 config)",
        )


def test_save_vis_during_validation(tiny_dataset, tmp_path):
    cfg = TrainConfig(
        logdir=str(tmp_path), save_vis=True, max_boundary_faces=64, **TINY
    )
    eng = Engine(cfg)
    eng.validate(_batches(tiny_dataset, cfg))
    import glob

    objs = glob.glob(eng.experiment.file_path("vis_*.obj"))
    assert len(objs) == cfg.batch_size
    from deftet_tpu.utils import load_obj

    verts, faces = load_obj(objs[0])
    assert verts.shape[1] == 3


def test_pretrain_warm_start_and_finetune_occ(tmp_path, tiny_dataset):
    """--pretrain warm-starts params from another experiment's best
    checkpoint (train_multigpu.py:145-156); --finetune_occ drops the
    deform term from the total (train_multigpu.py:269)."""
    kw = dict(TINY, logdir=str(tmp_path))
    cfg1 = TrainConfig(experiment_id="src", **kw)
    e1 = Engine(cfg1)
    batch = next(_batches(tiny_dataset, cfg1))
    e1.train_epoch(iter([batch]))
    e1.best_iou = 1.0
    e1.save(best=True)

    cfg2 = TrainConfig(
        experiment_id="warm", pretrain=e1.experiment.path, **kw
    )
    e2 = Engine(cfg2)
    # warm-started params equal the source's trained params
    p1 = jax.tree_util.tree_leaves(e1.state.params)
    p2 = jax.tree_util.tree_leaves(e2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    cfg3 = TrainConfig(experiment_id="ft", finetune_occ=True, **kw)
    e3 = Engine(cfg3)
    _, terms = e3._train_step(
        e3.state, e3._prep_batch(batch), jax.random.PRNGKey(0), e3.statics
    )
    # total excludes the deform terms: equals lambda_occ * occ only
    np.testing.assert_allclose(
        float(terms["total"]), cfg3.lambda_occ * float(terms["occ"]),
        rtol=1e-5,
    )


def test_2d_mesh_data_space_sharding(tiny_dataset, tmp_path):
    """Train step over a 2-D (data, space) mesh: batch on `data`, the
    surface-point sample axis on `space` (the workload's second parallel
    axis — XLA inserts the reduction collectives)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.device_count() == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "space"))
    cfg = TrainConfig(logdir=str(tmp_path), **{**TINY, "batch_size": 4})
    eng = Engine(cfg, mesh=mesh)
    items = [tiny_dataset[i % len(tiny_dataset)] for i in range(4)]
    batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
    sharded = eng._prep_batch(batch)
    sharded["surface_points"] = jax.device_put(
        sharded["surface_points"],
        NamedSharding(mesh, P("data", "space", None)),
    )
    assert len(sharded["surface_points"].sharding.device_set) == 8
    state, terms = eng._train_step(
        eng.state, sharded, jax.random.PRNGKey(0), eng.statics
    )
    for k, v in terms.items():
        assert np.isfinite(float(v)), k


def test_grad_accum_step(tiny_dataset, tmp_path):
    """grad_accum=2 microbatch scan: runs, finite terms, params update,
    and the optimizer applies ONE update for the whole batch."""
    cfg = TrainConfig(
        logdir=str(tmp_path), experiment_id="ga", grad_accum=2, **TINY
    )
    eng = Engine(cfg)
    batch = next(_batches(tiny_dataset, cfg))
    before = jax.tree_util.tree_map(np.asarray, eng.state.params)
    state, terms = eng._train_step(
        eng.state, eng._prep_batch(batch), jax.random.PRNGKey(0),
        eng.statics,
    )
    for k, v in terms.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state.step) == 1
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(before),
            jax.tree_util.tree_leaves(state.params),
        )
    )
    assert changed, "params did not update under grad accumulation"


def test_remat_step_matches_plain(tiny_dataset, tmp_path):
    """remat=True (jax.checkpoint with the save_only_these_names policy
    keeping argmin/compaction descriptors) must be a pure memory/time
    trade: identical loss terms and identical post-step params vs the
    plain step at f32 tolerance."""
    outs = []
    for remat in (False, True):
        cfg = TrainConfig(
            logdir=str(tmp_path), experiment_id=f"remat{int(remat)}",
            remat=remat, **TINY
        )
        eng = Engine(cfg)
        batch = next(_batches(tiny_dataset, cfg))
        state, terms = eng._train_step(
            eng.state, eng._prep_batch(batch), jax.random.PRNGKey(0),
            eng.statics,
        )
        outs.append((
            {k: float(v) for k, v in terms.items()},
            jax.tree_util.tree_map(np.asarray, state.params),
        ))
    (terms_a, params_a), (terms_b, params_b) = outs
    for k in terms_a:
        assert np.isclose(terms_a[k], terms_b[k], rtol=1e-5, atol=1e-6), (
            f"{k}: {terms_a[k]} vs {terms_b[k]}"
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(params_a),
        jax.tree_util.tree_leaves(params_b),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_validate_inference_threshold_sweep(engine, tiny_dataset):
    """Reference-parity selection metric: probability-pasted SDF IoU swept
    over thresholds 0.1-0.5 with val_iou_max = max over the sweep
    (train_multigpu.py:103,385-413)."""
    means = engine.validate_inference(_batches(tiny_dataset, engine.config))
    assert means is not None
    sweep_keys = [f"val_iou_{t:.1f}" for t in (0.1, 0.2, 0.3, 0.4, 0.5)]
    for k in sweep_keys:
        assert k in means and np.isfinite(means[k]), k
    assert "val_iou_max" in means
    assert means["val_iou_max"] >= max(means[k] for k in sweep_keys) - 1e-6
    # fed from the same harness as deftet-eval: surface metrics present
    assert "chamfer" in means and "boundary_overflow" in means


def test_train_cli_writes_split_manifest(tmp_path):
    """deftet-train persists split.json; deftet-eval consumes it."""
    from deftet_tpu.cli import train_main

    logdir, dataroot = str(tmp_path / "exp"), str(tmp_path / "data")
    rc = train_main([
        "--res", "4", "--batch_size", "2", "--n_point", "128",
        "--num_sample_points", "256", "--occ_sample", "128",
        "--per_face_samples", "4", "--encoder_blocks", "8,1,8;16,1,4",
        "--gcn_hidden", "16,8", "--pos_mlp_hidden", "8",
        "--occ_mlp_hidden", "16,8", "--epochs", "1", "--n_shapes", "4",
        "--dataset_root", dataroot, "--logdir", logdir,
    ])
    assert rc == 0
    import glob
    import os

    exp_dirs = glob.glob(os.path.join(logdir, "*"))
    assert len(exp_dirs) == 1
    with open(os.path.join(exp_dirs[0], "split.json")) as f:
        manifest = json.load(f)
    assert manifest["val"] and manifest["train"]
    for p in manifest["val"] + manifest["train"]:
        assert os.path.exists(p)
    # metrics log carries the full-inference validation record
    with open(os.path.join(exp_dirs[0], "metrics.jsonl")) as f:
        kinds = {json.loads(ln)["kind"] for ln in f}
    assert "val_inference" in kinds


def test_lr_cosine_decay_schedule():
    """lr_decay_steps > 0 switches Adam onto a cosine schedule ending at
    lr * lr_final_scale; default config stays constant-lr (parity)."""
    import optax

    from deftet_tpu.config import TrainConfig
    from deftet_tpu.train.step import make_optimizer

    cfg = TrainConfig(lr=1e-3, lr_decay_steps=100, lr_final_scale=0.1)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}

    def first_update_size(tx, state):
        updates, _ = tx.update(grads, state, params)
        return float(jnp.abs(updates["w"][0]))

    # step the schedule to the end: update magnitude shrinks ~10x
    early = first_update_size(tx, state)
    for _ in range(100):
        _, state = tx.update(grads, state, params)
    late = first_update_size(tx, state)
    assert late < early * 0.2, (early, late)

    cfg0 = TrainConfig(lr=1e-3)
    tx0 = make_optimizer(cfg0)
    s0 = tx0.init(params)
    e0 = first_update_size(tx0, s0)
    for _ in range(100):
        _, s0 = tx0.update(grads, s0, params)
    l0 = first_update_size(tx0, s0)
    assert abs(l0 - e0) / e0 < 0.5, (e0, l0)
