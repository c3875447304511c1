"""DISN image-branch end-to-end tests (pc_model.py:73-111,213-238 +
train_multigpu.py:99: use_disn trains the network from images + camera
matrices instead of point clouds).

A tiny VGG width + res-4 grid; verifies the image-conditioned train step
runs, the occupancy BCE falls over a few dozen steps, and the full
inference path (threshold sweep + surface metrics) consumes image
batches.
"""

import jax
import numpy as np
import pytest

from deftet_tpu.config import TrainConfig
from deftet_tpu.data import ShapeDataset, batch_iterator, build_dataset
from deftet_tpu.train import Engine

DISN_TINY = dict(
    res=4,
    n_point=128,
    num_sample_points=256,
    occ_sample=128,
    per_face_samples=4,
    batch_size=2,
    encoder_blocks="8,1,8;16,1,4",
    gcn_hidden="16,8",
    pos_mlp_hidden="8",
    occ_mlp_hidden="16,8",
    lr=1e-3,
    epochs=1,
    n_shapes=4,
    use_disn=True,
    disn_width=0.05,
    disn_encoding_dim=64,
    disn_image_size=32,
    disn_local_feature_size=16,
)


@pytest.fixture(scope="module")
def image_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("img_shards")
    paths = build_dataset(
        str(root), n_shapes=4, n_surface=512, n_sdf=256, seed=0, level=1,
        with_images=True,
    )
    ds = ShapeDataset(paths)
    ex = ds[0]
    assert ex["imgs"].shape == (64, 64, 3)
    assert ex["cam_matrix"].shape == (4, 4)
    return ds


@pytest.fixture(scope="module")
def disn_engine(tmp_path_factory):
    cfg = TrainConfig(
        logdir=str(tmp_path_factory.mktemp("disn_exp")), **DISN_TINY
    )
    return Engine(cfg)


def _batches(dataset, cfg, seed=0):
    return batch_iterator(
        dataset, cfg.batch_size, rng=np.random.default_rng(seed)
    )


def test_rendered_image_has_foreground(image_dataset):
    ex = image_dataset[0]
    img = ex["imgs"]
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    # white background + shaded foreground: some pixels must differ
    assert (np.abs(img - 1.0) > 0.05).any(), "image is all background"


def test_camera_projects_mesh_into_frame(image_dataset):
    from deftet_tpu.nn.disn import project_points
    import jax.numpy as jnp

    ex = image_dataset[0]
    verts = ex["verts"][: int(ex["n_verts"])]
    xy = np.asarray(
        project_points(
            jnp.asarray(verts)[None], jnp.asarray(ex["cam_matrix"])[None]
        )
    )[0]
    inside = (np.abs(xy) <= 1.0).all(axis=1).mean()
    assert inside > 0.9, f"only {inside:.0%} of mesh projects into frame"


def test_disn_train_step_and_loss_falls(disn_engine, image_dataset):
    eng = disn_engine
    first = last = None
    for epoch in range(15):
        means = eng.train_epoch(_batches(image_dataset, eng.config, epoch))
        if first is None:
            first = means["occ"]
        last = means["occ"]
        for k, v in means.items():
            assert np.isfinite(v), f"{k} not finite"
    assert last < first, f"DISN occ BCE did not fall: {first} -> {last}"


def test_disn_inference_path(disn_engine, image_dataset):
    means = disn_engine.validate_inference(
        _batches(image_dataset, disn_engine.config)
    )
    assert means is not None
    assert np.isfinite(means["val_iou_max"])
    assert np.isfinite(means["chamfer"])


def test_vgg16_weight_port_roundtrip(tmp_path):
    """Offline torchvision VGG-16 -> DISNEncoder weight port: a synthetic
    state_dict with torchvision's exact keys/shapes maps onto the flax
    tree, and injection changes the encoder output."""
    import torch

    from deftet_tpu.nn.disn import DISNEncoder
    from deftet_tpu.nn.disn_port import load_vgg16_params, inject_vgg16

    # torchvision VGG-16 (config D) state_dict shapes
    conv_ids = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    widths = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    state = {}
    c_in = 3
    g = torch.Generator().manual_seed(0)
    for tid, c_out in zip(conv_ids, widths):
        state[f"features.{tid}.weight"] = torch.randn(
            (c_out, c_in, 3, 3), generator=g
        ) * 0.01
        state[f"features.{tid}.bias"] = torch.zeros(c_out)
        c_in = c_out
    fc_dims = ((4096, 512 * 7 * 7), (4096, 4096), (1000, 4096))
    for tid, (o, i) in zip((0, 3, 6), fc_dims):
        state[f"classifier.{tid}.weight"] = torch.randn(
            (o, i), generator=g
        ) * 0.01
        state[f"classifier.{tid}.bias"] = torch.zeros(o)
    path = tmp_path / "vgg16.pth"
    torch.save(state, path)

    ported = load_vgg16_params(str(path))
    assert ported["Conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert ported["Dense_2"]["kernel"].shape == (4096, 1000)

    enc = DISNEncoder(image_size=32, local_feature_size=8, width=1.0,
                      image_encoding_dim=1000)
    img = jax.numpy.zeros((1, 32, 32, 3)) + 0.5
    variables = enc.init(jax.random.PRNGKey(0), img)
    before, _ = enc.apply(variables, img)
    wrapped = {"params": {"enc": variables["params"]}}
    injected = inject_vgg16(wrapped, ported, encoder="enc")
    after, _ = enc.apply({"params": injected["params"]["enc"]}, img)
    assert before.shape == after.shape == (1, 1000)
    assert not np.allclose(np.asarray(before), np.asarray(after))
