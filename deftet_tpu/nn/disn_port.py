"""Offline VGG-16 weight port: torchvision state_dict -> DISNEncoder params.

The reference initializes its VGG16WithFeatures from torchvision's
imagenet-pretrained VGG-16 (layers/disn.py:30-84,
``use_pretrained_image_encoder=True``).  This environment has no network
egress, so no weights ship with the framework — this module ports them
OFFLINE from a user-supplied checkpoint:

    # anywhere with torchvision:
    #   import torch, torchvision
    #   torch.save(torchvision.models.vgg16(weights="IMAGENET1K_V1")
    #              .state_dict(), "vgg16.pth")
    from deftet_tpu.nn.disn_port import load_vgg16_params
    params = load_vgg16_params("vgg16.pth")        # flax param pytree
    variables = inject_vgg16(variables, params, encoder="encoder_pos")

Layout conversion: torch Conv2d weights are (out, in, kh, kw) -> flax
(kh, kw, in, out); Linear weights are (out, in) -> (in, out).  Only the
13 conv layers + 3 classifier Dense layers map; requires disn_width=1.0
and disn_encoding_dim=1000 (the torchvision head).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# torchvision vgg16 state_dict conv indices for configuration D
_TORCH_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_TORCH_FC_IDS = (0, 3, 6)


def load_vgg16_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-saved VGG-16 state_dict into numpy (CPU torch)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in state.items()}


def vgg16_flax_params(state: Dict[str, np.ndarray]) -> Dict:
    """Map a torchvision VGG-16 state_dict to VGG16Features' param tree.

    Returns {'Conv_0': {'kernel', 'bias'}, ..., 'Dense_0': ..., 'Dense_2'}
    matching flax's auto-naming of nn.Conv / nn.Dense in VGG16Features
    (13 convs then 3 denses, in call order).
    """
    params: Dict = {}
    for i, tid in enumerate(_TORCH_CONV_IDS):
        w = state[f"features.{tid}.weight"]      # (out, in, kh, kw)
        b = state[f"features.{tid}.bias"]
        params[f"Conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": b.astype(np.float32),
        }
    for i, tid in enumerate(_TORCH_FC_IDS):
        w = state[f"classifier.{tid}.weight"]    # (out, in)
        b = state[f"classifier.{tid}.bias"]
        params[f"Dense_{i}"] = {
            "kernel": np.ascontiguousarray(w.T).astype(np.float32),
            "bias": b.astype(np.float32),
        }
    return params


def load_vgg16_params(path: str) -> Dict:
    return vgg16_flax_params(load_vgg16_state_dict(path))


def inject_vgg16(variables: Dict, vgg_params: Dict,
                 encoder: str = "encoder_pos") -> Dict:
    """Return a copy of `variables` with the named DISN encoder's
    VGG16Features params replaced by the ported weights.

    Shapes are validated against the existing tree — a width-scaled
    (disn_width != 1) or non-1000-dim encoder raises."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    try:
        vgg = params[encoder]["VGG16Features_0"]
    except KeyError as e:
        raise KeyError(
            f"no VGG tree under params[{encoder!r}] — is use_disn on?"
        ) from e
    for layer, tree in vgg_params.items():
        if layer not in vgg:
            raise KeyError(f"{layer} missing in model (width-scaled VGG?)")
        for name, arr in tree.items():
            want = vgg[layer][name].shape
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"{encoder}.{layer}.{name}: checkpoint {arr.shape} "
                    f"!= model {want} (need disn_width=1.0, "
                    f"disn_encoding_dim=1000)"
                )
            vgg[layer][name] = arr
    out = dict(variables)
    out["params"] = params
    return out
