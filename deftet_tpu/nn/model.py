"""DeformableTetNetwork: encoder(s) + position decoder + occupancy decoder.

Re-architecture of layers/pc_model.py:19-366.  Differences from the
reference are layout-only (channels-last, padded-gather adjacency); the
computational contract is preserved:

  * encode        — PVCNN voxel-feature pyramid per encoder; the paper
                    config uses two independent encoders (pos / occ)
                    (pc_model.py:54-65, use_two_encoder).
  * sample_grid_features — trilinear feature probe of every pyramid level at
                    p + 0.5 scaled to each resolution (sample_f, :182-194).
  * decode_pos    — features ++ xyz -> GCNMLPDecoder -> x0.1 ->
                    optional sigmoid squash to (-0.1, 0.1) (scale_pos) ->
                    boundary mask -> p + delta (:196-256).
  * decode_occ    — tet-center features -> MLP -> Bernoulli logits
                    (:269-314).  Center subsampling is the caller's job
                    (train step passes pre-gathered centers), keeping this
                    module shape-static.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.voxelize import trilinear_devoxelize
from .gcn import GCNMLPDecoder, VertexAdjacency
from .mlp import MLPDecoder
from .pvcnn import DEFAULT_BLOCKS, PVCNNEncoder


def sample_grid_features(
    point_pos_bxnx3: jnp.ndarray, pyramid: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Probe every voxel-pyramid level at the given points (sample_f).

    Points live in [-0.5, 0.5]; each level of resolution r is sampled at
    clamp((p + 0.5) * r, 0, r - 1) with border trilinear interpolation —
    exactly the grid_sample path of pc_model.py:182-194.
    """
    p01 = point_pos_bxnx3 + 0.5
    feats = []
    for level in pyramid:
        r = level.shape[1]
        coords = jnp.clip(p01 * r, 0.0, r - 1.0)
        feats.append(trilinear_devoxelize(level, coords))
    return jnp.concatenate(feats, axis=-1)


def _lattice_interp_matrix(n_axis: int, grid_res: int, vox_res: int):
    """(n_axis, vox_res) trilinear weights of lattice vertex i at voxel
    coordinate clip(i * r / res, 0, r - 1) — identical per axis."""
    import numpy as np

    c = np.clip(
        np.arange(n_axis) * vox_res / float(grid_res), 0.0, vox_res - 1.0
    )
    f = np.floor(c).astype(np.int64)
    t = c - f
    w = np.zeros((n_axis, vox_res), np.float32)
    w[np.arange(n_axis), f] += 1.0 - t
    w[np.arange(n_axis), np.minimum(f + 1, vox_res - 1)] += t
    return jnp.asarray(w)


def sample_grid_features_lattice(
    pyramid: Sequence[jnp.ndarray], grid_res: int, n_axis: int
) -> jnp.ndarray:
    """Exact sample_grid_features at ALL lattice vertices, as three
    separable interpolation matmuls per pyramid level.

    The tet-grid vertices form a regular (n_axis)^3 lattice, so trilinear
    sampling of an r^3 voxel grid at every vertex is a tensor contraction
    with a tiny dense (n_axis, r) weight matrix per axis — MXU work with a
    matmul transpose for the backward, instead of 10^9-element gathers
    whose scatter-add transpose dominates the step.  Returns
    (B, n_axis^3, sum C) in vertex-lattice order (i*n^2 + j*n + k).
    """
    feats = []
    for level in pyramid:
        r = level.shape[1]
        w = _lattice_interp_matrix(n_axis, grid_res, r)
        y = jnp.einsum("xi,bijkc->bxjkc", w, level)
        y = jnp.einsum("yj,bxjkc->bxykc", w, y)
        y = jnp.einsum("zk,bxykc->bxyzc", w, y)
        feats.append(y.reshape(y.shape[0], n_axis**3, y.shape[-1]))
    return jnp.concatenate(feats, axis=-1)


class DeformableTetNetwork(nn.Module):
    # Static fallback adjacency; pass `adj` to decode_pos/__call__ instead
    # when the arrays should be jit arguments rather than baked-in
    # constants (large grids: constants bloat the HLO and slow compiles).
    adj: Optional[VertexAdjacency] = None
    blocks: Tuple[Tuple[int, int, int], ...] = DEFAULT_BLOCKS
    use_two_encoder: bool = True
    use_lap_layer: bool = False
    scale_pos: bool = True
    scale_pvcnn: bool = True
    train_def: bool = True
    gcn_hidden: Sequence[int] = (256, 256, 128)
    pos_mlp_hidden: Sequence[float] = (128, 0.2, 64)
    occ_mlp_hidden: Sequence[float] = (256, 0.2, 256, 0.2, 128, 0.2, 64)
    # compute dtype for matmuls/convs (params stay float32); None = float32
    dtype: object = None
    # -- DISN image branch (pc_model.py:73-111: point_cloud=False swaps
    # the PVCNN encoders for DISNEncoders and the GCN/MLP decoders for
    # DISNDecoders; features at query points = global image encoding +
    # camera-projected local VGG features + xyz) --------------------------
    use_disn: bool = False
    disn_image_size: int = 64
    disn_local_feature_size: int = 64
    disn_encoding_dim: int = 1000
    disn_width: float = 1.0

    def setup(self):
        if self.use_disn:
            from .disn import DISNDecoder, DISNEncoder

            mk_enc = lambda: DISNEncoder(  # noqa: E731
                image_size=self.disn_image_size,
                local_feature_size=self.disn_local_feature_size,
                image_encoding_dim=self.disn_encoding_dim,
                width=self.disn_width,
            )
            self.encoder_pos = mk_enc()
            if self.use_two_encoder:
                self.encoder_occ = mk_enc()
            self.decoder_pos = DISNDecoder(out_features=3)
            self.decoder_occ = DISNDecoder(out_features=1)
            if self.use_lap_layer:
                self.lap_decoder_pos = DISNDecoder(out_features=3)
            return
        self.encoder_pos = PVCNNEncoder(
            blocks=self.blocks, scale_pvcnn=self.scale_pvcnn,
            dtype=self.dtype,
        )
        if self.use_two_encoder:
            self.encoder_occ = PVCNNEncoder(
                blocks=self.blocks, scale_pvcnn=self.scale_pvcnn,
                dtype=self.dtype,
            )
        self.decoder_pos = GCNMLPDecoder(
            gcn_hidden=tuple(self.gcn_hidden),
            mlp_hidden=tuple(self.pos_mlp_hidden),
            out_dim=3,
            dtype=self.dtype,
        )
        self.decoder_occ = MLPDecoder(
            hidden=tuple(self.occ_mlp_hidden), out_dim=1, dtype=self.dtype
        )
        if self.use_lap_layer:
            # refinement ("laplacian") position decoder (pc_model.py:
            # 231-254): a second GCNMLP head that refines the first
            # decoder's output from features sampled at the UNDEFORMED
            # positions, same x0.1 / sigmoid-scale / mask treatment.
            self.lap_decoder_pos = GCNMLPDecoder(
                gcn_hidden=tuple(self.gcn_hidden),
                mlp_hidden=tuple(self.pos_mlp_hidden),
                out_dim=3,
                dtype=self.dtype,
            )

    def encode(self, inputs, train: bool = True):
        """Returns (pos_encoding, occ_encoding).

        Point branch: `inputs` = (B, N, 3) surface points -> voxel-feature
        pyramids.  DISN branch: `inputs` = (B, H, W, 3) images ->
        (global_feat, local_maps) per encoder (encode_images,
        pc_model.py:164-167)."""
        enc_pos = self.encoder_pos(inputs, train=train) if not self.use_disn \
            else self.encoder_pos(inputs)
        if self.use_two_encoder:
            enc_occ = self.encoder_occ(inputs, train=train) \
                if not self.use_disn else self.encoder_occ(inputs)
        else:
            enc_occ = enc_pos
        return enc_pos, enc_occ

    def _disn_point_delta(self, decoder, p_bxnx3, encoding, cam_bx4x4):
        """DISN per-point prediction: camera-projected local VGG samples +
        global image code + query xyz (the working form of the
        reference's use_disn branch, pc_model.py:213-219 +
        disn.py:279-298's intended _extract_point_image_features)."""
        from .disn import sample_image_features

        global_feat, maps = encoding
        if cam_bx4x4 is None:
            cam_bx4x4 = jnp.broadcast_to(
                jnp.eye(4, dtype=p_bxnx3.dtype)[None],
                (p_bxnx3.shape[0], 4, 4),
            )
        local = sample_image_features(maps, p_bxnx3, cam_bx4x4)
        return decoder(p_bxnx3, global_feat, local)

    def decode_pos(
        self,
        p_bxnx3: jnp.ndarray,
        pyramid: Sequence[jnp.ndarray],
        pos_mask_bxnx3: Optional[jnp.ndarray] = None,
        train: bool = True,
        adj: Optional[VertexAdjacency] = None,
        lattice_res: int = 0,
        cam_bx4x4: Optional[jnp.ndarray] = None,
    ):
        """Returns (pos_delta, tet_pos, ori_pos_delta).

        `lattice_res > 0` asserts that `p_bxnx3` is the UNDEFORMED vertex
        lattice of a res-`lattice_res` grid in i*n^2+j*n+k order, enabling
        the separable-matmul feature probe (exact, much faster than the
        per-point gather)."""
        if not self.train_def:
            zero = jnp.zeros_like(p_bxnx3)
            return zero, p_bxnx3, zero
        if self.use_disn:
            delta = self._disn_point_delta(
                self.decoder_pos, p_bxnx3, pyramid, cam_bx4x4
            ) * 0.1
            ori_delta = delta
            if self.scale_pos:
                scale = 0.2
                delta = nn.sigmoid(delta) * scale - scale / 2
            if pos_mask_bxnx3 is not None:
                delta = delta * pos_mask_bxnx3
            pos = p_bxnx3 + delta
            if self.use_lap_layer:
                lap_delta = self._disn_point_delta(
                    self.lap_decoder_pos, pos, pyramid, cam_bx4x4
                ) * 0.1
                if self.scale_pos:
                    scale = 0.2
                    lap_delta = nn.sigmoid(lap_delta) * scale - scale / 2
                if pos_mask_bxnx3 is not None:
                    lap_delta = lap_delta * pos_mask_bxnx3
                return delta + lap_delta, pos + lap_delta, ori_delta
            return delta, pos, ori_delta
        if adj is None:
            adj = self.adj
        if lattice_res > 0:
            feat = sample_grid_features_lattice(
                pyramid, lattice_res, lattice_res + 1
            )
        else:
            feat = sample_grid_features(p_bxnx3, pyramid)
        feat = jnp.concatenate([feat, p_bxnx3], axis=-1)
        delta = self.decoder_pos(feat, adj, train=train) * 0.1
        ori_delta = delta
        if self.scale_pos:
            scale = 0.2
            delta = nn.sigmoid(delta) * scale - scale / 2
        if pos_mask_bxnx3 is not None:
            delta = delta * pos_mask_bxnx3
        pos = p_bxnx3 + delta
        if self.use_lap_layer:
            # Second refinement pass (pc_model.py:231-254): features at
            # the undeformed lattice (reusing `feat`'s pyramid samples)
            # concatenated with the refined positions.  NOTE the
            # reference's companion lap_v_loss is identically zero
            # (deftet.py:107) and its train-mode pred_occ is unused
            # (deftet.py:51-130), so the architecture change is the
            # whole feature.
            lap_feat = jnp.concatenate([feat[..., :-3], pos], axis=-1)
            lap_delta = self.lap_decoder_pos(lap_feat, adj, train=train) * 0.1
            if self.scale_pos:
                scale = 0.2
                lap_delta = nn.sigmoid(lap_delta) * scale - scale / 2
            if pos_mask_bxnx3 is not None:
                lap_delta = lap_delta * pos_mask_bxnx3
            # first output = TOTAL deformation (delta + lap_delta) so the
            # laplacian-smoothness / movement regularizers in the train
            # step act on the whole field, not just the refinement
            return delta + lap_delta, pos + lap_delta, ori_delta
        return delta, pos, ori_delta

    def decode_occ(
        self,
        centers_bxkx3: jnp.ndarray,
        pyramid: Sequence[jnp.ndarray],
        train: bool = True,
        cam_bx4x4: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Bernoulli logits (B, K) for pre-gathered tet centers."""
        if self.use_disn:
            logits = self._disn_point_delta(
                self.decoder_occ, centers_bxkx3, pyramid, cam_bx4x4
            )
            return logits[..., 0]
        feat = sample_grid_features(centers_bxkx3, pyramid)
        feat = jnp.concatenate([feat, centers_bxkx3], axis=-1)
        logits = self.decoder_occ(feat, train=train)
        return logits[..., 0]

    def __call__(
        self,
        inputs,
        p_bxnx3,
        centers_bxkx3,
        pos_mask_bxnx3=None,
        train: bool = True,
        adj: Optional[VertexAdjacency] = None,
        cam_bx4x4=None,
    ):
        """Initialization / smoke path exercising all submodules.

        `inputs` = surface points (B, N, 3), or images (B, H, W, 3) with
        `cam_bx4x4` when use_disn."""
        pyr_pos, pyr_occ = self.encode(inputs, train=train)
        delta, pos, ori = self.decode_pos(
            p_bxnx3, pyr_pos, pos_mask_bxnx3, train=train, adj=adj,
            cam_bx4x4=cam_bx4x4,
        )
        logits = self.decode_occ(
            centers_bxkx3, pyr_occ, train=train, cam_bx4x4=cam_bx4x4
        )
        return delta, pos, ori, logits
