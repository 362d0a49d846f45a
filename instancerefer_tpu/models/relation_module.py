"""Relation module: kNN instance-graph context aggregation vs language.

Mirror of reference ``models/relation_module.py`` + ``DynamicEdgeConv``
(``models/basic_blocks.py:98-133``), replacing torch-geometric's CUDA
knn/scatter-max with padded dense ops (SURVEY.md §2.3 N6/N7):

* node features: per-instance mean point feature with xyz replaced by the obb
  centroid, concat one-hot(18) class (built in the input pipeline, which is
  where the reference builds them in a numpy loop, ``:66-76``),
* kNN (k=8) from *candidate* instances to *all* instances of the same scene
  over centroid distance (``models/basic_blocks.py:114-125``),
* edge message: mlp([x_i, weight(Δpos, cls_i, cls_j), x_j]) with max
  aggregation over the k neighbors (``:127-133``); duplicated padded
  neighbors are exact under max,
* 128->128 vis MLP; cosine similarity vs the relation language embedding.

Outputs ``relation_scores`` as [B, C] aligned with ``cand_mask``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from instancerefer_tpu.models.basic_blocks import MaskedBatchNorm, TorchLinear
from instancerefer_tpu.ops.knn import knn_padded


def cosine_similarity(a, b, axis=-1, eps=1e-8):
    """torch F.cosine_similarity: dot / max(||a||*||b||, eps)."""
    dot = jnp.sum(a * b, axis=axis)
    na = jnp.linalg.norm(a, axis=axis)
    nb = jnp.linalg.norm(b, axis=axis)
    return dot / jnp.maximum(na * nb, eps)


class DynamicEdgeConv(nn.Module):
    """EdgeConv with learned edge weights and max aggregation."""

    f_in: int  # node feature dim (7 + num_classes)
    f_out: int
    k: int
    num_classes: int

    @nn.compact
    def __call__(self, node_feats, node_xyz, node_mask, query_slot, query_mask):
        """node_*: [B, M, ...]; query_slot: [B, C] indices into M.

        Returns [B, C, f_out] aggregated features for the query (candidate)
        nodes; invalid queries yield zeros.
        """
        bsz, m, _ = node_feats.shape
        cdim = query_slot.shape[1]

        safe_slot = jnp.clip(query_slot, 0, m - 1)
        q_xyz = jnp.take_along_axis(node_xyz, safe_slot[..., None], axis=1)  # [B,C,3]
        q_feat = jnp.take_along_axis(node_feats, safe_slot[..., None], axis=1)

        idx, nbr_valid = knn_padded(q_xyz, node_xyz, node_mask, self.k)  # [B,C,k]
        n_xyz = jnp.take_along_axis(node_xyz, idx.reshape(bsz, -1, 1), axis=1).reshape(
            bsz, cdim, self.k, 3
        )
        n_feat = jnp.take_along_axis(
            node_feats, idx.reshape(bsz, -1, 1), axis=1
        ).reshape(bsz, cdim, self.k, self.f_in)

        x_i = jnp.broadcast_to(q_feat[:, :, None, :], n_feat.shape)  # target (query)
        x_j = n_feat  # source (support)
        pos_delta = n_xyz - q_xyz[:, :, None, :]  # pos_j - pos_i

        win = jnp.concatenate(
            [
                pos_delta,
                x_i[..., -self.num_classes :],
                x_j[..., -self.num_classes :],
            ],
            axis=-1,
        )
        w = TorchLinear(64, name="weight_0")(win)
        w = nn.relu(w)
        w = TorchLinear(self.f_in, name="weight_1")(w)

        edge = jnp.concatenate([x_i, w, x_j], axis=-1)  # [B,C,k,3*f_in]
        msg = TorchLinear(self.f_out, name="mlp_0")(edge)
        msg = nn.relu(msg)
        msg = TorchLinear(self.f_out, name="mlp_1")(msg)

        neg = jnp.finfo(msg.dtype).min
        msg = jnp.where(nbr_valid[..., None], msg, neg)
        agg = jnp.max(msg, axis=2)  # [B, C, f_out]
        has = jnp.any(nbr_valid, axis=-1) & query_mask
        return jnp.where(has[..., None], agg, 0.0)


class RelationModule(nn.Module):
    input_feature_dim: int
    num_classes: int
    k: int = 8
    v_dim: int = 128
    h_dim: int = 128
    l_dim: int = 256
    dropout_rate: float = 0.15

    @nn.compact
    def __call__(self, data_dict: dict, *, train: bool, bn_momentum: float = 0.1) -> dict:
        out = dict(data_dict)
        inst_mask = data_dict["instance_mask"]  # [B, M]
        inst_class = data_dict["instance_class"]  # [B, M]
        inst_obbs = data_dict["instance_obbs"]  # [B, M, 7]
        node_base = data_dict["instance_node_feat"]  # [B, M, 7]
        cand_slot = data_dict["cand_slot"]  # [B, C]
        cand_mask = data_dict["cand_mask"]  # [B, C]

        lang = data_dict["lang_rel_feats"]  # [B, 256]
        lang = TorchLinear(self.h_dim, name="lang_emb_fc_0")(lang)
        # sample_valid masks loader-padded tail rows out of the statistics
        lang = MaskedBatchNorm(self.h_dim, name="lang_emb_fc_bn")(
            lang, data_dict.get("sample_valid"), train=train, momentum=bn_momentum
        )
        lang = nn.relu(lang)
        lang = nn.Dropout(self.dropout_rate, deterministic=not train)(lang)
        lang = TorchLinear(self.h_dim, name="lang_emb_fc_1")(lang)  # [B, h]

        onehot = jnp.where(
            inst_mask[..., None],
            jnp.eye(self.num_classes, dtype=node_base.dtype)[
                jnp.clip(inst_class, 0, self.num_classes - 1)
            ],
            0.0,
        )
        node_feats = jnp.concatenate([node_base, onehot], axis=-1)  # [B, M, 25]
        node_xyz = inst_obbs[..., 0:3]

        feats = DynamicEdgeConv(
            f_in=self.input_feature_dim + self.num_classes,
            f_out=128,
            k=self.k,
            num_classes=self.num_classes,
            name="gcn",
        )(node_feats, node_xyz, inst_mask, cand_slot, cand_mask)  # [B, C, 128]

        vis = TorchLinear(self.h_dim, name="vis_emb_fc_0")(feats)
        vis = nn.LayerNorm(epsilon=1e-5, name="vis_emb_fc_ln")(vis)
        vis = nn.relu(vis)
        vis = nn.Dropout(self.dropout_rate, deterministic=not train)(vis)
        vis = TorchLinear(self.h_dim, name="vis_emb_fc_1")(vis)

        scores = cosine_similarity(vis, lang[:, None, :], axis=-1)  # [B, C]
        out["relation_scores"] = scores
        return out
