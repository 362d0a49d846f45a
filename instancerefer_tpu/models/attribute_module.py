"""Attribute module: per-candidate sparse-conv encoding vs language embedding.

Mirror of reference ``models/attribute_module.py``, with the defining change
that candidate filtering is *not* a host loop (reference ``filter_candidates``,
``:42-81``, runs per-sample numpy + re-voxelization mid-forward): candidates
arrive from the input pipeline as a padded flat sparse pyramid plus a
``cand_mask`` (class == language-predicted class) and the "<2 candidates"
drop rule is a mask (``score_mask``), so the whole forward stays on device.

Score layout: the reference flattens scores over samples with >=2 candidates
(``:115-126``); here ``attribute_scores`` is [B, C] with ``score_mask``
selecting exactly the rows the reference would have produced.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from instancerefer_tpu.models.basic_blocks import (
    MaskedBatchNorm,
    SparseConvEncoder,
    TorchLinear,
)
from instancerefer_tpu.ops.sparse import masked_global_max_pool


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2): x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


class AttributeModule(nn.Module):
    input_feature_dim: int
    max_candidates: int
    v_dim: int = 128
    h_dim: int = 256
    l_dim: int = 256

    @nn.compact
    def __call__(self, data_dict: dict, *, train: bool, bn_momentum: float = 0.1) -> dict:
        out = dict(data_dict)
        pyramid = data_dict["inst_pyramid"]
        inst_feats = data_dict["inst_feats"]  # [IV0, Fin]
        cand_mask = data_dict["cand_mask"]  # [B, C] bool
        b = cand_mask.shape[0]
        c = self.max_candidates

        # ---- language embedding (full batch; BatchNorm over B rows as in
        # ref — masked by sample_valid so a loader-padded tail batch computes
        # exactly the reference's smaller batch statistics)
        valid = data_dict.get("sample_valid")
        lang = data_dict["lang_attr_feats"]  # [B, 256]
        lang = TorchLinear(self.h_dim, name="lang_emb_fc_0")(lang)
        lang = MaskedBatchNorm(self.h_dim, name="lang_emb_fc_bn")(
            lang, valid, train=train, momentum=bn_momentum
        )
        lang = nn.relu(lang)
        lang = TorchLinear(self.h_dim, name="lang_emb_fc_1")(lang)
        lang = l2_normalize(lang, axis=1)  # [B, h]

        # ---- sparse volumetric backbone over all candidates at once
        feats = SparseConvEncoder(name="net")(
            inst_feats, pyramid, train=train, bn_momentum=bn_momentum
        )  # [IV4, 128]
        pooled = masked_global_max_pool(
            feats, pyramid[-1].owner, num_segments=b * c
        ).reshape(b, c, self.v_dim)
        out["obj_feats"] = pooled  # consumed by the scene module (ref :106)

        vis = TorchLinear(self.h_dim, name="vis_emb_fc_0")(pooled)
        vis = nn.LayerNorm(epsilon=1e-5, name="vis_emb_fc_ln")(vis)
        vis = nn.relu(vis)
        vis = TorchLinear(self.h_dim, name="vis_emb_fc_1")(vis)
        vis = l2_normalize(vis, axis=-1)

        scores = jnp.einsum("bch,bh->bc", vis, lang, preferred_element_type=jnp.float32)

        num_filtered = jnp.sum(cand_mask, axis=1)  # [B]
        score_mask = cand_mask & (num_filtered >= 2)[:, None]

        out["attribute_scores"] = scores
        out["score_mask"] = score_mask
        out["num_filtered_objs"] = num_filtered
        return out
