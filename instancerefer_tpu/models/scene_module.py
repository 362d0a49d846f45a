"""Scene (global localization) module: BEV encoding + language attention.

Mirror of reference ``models/scene_module.py``:

* BEVEncoder over the full-scene 0.05 m sparse tensor (5 stages -> stride 16),
* crop to voxel box [0,0,0]–[240,400,80] and scatter to a dense 15x25 BEV via
  per-z-slab kernels (``to_bev``: SparseCrop + ToDenseBEVConvolution + BN +
  ReLU, reference ``:25-30``),
* two VALID 3x3 Conv2d (15x25 -> 11x21 = 231 cells, reference ``:33-38``),
* language attention over the 231 cells (scaled by sqrt(h_dim), ``:77-83``),
* 9-way region classifier on the attended scene feature (``:54-58,84-86``),
* scene<->object cosine matching against the attribute module's pooled
  ``obj_feats`` (``:89-106``) -> ``scene_scores`` [B, C].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from instancerefer_tpu.models.basic_blocks import (
    BEVEncoder,
    MaskedBatchNorm,
    ToDenseBEVConvolution,
    TorchLinear,
    sparse_crop_mask,
    torch_uniform,
)
from instancerefer_tpu.models.relation_module import cosine_similarity


class TorchConv2d(nn.Module):
    """3x3 VALID conv, NHWC, with torch's default init."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel * self.kernel
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="VALID",
            kernel_init=torch_uniform(fan_in),
            bias_init=torch_uniform(fan_in),
            name="conv",
        )(x)


class SceneModule(nn.Module):
    input_feature_dim: int
    v_dim: int = 128
    h_dim: int = 128
    l_dim: int = 256
    dropout_rate: float = 0.15
    loc_min: Tuple[int, int, int] = (0, 0, 0)
    loc_max: Tuple[int, int, int] = (240, 400, 80)

    @nn.compact
    def __call__(self, data_dict: dict, *, train: bool, bn_momentum: float = 0.1) -> dict:
        out = dict(data_dict)
        pyramid = data_dict["scene_pyramid"]
        scene_feats_in = data_dict["scene_feats"]  # [SV0, Fin]
        cand_mask = data_dict["cand_mask"]
        obj_feats = data_dict["obj_feats"]  # [B, C, 128] from AttributeModule
        bsz = cand_mask.shape[0]

        # ---- sparse volumetric backbone
        feats = BEVEncoder(name="net")(
            scene_feats_in, pyramid, train=train, bn_momentum=bn_momentum
        )  # [SV4, 128] at stride 16

        # ---- to dense BEV
        final = pyramid[-1]
        stride = final.stride  # 16
        crop = sparse_crop_mask(final, self.loc_min, self.loc_max)
        h = (self.loc_max[0] - self.loc_min[0]) // stride  # 15
        w = (self.loc_max[1] - self.loc_min[1]) // stride  # 25
        nz = (self.loc_max[2] - self.loc_min[2]) // stride  # 5
        bev = ToDenseBEVConvolution(
            in_channels=128,
            out_channels=128,
            bev_shape=(h, w),
            n_kernels=nz,
            name="to_bev_conv",
        )(feats, final, crop, bsz)  # [B, 15, 25, 128] NHWC
        # sample_valid (loader-padded tail rows) masks whole BEV planes out of
        # the batch statistics — the padded batch then equals the reference's
        # genuinely smaller final batch
        valid = data_dict.get("sample_valid")

        def plane_mask(t):
            if valid is None:
                return None
            return jnp.broadcast_to(valid[:, None, None], t.shape[:3])

        bev = MaskedBatchNorm(128, name="to_bev_bn")(
            bev, plane_mask(bev), train=train, momentum=bn_momentum
        )
        bev = nn.relu(bev)

        # ---- 2x VALID 3x3 conv -> 11x21 cells
        x = TorchConv2d(self.h_dim, name="vis_emb_fc_conv0")(bev)
        x = MaskedBatchNorm(self.h_dim, name="vis_emb_fc_bn")(
            x, plane_mask(x), train=train, momentum=bn_momentum
        )
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = TorchConv2d(self.h_dim, name="vis_emb_fc_conv1")(x)  # [B, 11, 21, h]

        hh, ww = x.shape[1], x.shape[2]
        cells = x.reshape(bsz, hh * ww, self.h_dim)  # [B, 231, h]

        lang = data_dict["lang_scene_feats"]  # [B, 256]
        lang = TorchLinear(self.h_dim, name="lang_emb_fc_0")(lang)
        lang = nn.LayerNorm(epsilon=1e-5, name="lang_emb_fc_ln")(lang)
        lang = nn.relu(lang)
        lang = nn.Dropout(self.dropout_rate, deterministic=not train)(lang)
        lang = TorchLinear(self.h_dim, name="lang_emb_fc_1")(lang)  # [B, h]

        atten = jnp.einsum(
            "bnh,bh->bn", cells, lang, preferred_element_type=jnp.float32
        ) / math.sqrt(self.h_dim)
        atten = nn.softmax(atten, axis=1)  # [B, 231]
        out["vis_atten"] = atten.reshape(bsz, hh, ww)

        scene_feats = jnp.einsum(
            "bn,bnh->bh", atten, cells, preferred_element_type=jnp.float32
        )  # [B, h]

        # ---- 9-region classifier
        s = TorchLinear(self.h_dim, name="cls_0")(scene_feats)
        s = MaskedBatchNorm(self.h_dim, name="cls_bn")(
            s, valid, train=train, momentum=bn_momentum
        )
        s = nn.relu(s)
        out["seg_scores"] = TorchLinear(9, name="cls_1")(s)

        # ---- scene <-> object matching
        obj = TorchLinear(self.h_dim, name="vis_emb_fc1_0")(obj_feats)
        obj = nn.LayerNorm(epsilon=1e-5, name="vis_emb_fc1_ln")(obj)
        obj = nn.relu(obj)
        obj = nn.Dropout(self.dropout_rate, deterministic=not train)(obj)
        obj = TorchLinear(self.h_dim, name="vis_emb_fc1_1")(obj)  # [B, C, h]

        out["scene_scores"] = cosine_similarity(obj, scene_feats[:, None, :], axis=-1)
        return out
