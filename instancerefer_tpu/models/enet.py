"""ENet 2D semantic-segmentation backbone in flax (multiview feature extractor).

Capability port of reference ``lib/enet.py`` (C18 in SURVEY.md §2.1): the
reference rebuilds ENet (Paszke et al. 2016) layer-by-layer in PyTorch with
Torch-Lua compat shims in order to load ``scannetv2_enet.pth`` and split it
into (fixed encoder, trainable 128-ch feature head, classifier) via
``create_enet_for_3d`` (``lib/enet.py:697-716``).

This implementation is a clean flax ENet with the same macro-structure and
interface contract:

* ``EnetEncoder``: initial block (16 ch) -> stage 1 (64 ch, 1/4 res) ->
  stages 2-3 (128 ch, 1/8 res with dilated/asymmetric bottlenecks) — the
  128-channel 1/8-resolution features consumed by the multiview pipeline
  (328x256 frames -> 41x32 feature maps, matching the reference's depth-map
  resolution, ``scripts/project_multiview_features.py``).
* ``EnetClassifier``: the decoder + per-pixel classifier for label projection
  (``scripts/project_multiview_labels.py``).
* ``create_enet_for_3d``: returns (encoder, classifier) apply-functions with
  the encoder intended to be frozen, mirroring ``lib/enet.py:697-716``.

NHWC layout throughout (TPU-native; the reference's NCHW is a torch
convention).  Inference-oriented: BN uses running statistics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class InitialBlock(nn.Module):
    """3x3/2 conv (13 ch) concat maxpool(2) of input (3 ch) -> 16 channels."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        conv = nn.Conv(13, (3, 3), strides=(2, 2), padding="SAME", use_bias=True)(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        out = jnp.concatenate([conv, pool], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(out)
        return nn.PReLU()(out)


class Bottleneck(nn.Module):
    """ENet bottleneck: 1x1 down -> (3x3 | dilated | asymmetric | deconv) -> 1x1 up.

    ``downsample`` adds the maxpool main branch + channel zero-pad, ``upsample``
    the transposed-conv main branch used by the decoder.
    """

    out_ch: int
    internal_ratio: int = 4
    kernel: int = 3
    dilation: int = 1
    asymmetric: bool = False
    downsample: bool = False
    upsample: bool = False
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        inter = self.out_ch // self.internal_ratio
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)

        main = x
        if self.downsample:
            main = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            pad = self.out_ch - x.shape[-1]
            if pad > 0:
                main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))
        elif self.upsample:
            main = nn.Conv(self.out_ch, (1, 1), use_bias=False)(x)
            main = bn()(main)
            b, h, w, c = main.shape
            main = jax.image.resize(main, (b, h * 2, w * 2, c), "nearest")
        elif x.shape[-1] != self.out_ch:
            main = nn.Conv(self.out_ch, (1, 1), use_bias=False)(x)
            main = bn()(main)

        # ext branch
        stride = 2 if self.downsample else 1
        ext = nn.Conv(inter, (stride, stride) if self.downsample else (1, 1),
                      strides=(stride, stride), use_bias=False)(x)
        ext = bn()(ext)
        ext = nn.PReLU()(ext)

        if self.upsample:
            ext = nn.ConvTranspose(inter, (3, 3), strides=(2, 2), padding="SAME")(ext)
        elif self.asymmetric:
            k = self.kernel
            ext = nn.Conv(inter, (k, 1), padding="SAME", use_bias=False)(ext)
            ext = nn.Conv(inter, (1, k), padding="SAME", use_bias=True)(ext)
        else:
            ext = nn.Conv(
                inter, (self.kernel, self.kernel),
                kernel_dilation=(self.dilation, self.dilation),
                padding="SAME", use_bias=True,
            )(ext)
        ext = bn()(ext)
        ext = nn.PReLU()(ext)

        ext = nn.Conv(self.out_ch, (1, 1), use_bias=False)(ext)
        ext = bn()(ext)
        ext = nn.Dropout(self.dropout_rate, deterministic=not train)(ext)

        return nn.PReLU()(main + ext)


class EnetEncoder(nn.Module):
    """Stages 0-3: 3 -> 16 -> 64 (1/4) -> 128 (1/8); the multiview feature net."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = InitialBlock(name="initial")(x, train=train)

        # stage 1: downsample to 64 @ 1/4, 4 regular bottlenecks (dropout 0.01)
        x = Bottleneck(64, downsample=True, dropout_rate=0.01, name="b1_0")(x, train=train)
        for i in range(1, 5):
            x = Bottleneck(64, dropout_rate=0.01, name=f"b1_{i}")(x, train=train)

        # stage 2: downsample to 128 @ 1/8, dilated/asymmetric mix
        x = Bottleneck(128, downsample=True, name="b2_0")(x, train=train)
        for stage in (2, 3):
            x = Bottleneck(128, name=f"b{stage}_1")(x, train=train)
            x = Bottleneck(128, dilation=2, name=f"b{stage}_2")(x, train=train)
            x = Bottleneck(128, kernel=5, asymmetric=True, name=f"b{stage}_3")(x, train=train)
            x = Bottleneck(128, dilation=4, name=f"b{stage}_4")(x, train=train)
            x = Bottleneck(128, name=f"b{stage}_5")(x, train=train)
            x = Bottleneck(128, dilation=8, name=f"b{stage}_6")(x, train=train)
            x = Bottleneck(128, kernel=5, asymmetric=True, name=f"b{stage}_7")(x, train=train)
            x = Bottleneck(128, dilation=16, name=f"b{stage}_8")(x, train=train)
        return x  # [B, H/8, W/8, 128]


class EnetClassifier(nn.Module):
    """Stages 4-5 + full-res classifier head (for label projection)."""

    num_classes: int = 41  # nyu40 + unannotated

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = Bottleneck(64, upsample=True, name="b4_0")(x, train=train)
        x = Bottleneck(64, name="b4_1")(x, train=train)
        x = Bottleneck(64, name="b4_2")(x, train=train)
        x = Bottleneck(16, upsample=True, name="b5_0")(x, train=train)
        x = Bottleneck(16, name="b5_1")(x, train=train)
        x = nn.ConvTranspose(self.num_classes, (2, 2), strides=(2, 2), name="fullconv")(x)
        return x  # [B, H, W, num_classes]


class Enet(nn.Module):
    """Full network: encoder + classifier (lib/enet.py create_enet)."""

    num_classes: int = 41

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = EnetEncoder(name="encoder")(x, train=train)
        logits = EnetClassifier(self.num_classes, name="classifier")(feats, train=train)
        return logits, feats


def create_enet_for_3d(num_classes: int = 41):
    """(feature_net, classifier_net) pair mirroring ``lib/enet.py:697-716``:
    the feature net (encoder) is the frozen 128-ch multiview extractor; the
    classifier completes semantic segmentation for label projection."""
    return EnetEncoder(), EnetClassifier(num_classes)


# ENet frame normalization used by the multiview pipeline
# (scripts/compute_multiview_features.py:76)
ENET_MEAN = jnp.array([0.496342, 0.466664, 0.440796])
ENET_STD = jnp.array([0.277856, 0.28623, 0.291129])


def normalize_frame(rgb01: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float in [0,1] -> normalized."""
    return (rgb01 - ENET_MEAN) / ENET_STD
