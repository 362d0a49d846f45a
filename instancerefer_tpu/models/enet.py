"""ENet 2D semantic-segmentation backbone in flax (multiview feature extractor).

Structural mirror of the reference's *live* network (``lib/enet.py:130-693``,
C18 in SURVEY.md §2.1).  Note the reference's decoder (max-unpool upsampling
stages) is entirely commented out there — the network that actually loads
``scannetv2_enet.pth`` is:

  initial block (16 ch) -> stage 1 (5 bottlenecks, 64 ch @ 1/4) ->
  stage 2 (downsample + 8 bottlenecks, 128 ch @ 1/8) ->
  stage 3 (8 bottlenecks, 128 ch @ 1/8) -> 1x1 conv classifier (no bias).

Parity details preserved for exact weight conversion
(``scripts/convert_enet.py`` + golden test ``tests/test_enet_convert.py``):

* per-channel PReLU (torch ``nn.PReLU(C)``),
* asymmetric bottlenecks apply (1,5) *then* (5,1), first conv bias-free
  (``lib/enet.py`` stage-2/3 asym blocks),
* Torch-Lua Dropout semantics (``lib/enet.py:81-96``): the custom Dropout
  multiplies by (1-p) *before* standard dropout, so at inference the ext
  branch is scaled by (1-p) — reproduced exactly,
* BatchNorm eps 1e-3, torch momentum 0.1,
* explicit torch paddings (the initial 3x3/2 conv pads (1,1); flax "SAME"
  would pad (0,1) and shift every window).

NHWC layout throughout (TPU-native; the reference's NCHW is a torch
convention).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ChannelPReLU(nn.Module):
    """torch ``nn.PReLU(num_channels)``: per-channel negative slopes."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],)
        )
        return jnp.where(x >= 0, x, alpha * x)


def _bn(train: bool, name: str):
    # torch nn.BatchNorm2d(C, eps=0.001, momentum=0.1)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3, name=name
    )


class InitialBlock(nn.Module):
    """3x3/2 conv (13 ch, pad 1) concat maxpool(2x2/2) of input -> 16 ch
    (``lib/enet.py:132-137``)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        conv = nn.Conv(
            13, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=True, name="conv",
        )(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        out = jnp.concatenate([conv, pool], axis=-1)
        out = _bn(train, "bn")(out)
        return ChannelPReLU(name="prelu")(out)


class Bottleneck(nn.Module):
    """ENet bottleneck: 1x1 reduce -> (3x3 | dilated | asymmetric) -> 1x1
    expand, plus the identity / maxpool+channel-pad main branch.

    The live reference has no upsampling bottlenecks (decoder commented out).
    """

    out_ch: int
    internal: int
    kernel: int = 3
    dilation: int = 1
    asymmetric: bool = False
    downsample: bool = False
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        inter = self.internal

        main = x
        if self.downsample:
            # maxpool(2,2) + zero-pad the new channels (Padding shim,
            # lib/enet.py:49-77)
            main = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
            pad = self.out_ch - x.shape[-1]
            if pad > 0:
                main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        if self.downsample:
            ext = nn.Conv(
                inter, (2, 2), strides=(2, 2), padding="VALID",
                use_bias=False, name="conv_reduce",
            )(x)
        else:
            ext = nn.Conv(inter, (1, 1), use_bias=False, name="conv_reduce")(x)
        ext = _bn(train, "bn_reduce")(ext)
        ext = ChannelPReLU(name="prelu_reduce")(ext)

        if self.asymmetric:
            k = self.kernel
            # reference order: (1,k) bias-free, then (k,1) with bias
            ext = nn.Conv(
                inter, (1, k), padding=((0, 0), (k // 2, k // 2)),
                use_bias=False, name="conv_mid_a",
            )(ext)
            ext = nn.Conv(
                inter, (k, 1), padding=((k // 2, k // 2), (0, 0)),
                use_bias=True, name="conv_mid_b",
            )(ext)
        else:
            p = self.dilation * (self.kernel // 2)
            ext = nn.Conv(
                inter, (self.kernel, self.kernel),
                kernel_dilation=(self.dilation, self.dilation),
                padding=((p, p), (p, p)), use_bias=True, name="conv_mid",
            )(ext)
        ext = _bn(train, "bn_mid")(ext)
        ext = ChannelPReLU(name="prelu_mid")(ext)

        ext = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_expand")(ext)
        ext = _bn(train, "bn_expand")(ext)
        # Torch-Lua Dropout (lib/enet.py:81-96): scale by (1-p) always, then
        # standard (rescaling) dropout when training — at eval the branch is
        # scaled by (1-p), which the pretrained weights expect.
        ext = ext * (1.0 - self.dropout_rate)
        ext = nn.Dropout(self.dropout_rate, deterministic=not train)(ext)

        return ChannelPReLU(name="prelu_out")(main + ext)


# (name, kwargs) descriptors of the live network's 22 bottlenecks — shared by
# the model and scripts/convert_enet.py's state-dict index mapping.
BOTTLENECK_PLAN = (
    [("b1_0", dict(out_ch=64, internal=16, downsample=True, dropout_rate=0.01))]
    + [(f"b1_{i}", dict(out_ch=64, internal=16, dropout_rate=0.01)) for i in range(1, 5)]
    + [("b2_0", dict(out_ch=128, internal=32, downsample=True))]
    + [
        (f"b{s}_{i}", dict(out_ch=128, internal=32, **kw))
        for s in (2, 3)
        for i, kw in [
            (1, {}),
            (2, dict(dilation=2)),
            (3, dict(kernel=5, asymmetric=True)),
            (4, dict(dilation=4)),
            (5, {}),
            (6, dict(dilation=8)),
            (7, dict(kernel=5, asymmetric=True)),
            (8, dict(dilation=16)),
        ]
    ]
)


class EnetEncoder(nn.Module):
    """Initial + stages 1-3: 3 -> 16 -> 64 (1/4) -> 128 (1/8).

    This is the reference's ``model_fixed`` + ``model_trainable``
    (``lib/enet.py:697-716``) — the 128-channel 1/8-resolution multiview
    feature extractor (328x256 frames -> 41x32 maps)."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = InitialBlock(name="initial")(x, train=train)
        for name, kw in BOTTLENECK_PLAN:
            x = Bottleneck(name=name, **kw)(x, train=train)
        return x  # [B, H/8, W/8, 128]


class EnetClassifier(nn.Module):
    """The live reference classifier: ONE bias-free 1x1 conv at 1/8 res
    (``lib/enet.py:688-690``; its decoder is commented out)."""

    num_classes: int = 41  # nyu40 + unannotated

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return nn.Conv(self.num_classes, (1, 1), use_bias=False, name="conv")(x)


class Enet(nn.Module):
    """Full network: encoder + classifier (lib/enet.py create_enet)."""

    num_classes: int = 41

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = EnetEncoder(name="encoder")(x, train=train)
        logits = EnetClassifier(self.num_classes, name="classifier")(feats, train=train)
        return logits, feats  # logits at 1/8 resolution, like the reference


def create_enet_for_3d(num_classes: int = 41):
    """(feature_net, classifier_net) pair mirroring ``lib/enet.py:697-716``:
    the feature net (encoder) is the frozen 128-ch multiview extractor; the
    classifier is the 1x1 conv head for label projection."""
    return EnetEncoder(), EnetClassifier(num_classes)


# ENet frame normalization used by the multiview pipeline
# (scripts/compute_multiview_features.py:76)
ENET_MEAN = jnp.array([0.496342, 0.466664, 0.440796])
ENET_STD = jnp.array([0.277856, 0.28623, 0.291129])


def normalize_frame(rgb01: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float in [0,1] -> normalized."""
    return (rgb01 - ENET_MEAN) / ENET_STD
