"""ENet backbone: output shapes/resolutions for the multiview contract."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.models.enet import (

    Enet,
    EnetClassifier,
    EnetEncoder,
    create_enet_for_3d,
    normalize_frame,
)

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow



def test_encoder_feature_resolution(rng):
    """328x256 frames -> 128-ch features at 41x32 (the depth-map resolution
    the projection pipeline assumes)."""
    model = EnetEncoder()
    x = jnp.asarray(rng.normal(size=(1, 256, 328, 3)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(jax.random.key(0), x)
    feats = model.apply(variables, x, train=False)
    assert feats.shape == (1, 32, 41, 128)
    assert np.isfinite(np.asarray(feats)).all()


def test_full_enet_classifier_resolution(rng):
    """The live reference classifier is a 1x1 conv at 1/8 resolution (its
    decoder is commented out, lib/enet.py:560-693)."""
    model = Enet(num_classes=41)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(jax.random.key(0), x)
    logits, feats = model.apply(variables, x, train=False)
    assert logits.shape == (1, 8, 8, 41)
    assert feats.shape == (1, 8, 8, 128)


def test_create_enet_for_3d_split():
    enc, cls = create_enet_for_3d(41)
    assert isinstance(enc, EnetEncoder)
    assert isinstance(cls, EnetClassifier)
    assert cls.num_classes == 41


def test_normalize_frame():
    x = jnp.ones((4, 4, 3)) * 0.5
    out = np.asarray(normalize_frame(x))
    assert out.shape == (4, 4, 3)
    assert np.isfinite(out).all()
    assert not np.allclose(out, 0.5)
