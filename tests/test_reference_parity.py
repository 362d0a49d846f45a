"""Direct oracle checks of reference formula quirks (torch as the oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.models.lang_module import masked_softmax
from instancerefer_tpu.train.losses import contrastive_loss_masked

torch = pytest.importorskip("torch")


def test_masked_softmax_equals_reference_renormalization(rng):
    """The reference computes softmax over ALL positions, multiplies by the
    length mask, and renormalizes (models/lang_module.py:62-64).  The full
    softmax's normalizer cancels, so this must equal a masked softmax."""
    b, t = 4, 11
    logits = rng.normal(size=(b, t)).astype(np.float32)
    lengths = np.array([11, 7, 3, 1])
    mask = np.arange(t)[None, :] < lengths[:, None]

    # reference formulation, verbatim in torch
    tl = torch.tensor(logits)
    atten = torch.softmax(tl, dim=1)
    atten = atten * torch.tensor(mask, dtype=torch.float32)
    want = (atten / atten.sum(1, keepdim=True)).numpy()

    got = np.asarray(masked_softmax(jnp.asarray(logits), jnp.asarray(mask), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_contrastive_loss_vs_torch_reference(rng):
    """Verbatim torch port of lib/loss_helper.py:93-107 as the oracle,
    including the positive-contributes-logit-0 quirk."""

    def torch_contrastive(score, label, margin=0.2, gamma=5):
        score = score * gamma
        sim = (score * label).sum()
        neg_sim = score * label.logical_not()
        neg_sim = torch.logsumexp(neg_sim, dim=0)
        return torch.clamp(neg_sim - sim + margin, min=0).sum()

    for _ in range(10):
        n = int(rng.integers(2, 9))
        score = rng.normal(size=n).astype(np.float32)
        label = np.zeros(n, np.float32)
        label[rng.integers(0, n)] = 1.0
        want = float(
            torch_contrastive(torch.tensor(score), torch.tensor(label).bool().float())
        )
        c = 12
        ps = np.zeros((1, c), np.float32); ps[0, :n] = score
        pl = np.zeros((1, c), np.float32); pl[0, :n] = label
        pm = np.zeros((1, c), bool); pm[0, :n] = True
        got = float(
            contrastive_loss_masked(jnp.asarray(ps), jnp.asarray(pl), jnp.asarray(pm))[0]
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cosine_similarity_vs_torch(rng):
    from instancerefer_tpu.models.relation_module import cosine_similarity

    a = rng.normal(size=(5, 16)).astype(np.float32)
    b = rng.normal(size=(5, 16)).astype(np.float32)
    want = torch.nn.functional.cosine_similarity(
        torch.tensor(a), torch.tensor(b), dim=1
    ).numpy()
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_l2_normalize_vs_torch(rng):
    from instancerefer_tpu.models.attribute_module import l2_normalize

    x = rng.normal(size=(6, 8)).astype(np.float32)
    x[3] = 0.0  # zero vector: torch clamps the norm by eps
    want = torch.nn.functional.normalize(torch.tensor(x), p=2, dim=1).numpy()
    got = np.asarray(l2_normalize(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
