"""Golden ENet conversion test: the torch->flax converter must reproduce a
torch execution of the REFERENCE network (/root/reference/lib/enet.py) to
< 1e-4 max abs diff — encoder features and classifier logits."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "lib")):
    pytest.skip("reference checkout not available", allow_module_level=True)

sys.path.insert(0, REFERENCE)
from lib.enet import create_enet  # noqa: E402  (reference torch module)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.convert_enet import convert_state_dict  # noqa: E402

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def torch_enet():
    torch.manual_seed(0)
    model = create_enet(41)
    # make BN affine + running stats non-trivial so the test discriminates
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_converted_enet_matches_reference(torch_enet):
    import functools

    import jax
    import jax.numpy as jnp

    from instancerefer_tpu.models.enet import Enet

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 128, 168)).astype(np.float32)

    with torch.no_grad():
        logits_t = torch_enet(torch.tensor(x)).numpy()  # [1, 41, 16, 21]
        # encoder features = everything except the classifier
        # (lib/enet.py:697-716 model_fixed + model_trainable)
        n = len(torch_enet)
        feats_t = x
        feats_t = torch.tensor(x)
        for i in range(n - 1):
            feats_t = torch_enet[i](feats_t)
        feats_t = feats_t.numpy()  # [1, 128, 16, 21]

    sd = {k: v.numpy() for k, v in torch_enet.state_dict().items()
          if hasattr(v, "numpy")}
    variables = convert_state_dict(sd)

    model = Enet(num_classes=41)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    # structure check: converted tree must match the model's own init tree
    init_vars = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), xj
    )
    assert jax.tree_util.tree_structure(init_vars["params"]) == \
        jax.tree_util.tree_structure(variables["params"])

    logits_j, feats_j = model.apply(variables, xj, train=False)
    logits_j = np.asarray(logits_j).transpose(0, 3, 1, 2)
    feats_j = np.asarray(feats_j).transpose(0, 3, 1, 2)

    assert feats_j.shape == feats_t.shape
    np.testing.assert_allclose(feats_j, feats_t, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(logits_j, logits_t, atol=1e-4, rtol=1e-4)


def test_converted_param_count(torch_enet):
    import jax

    sd = {k: v.numpy() for k, v in torch_enet.state_dict().items()
          if hasattr(v, "numpy")}
    variables = convert_state_dict(sd)
    n_flax = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    n_flax += sum(x.size for x in jax.tree_util.tree_leaves(variables["batch_stats"]))
    n_torch = sum(
        v.size for k, v in sd.items() if not k.endswith("num_batches_tracked")
    )
    assert n_flax == n_torch
