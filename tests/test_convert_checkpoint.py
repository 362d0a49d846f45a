"""Reference-checkpoint conversion (utils/convert_torch.py).

Strategy: initialize the flax model, export its parameters into a synthetic
torch ``state_dict`` under the reference's exact parameter names (the inverse
mapping below is written independently from the converter's table, against
the reference sources cited in convert_torch.py), run the converter, and
require the round-trip to reproduce the flax trees exactly — structure,
shapes, and values (all transforms are transposes/permutations, so equality
is exact).
"""

import functools

import jax
import numpy as np
import pytest

from instancerefer_tpu.data.synthetic import TEST_SPEC, make_device_batch
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.utils.convert_torch import (
    _PERM2,
    _PERM3,
    assert_same_structure,
    map_state_dict,
    torchsparse_offsets,
)

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def variables():
    batch = make_device_batch(2, TEST_SPEC, seed=3)
    model = InstanceRefer(
        input_feature_dim=TEST_SPEC.feat_dim,
        num_classes=TEST_SPEC.num_classes,
        max_candidates=TEST_SPEC.max_candidates,
    )
    return jax.device_get(
        jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.key(7), "dropout": jax.random.key(8)}, batch
        )
    )


def _rand_stats(tree):
    """Give batch_stats leaves distinct random values so mean/var routing
    mistakes can't hide behind the zeros/ones init."""
    rng = np.random.default_rng(11)

    def walk(t):
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        return rng.normal(size=np.shape(t)).astype(np.float32)

    return walk(tree)


def _export_state_dict(params, stats):
    """flax trees -> reference-named torch-layout state_dict (numpy)."""
    sd = {}

    def linear(ref, p):
        sd[f"{ref}.weight"] = np.ascontiguousarray(p["kernel"].T)
        sd[f"{ref}.bias"] = p["bias"]

    def norm(ref, p):  # LayerNorm
        sd[f"{ref}.weight"] = p["scale"]
        sd[f"{ref}.bias"] = p["bias"]

    def bn(ref, p, s):
        sd[f"{ref}.weight"] = p["scale"]
        sd[f"{ref}.bias"] = p["bias"]
        sd[f"{ref}.running_mean"] = s["mean"]
        sd[f"{ref}.running_var"] = s["var"]
        sd[f"{ref}.num_batches_tracked"] = np.asarray(0, np.int64)

    def spconv(ref, p, perm):
        inv = np.argsort(perm)  # converter does kernel[perm]; export inverts
        sd[f"{ref}.kernel"] = p["kernel"][inv]

    def encoder(ref, p, s):
        spconv(f"{ref}.stem.0.net.0", p["stem"]["conv"], _PERM3)
        bn(f"{ref}.stem.0.net.1", p["stem"]["bn"], s["stem"]["bn"])
        for n in (1, 2, 3, 4):
            spconv(f"{ref}.stage{n}.0.net.0", p[f"stage{n}_down"]["conv"], _PERM2)
            bn(f"{ref}.stage{n}.0.net.1", p[f"stage{n}_down"]["bn"],
               s[f"stage{n}_down"]["bn"])
            spconv(f"{ref}.stage{n}.1.net.0", p[f"stage{n}_res"]["conv1"], _PERM3)
            bn(f"{ref}.stage{n}.1.net.1", p[f"stage{n}_res"]["bn1"],
               s[f"stage{n}_res"]["bn1"])
            spconv(f"{ref}.stage{n}.1.net.3", p[f"stage{n}_res"]["conv2"], _PERM3)
            bn(f"{ref}.stage{n}.1.net.4", p[f"stage{n}_res"]["bn2"],
               s[f"stage{n}_res"]["bn2"])

    # lang (models/lang_module.py:22-49)
    lang = params["lang"]
    linear("lang.word_projection.0", lang["word_projection_0"])
    linear("lang.word_projection.3", lang["word_projection_1"])
    for head in ("fc_a", "fc_cls", "fc_rel", "fc_scene"):
        linear(f"lang.{head}", lang[head])
    linear("lang.lang_cls.0", lang["lang_cls"])
    for layer in (0, 1):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            g = lang["gru"][f"l{layer}_{direction}"]
            sd[f"lang.gru.weight_ih_l{layer}{sfx}"] = np.ascontiguousarray(g["wx"].T)
            sd[f"lang.gru.weight_hh_l{layer}{sfx}"] = np.ascontiguousarray(g["wh"].T)
            sd[f"lang.gru.bias_ih_l{layer}{sfx}"] = g["bx"]
            sd[f"lang.gru.bias_hh_l{layer}{sfx}"] = g["bh"]

    # attribute (models/attribute_module.py:19-32)
    att, atts = params["attribute"], stats["attribute"]
    encoder("attribute.net", att["net"], atts["net"])
    linear("attribute.vis_emb_fc.0", att["vis_emb_fc_0"])
    norm("attribute.vis_emb_fc.1", att["vis_emb_fc_ln"])
    linear("attribute.vis_emb_fc.3", att["vis_emb_fc_1"])
    linear("attribute.lang_emb_fc.0", att["lang_emb_fc_0"])
    bn("attribute.lang_emb_fc.1", att["lang_emb_fc_bn"], atts["lang_emb_fc_bn"])
    linear("attribute.lang_emb_fc.3", att["lang_emb_fc_1"])

    # relation (models/relation_module.py:13-27; dropout at Sequential
    # index 3 puts the second Linear at 4)
    rel, rels = params["relation"], stats["relation"]
    linear("relation.vis_emb_fc.0", rel["vis_emb_fc_0"])
    norm("relation.vis_emb_fc.1", rel["vis_emb_fc_ln"])
    linear("relation.vis_emb_fc.4", rel["vis_emb_fc_1"])
    linear("relation.lang_emb_fc.0", rel["lang_emb_fc_0"])
    bn("relation.lang_emb_fc.1", rel["lang_emb_fc_bn"], rels["lang_emb_fc_bn"])
    linear("relation.lang_emb_fc.4", rel["lang_emb_fc_1"])
    linear("relation.gcn.mlp.0", rel["gcn"]["mlp_0"])
    linear("relation.gcn.mlp.2", rel["gcn"]["mlp_1"])
    linear("relation.gcn.weight.0", rel["gcn"]["weight_0"])
    linear("relation.gcn.weight.2", rel["gcn"]["weight_1"])

    # scene (models/scene_module.py:18-58)
    sc, scs = params["scene"], stats["scene"]
    encoder("scene.net", sc["net"], scs["net"])
    sd["scene.to_bev.1.kernel"] = sc["to_bev_conv"]["kernel"]
    bn("scene.to_bev.2", sc["to_bev_bn"], scs["to_bev_bn"])
    for i, name in ((0, "vis_emb_fc_conv0"), (4, "vis_emb_fc_conv1")):
        conv = sc[name]["conv"]
        # flax NHWC [kh,kw,in,out] -> torch [out,in,kh,kw]
        sd[f"scene.vis_emb_fc.{i}.weight"] = np.transpose(conv["kernel"], (3, 2, 0, 1))
        sd[f"scene.vis_emb_fc.{i}.bias"] = conv["bias"]
    bn("scene.vis_emb_fc.1", sc["vis_emb_fc_bn"], scs["vis_emb_fc_bn"])
    linear("scene.vis_emb_fc1.0", sc["vis_emb_fc1_0"])
    norm("scene.vis_emb_fc1.1", sc["vis_emb_fc1_ln"])
    linear("scene.vis_emb_fc1.4", sc["vis_emb_fc1_1"])
    linear("scene.lang_emb_fc.0", sc["lang_emb_fc_0"])
    norm("scene.lang_emb_fc.1", sc["lang_emb_fc_ln"])
    linear("scene.lang_emb_fc.4", sc["lang_emb_fc_1"])
    linear("scene.cls.0", sc["cls_0"])
    bn("scene.cls.1", sc["cls_bn"], scs["cls_bn"])
    linear("scene.cls.3", sc["cls_1"])
    return sd


def _assert_tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {sorted(set(a) ^ set(b))}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}"
            )


def test_roundtrip_exact(variables):
    params = jax.tree.map(np.asarray, variables["params"])
    stats = _rand_stats(variables["batch_stats"])
    sd = _export_state_dict(params, stats)

    got_params, got_stats = map_state_dict(sd)
    _assert_tree_equal(got_params, params)
    _assert_tree_equal(got_stats, stats)
    assert_same_structure(got_params, variables["params"], "params")
    assert_same_structure(got_stats, variables["batch_stats"], "batch_stats")


def test_reference_key_names_pinned(variables):
    """Pin a sample of exact reference state_dict names against the cited
    sources, so the export helper and the converter can't drift together."""
    sd = _export_state_dict(
        jax.tree.map(np.asarray, variables["params"]), variables["batch_stats"]
    )
    for key in [
        "lang.gru.weight_ih_l1_reverse",          # nn.GRU, bidir 2-layer
        "lang.word_projection.3.bias",            # Linear after Dropout(2)
        "attribute.net.stage3.1.net.3.kernel",    # ResidualBlock second conv
        "attribute.lang_emb_fc.1.running_var",    # BatchNorm1d at index 1
        "relation.vis_emb_fc.4.weight",           # Dropout shifts Linear to 4
        "relation.gcn.weight.2.bias",             # edge-weight MLP second Linear
        "scene.to_bev.1.kernel",                  # ToDenseBEVConvolution
        "scene.vis_emb_fc.4.weight",              # second Conv2d
        "scene.cls.3.bias",                       # 9-way region classifier
    ]:
        assert key in sd, key
    # torchsparse Conv3d has no bias parameter anywhere in this topology
    assert not [k for k in sd if ".net.0.bias" in k or ".net.3.bias" in k]


def test_offset_enumeration_matches_torchsparse12():
    """torchsparse-1.2 enumerates x-fastest for both kernel volumes — the
    same order as ops/voxelize, so the K-axis permutation is the identity."""
    assert (_PERM3 == np.arange(27)).all()
    assert (_PERM2 == np.arange(8)).all()
    assert (torchsparse_offsets(3)[0] == [-1, -1, -1]).all()
    assert (torchsparse_offsets(3)[1] == [0, -1, -1]).all()  # x fastest
    assert (torchsparse_offsets(2)[0] == [0, 0, 0]).all()
    assert (torchsparse_offsets(2)[1] == [1, 0, 0]).all()


def test_export_matches_independent_inverse(variables):
    """The library exporter (utils/convert_torch.export_state_dict) must
    agree key-for-key and value-for-value with this file's independently
    written inverse, and round-trip through map_state_dict exactly."""
    from instancerefer_tpu.utils.convert_torch import export_state_dict

    params = jax.tree.map(np.asarray, variables["params"])
    stats = _rand_stats(variables["batch_stats"])

    lib = export_state_dict(params, stats)
    ours = _export_state_dict(params, stats)
    assert set(lib) == set(ours)
    for k in ours:
        np.testing.assert_array_equal(lib[k], ours[k], err_msg=k)

    back_params, back_stats = map_state_dict(lib)
    _assert_tree_equal(back_params, params)
    _assert_tree_equal(back_stats, stats)


def test_unknown_and_unconsumed_keys_fail(variables):
    sd = _export_state_dict(
        jax.tree.map(np.asarray, variables["params"]), variables["batch_stats"]
    )
    with pytest.raises(ValueError, match="unknown"):
        map_state_dict({**sd, "scene.mystery.0.weight": np.zeros(3, np.float32)})
    with pytest.raises(ValueError, match="unconsumed|unknown"):
        map_state_dict(
            {**sd, "scene.cls.0.weight_extra": np.zeros(3, np.float32)}
        )
