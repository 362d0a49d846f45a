"""Convert a reference-trained torch checkpoint into this framework's trees.

The reference saves plain ``state_dict()`` files (``model_last.pth`` each
epoch / ``model.pth`` on best, ``lib/solver.py:154-156,342``) and a finish
``checkpoint.tar`` = ``{epoch, model_state_dict, optimizer_state_dict}``
(``lib/solver.py:373-381``).  This module maps those parameter names and
layouts onto the flax ``params`` / ``batch_stats`` trees of
``models/instancerefer.InstanceRefer`` so a user of the reference can bring a
trained model across (``scripts/convert_checkpoint.py`` is the CLI; optimizer
moments are not converted — warm-start re-estimates them in a few steps).

Name map (reference module attribute paths -> flax collection paths):

* ``lang.*`` (``models/lang_module.py:22-49``): ``word_projection.{0,3}`` ->
  ``word_projection_{0,1}``; ``gru.weight_ih_l{L}[_reverse]`` -> transposed
  ``gru/l{L}_{fwd,bwd}/wx`` (same r,z,n gate packing as torch, validated by
  the GRU torch oracle in ``tests/test_gru.py``); ``fc_{a,cls,rel,scene}``;
  ``lang_cls.0`` -> ``lang_cls``.
* ``attribute.*`` (``models/attribute_module.py:19-32``): ``net`` (see
  encoder below); ``vis_emb_fc.{0,1,3}`` -> ``vis_emb_fc_0 / vis_emb_fc_ln /
  vis_emb_fc_1``; ``lang_emb_fc.{0,1,3}`` -> ``lang_emb_fc_0 /
  lang_emb_fc_bn / lang_emb_fc_1``.
* ``relation.*`` (``models/relation_module.py:13-27``, dropout shifts the
  second Linear to index 4): ``vis_emb_fc.{0,1,4}``, ``lang_emb_fc.{0,1,4}``;
  ``gcn.mlp.{0,2}`` -> ``gcn/mlp_{0,1}``; ``gcn.weight.{0,2}`` ->
  ``gcn/weight_{0,1}``.
* ``scene.*`` (``models/scene_module.py:18-58``): ``net``; ``to_bev.1``
  (ToDenseBEVConvolution) -> ``to_bev_conv``; ``to_bev.2`` -> ``to_bev_bn``;
  ``vis_emb_fc.{0,1,4}`` -> ``vis_emb_fc_conv0 / vis_emb_fc_bn /
  vis_emb_fc_conv1``; ``vis_emb_fc1.{0,1,4}``, ``lang_emb_fc.{0,1,4}``
  (LayerNorm variants); ``cls.{0,1,3}`` -> ``cls_0 / cls_bn / cls_1``.
* encoder ``net.*`` (``models/basic_blocks.py:59-93,137-171``):
  ``stem.0.net.{0,1}`` -> ``stem/{conv,bn}``; ``stage{N}.0.net.{0,1}`` ->
  ``stage{N}_down/{conv,bn}``; ``stage{N}.1.net.{0,1,3,4}`` ->
  ``stage{N}_res/{conv1,bn1,conv2,bn2}``.  The ResidualBlock ``downsample``
  branch is an empty Sequential at every site in this topology (inc==outc,
  stride 1) and so never appears in a state_dict.

Layout transforms:

* ``nn.Linear`` weight ``[out, in]`` -> ``kernel = weight.T`` (TorchLinear
  stores ``[in, out]``); bias direct.
* ``nn.LayerNorm`` / BatchNorm ``weight`` -> ``scale``; ``running_mean`` /
  ``running_var`` -> ``batch_stats`` ``mean`` / ``var``;
  ``num_batches_tracked`` dropped (unused by either side's math).
* torchsparse ``spnn.Conv3d`` ``kernel`` ``[K, Cin, Cout]`` -> same layout,
  K axis re-ordered from torchsparse-1.2's offset enumeration to ours.
  torchsparse 1.2 (the version the reference pins, ``README.md:41-45``)
  enumerates x-fastest for both the 3^3 (offsets -1..1) and 2^3 (offsets
  {0,1}, ``kernel_region.py``) kernels — identical to
  ``ops/voxelize.KERNEL_OFFSETS_{3,2}`` — but the permutation is computed by
  offset-vector matching, not assumed.  Both sides gather the input at
  ``out_coord + offset*stride`` (torchsparse hashes ``coords + offset``).
* ``nn.Conv2d`` weight ``[out, in, kh, kw]`` -> flax NHWC ``[kh, kw, in,
  out]`` (transpose 2,3,1,0).
* ``ToDenseBEVConvolution.kernel`` ``[n_kernels, in, out]`` -> direct
  (``models/basic_blocks.py:219``; ``use_bias=False`` so no bias key).

``map_state_dict`` fails loudly on any unrecognized key so silent drift
between the reference and this table cannot go unnoticed.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from instancerefer_tpu.ops.voxelize import KERNEL_OFFSETS_2, KERNEL_OFFSETS_3


def torchsparse_offsets(kernel_size: int) -> np.ndarray:
    """torchsparse-1.2 kernel offset enumeration (``kernel_region.py``):
    per-axis offsets ``-ks//2+1 .. ks//2`` for odd ks, ``0 .. ks-1`` for even
    ks, composed x-fastest (``[[x,y,z] for z ... for y ... for x ...]``)."""
    if kernel_size % 2:
        axis = np.arange(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        axis = np.arange(0, kernel_size)
    return np.array(
        [[x, y, z] for z in axis for y in axis for x in axis], np.int32
    )


def _offset_permutation(ks: int, ours: np.ndarray) -> np.ndarray:
    """perm with ours[k] == ts_offsets[perm[k]] — our kernel's slot k takes
    the torchsparse slot holding the same geometric offset."""
    theirs = torchsparse_offsets(ks)
    index = {tuple(o): i for i, o in enumerate(theirs)}
    perm = np.array([index[tuple(o)] for o in ours], np.int64)
    if len(set(perm.tolist())) != len(perm):
        raise AssertionError("offset permutation is not a bijection")
    return perm


_PERM3 = _offset_permutation(3, KERNEL_OFFSETS_3)
_PERM2 = _offset_permutation(2, KERNEL_OFFSETS_2)


def _linear(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"kernel": np.ascontiguousarray(w.T), "bias": b}


def _conv3d(kernel: np.ndarray) -> np.ndarray:
    k = kernel.shape[0]
    if k == 27:
        return kernel[_PERM3]
    if k == 8:
        return kernel[_PERM2]
    raise ValueError(f"unexpected sparse-conv kernel volume {k}")


# encoder member -> (flax block, flax leaf-module) for SparseConvEncoder /
# BEVEncoder sites (reference models/basic_blocks.py:14-56: Sequential
# indices 0=conv,1=bn inside BasicConvolutionBlock.net; 0,1,3,4 inside
# ResidualBlock.net)
_ENCODER_SITES = {
    ("stem", "0", "net", "0"): ("stem", "conv"),
    ("stem", "0", "net", "1"): ("stem", "bn"),
    **{
        (f"stage{n}", seq, "net", idx): (f"stage{n}_{blk}", leaf)
        for n in (1, 2, 3, 4)
        for seq, idx, blk, leaf in (
            ("0", "0", "down", "conv"),
            ("0", "1", "down", "bn"),
            ("1", "0", "res", "conv1"),
            ("1", "1", "res", "bn1"),
            ("1", "3", "res", "conv2"),
            ("1", "4", "res", "bn2"),
        )
    },
}

# module-local Sequential index -> flax name, per reference module
_HEAD_SITES = {
    "lang": {
        ("word_projection", "0"): ("linear", "word_projection_0"),
        ("word_projection", "3"): ("linear", "word_projection_1"),
        ("fc_a",): ("linear", "fc_a"),
        ("fc_cls",): ("linear", "fc_cls"),
        ("fc_rel",): ("linear", "fc_rel"),
        ("fc_scene",): ("linear", "fc_scene"),
        ("lang_cls", "0"): ("linear", "lang_cls"),
    },
    "attribute": {
        ("vis_emb_fc", "0"): ("linear", "vis_emb_fc_0"),
        ("vis_emb_fc", "1"): ("norm", "vis_emb_fc_ln"),
        ("vis_emb_fc", "3"): ("linear", "vis_emb_fc_1"),
        ("lang_emb_fc", "0"): ("linear", "lang_emb_fc_0"),
        ("lang_emb_fc", "1"): ("batchnorm", "lang_emb_fc_bn"),
        ("lang_emb_fc", "3"): ("linear", "lang_emb_fc_1"),
    },
    "relation": {
        ("vis_emb_fc", "0"): ("linear", "vis_emb_fc_0"),
        ("vis_emb_fc", "1"): ("norm", "vis_emb_fc_ln"),
        ("vis_emb_fc", "4"): ("linear", "vis_emb_fc_1"),
        ("lang_emb_fc", "0"): ("linear", "lang_emb_fc_0"),
        ("lang_emb_fc", "1"): ("batchnorm", "lang_emb_fc_bn"),
        ("lang_emb_fc", "4"): ("linear", "lang_emb_fc_1"),
        ("gcn", "mlp", "0"): ("linear", "gcn/mlp_0"),
        ("gcn", "mlp", "2"): ("linear", "gcn/mlp_1"),
        ("gcn", "weight", "0"): ("linear", "gcn/weight_0"),
        ("gcn", "weight", "2"): ("linear", "gcn/weight_1"),
    },
    "scene": {
        ("to_bev", "1"): ("bev_kernel", "to_bev_conv"),
        ("to_bev", "2"): ("batchnorm", "to_bev_bn"),
        ("vis_emb_fc", "0"): ("conv2d", "vis_emb_fc_conv0/conv"),
        ("vis_emb_fc", "1"): ("batchnorm", "vis_emb_fc_bn"),
        ("vis_emb_fc", "4"): ("conv2d", "vis_emb_fc_conv1/conv"),
        ("vis_emb_fc1", "0"): ("linear", "vis_emb_fc1_0"),
        ("vis_emb_fc1", "1"): ("norm", "vis_emb_fc1_ln"),
        ("vis_emb_fc1", "4"): ("linear", "vis_emb_fc1_1"),
        ("lang_emb_fc", "0"): ("linear", "lang_emb_fc_0"),
        ("lang_emb_fc", "1"): ("norm", "lang_emb_fc_ln"),
        ("lang_emb_fc", "4"): ("linear", "lang_emb_fc_1"),
        ("cls", "0"): ("linear", "cls_0"),
        ("cls", "1"): ("batchnorm", "cls_bn"),
        ("cls", "3"): ("linear", "cls_1"),
    },
}

_GRU_RE = re.compile(r"^(weight|bias)_(ih|hh)_l([01])(_reverse)?$")


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    if parts[-1] in node:
        raise ValueError(f"duplicate assignment at {path}")
    node[parts[-1]] = np.asarray(value, np.float32)


def map_state_dict(
    state: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """Reference ``model.state_dict()`` (numpy leaves) -> ``(params,
    batch_stats)`` flax trees.  Raises on any key the table doesn't cover."""
    params: Dict = {}
    stats: Dict = {}

    # group keys by site so weight/bias/running_* land together
    leaves: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        parts = tuple(key.split("."))
        leaves.setdefault(parts[:-1], {})[parts[-1]] = np.asarray(value)

    for site, vals in sorted(leaves.items()):
        module, rest = site[0], site[1:]
        if module not in ("lang", "attribute", "relation", "scene"):
            raise ValueError(f"unknown reference module {'.'.join(site)}")

        # --- GRU: parameters live flat on lang.gru ---------------------
        if module == "lang" and rest == ("gru",):
            for name, value in vals.items():
                m = _GRU_RE.match(name)
                if not m:
                    raise ValueError(f"unknown GRU parameter lang.gru.{name}")
                kind, gate, layer, rev = m.groups()
                direction = "bwd" if rev else "fwd"
                leaf = ("wx" if gate == "ih" else "wh") if kind == "weight" else (
                    "bx" if gate == "ih" else "bh"
                )
                value = value.T if kind == "weight" else value
                _set(params, f"lang/gru/l{layer}_{direction}/{leaf}", value)
            continue

        # --- sparse encoders -------------------------------------------
        if rest[:1] == ("net",) and module in ("attribute", "scene"):
            if rest[1:] not in _ENCODER_SITES:
                raise ValueError(f"unknown encoder site {'.'.join(site)}")
            block, leaf = _ENCODER_SITES[rest[1:]]
            base = f"{module}/net/{block}/{leaf}"
            if leaf.startswith("conv"):
                if set(vals) != {"kernel"}:
                    raise ValueError(
                        f"sparse conv at {'.'.join(site)} has keys {sorted(vals)}"
                    )
                _set(params, f"{base}/kernel", _conv3d(vals["kernel"]))
            else:
                _emit_batchnorm(params, stats, base, site, vals)
            continue

        # --- per-module heads ------------------------------------------
        table = _HEAD_SITES[module]
        if rest not in table:
            raise ValueError(f"unknown reference parameter site {'.'.join(site)}")
        kind, flax_name = table[rest]
        base = f"{module}/{flax_name}"
        if kind == "linear":
            lin = _linear(vals.pop("weight"), vals.pop("bias"))
            _require_consumed(site, vals)
            _set(params, f"{base}/kernel", lin["kernel"])
            _set(params, f"{base}/bias", lin["bias"])
        elif kind == "norm":  # LayerNorm
            _set(params, f"{base}/scale", vals.pop("weight"))
            _set(params, f"{base}/bias", vals.pop("bias"))
            _require_consumed(site, vals)
        elif kind == "batchnorm":
            _emit_batchnorm(params, stats, base, site, vals)
        elif kind == "conv2d":
            w = vals.pop("weight")
            _set(params, f"{base}/kernel", np.transpose(w, (2, 3, 1, 0)))
            _set(params, f"{base}/bias", vals.pop("bias"))
            _require_consumed(site, vals)
        elif kind == "bev_kernel":
            _set(params, f"{base}/kernel", vals.pop("kernel"))
            _require_consumed(site, vals)
        else:  # pragma: no cover
            raise AssertionError(kind)

    return params, stats


def export_state_dict(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`map_state_dict`: flax ``(params, batch_stats)`` ->
    a reference-named torch-layout ``state_dict`` (numpy leaves), so a model
    trained here can be taken back to the reference stack
    (``model.load_state_dict`` after ``torch.from_numpy`` per leaf).

    Walks the same name tables as the import direction (so the two cannot
    drift apart) and inverts each layout transform.  Disabled modules are
    simply absent from ``params`` and are skipped.
    """
    sd: Dict[str, np.ndarray] = {}

    def get(tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return np.asarray(node)

    def emit(kind, ref, module, flax_name):
        base = f"{module}/{flax_name}"
        if kind == "linear":
            sd[f"{ref}.weight"] = np.ascontiguousarray(get(params, f"{base}/kernel").T)
            sd[f"{ref}.bias"] = get(params, f"{base}/bias")
        elif kind == "norm":
            sd[f"{ref}.weight"] = get(params, f"{base}/scale")
            sd[f"{ref}.bias"] = get(params, f"{base}/bias")
        elif kind == "batchnorm":
            sd[f"{ref}.weight"] = get(params, f"{base}/scale")
            sd[f"{ref}.bias"] = get(params, f"{base}/bias")
            sd[f"{ref}.running_mean"] = get(batch_stats, f"{base}/mean")
            sd[f"{ref}.running_var"] = get(batch_stats, f"{base}/var")
            sd[f"{ref}.num_batches_tracked"] = np.asarray(0, np.int64)
        elif kind == "conv2d":
            k = get(params, f"{base}/kernel")  # [kh, kw, in, out]
            sd[f"{ref}.weight"] = np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))
            sd[f"{ref}.bias"] = get(params, f"{base}/bias")
        elif kind == "bev_kernel":
            sd[f"{ref}.kernel"] = get(params, f"{base}/kernel")
        else:  # pragma: no cover
            raise AssertionError(kind)

    for module, table in _HEAD_SITES.items():
        if module not in params:
            continue
        for site, (kind, flax_name) in table.items():
            emit(kind, f"{module}." + ".".join(site), module, flax_name)

    for module in ("attribute", "scene"):
        if module not in params or "net" not in params[module]:
            continue
        for site, (block, leaf) in _ENCODER_SITES.items():
            ref = f"{module}.net." + ".".join(site)
            base = f"{module}/net/{block}/{leaf}"
            if leaf.startswith("conv"):
                kernel = get(params, f"{base}/kernel")
                perm = _PERM3 if kernel.shape[0] == 27 else _PERM2
                sd[f"{ref}.kernel"] = kernel[np.argsort(perm)]
            else:
                emit("batchnorm", ref, module, f"net/{block}/{leaf}")

    if "lang" in params and "gru" in params["lang"]:
        for layer in (0, 1):
            for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
                key = f"l{layer}_{direction}"
                if key not in params["lang"]["gru"]:
                    continue
                g = params["lang"]["gru"][key]
                sd[f"lang.gru.weight_ih_l{layer}{sfx}"] = np.ascontiguousarray(
                    np.asarray(g["wx"]).T
                )
                sd[f"lang.gru.weight_hh_l{layer}{sfx}"] = np.ascontiguousarray(
                    np.asarray(g["wh"]).T
                )
                sd[f"lang.gru.bias_ih_l{layer}{sfx}"] = np.asarray(g["bx"])
                sd[f"lang.gru.bias_hh_l{layer}{sfx}"] = np.asarray(g["bh"])

    return sd


def _emit_batchnorm(params, stats, base, site, vals):
    _set(params, f"{base}/scale", vals.pop("weight"))
    _set(params, f"{base}/bias", vals.pop("bias"))
    _set(stats, f"{base}/mean", vals.pop("running_mean"))
    _set(stats, f"{base}/var", vals.pop("running_var"))
    vals.pop("num_batches_tracked", None)
    _require_consumed(site, vals)


def _require_consumed(site, vals):
    if vals:
        raise ValueError(
            f"unconsumed parameters at {'.'.join(site)}: {sorted(vals)}"
        )


def assert_same_structure(converted: Dict, template: Dict, collection: str):
    """Fail loudly if the converted tree differs from a freshly initialized
    model's tree in leaf set or any leaf shape."""

    def flatten(t, prefix=""):
        out = {}
        for k, v in t.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, p))
            else:
                out[p] = tuple(np.shape(v))
        return out

    got, want = flatten(converted), flatten(template)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    if missing or extra or bad:
        raise ValueError(
            f"{collection} mismatch vs model template — missing: {missing[:8]}"
            f" extra: {extra[:8]}"
            f" shape-mismatched: {[(k, got[k], want[k]) for k in bad[:8]]}"
        )
