"""torch -> flax ENet weight converter for ``scannetv2_enet.pth``.

    python scripts/convert_enet.py --pth scannetv2_enet.pth --out enet_flax

Loads the reference's pretrained ENet state dict (the Sequential built by
``/root/reference/lib/enet.py:130-693`` — note its decoder is commented out,
so the live module list is: initial block (4 modules) + 22 bottlenecks +
1x1 classifier) and emits an orbax checkpoint of the flax ``Enet`` variables
(``instancerefer_tpu/models/enet.py``), which both multiview scripts accept
via ``--weights``:

    python scripts/compute_multiview_features.py --weights enet_flax ...
    python scripts/project_multiview_labels.py   --weights enet_flax ...

Conversions: conv OIHW -> HWIO; BatchNorm weight/bias -> scale/bias +
running stats -> batch_stats; per-channel PReLU weight -> alpha.  Golden
activation parity vs a torch execution of the reference network is tested in
``tests/test_enet_convert.py`` (max abs diff < 1e-4 on a fixture frame).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from instancerefer_tpu.models.enet import BOTTLENECK_PLAN

# Top-level indices of the reference Sequential: 0=LambdaMap(conv,pool),
# 1=LambdaReduce, 2=BN, 3=PReLU, 4..25=bottlenecks, 26=classifier.
FIRST_BOTTLENECK_INDEX = 4


def _conv(sd, key, transpose=(2, 3, 1, 0)):
    out = {"kernel": np.asarray(sd[f"{key}.weight"]).transpose(*transpose)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _bn(sd, key):
    params = {"scale": np.asarray(sd[f"{key}.weight"]),
              "bias": np.asarray(sd[f"{key}.bias"])}
    stats = {"mean": np.asarray(sd[f"{key}.running_mean"]),
             "var": np.asarray(sd[f"{key}.running_var"])}
    return params, stats


def _prelu(sd, key):
    return {"alpha": np.asarray(sd[f"{key}.weight"])}


def convert_state_dict(sd):
    """torch state dict -> flax {"params": ..., "batch_stats": ...} for Enet."""
    sd = {k: v for k, v in sd.items()}
    enc_params, enc_stats = {}, {}

    # initial block: conv "0.0", bn "2", prelu "3"
    bn_p, bn_s = _bn(sd, "2")
    enc_params["initial"] = {"conv": _conv(sd, "0.0"), "bn": bn_p,
                             "prelu": _prelu(sd, "3")}
    enc_stats["initial"] = {"bn": bn_s}

    for j, (name, kw) in enumerate(BOTTLENECK_PLAN):
        idx = FIRST_BOTTLENECK_INDEX + j
        ext = f"{idx}.0.0"  # LambdaMap child 0 = the ext Sequential
        p, s = {}, {}
        p["conv_reduce"] = _conv(sd, f"{ext}.0")
        p["bn_reduce"], s["bn_reduce"] = _bn(sd, f"{ext}.1")
        p["prelu_reduce"] = _prelu(sd, f"{ext}.2")
        if kw.get("asymmetric"):
            p["conv_mid_a"] = _conv(sd, f"{ext}.3")
            p["conv_mid_b"] = _conv(sd, f"{ext}.4")
            mid = 5
        else:
            p["conv_mid"] = _conv(sd, f"{ext}.3")
            mid = 4
        p["bn_mid"], s["bn_mid"] = _bn(sd, f"{ext}.{mid}")
        p["prelu_mid"] = _prelu(sd, f"{ext}.{mid + 1}")
        p["conv_expand"] = _conv(sd, f"{ext}.{mid + 2}")
        p["bn_expand"], s["bn_expand"] = _bn(sd, f"{ext}.{mid + 3}")
        p["prelu_out"] = _prelu(sd, f"{idx}.2")
        enc_params[name] = p
        enc_stats[name] = s

    cls_idx = FIRST_BOTTLENECK_INDEX + len(BOTTLENECK_PLAN)
    cls_params = {"conv": _conv(sd, f"{cls_idx}.0")}

    return {
        "params": {"encoder": enc_params, "classifier": cls_params},
        "batch_stats": {"encoder": enc_stats},
    }


def main():
    parser = argparse.ArgumentParser(description="torch->flax ENet converter")
    parser.add_argument("--pth", required=True, help="scannetv2_enet.pth")
    parser.add_argument("--out", required=True, help="orbax checkpoint dir")
    args = parser.parse_args()

    import torch

    try:
        sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    variables = convert_state_dict(sd)

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.out), variables, force=True)
    n = sum(np.asarray(x).size for x in
            __import__("jax").tree_util.tree_leaves(variables["params"]))
    print(f"converted {n} params -> {args.out}")


if __name__ == "__main__":
    main()
