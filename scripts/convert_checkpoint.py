"""Convert a reference-trained InstanceRefer torch checkpoint to orbax.

    python scripts/convert_checkpoint.py model_last.pth out_dir/model_last
    python scripts/convert_checkpoint.py checkpoint.tar out_dir/model_last

Accepts the reference's ``model_last.pth`` / ``model.pth`` (raw
``state_dict()``, ``lib/solver.py:154-156,342``) or ``checkpoint.tar``
(``{epoch, model_state_dict, optimizer_state_dict}``,
``lib/solver.py:373-381``; the optimizer moments are torch-specific and are
not converted).  The output is an orbax checkpoint of ``{params,
batch_stats}`` that ``scripts/train.py --pretrain <dir>`` /
``use_pretrained`` and ``scripts/eval.py`` load directly.

The converted tree is structure-checked against a freshly initialized model
(same leaf paths and shapes) before saving; pass ``--skip-structure-check``
to convert a checkpoint trained with non-default module switches.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", help="model_last.pth / model.pth / checkpoint.tar"
                    " (or an orbax checkpoint dir with --to-torch)")
    ap.add_argument("dest", help="output orbax checkpoint directory"
                    " (or output .pth with --to-torch)")
    ap.add_argument("--skip-structure-check", action="store_true")
    ap.add_argument(
        "--to-torch", action="store_true",
        help="reverse direction: orbax {params, batch_stats} -> reference-"
             "named state_dict .pth (loadable by the reference's "
             "model.load_state_dict)",
    )
    args = ap.parse_args()

    import numpy as np
    import torch

    from instancerefer_tpu.utils.convert_torch import (
        assert_same_structure,
        export_state_dict,
        map_state_dict,
    )

    if args.to_torch:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(args.source))
        sd = export_state_dict(payload["params"], payload["batch_stats"])
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
             else torch.tensor(v) for k, v in sd.items()},
            args.dest,
        )
        print(f"saved {args.dest} ({len(sd)} tensors, reference state_dict names)")
        return

    blob = torch.load(args.source, map_location="cpu")
    epoch = None
    if isinstance(blob, dict) and "model_state_dict" in blob:
        epoch = blob.get("epoch")
        blob = blob["model_state_dict"]
    state = {k: v.numpy() for k, v in blob.items()}
    print(f"loaded {len(state)} tensors from {args.source}"
          + (f" (checkpoint.tar, epoch {epoch})" if epoch is not None else ""))

    params, batch_stats = map_state_dict(state)

    if not args.skip_structure_check:
        import dataclasses
        import functools

        import jax

        from instancerefer_tpu.data.synthetic import TEST_SPEC, make_device_batch
        from instancerefer_tpu.models.instancerefer import InstanceRefer

        # the template only supplies leaf paths/shapes; the feature dim
        # comes from the stem kernel, the class count from the classifier
        stem = state.get(
            "attribute.net.stem.0.net.0.kernel",
            state.get("scene.net.stem.0.net.0.kernel"),
        )
        feat_dim = int(stem.shape[1]) if stem is not None else TEST_SPEC.feat_dim
        spec = dataclasses.replace(TEST_SPEC, feat_dim=feat_dim)
        model = InstanceRefer(
            input_feature_dim=feat_dim,
            num_classes=int(state["lang.lang_cls.0.weight"].shape[0]),
            max_candidates=spec.max_candidates,
        )
        batch = make_device_batch(2, spec, seed=0)
        variables = jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch
        )
        assert_same_structure(params, variables["params"], "params")
        assert_same_structure(batch_stats, variables["batch_stats"], "batch_stats")
        print("structure check passed (leaf paths and shapes match the model)")

    import orbax.checkpoint as ocp

    dest = os.path.abspath(args.dest)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(dest, {"params": params, "batch_stats": batch_stats}, force=True)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"saved {dest} ({n/1e6:.2f} M params)")


if __name__ == "__main__":
    main()
