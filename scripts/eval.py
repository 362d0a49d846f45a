"""Evaluation CLI — same surface as the reference's ``scripts/eval.py``.

    python scripts/eval.py --config config/InstanceRefer.yaml --log_dir mylog

Scores the full val split with the checkpointed model, caches per-sample
scores (``scores.npz`` — the reference pickles ``scores.p``,
``scripts/eval.py:160-199``) and prints the unique/multiple x others
Acc@0.25/0.5 table (``:201-334``).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from instancerefer_tpu.config import Config, load_config


def resolve_run_dir(cfg: Config) -> str:
    """Locate the training run directory holding ``model_last``.

    Accepts either the experiment name used at training time (``--log_dir``
    as in the reference, where the newest timestamped run under its
    ``checkpoints/`` is picked) or a direct run-directory path.  Fails loudly
    (listing what exists) rather than silently evaluating some other run's
    checkpoint; prints the resolved path.
    """
    import glob as _glob

    candidates = []
    if os.path.isdir(os.path.join(cfg.log_dir, "model_last")):
        candidates.append(cfg.log_dir)
    # newest stamped run of THIS experiment (path_output embeds log_dir)
    candidates += sorted(
        _glob.glob(os.path.join(cfg.path_output, "*", "model_last")), reverse=True
    )
    # runs whose stamp suffix is the log_dir (train.py names run dirs
    # "{timestamp}_{log_dir.upper()}")
    candidates += sorted(
        _glob.glob(
            os.path.join(cfg.output_root, cfg.dataset, "*", "checkpoints",
                         "*_" + cfg.log_dir.upper(), "model_last")
        ),
        reverse=True,
    )
    for c in candidates:
        run = c[: -len("/model_last")] if c.endswith("model_last") else c
        if os.path.isdir(os.path.join(run, "model_last")):
            print(f"evaluating run: {run}")
            return run
    others = sorted(
        _glob.glob(
            os.path.join(cfg.output_root, cfg.dataset, "*", "checkpoints", "*",
                         "model_last")
        )
    )
    hint = (
        "\n  runs that do exist (pass one as --log_dir):\n    "
        + "\n    ".join(os.path.dirname(o) for o in others)
        if others
        else ""
    )
    raise FileNotFoundError(
        f"no trained run with model_last found for log_dir={cfg.log_dir!r} "
        f"under {cfg.path_output!r}{hint}"
    )


def check_eval_overflow(overflow_max: dict, allow: bool):
    """Fail loud when eval data overflowed any padded capacity (VERDICT r4
    #2): the reference evaluates ragged, uncapped lists
    (``lib/dataset.py:207-245``), so a truncated candidate/voxel at eval is a
    silent metric deviation.  ``overflow_max``: {"scene"/"inst"/"cand": max
    per-sample overflow fraction seen}.  ``allow`` downgrades to a warning
    (--allow_overflow)."""
    bad = {k: v for k, v in overflow_max.items() if v > 0}
    if not bad:
        return
    msg = (
        "capacity overflow at eval — padded caps truncated data the "
        f"reference would keep (max per-sample overflow fraction: {bad}). "
        "Fit caps to this dataset with `scripts/calibrate_bands.py "
        "--fit-caps --emit-yaml <profile>` and point the config's "
        "band_profile at it, or re-run with --allow_overflow to accept "
        "the deviation (see DEVIATIONS.md D4)."
    )
    if allow:
        print(f"WARNING: {msg}")
    else:
        raise SystemExit(f"ERROR: {msg}")


def _pop_band_diagnostics(dd, _warned=[]):
    """Strip the 0-d band-drop counters before jit (shared helper) and warn
    once if bands ever dropped a neighbor."""
    from instancerefer_tpu.data.pipeline import pop_band_diagnostics

    drops = pop_band_diagnostics(dd)
    if not _warned and any(d > 0 for d in drops.values()):
        _warned.append(True)
        print(
            f"WARNING: banded conv dropped neighbors {drops} — raise "
            "pallas_subwin for exact scores"
        )


def eval_ref(cfg: Config):
    import jax

    from instancerefer_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from instancerefer_tpu.data.dataset import (
        PaddedLoader,
        ScannetReferenceDataset,
        get_scanrefer,
    )
    from instancerefer_tpu.data.pipeline import batch_to_device_dict
    from instancerefer_tpu.data.scannet_config import ScannetDatasetConfig
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.train.evaluate import aggregate_scores, get_eval
    from instancerefer_tpu.train.losses import get_loss
    from instancerefer_tpu.train.solver import Solver

    root = resolve_run_dir(cfg)
    stamp = os.path.basename(root)
    cache_path = os.path.join(root, "scores.npz")

    if not os.path.exists(cache_path):
        scanrefer_val = get_scanrefer(cfg.data_root, "val", cfg.num_scenes)
        print(f"evaluating on {len(scanrefer_val)} samples...")

        dc = ScannetDatasetConfig(
            meta_dir=os.path.join(cfg.data_root, "scannet", "meta_data")
        )
        spec = cfg.batch_spec()
        dataset = ScannetReferenceDataset(
            scanrefer_val, "val",
            data_root=cfg.data_root, num_points=cfg.num_points,
            use_color=cfg.use_color, use_height=cfg.use_height,
            use_normal=cfg.use_normal, use_multiview=cfg.use_multiview,
            use_augment=False, seed=cfg.seed, dc=dc,
        )
        loader = PaddedLoader(
            dataset, spec, cfg.batch_size, shuffle=False, num_workers=cfg.num_workers,
            drop_last=False,
            voxel_size_ap=cfg.voxel_size_ap, voxel_size_glp=cfg.voxel_size_glp,
        )

        model = InstanceRefer(
            input_feature_dim=cfg.input_feature_dim,
            num_classes=cfg.num_classes,
            max_candidates=cfg.max_candidates,
            use_bidir=cfg.use_bidir,
            k=cfg.k,
            # module ablations must match training: a checkpoint trained with
            # e.g. relation_module null has no params["relation"] subtree and
            # the restore template must agree
            use_attribute=bool(cfg.attribute_module),
            use_relation=bool(cfg.relation_module),
            use_scene=bool(cfg.scene_module),
        )
        solver = Solver(
            model, dc.mean_size_arr, stamp=stamp, output_dir=cfg.path_output,
            steps_per_epoch=1,
        )
        first = batch_to_device_dict(next(iter(loader)), spec)
        solver.init_params(first)
        # the reference loads model_last.pth (scripts/eval.py:54)
        solver.load_checkpoint(os.path.join(root, "model_last"))
        mean_size = jax.numpy.asarray(dc.mean_size_arr)

        if not cfg.use_gt_lang:
            # Two-pass eval: the reference filters candidates by
            # argmax(lang_scores) when use_gt_lang is False
            # (models/attribute_module.py:93-97).  Candidates live in the
            # input pipeline here, so pass 1 runs just the language branch —
            # through the cheap ``dataset.get_lang`` path (no scene IO, no
            # voxelization; same machinery as train-time
            # PredictedClassLoader._predict_overrides) — and pass 2 rebuilds
            # the loader filtered by the predictions.
            from instancerefer_tpu.data.dataset import PredictedClassLoader
            from instancerefer_tpu.models.lang_module import LangModule

            lang = LangModule(num_text_classes=cfg.num_classes,
                              use_bidir=cfg.use_bidir)
            lang_params = solver.state["params"]["lang"]

            @jax.jit
            def _lang_step(params, lang_feat, lang_len):
                out = lang.apply(
                    {"params": params},
                    {"lang_feat": lang_feat, "lang_len": lang_len},
                    train=False,
                )
                return jax.numpy.argmax(out["lang_scores"], axis=1)

            def predict_fn(lang_feat, lang_len):
                return jax.device_get(_lang_step(lang_params, lang_feat, lang_len))

            pcl = PredictedClassLoader(
                dataset, spec, cfg.batch_size, predict_fn,
                shuffle=False, num_workers=cfg.num_workers, drop_last=False,
                voxel_size_ap=cfg.voxel_size_ap, voxel_size_glp=cfg.voxel_size_glp,
            )
            overrides = pcl._predict_overrides()
            print(f"pass 1 done: predicted classes for {len(overrides)} samples")
            loader = PaddedLoader(
                dataset, spec, cfg.batch_size, shuffle=False,
                num_workers=cfg.num_workers, drop_last=False,
                voxel_size_ap=cfg.voxel_size_ap, voxel_size_glp=cfg.voxel_size_glp,
                class_overrides=overrides,
            )

        @jax.jit
        def step(params, batch_stats, batch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, train=False
            )
            out = get_loss(out, mean_size)  # cluster_label needed by eval (:127)
            out = get_eval(out)
            return {
                "ref_iou": out["ref_iou"],
                "ref_acc": out["ref_acc"],
                "multiple": out["ref_multiple_mask"],
                "others": out["ref_others_mask"],
                # per-sample correctness so padded duplicate rows can be
                # filtered out of the published lang_acc
                "lang_correct": out["lang_correct"],
                # predicted/GT boxes (the reference also pickles predictions.p,
                # scripts/eval.py:160-187)
                "pred_bboxes": out["pred_bboxes"],
                "gt_bboxes": out["gt_bboxes"],
            }

        all_res = {
            k: []
            for k in ["ref_iou", "ref_acc", "multiple", "others",
                      "lang_correct", "pred_bboxes", "gt_bboxes"]
        }
        overflow_max = {"scene": 0.0, "inst": 0.0, "cand": 0.0}
        for batch in loader:
            valid = batch.pop("sample_valid", np.ones(cfg.batch_size, bool))
            for key in overflow_max:
                ov = batch.get(f"{key}_overflow")
                if ov is not None:
                    overflow_max[key] = max(
                        overflow_max[key], float(np.asarray(ov)[valid].max())
                    )
            dd = batch_to_device_dict(batch, spec)
            _pop_band_diagnostics(dd)
            res = jax.device_get(
                step(solver.state["params"], solver.state["batch_stats"], dd)
            )
            for k in all_res:
                all_res[k].append(np.asarray(res[k])[valid])
        # gate BEFORE caching: an overflowing run must not leave a cache
        # that silently short-circuits future (gated) evals
        check_eval_overflow(overflow_max, cfg.allow_overflow)
        res = {k: np.concatenate(v) for k, v in all_res.items()}
        res["lang_acc"] = res["lang_correct"]
        np.savez(cache_path, **res)
    else:
        print(f"loading cached scores from {cache_path}...")
        res = dict(np.load(cache_path))

    table = aggregate_scores(res["ref_iou"], res["ref_acc"], res["multiple"], res["others"])
    print(json.dumps(table, indent=2))
    print(f"lang_acc: {float(np.mean(res['lang_acc'])):.4f}")
    overall = table["overall"]["overall"]
    print(
        f"overall: ref_acc={overall['ref_acc']:.4f} "
        f"acc@0.25={overall['acc@0.25iou']:.4f} acc@0.5={overall['acc@0.5iou']:.4f}"
    )
    return table


if __name__ == "__main__":
    cfg = load_config()
    eval_ref(cfg)
