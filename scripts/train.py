"""Training CLI — same surface as the reference's ``scripts/train.py``.

    python scripts/train.py --config config/InstanceRefer.yaml --log_dir mylog

Mirrors: seeding (``:43-49``), source-file backup into the experiment dir
(``:26-41``), dataset/dataloader builders (``:52-69``), model construction with
the input-channel arithmetic (``:74-75``), pretrained/checkpoint restore
(``:83-96,114-119``), ``info.json`` run metadata dump (``:143-155``), and the
Solver-driven epoch loop.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from instancerefer_tpu.config import Config, load_config


def init_experiment(cfg: Config, stamp: str):
    root = os.path.join(cfg.path_output, stamp)
    os.makedirs(root, exist_ok=True)
    # source backup (scripts/train.py:26-41)
    backup = os.path.join(root, "backup")
    os.makedirs(backup, exist_ok=True)
    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "instancerefer_tpu")
    for rel in ["models/instancerefer.py", "models/lang_module.py",
                "models/attribute_module.py", "models/relation_module.py",
                "models/scene_module.py", "train/solver.py", "data/dataset.py"]:
        src = os.path.join(pkg, rel)
        if os.path.exists(src):
            os.makedirs(os.path.join(backup, os.path.dirname(rel)), exist_ok=True)
            shutil.copyfile(src, os.path.join(backup, rel))
    return root


def train(cfg: Config):
    import jax

    from instancerefer_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from instancerefer_tpu.ops.precision import set_compute_dtype

    set_compute_dtype(cfg.compute_dtype)

    from instancerefer_tpu.data.dataset import (
        PaddedLoader,
        ScannetReferenceDataset,
        get_scanrefer,
    )
    from instancerefer_tpu.data.scannet_config import ScannetDatasetConfig
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.train.solver import Solver

    np.random.seed(cfg.manual_seed)

    stamp = time.strftime("%Y-%m-%d_%H-%M-%S", time.gmtime())
    if cfg.log_dir:
        stamp += "_" + cfg.log_dir.upper()
    root = init_experiment(cfg, stamp)

    scanrefer_train = get_scanrefer(cfg.data_root, "train", cfg.num_scenes)
    scanrefer_val = get_scanrefer(cfg.data_root, "val", cfg.num_scenes)
    print(f"train on {len(scanrefer_train)} samples, val on {len(scanrefer_val)} samples")

    dc = ScannetDatasetConfig(meta_dir=os.path.join(cfg.data_root, "scannet", "meta_data"))
    spec = cfg.batch_spec()

    def make_ds(scanrefer, split):
        return ScannetReferenceDataset(
            scanrefer,
            split,
            data_root=cfg.data_root,
            num_points=cfg.num_points,
            use_color=cfg.use_color,
            use_height=cfg.use_height,
            use_normal=cfg.use_normal,
            use_multiview=cfg.use_multiview,
            use_augment=cfg.use_augment,
            seed=cfg.seed,
            dc=dc,
        )

    # multi-host data parallelism: each host loads its 1-in-process_count
    # slice of the global permutation (parallel.mesh.host_shard_indices) as
    # PER-HOST batches of batch_size/process_count samples; shard_batch
    # assembles them into the global batch via
    # jax.make_array_from_process_local_data, so the global batch is exactly
    # the union of the hosts' disjoint slices.
    pc = jax.process_count()
    assert cfg.batch_size % pc == 0, (
        f"batch_size {cfg.batch_size} must divide over {pc} hosts"
    )
    # (lang_bucket is multi-host-safe: loaders derive each batch's language
    # grid from the global permutation, so hosts stay shape-synchronized)
    local_bs = cfg.batch_size // pc
    host = dict(process_index=jax.process_index(), process_count=pc)
    # one dataset per split (shared by the plain and predicted-class loaders:
    # ScannetReferenceDataset.__init__ unpickles the full GloVe dict and
    # builds the unique/multiple lookup — too heavy to construct twice)
    datasets = {
        "train": make_ds(scanrefer_train, "train"),
        "val": make_ds(scanrefer_val, "val"),
    }
    loaders = {
        "train": PaddedLoader(
            datasets["train"], spec, local_bs,
            shuffle=True, seed=cfg.manual_seed, num_workers=cfg.num_workers,
            voxel_size_ap=cfg.voxel_size_ap, voxel_size_glp=cfg.voxel_size_glp,
            **host,
        ),
        "val": PaddedLoader(
            datasets["val"], spec, local_bs,
            shuffle=False, seed=cfg.manual_seed, num_workers=cfg.num_workers,
            drop_last=False,
            voxel_size_ap=cfg.voxel_size_ap, voxel_size_glp=cfg.voxel_size_glp,
            **host,
        ),
    }

    model = InstanceRefer(
        input_feature_dim=cfg.input_feature_dim,
        num_classes=cfg.num_classes,
        max_candidates=cfg.max_candidates,
        use_bidir=cfg.use_bidir,
        k=cfg.k,
        use_attribute=bool(cfg.attribute_module),
        use_relation=bool(cfg.relation_module),
        use_scene=bool(cfg.scene_module),
    )

    solver = Solver(
        model,
        dc.mean_size_arr,
        lr=cfg.lr,
        wd=cfg.wd,
        lr_decay_step=cfg.lr_decay_step,
        lr_decay_rate=cfg.lr_decay_rate,
        bn_decay_step=cfg.bn_decay_step,
        bn_decay_rate=cfg.bn_decay_rate,
        steps_per_epoch=len(loaders["train"]),
        stamp=stamp,
        output_dir=cfg.path_output,
        val_step=cfg.val_step,
        start_val=cfg.start_val,
        seed=cfg.manual_seed,
    )

    # init params from the first batch
    from instancerefer_tpu.data.pipeline import batch_to_device_dict

    first = next(iter(loaders["val" if len(scanrefer_val) else "train"]))
    solver.init_params(batch_to_device_dict(first, spec))

    if cfg.use_checkpoint:
        print(f"loading checkpoint {cfg.use_checkpoint}...")
        solver.load_checkpoint(
            os.path.join(cfg.path_output, cfg.use_checkpoint, "checkpoint"),
            with_opt=True,
        )
    elif cfg.pretrain:
        print(f"loading pretrained model {cfg.pretrain}...")
        solver.load_checkpoint(cfg.pretrain)
    elif cfg.use_pretrained:
        # partial warm-start of the four submodules (scripts/train.py:83-96)
        if not isinstance(cfg.use_pretrained, str):
            # `use_pretrained: true` is a config mistake (the reference option
            # is a run-name string); silently training from random init while
            # the user believes they warm-started would be worse than failing
            raise ValueError(
                "use_pretrained must be the pretrained run's name/path "
                f"(a string), got {cfg.use_pretrained!r}"
            )
        print(f"warm-starting submodules from {cfg.use_pretrained}...")
        solver.load_pretrained_modules(
            os.path.join(cfg.use_pretrained, "model_last")
        )

    if not cfg.use_gt_lang:
        # Train-time predicted-class candidate filtering (reference
        # models/attribute_module.py:93-97 with use_gt_lang False): wrap the
        # loaders so each epoch re-predicts every sample's class with the
        # CURRENT language weights (cheap language-only pass) and filters
        # candidates by it.  See PredictedClassLoader for the per-epoch
        # refresh approximation note.
        from instancerefer_tpu.data.dataset import PredictedClassLoader
        from instancerefer_tpu.models.lang_module import LangModule

        lang = LangModule(num_text_classes=cfg.num_classes, use_bidir=cfg.use_bidir)

        @jax.jit
        def _lang_step(params, lang_feat, lang_len):
            out = lang.apply(
                {"params": params},
                {"lang_feat": lang_feat, "lang_len": lang_len},
                train=False,
            )
            return jax.numpy.argmax(out["lang_scores"], axis=1)

        def predict_fn(lang_feat, lang_len):
            return jax.device_get(
                _lang_step(solver.state["params"]["lang"], lang_feat, lang_len)
            )

        for phase, shuffle, extra in (
            ("train", True, {}),
            ("val", False, {"drop_last": False}),
        ):
            loaders[phase] = PredictedClassLoader(
                datasets[phase],
                spec, local_bs, predict_fn,
                shuffle=shuffle, seed=cfg.manual_seed,
                num_workers=cfg.num_workers,
                voxel_size_ap=cfg.voxel_size_ap,
                voxel_size_glp=cfg.voxel_size_glp,
                **extra, **host,
            )

    # info.json (scripts/train.py:143-155)
    info = {k: v for k, v in vars(cfg).items() if isinstance(v, (str, int, float, bool, list))}
    info["num_train"] = len(scanrefer_train)
    info["num_val"] = len(scanrefer_val)
    info["num_devices"] = len(jax.devices())
    with open(os.path.join(root, "info.json"), "w") as f:
        json.dump(info, f, indent=4)

    class _DeviceLoader:
        def __init__(self, loader):
            self.loader = loader

        def __len__(self):
            return len(self.loader)

        def __iter__(self):
            for b in self.loader:
                yield batch_to_device_dict(b, spec)

    print("start training...\n")
    solver({k: _DeviceLoader(v) for k, v in loaders.items()}, cfg.epoch, cfg.verbose)


if __name__ == "__main__":
    cfg = load_config()
    train(cfg)
