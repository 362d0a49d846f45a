"""Config system: argparse + YAML with the reference's exact schema.

Port of ``lib/config.py`` + ``config/InstanceRefer.yaml`` with one deliberate
change (SURVEY.md §5): no import-time global singleton — ``load_config`` is an
explicit call returning a ``Config`` object.  All YAML keys from the reference
schema (GENERAL/DATA/MODEL/TRAIN sections flattened onto one namespace,
``lib/config.py:24-26``) are preserved, plus a TPU section for the padded
capacities this framework introduces.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml

from instancerefer_tpu.data.pipeline import BatchSpec


@dataclasses.dataclass
class Config:
    # GENERAL
    manual_seed: int = 123
    # DATA (config/InstanceRefer.yaml:4-15)
    dataset: str = "ScanRefer"
    num_points: int = 40000
    num_scenes: int = -1
    num_classes: int = 18
    use_augment: bool = True
    use_height: bool = True
    use_color: bool = True
    use_normal: bool = False
    use_multiview: bool = False
    # MODEL (:17-41)
    model: str = "instancerefer"
    use_gt_lang: bool = True
    attribute_module: str = "attribute_module"
    voxel_size_ap: float = 0.02
    relation_module: str = "relation_module"
    k: int = 8
    scene_module: str = "scene_module"
    voxel_size_glp: float = 0.05
    language_module: str = "lang_module"
    use_bidir: bool = True
    use_checkpoint: Optional[str] = None
    use_pretrained: Any = False
    # TRAIN (:43-57)
    batch_size: int = 64
    num_workers: int = 4
    epoch: int = 25
    lr: float = 0.001
    lr_decay_step: Sequence[int] = (15, 20)
    lr_decay_rate: float = 0.1
    bn_decay_step: Optional[int] = None
    bn_decay_rate: Optional[float] = None
    wd: float = 0.00001
    verbose: int = 20
    val_step: int = 2000
    start_val: int = 0
    # CLI (lib/config.py:10-17)
    gpu: str = "0"
    config: str = "config/InstanceRefer.yaml"
    log_dir: str = "test"
    debug: bool = False
    pretrain: str = ""
    # constants (lib/config.py:73-75)
    max_des_len: int = 126
    seed: int = 42
    # TPU capacities (new)
    max_instances: int = 128
    max_candidates: int = 16
    scene_caps: Sequence[int] = (20480, 8192, 4096, 2048, 1024)
    inst_caps: Sequence[int] = (4096, 2048, 1024, 512, 256)
    # matmul-input dtype for the hot GEMMs ('bfloat16' = native MXU speed,
    # f32 accumulation; 'float32' = full precision)
    compute_dtype: str = "bfloat16"
    # banded Pallas submanifold conv (train + eval; requires a TPU backend —
    # auto-disabled elsewhere).  Geometry per ops/pallas_conv.
    pallas_conv: bool = True
    pallas_chunk: int = 256
    pallas_window: int = 1024
    # per-stage one-hot band widths (int broadcasts to all stages; the MXU
    # lane-pads to 128 multiples, so use 128/256/384/512); kernel time is
    # proportional to V * subwin, and the solver warns if a band ever drops
    # a neighbor — see ops/pallas_conv module docstring
    pallas_subwin: Sequence[int] = (384, 512, 384, 384, 128)
    pallas_subwin_inst: Sequence[int] = (384, 384, 384, 384, 256)
    pallas_count_drops: bool = True
    # banded geometry for the stride-2 down maps (0 = keep that stage's down
    # conv on the XLA gather path; see data/pipeline.BatchSpec)
    pallas_down_chunk: int = 128
    pallas_down_subwin: Sequence[int] = (0, 1280, 768, 768, 256)
    pallas_down_window: Sequence[int] = (0, 1536, 1024, 1024, 512)
    pallas_down_subwin_inst: Sequence[int] = (0, 256, 384, 0, 0)
    pallas_down_window_inst: Sequence[int] = (0, 512, 512, 0, 0)
    # inverse (up) map bands driving the banded down-conv dX
    pallas_up_window: int = 512
    pallas_up_subwin: int = 384
    # bucketed language grid (data/pipeline.BatchSpec.lang_bucket — the
    # pack_padded_sequence analog); 0 = fixed max_des_len grid.  Multi-host
    # safe: hosts derive each batch's bucket from the shared global epoch
    # plan (PaddedLoader._global_lang_grids), so per-host shapes agree.
    lang_bucket: int = 32
    # measured band-geometry profile: a yaml written by
    # scripts/calibrate_bands.py --emit-yaml, overlaid onto the pallas_*
    # keys above at load time — so shipped geometry is provably derived
    # from measurement, not hand-tuning (None = use the keys as written)
    band_profile: Optional[str] = None
    # eval-time capacity-overflow policy: the reference evaluates ragged,
    # uncapped lists (lib/dataset.py:207-245), so ANY cap overflow at eval is
    # a silent metric deviation — scripts/eval.py fails loud on overflow > 0
    # unless this is set (CLI --allow_overflow downgrades to a warning).
    # Fit caps to the data with scripts/calibrate_bands.py --fit-caps.
    allow_overflow: bool = False
    # paths (lib/config.py:34-70 tree, rooted at --data_root)
    data_root: str = "data"
    output_root: str = "outputs"

    @property
    def input_feature_dim(self) -> int:
        """Channel arithmetic of scripts/train.py:74-75."""
        return (
            int(self.use_multiview) * 128
            + int(self.use_normal) * 3
            + int(self.use_color) * 3
            + int(self.use_height + 3)
        )

    def batch_spec(self) -> BatchSpec:
        def _seq(v):
            return v if isinstance(v, int) or v is None else tuple(v)

        use_pallas = bool(self.pallas_conv)
        data_shards = 1
        if use_pallas:
            # Mosaic kernels need a real TPU backend; CPU/GPU fall back to the
            # XLA gather-GEMM path (identical math, tested in
            # tests/test_pallas_conv.py).  Multi-device meshes run the banded
            # kernels shard_map'd over the data axis with block-clamped,
            # per-shard-localized band metadata (ops/pallas_conv sharded
            # wrappers; equality vs the global conv tested on the fake
            # 8-device CPU mesh in tests/test_multichip.py).
            try:
                import jax

                use_pallas = jax.default_backend() not in ("cpu", "gpu")
                data_shards = len(jax.devices()) if use_pallas else 1
            except Exception:
                use_pallas = False
        # lang_bucket works on multi-host runs too: PaddedLoader derives each
        # batch's grid from the GLOBAL permutation + lang_lengths(), so every
        # host compiles the same shapes (test_lang_bucket_multihost_symmetric).
        lang_bucket = self.lang_bucket
        return BatchSpec(
            max_tokens=self.max_des_len,
            max_instances=self.max_instances,
            max_candidates=self.max_candidates,
            scene_caps=tuple(self.scene_caps),
            inst_caps=tuple(self.inst_caps),
            num_classes=self.num_classes,
            feat_dim=self.input_feature_dim,
            pallas_conv=use_pallas,
            pallas_chunk=self.pallas_chunk,
            pallas_window=self.pallas_window,
            pallas_subwin=(
                self.pallas_subwin
                if isinstance(self.pallas_subwin, int)
                else tuple(self.pallas_subwin)
            ),
            pallas_subwin_inst=(
                self.pallas_subwin_inst
                if isinstance(self.pallas_subwin_inst, int)
                or self.pallas_subwin_inst is None
                else tuple(self.pallas_subwin_inst)
            ),
            pallas_count_drops=self.pallas_count_drops,
            pallas_down_chunk=self.pallas_down_chunk,
            pallas_down_subwin=_seq(self.pallas_down_subwin),
            pallas_down_window=_seq(self.pallas_down_window),
            pallas_down_subwin_inst=_seq(self.pallas_down_subwin_inst),
            pallas_down_window_inst=_seq(self.pallas_down_window_inst),
            pallas_up_window=self.pallas_up_window,
            pallas_up_subwin=self.pallas_up_subwin,
            lang_bucket=lang_bucket,
            data_shards=data_shards,
        )

    # ---- reference path tree (lib/config.py:34-70)
    @property
    def path_data(self):
        return self.data_root

    @property
    def path_scannet(self):
        return os.path.join(self.data_root, "scannet")

    @property
    def path_scannet_meta(self):
        return os.path.join(self.path_scannet, "meta_data")

    @property
    def path_scannet_data(self):
        return os.path.join(self.path_scannet, "pointgroup_data")

    @property
    def path_glove(self):
        return os.path.join(self.data_root, "glove.p")

    @property
    def path_multiview(self):
        return os.path.join(self.data_root, "enet_feats_maxpool.hdf5")

    @property
    def exp_path(self):
        return os.path.join(self.output_root, self.dataset, self.log_dir)

    @property
    def path_output(self):
        return os.path.join(self.exp_path, "checkpoints")


def _flatten_yaml(cfg_file: str) -> Dict[str, Any]:
    with open(cfg_file) as f:
        raw = yaml.safe_load(f)
    flat: Dict[str, Any] = {}
    for section in raw or {}:
        for k, v in (raw[section] or {}).items():
            flat[k] = v
    return flat


_PROFILE_CAP_KEYS = ("scene_caps", "inst_caps", "max_candidates", "max_instances")


def band_profile_kwargs(path: str) -> Dict[str, Any]:
    """The ONE policy for mapping a ``calibrate_bands.py --emit-yaml`` profile
    onto pallas_* band-geometry kwargs (Config fields / BatchSpec kwargs):
    every ``pallas_*`` key across sections plus the fitted capacity keys
    (``--fit-caps``: scene/inst_caps, max_candidates, max_instances); yaml
    lists become tuples.  Shared by ``load_config``, ``bench.py``, and the
    band-profile tests so the overlay policy can never drift between
    train/eval, the bench artifact, and CI."""
    return {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in _flatten_yaml(path).items()
        if (k.startswith("pallas_") or k in _PROFILE_CAP_KEYS) and v is not None
    }


def load_config(argv: Optional[List[str]] = None) -> Config:
    """CLI flags (lib/config.py:10-17) + YAML sections -> Config."""
    parser = argparse.ArgumentParser(description="InstanceRefer-TPU")
    parser.add_argument("--gpu", type=str, default="0", help="device idx (kept for CLI parity)")
    parser.add_argument("--config", type=str, default="config/InstanceRefer.yaml")
    parser.add_argument("--log_dir", type=str, default="test")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--pretrain", type=str, default="")
    parser.add_argument("--data_root", type=str, default="data")
    parser.add_argument("--output_root", type=str, default="outputs")
    parser.add_argument(
        "--allow_overflow", action="store_true",
        help="downgrade the eval-time capacity-overflow failure to a warning",
    )
    args = parser.parse_args(argv)

    cfg = Config()
    known = {f.name for f in dataclasses.fields(Config)}
    explicit = set()
    if args.config and os.path.exists(args.config):
        flat = _flatten_yaml(args.config)
        for k, v in flat.items():
            if k in known and v is not None:
                setattr(cfg, k, v)
                explicit.add(k)
    if cfg.band_profile:
        # overlay the calibrated band geometry (relative paths resolve
        # against the main config's directory, then the cwd)
        prof = cfg.band_profile
        if not os.path.exists(prof) and args.config:
            cand = os.path.join(os.path.dirname(os.path.abspath(args.config)), prof)
            prof = cand if os.path.exists(cand) else prof
        if not os.path.exists(prof):
            raise FileNotFoundError(
                f"band_profile {cfg.band_profile!r} not found — regenerate it "
                "with scripts/calibrate_bands.py --emit-yaml"
            )
        overridden = []
        for k, v in band_profile_kwargs(prof).items():
            if k in known:
                # a hand-set pallas_* key in the main yaml loses to the
                # profile — say so instead of silently ignoring it
                # (ADVICE r4: one policy, no quiet shadowing)
                if k in explicit and getattr(cfg, k) != v:
                    overridden.append(k)
                setattr(cfg, k, v)
        if overridden:
            import warnings

            warnings.warn(
                f"band_profile {prof!r} overrides values the main config "
                f"set explicitly: {sorted(overridden)} — remove them from "
                "the yaml or drop band_profile to hand-tune",
                stacklevel=2,
            )
    for k in ["gpu", "config", "log_dir", "debug", "pretrain", "data_root", "output_root"]:
        setattr(cfg, k, getattr(args, k))
    if args.allow_overflow:
        cfg.allow_overflow = True
    return cfg
