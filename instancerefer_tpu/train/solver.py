"""Training solver: jitted DP train/eval steps, schedules, checkpoints, reports.

Mirror of reference ``lib/solver.py`` (Solver) + ``lib/scheduler_helper.py``:

* Adam with torch semantics (L2 weight decay folded into the gradient before
  the moment updates — ``optim.Adam(weight_decay=...)``, ``scripts/train.py:112``),
* MultiStepLR epoch schedule (lr x rate at each milestone epoch,
  ``lib/solver.py:119-126``),
* BN momentum schedule hook (``lib/scheduler_helper.py``; threaded into every
  MaskedBatchNorm as a call argument),
* per-phase wall-clock timers and the same iter/epoch/best report templates
  (``lib/solver.py:23-60``) — on TPU forward+loss+backward fuse into one jitted
  step, reported as forward/backward by fraction of the step,
* best-model selection on val ``iou_rate_0.25`` (``lib/solver.py:324-342``),
* orbax checkpoints in the reference's three roles: ``model_last`` every epoch,
  ``model`` on new best, ``checkpoint`` (with optimizer state) at finish,
* KeyboardInterrupt-safe finish (``lib/solver.py:174-177``).

The whole train step (forward + loss + IoU target assignment + backward +
eval metrics) runs as ONE jitted program on device — the reference crosses
host<->device at least five times per iteration (SURVEY.md §3.2).
"""

from __future__ import annotations

import collections
import contextlib
import functools
import json
import os
import signal
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instancerefer_tpu.data.pipeline import pop_band_diagnostics
from instancerefer_tpu.parallel.mesh import host_local, make_mesh, shard_batch
from instancerefer_tpu.train.evaluate import get_eval
from instancerefer_tpu.train.losses import get_loss
from instancerefer_tpu.utils.eta import decode_eta

ITER_REPORT_TEMPLATE = """
-------------------------------iter: [{epoch_id}: {iter_id}/{total_iter}]-------------------------------
[loss] train_loss: {train_loss}
[loss] train_ref_loss: {train_ref_loss}
[loss] train_lang_loss: {train_lang_loss}
[loss] train_seg_loss: {train_seg_loss}
[loss] train_lang_acc: {train_lang_acc}
[sco.] train_ref_acc: {train_ref_acc}
[sco.] train_seg_acc: {train_seg_acc}
[sco.] train_iou_rate_0.25: {train_iou_rate_25}, train_iou_rate_0.5: {train_iou_rate_5}
[info] mean_fetch_time: {mean_fetch_time}s
[info] mean_forward_time: {mean_forward_time}s
[info] mean_backward_time: {mean_backward_time}s
[info] mean_eval_time: {mean_eval_time}s
[info] mean_iter_time: {mean_iter_time}s
[info] ETA: {eta_h}h {eta_m}m {eta_s}s
"""

EPOCH_REPORT_TEMPLATE = """
---------------------------------summary---------------------------------
[val]   val_loss: {val_loss}
[val]   val_lang_loss: {val_lang_loss}
[val]   val_lang_acc: {val_lang_acc}
[val]   val_seg_acc: {val_seg_acc}
[val]   val_ref_acc: {val_ref_acc}
[val]   val_iou_rate_0.25: {val_iou_rate_25}, val_iou_rate_0.5: {val_iou_rate_5}
"""

BEST_REPORT_TEMPLATE = """
--------------------------------------best--------------------------------------
[best] epoch: {epoch}
[loss] loss: {loss}
[loss] ref_loss: {ref_loss}
[loss] lang_loss: {lang_loss}
[loss] lang_acc: {lang_acc}
[sco.] ref_acc: {ref_acc}
[sco.] iou_rate_0.25: {iou_rate_25}, iou_rate_0.5: {iou_rate_5}
"""

METRIC_KEYS = ("loss", "ref_loss", "lang_loss", "seg_loss", "lang_acc", "ref_acc", "seg_acc")


@contextlib.contextmanager
def _defer_interrupt():
    """Defer Ctrl-C around the donating train-step dispatch.

    The jitted train step donates the params/batch_stats/opt_state buffers, so
    dispatch invalidates ``self.state``'s old arrays immediately; a
    KeyboardInterrupt landing between the dispatch and ``self.state.update``
    would leave the solver holding deleted arrays and crash the
    interrupt-save in ``_finish`` (the one resilience feature the reference
    ships, lib/solver.py:174-177).  Deferring SIGINT across those two lines
    closes the race; the pending interrupt re-raises on clean exit only — a
    body that raised on its own keeps its real exception (an interrupt
    swallowing e.g. an XlaRuntimeError would hide the failure AND route a
    failed step into the interrupt-save path holding donated buffers)."""
    if signal.getsignal(signal.SIGINT) is signal.SIG_IGN:
        # deliberately-ignored SIGINT (nohup/setsid wrappers) stays ignored
        yield
        return
    try:
        pending = []
        prev = signal.signal(signal.SIGINT, lambda s, f: pending.append(1))
    except ValueError:
        # not the main thread: SIGINT cannot be delivered here anyway
        yield
        return
    try:
        yield
    finally:
        signal.signal(signal.SIGINT, prev)
    if pending:
        raise KeyboardInterrupt


def make_optimizer(lr: float, wd: float, lr_decay_step, lr_decay_rate, steps_per_epoch: int):
    """torch Adam + MultiStepLR equivalents (config/InstanceRefer.yaml:48-53)."""
    if lr_decay_step and lr_decay_rate:
        steps = lr_decay_step if isinstance(lr_decay_step, (list, tuple)) else [lr_decay_step]
        schedule = optax.piecewise_constant_schedule(
            lr, {int(e) * steps_per_epoch: float(lr_decay_rate) for e in steps}
        )
    else:
        schedule = lr
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts += [optax.scale_by_adam(), optax.scale_by_learning_rate(schedule)]
    return optax.chain(*parts)


def bn_momentum_for_epoch(epoch: int, bn_decay_step, bn_decay_rate) -> float:
    """BNMomentumScheduler (lib/scheduler_helper.py + lib/solver.py:128-137):
    lambda(epoch) = max(0.5 * rate^(epoch//step), 0.001).

    The reference scheduler sets ``module.momentum = lmbd(epoch)`` on every
    torch BN (torch momentum = update weight of the *new* batch statistic);
    MaskedBatchNorm uses the identical convention, so the value is returned
    directly for its ``momentum`` call arg.  Oracle-tested against torch BN
    running stats in tests/test_batchnorm.py.
    """
    if not (bn_decay_step and bn_decay_rate):
        return 0.1
    BN_MOMENTUM_INIT, BN_MOMENTUM_MAX = 0.5, 0.001
    return max(BN_MOMENTUM_INIT * bn_decay_rate ** (epoch // bn_decay_step), BN_MOMENTUM_MAX)


class Solver:
    def __init__(
        self,
        model,
        mean_size_arr: np.ndarray,
        *,
        lr: float = 1e-3,
        wd: float = 1e-5,
        lr_decay_step=(15, 20),
        lr_decay_rate: float = 0.1,
        bn_decay_step=None,
        bn_decay_rate=None,
        steps_per_epoch: int = 1000,
        stamp: str = "run",
        output_dir: str = "outputs",
        val_step: int = 2000,
        start_val: int = 0,
        use_mesh: bool = True,
        seed: int = 123,
    ):
        self.model = model
        self.mean_size_arr = jnp.asarray(mean_size_arr)
        self.tx = make_optimizer(lr, wd, lr_decay_step, lr_decay_rate, steps_per_epoch)
        self.bn_decay_step = bn_decay_step
        self.bn_decay_rate = bn_decay_rate
        self.mesh = make_mesh() if use_mesh else None
        self.stamp = stamp
        # config-parity knob only: the reference's ETA counted a fixed
        # val_step-based total (lib/solver.py:404); this solver validates
        # once per epoch and derives the val ETA term from epochs remaining
        self.val_step = val_step
        # reference parses TRAIN.start_val (config/InstanceRefer.yaml:57) but
        # never consumes it; here the evident intent is honored — validation
        # (and best-model selection) starts at epoch ``start_val`` (default 0
        # = every epoch, identical behavior to the reference's default)
        self.start_val = start_val
        self.root = os.path.join(output_dir, stamp)
        os.makedirs(self.root, exist_ok=True)
        self.log_path = os.path.join(self.root, "log.txt")
        self.scalars_path = os.path.join(self.root, "scalars.jsonl")
        self.rng = jax.random.key(seed)

        # tensorboard writers (reference lib/solver.py:96-102); optional dep
        self._log_writer = {}
        try:
            from tensorboardX import SummaryWriter

            for phase in ("train", "val"):
                d = os.path.join(self.root, "tensorboard", phase)
                os.makedirs(d, exist_ok=True)
                self._log_writer[phase] = SummaryWriter(d)
        except Exception:
            pass

        self.best = {
            "epoch": 0, "loss": float("inf"), "ref_loss": float("inf"),
            "lang_loss": float("inf"), "seg_loss": float("inf"),
            "lang_acc": -float("inf"), "ref_acc": -float("inf"),
            "seg_acc": -float("inf"),
            "iou_rate_0.25": -float("inf"), "iou_rate_0.5": -float("inf"),
        }
        self.state: Optional[Dict[str, Any]] = None
        self._global_iter_id = 0
        self._total_iter = {"train": 0}
        self._iters_per_epoch = 1
        self._val_len = 0
        self._train_step = None
        self._eval_step = None
        self.init_log()

    # ------------------------------------------------------------------ setup
    def init_params(self, example_batch):
        # drop host-side diagnostics so the init/example structure matches
        # the batches _device_prefetch feeds (it pops these before sharding)
        from instancerefer_tpu.data.pipeline import pop_band_diagnostics

        example_batch = dict(example_batch)
        pop_band_diagnostics(example_batch)
        batch = shard_batch(example_batch, self.mesh)
        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        # jit the init: eager init compiles each op separately, which is
        # pathologically slow through a remote-TPU tunnel.
        init_fn = jax.jit(functools.partial(self.model.init, train=False))
        variables = init_fn({"params": k1, "dropout": k2}, batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
            "epoch": 0,
        }
        return self.state

    def _build_steps(self):
        model, tx, mean_size_arr = self.model, self.tx, self.mean_size_arr

        @functools.partial(jax.jit, static_argnames=("bn_momentum",), donate_argnames=("params", "batch_stats", "opt_state"))
        def train_step(params, batch_stats, opt_state, batch, rng, bn_momentum=0.1):
            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch,
                    train=True,
                    bn_momentum=bn_momentum,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                out = get_loss(out, mean_size_arr)
                return out["loss"], (updates["batch_stats"], out)

            (loss, (new_stats, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            out = get_eval(out)
            return params, new_stats, opt_state, _metrics(out)

        def _metrics(out):
            # scalar metrics are masked means over valid (non-padding) rows.
            # The Acc@IoU pool (reference lib/solver.py:295-297) accumulates
            # as GLOBAL hit/valid counters reduced inside the jitted step:
            # under multi-host DP the per-sample rows are globally sharded
            # (each host only addresses its own), but a jnp.sum over the
            # sharded batch axis is a replicated global scalar — so every
            # host computes identical iou rates and picks the same best epoch.
            metrics = {k: out[k] for k in METRIC_KEYS}
            metrics["ref_acc"] = out["ref_acc_mean"]
            valid = out["sample_valid"]
            iou = out["ref_iou"]
            metrics["iou25_hits"] = jnp.sum((iou >= 0.25) & valid)
            metrics["iou5_hits"] = jnp.sum((iou >= 0.5) & valid)
            metrics["iou_count"] = jnp.sum(valid)
            return metrics

        @jax.jit
        def eval_step(params, batch_stats, batch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, train=False
            )
            out = get_loss(out, mean_size_arr)
            out = get_eval(out)
            return _metrics(out)

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------- loop
    def __call__(self, dataloader: Dict[str, Iterable], epoch: int, verbose: int):
        if self._train_step is None:
            self._build_steps()
        self.epoch = epoch
        self.verbose = verbose
        self._total_iter["train"] = len(dataloader["train"]) * epoch
        self._iters_per_epoch = max(len(dataloader["train"]), 1)
        self._val_len = len(dataloader["val"])  # for the ETA's val term

        # resume: continue epoch numbering from a restored checkpoint so the
        # MultiStepLR epoch mapping, BN-momentum schedule and best tracking
        # pick up where they left off (reference lib/solver.py:373-381 +
        # scripts/train.py:114-119)
        start_epoch = int(self.state.get("epoch", 0)) if self.state else 0
        self._global_iter_id = start_epoch * len(dataloader["train"])
        epoch_id = start_epoch
        for epoch_id in range(start_epoch, epoch):
            try:
                self._log(f"epoch {epoch_id + 1} starting...")
                bn_momentum = bn_momentum_for_epoch(
                    epoch_id, self.bn_decay_step, self.bn_decay_rate
                )
                self._feed(dataloader["train"], "train", epoch_id, bn_momentum)
                self._log("saving last models...\n")
                self.save_checkpoint("model_last")
                if epoch_id + 1 >= self.start_val:
                    self.init_log()
                    self._feed(dataloader["val"], "val", epoch_id)
                self.state["epoch"] = epoch_id + 1
            except KeyboardInterrupt:
                self._finish(epoch_id)
                return
        self._finish(epoch_id)

    def _device_prefetch(self, loader, size: int = 2, overflow_log=None):
        """Transfer batches to device ahead of consumption: ``device_put`` is
        asynchronous, so batch k+1's host->device copy overlaps step k's
        compute (the reference's fetch time is serial, lib/solver.py:239).

        ``overflow_log`` ({"scene": [], "inst": []}) accumulates per-batch
        capacity-overflow fractions — read here, while the leaves are still
        host numpy, so the bookkeeping never forces a device sync.
        """
        queue = collections.deque()
        it = iter(loader)
        while True:
            while len(queue) < size:
                try:
                    nxt = next(it)
                except StopIteration:
                    break
                # record only when the loader yields host numpy (always true
                # for PaddedLoader); a device-resident leaf would force a
                # sync here and defeat the prefetch overlap, so it is skipped
                if (
                    overflow_log is not None
                    and isinstance(nxt.get("scene_overflow"), np.ndarray)
                ):
                    overflow_log["scene"].append(float(nxt["scene_overflow"].mean()))
                    overflow_log["inst"].append(float(nxt["inst_overflow"].mean()))
                    co = nxt.get("cand_overflow")
                    if isinstance(co, np.ndarray):
                        overflow_log.setdefault("cand", []).append(float(co.mean()))
                # banded-conv neighbor drops: batch-level host scalars; popped
                # (not fed) through the shared helper
                bd = pop_band_diagnostics(nxt)
                if overflow_log is not None and bd:
                    overflow_log.setdefault("band", []).append(max(bd.values()))
                queue.append(shard_batch(nxt, self.mesh))
            if not queue:
                return
            yield queue.popleft()

    def _report_overflow(self, phase, overflow_log):
        """Epoch-wide capacity-overflow fractions (every batch, not just the
        first): a capacity bust anywhere in the epoch is surfaced here."""
        if not overflow_log["scene"]:
            return
        so = float(np.mean(overflow_log["scene"]))
        io_ = float(np.mean(overflow_log["inst"]))
        so_max = float(np.max(overflow_log["scene"]))
        io_max = float(np.max(overflow_log["inst"]))
        if max(so, io_, so_max, io_max) > 0.01:
            self._log(
                f"WARNING: [{phase}] voxel capacity overflow over the epoch "
                f"(scene mean {so:.1%} / max {so_max:.1%}, instance mean "
                f"{io_:.1%} / max {io_max:.1%}) — raise scene_caps/inst_caps "
                f"in the TPU config section to avoid dropped voxels"
            )
        cand = overflow_log.get("cand", [])
        if cand and max(cand) > 0:
            self._log(
                f"WARNING: [{phase}] candidate capacity overflow over the "
                f"epoch (mean {float(np.mean(cand)):.2%} / max "
                f"{float(np.max(cand)):.2%} of filtered instances dropped) — "
                f"the reference keeps every filtered candidate; raise "
                f"max_candidates in the TPU config section"
            )
        band = overflow_log.get("band", [])
        if band and max(band) > 0:
            self._log(
                f"WARNING: [{phase}] banded Pallas conv dropped neighbors "
                f"(batch max {max(band):.3%} of entries) — raise "
                f"pallas_subwin (per stage) in the TPU config section for "
                f"exact convolutions"
            )

    def _feed(self, loader, phase, epoch_id, bn_momentum: float = 0.1):
        fetch_start = time.time()
        overflow_log = {"scene": [], "inst": []}
        for batch in self._device_prefetch(loader, overflow_log=overflow_log):
            self.log[phase]["fetch"].append(time.time() - fetch_start)
            start = time.time()
            if phase == "train":
                self.rng, drop_rng = jax.random.split(self.rng)
                with _defer_interrupt():
                    params, stats, opt_state, metrics = self._train_step(
                        self.state["params"],
                        self.state["batch_stats"],
                        self.state["opt_state"],
                        batch,
                        drop_rng,
                        bn_momentum=bn_momentum,
                    )
                    self.state.update(
                        params=params, batch_stats=stats, opt_state=opt_state
                    )
            else:
                metrics = self._eval_step(
                    self.state["params"], self.state["batch_stats"], batch
                )
            # per-sample metric rows of a multi-host batch are globally
            # sharded; each host aggregates its own samples' rows
            metrics = jax.tree.map(host_local, metrics)
            step_time = time.time() - start
            # forward+backward are one fused program on TPU; split the wall
            # time 1:2 for the report's forward/backward fields.
            self.log[phase]["forward"].append(step_time / 3 if phase == "train" else step_time)
            self.log[phase]["backward"].append(2 * step_time / 3 if phase == "train" else 0.0)
            self.log[phase]["eval"].append(0.0)  # fused into the step

            for k in METRIC_KEYS:
                self.log[phase][k].append(float(np.mean(metrics[k])))
            # global Acc@IoU pool via replicated counters (identical on every
            # host of a multi-host run — see _metrics)
            for k in ("iou25_hits", "iou5_hits", "iou_count"):
                self.log[phase][k] += float(metrics[k])
            denom = max(self.log[phase]["iou_count"], 1.0)
            self.log[phase]["iou_rate_0.25"] = self.log[phase]["iou25_hits"] / denom
            self.log[phase]["iou_rate_0.5"] = self.log[phase]["iou5_hits"] / denom

            if phase == "train":
                iter_time = self.log[phase]["fetch"][-1] + step_time
                self.log[phase]["iter_time"].append(iter_time)
                if (self._global_iter_id + 1) % self.verbose == 0:
                    self._train_report(epoch_id)
                    self._dump_log("train")
                    self.init_log()
                self._global_iter_id += 1
            fetch_start = time.time()

        self._report_overflow(phase, overflow_log)
        if phase == "val":
            self._dump_log("val")
            self._epoch_report(epoch_id)
            cur = self.log["val"]["iou_rate_0.25"]
            if cur > self.best["iou_rate_0.25"]:
                self._log(f"best iou_rate_0.25 achieved: {cur}")
                for k in METRIC_KEYS:
                    self.best[k] = float(np.mean(self.log["val"][k])) if self.log["val"][k] else 0.0
                self.best["epoch"] = epoch_id + 1
                self.best["iou_rate_0.25"] = self.log["val"]["iou_rate_0.25"]
                self.best["iou_rate_0.5"] = self.log["val"]["iou_rate_0.5"]
                self._log("saving best models...\n")
                self.save_checkpoint("model")

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, name: str, with_opt: bool = False):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.root, name))
        payload = {
            "params": self.state["params"],
            "batch_stats": self.state["batch_stats"],
        }
        if with_opt:
            payload["opt_state"] = self.state["opt_state"]
            # the reference's checkpoint.tar records the epoch counter
            # (lib/solver.py:373-381); best-metric state rides along so a
            # resumed run keeps best-model tracking
            payload["epoch"] = np.asarray(self.state.get("epoch", 0), np.int32)
            payload["best"] = {
                k: np.asarray(v, np.float64) for k, v in self.best.items()
            }
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)

    def load_pretrained_modules(self, path: str, modules=("lang", "attribute", "relation", "scene")):
        """Partial warm-start: copy only the named top-level submodules'
        parameters from a checkpoint (reference ``use_pretrained``,
        ``scripts/train.py:83-96``, which copies the four model submodules)."""
        import orbax.checkpoint as ocp

        template = {
            "params": self.state["params"],
            "batch_stats": self.state["batch_stats"],
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), template)
        for coll in ("params", "batch_stats"):
            current = dict(self.state[coll])
            for m in modules:
                if m in restored[coll]:
                    current[m] = restored[coll][m]
            self.state[coll] = current

    def profile_steps(self, loader, out_dir: str, num_steps: int = 3):
        """Capture a jax.profiler device trace over a few training steps
        (TPU-native upgrade of the reference's wall-clock phase timers,
        SURVEY.md §5)."""
        if self._train_step is None:
            self._build_steps()
        it = iter(self._device_prefetch(loader))
        first = next(it)
        # warmup/compile outside the trace
        self.rng, r = jax.random.split(self.rng)
        out = self._train_step(
            self.state["params"], self.state["batch_stats"],
            self.state["opt_state"], first, r,
        )
        self.state.update(params=out[0], batch_stats=out[1], opt_state=out[2])
        with jax.profiler.trace(out_dir):
            for _ in range(num_steps):
                try:
                    batch = next(it)
                except StopIteration:
                    break
                self.rng, r = jax.random.split(self.rng)
                out = self._train_step(
                    self.state["params"], self.state["batch_stats"],
                    self.state["opt_state"], batch, r,
                )
                self.state.update(params=out[0], batch_stats=out[1], opt_state=out[2])
            jax.block_until_ready(out[3])
        self._log(f"profiler trace written to {out_dir}")

    def load_checkpoint(self, path: str, with_opt: bool = False):
        import orbax.checkpoint as ocp

        template = {
            "params": self.state["params"],
            "batch_stats": self.state["batch_stats"],
        }
        if with_opt:
            template["opt_state"] = self.state["opt_state"]
            template["epoch"] = np.asarray(0, np.int32)
            template["best"] = {k: np.asarray(v, np.float64) for k, v in self.best.items()}
        with ocp.StandardCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(os.path.abspath(path), template)
            except Exception as first_err:
                if not with_opt:
                    raise
                # pre-resume-fidelity checkpoint without epoch/best; if the
                # legacy-template retry ALSO fails, surface the original
                # error (a genuinely corrupt checkpoint, not a format skew)
                template.pop("epoch")
                template.pop("best")
                try:
                    restored = ckptr.restore(os.path.abspath(path), template)
                except Exception:
                    raise first_err
        best = restored.pop("best", None)
        if best is not None:
            self.best.update(
                {
                    k: (int(v) if k == "epoch" else float(v))
                    for k, v in best.items()
                }
            )
        if "epoch" in restored:
            restored["epoch"] = int(restored["epoch"])
        self.state.update(restored)

    def _finish(self, epoch_id):
        self._best_report()
        self._log("saving checkpoint...\n")
        self.save_checkpoint("checkpoint", with_opt=True)
        self._log("saving last models...\n")
        self.save_checkpoint("model_last")
        # tensorboard json export (lib/solver.py:389-391)
        for phase, w in self._log_writer.items():
            try:
                w.export_scalars_to_json(
                    os.path.join(self.root, "tensorboard", phase, "all_scalars.json")
                )
                w.close()
            except Exception:
                pass

    # ----------------------------------------------------------------- logging
    def init_log(self):
        self.log = {
            phase: {
                "forward": [], "backward": [], "eval": [], "fetch": [], "iter_time": [],
                **{k: [] for k in METRIC_KEYS},
                "iou25_hits": 0.0, "iou5_hits": 0.0, "iou_count": 0.0,
                "iou_rate_0.25": 0.0, "iou_rate_0.5": 0.0,
            }
            for phase in ["train", "val"]
        }

    def _log(self, msg: str):
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")
        print(msg)

    def _dump_log(self, phase):
        rec = {"iter": self._global_iter_id, "phase": phase}
        for key in METRIC_KEYS:
            vals = self.log[phase][key]
            rec[key] = float(np.mean(vals)) if vals else 0.0
        rec["iou_rate_0.25"] = self.log[phase]["iou_rate_0.25"]
        rec["iou_rate_0.5"] = self.log[phase]["iou_rate_0.5"]
        with open(self.scalars_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if phase in self._log_writer:
            w = self._log_writer[phase]
            groups = {"loss": ["loss", "ref_loss", "lang_loss", "seg_loss"],
                      "score": ["lang_acc", "ref_acc", "seg_acc"]}
            for g, keys in groups.items():
                for k in keys:
                    w.add_scalar(f"{g}/{k}", rec[k], self._global_iter_id)
            w.add_scalar("score/iou_rate_0.25", rec["iou_rate_0.25"], self._global_iter_id)
            w.add_scalar("score/iou_rate_0.5", rec["iou_rate_0.5"], self._global_iter_id)

    def _train_report(self, epoch_id):
        log = self.log["train"]
        mean_train_time = float(np.mean(log["iter_time"]))
        mean_est_val_time = float(np.mean([f + fw for f, fw in zip(log["fetch"], log["forward"])]))
        remaining_iters = self._total_iter["train"] - self._global_iter_id - 1
        eta_sec = remaining_iters * mean_train_time
        # estimated remaining validation time (lib/solver.py:404 analog): this
        # solver validates once per epoch from epoch start_val on, so the val
        # term counts only the validating epochs still ahead — and shrinks as
        # training progresses (the reference's val_step formula counted a
        # fixed total for the whole run)
        cur_epoch = self._global_iter_id // self._iters_per_epoch
        remaining_vals = max(self.epoch - max(cur_epoch, max(self.start_val - 1, 0)), 0)
        eta_sec += self._val_len * remaining_vals * mean_est_val_time
        eta = decode_eta(eta_sec)
        self._log(
            ITER_REPORT_TEMPLATE.format(
                epoch_id=epoch_id + 1,
                iter_id=self._global_iter_id + 1,
                total_iter=self._total_iter["train"],
                train_loss=round(float(np.mean(log["loss"])), 5),
                train_ref_loss=round(float(np.mean(log["ref_loss"])), 5),
                train_lang_loss=round(float(np.mean(log["lang_loss"])), 5),
                train_seg_loss=round(float(np.mean(log["seg_loss"])), 5),
                train_lang_acc=round(float(np.mean(log["lang_acc"])), 5),
                train_ref_acc=round(float(np.mean(log["ref_acc"])), 5),
                train_seg_acc=round(float(np.mean(log["seg_acc"])), 5),
                train_iou_rate_25=round(log["iou_rate_0.25"], 5),
                train_iou_rate_5=round(log["iou_rate_0.5"], 5),
                mean_fetch_time=round(float(np.mean(log["fetch"])), 5),
                mean_forward_time=round(float(np.mean(log["forward"])), 5),
                mean_backward_time=round(float(np.mean(log["backward"])), 5),
                mean_eval_time=round(float(np.mean(log["eval"])), 5),
                mean_iter_time=round(mean_train_time, 5),
                eta_h=eta["h"], eta_m=eta["m"], eta_s=eta["s"],
            )
        )

    def _epoch_report(self, epoch_id):
        self._log(f"epoch [{epoch_id + 1}/{self.epoch}] done...")
        log = self.log["val"]
        self._log(
            EPOCH_REPORT_TEMPLATE.format(
                val_loss=round(float(np.mean(log["loss"])), 5),
                val_lang_loss=round(float(np.mean(log["lang_loss"])), 5),
                val_lang_acc=round(float(np.mean(log["lang_acc"])), 5),
                val_seg_acc=round(float(np.mean(log["seg_acc"])), 5),
                val_ref_acc=round(float(np.mean(log["ref_acc"])), 5),
                val_iou_rate_25=round(log["iou_rate_0.25"], 5),
                val_iou_rate_5=round(log["iou_rate_0.5"], 5),
            )
        )

    def _best_report(self):
        self._log("training completed...")
        report = BEST_REPORT_TEMPLATE.format(
            epoch=self.best["epoch"],
            loss=round(self.best["loss"], 5),
            ref_loss=round(self.best["ref_loss"], 5),
            lang_loss=round(self.best["lang_loss"], 5),
            lang_acc=round(self.best["lang_acc"], 5),
            ref_acc=round(self.best["ref_acc"], 5),
            iou_rate_25=round(self.best["iou_rate_0.25"], 5),
            iou_rate_5=round(self.best["iou_rate_0.5"], 5),
        )
        self._log(report)
        with open(os.path.join(self.root, "best.txt"), "w") as f:
            f.write(report)
