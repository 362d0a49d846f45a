"""Data parallelism over a 1-D device mesh (the distributed backend).

The reference has *no* distributed support of any kind (single CUDA device via
``CUDA_VISIBLE_DEVICES``, ``scripts/train.py:217``; no torch.distributed/NCCL/
MPI anywhere — SURVEY.md §2.3).  The TPU-native backend is XLA collectives
over ICI driven by ``jax.sharding``:

* a 1-D ``data`` mesh over all local+remote devices,
* every batch array is sharded on its leading dimension (the pipeline
  guarantees leading dims divisible by the batch size via uniform per-sample
  voxel blocks),
* parameters/optimizer state are replicated; the loss mean over the global
  batch makes XLA insert the gradient ``psum`` automatically under ``jit``,
* BatchNorm statistics reduce over the global batch inside the same graph, so
  DP training is semantically identical to the reference's single-device
  full-batch BN,
* per-host data loading shards by ``jax.process_index()`` (multi-host DCN).

TP/PP/SP/EP/CP are deliberately out of scope at this model scale (≈10 M
params, 126-token sequences); the mesh layout leaves room to add axes later.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    mesh = Mesh(np.asarray(devices), (axis_name,))
    set_active_mesh(mesh)
    return mesh


# The mesh the banded Pallas kernels shard_map over when a SparseStage carries
# ``data_shards > 1`` (ops/pallas_conv sharded wrappers).  Registered by
# make_mesh (the solver/bench/dryrun all build their mesh through it) rather
# than threaded through every module call; one process drives one mesh.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-dimension sharding for every batch leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def globalize_batch_indices(
    dd: Dict[str, Any], *, process_index=None, process_count=None
) -> Dict[str, Any]:
    """Rebase host-LOCAL intra-batch indices to GLOBAL ids before multi-host
    assembly.

    Each host collates its own sample slice, so every index-carrying array in
    its device dict — voxel owners, ``nbr3``/``down``/``up8``/``up_row`` row
    maps, and the banded-conv window starts — points into the HOST-LOCAL flat
    layout.  ``jax.make_array_from_process_local_data`` then places host ``p``'s
    rows at global rows ``[p * local_rows, (p+1) * local_rows)``, and every
    consumer (``feats[nbr]`` gathers, segment pooling with
    ``num_segments = B_global * ...``, the shard_map wrappers' per-shard
    localization ``off = axis_index * in_rows`` in ops/pallas_conv) treats the
    values as GLOBAL.  This helper adds exactly the host's global offset to
    each index family, preserving ``-1`` sentinels — the per-host analogue of
    what ``data/pipeline.collate`` does per sample with ``bi * cap``.

    No-op on single-process runs and for host 0 (all offsets are zero).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1 or pi == 0 or not isinstance(dd, dict) or "scene_pyramid" not in dd:
        return dd

    def off(a, k, preserve_neg=True):
        if a is None or a.size == 0 or k == 0:
            return a
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            # already assembled into a global array by a previous shard_batch
            # — its indices are already global; np.asarray would raise on the
            # non-addressable shards and rebasing again would corrupt it
            return a
        a = np.asarray(a)
        k = a.dtype.type(k)
        return np.where(a >= 0, a + k, a) if preserve_neg else a + k

    cand_mask = dd["cand_mask"]
    local_b, cmax = int(cand_mask.shape[0]), int(cand_mask.shape[1])
    if isinstance(cand_mask, jax.Array) and not cand_mask.is_fully_addressable:
        # cand_mask is already global: its batch dim is global, not host-local
        local_b //= pc
    out = dict(dd)
    for key, seg in (("scene_pyramid", local_b), ("inst_pyramid", local_b * cmax)):
        stages = dd.get(key)
        if stages is None:
            continue
        new_stages = []
        prev_v = 0
        for st in stages:
            v = st.nbr3.shape[0]
            new_stages.append(
                st.replace(
                    owner=off(st.owner, pi * seg),
                    nbr3=off(st.nbr3, pi * v),
                    down=off(st.down, pi * prev_v),
                    # subm bands index THIS stage's input rows
                    ws3=off(st.ws3, pi * v),
                    wsk3=off(st.wsk3, pi * v, preserve_neg=False),
                    # inverse (up) maps index THIS stage's rows too
                    up_row=off(st.up_row, pi * v),
                    up8=off(st.up8, pi * v),
                    wsu=off(st.wsu, pi * v),
                    wsktu=off(st.wsktu, pi * v, preserve_neg=False),
                    # down bands index the PREVIOUS stage's rows
                    wsd=off(st.wsd, pi * prev_v),
                    wskd=off(st.wskd, pi * prev_v, preserve_neg=False),
                )
            )
            prev_v = v
        out[key] = tuple(new_stages)
    return out


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh]):
    """Place a (numpy or jnp) batch pytree onto the mesh, sharded on dim 0.

    Exception: banded-conv offset-window metadata (``SparseStage.wsk3``) is
    stored transposed as [K, n_chunks] for the kernels' SMEM layout — its
    batch-divisible axis is axis 1, so it shards as P(None, "data").

    Multi-host: each host's loader yields PER-HOST batches (disjoint sample
    slices, ``host_shard_indices``); the host's arrays are its addressable
    portion of the global batch, assembled with
    ``jax.make_array_from_process_local_data`` — the global batch dimension
    is ``local * process_count``.  Intra-batch indices are first rebased from
    host-local to global (``globalize_batch_indices``).  (Requires the mesh's
    device order to place each process's devices on a contiguous range of the
    data axis, which ``make_mesh()`` over ``jax.devices()`` gives.)

    Without a mesh the batch is still device_put (asynchronously) so that
    prefetching overlaps host->device transfer with compute.
    """
    if mesh is None:
        return jax.device_put(batch)
    leaves = jax.tree_util.tree_leaves(batch)
    if leaves and all(
        isinstance(l, jax.Array)
        and isinstance(getattr(l, "sharding", None), NamedSharding)
        and l.sharding.mesh == mesh
        for l in leaves
    ):
        # idempotence: the batch is already assembled/placed on this mesh
        # (Solver.init_params re-shards its example batch; re-globalizing
        # assembled global arrays would both corrupt indices and raise on
        # np.asarray of non-addressable shards — found by the 2-process dryrun)
        return batch
    sh = batch_sharding(mesh)
    sh_t = NamedSharding(mesh, P(None, "data"))
    pc = jax.process_count()
    if pc > 1:
        batch = globalize_batch_indices(batch)

    def place(path, x):
        transposed = any(
            getattr(p, "name", None) in ("wsk3", "wskd", "wsktu") for p in path
        )
        if (
            isinstance(x, jax.Array)
            and isinstance(getattr(x, "sharding", None), NamedSharding)
            and x.sharding.mesh == mesh
        ):
            # already placed on this mesh — skip the device_put/assembly.
            # (For multi-host batches the real protection is the whole-batch
            # precheck above plus globalize_batch_indices' own skip of
            # non-fully-addressable leaves: by the time place() runs,
            # globalization has already happened.)
            return x
        if pc == 1:
            return jax.device_put(x, sh_t if transposed else sh)
        x = np.asarray(x)
        if transposed:
            gshape = (x.shape[0], x.shape[1] * pc)
            return jax.make_array_from_process_local_data(sh_t, x, gshape)
        gshape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, gshape)

    return jax.tree_util.tree_map_with_path(place, batch)


def host_local(x) -> np.ndarray:
    """Fetch an array to host numpy; for multi-host globally-sharded arrays
    (not fully addressable), concatenate this process's addressable shards —
    each host then sees exactly its own samples' rows.  Fully-replicated
    arrays (e.g. the scalar loss on a multi-host mesh — found by the
    2-process dryrun: device_get raises on non-addressable replicas, and 0-d
    shards cannot concatenate) return any local replica directly."""
    try:
        return np.asarray(jax.device_get(x))
    except RuntimeError:
        if getattr(x, "is_fully_replicated", False):
            return np.asarray(x.addressable_shards[0].data)
        # Shard.index is a tuple of slice objects (not comparable directly);
        # order by the leading axis' start offset.
        shards = sorted(
            x.addressable_shards,
            key=lambda s: (s.index[0].start or 0) if s.index else 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards])


def host_shard_indices(num_samples: int, *, process_index=None, process_count=None):
    """Which sample indices this host should load (multi-host data sharding)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, num_samples, pc)
