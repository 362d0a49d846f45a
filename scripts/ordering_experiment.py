"""Band-ordering experiment: do alternative per-stage row orderings shrink
the measured zero-drop band minima (kernel time ~ V * K * subwin)?

Orderings tried per stage (post-hoc permutation of the built pyramid):
  raster   : pack(x,y,z), x-major  (current production order)
  parent   : sort by (pack(parent cell), pack(own))  — groups the <=8
             children of each stride-2 parent contiguously
  paired_x : sort by (x // (2*stride), y, z, x) — merges the two x-slabs
             sharing a parent
  ymajor   : pack(y,x,z)

For each ordering: per-stage subm/down/up band minima at the production
chunk sizes, and a total-cost model Sum over conv passes of V*K*subwin
(fwd + bwd legs).
"""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from instancerefer_tpu.ops import voxelize as V
from instancerefer_tpu.data.synthetic import make_core_sample
from instancerefer_tpu.data.pipeline import BatchSpec

# reuse calibrate_bands' band-minimum measurement (single source of truth)
_cb_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "calibrate_bands.py")
_cb_spec = importlib.util.spec_from_file_location("calibrate_bands", _cb_path)
_cb = importlib.util.module_from_spec(_cb_spec)
_cb_spec.loader.exec_module(_cb)

ALIGN = _cb.ALIGN
spec = BatchSpec(pallas_conv=True)


def pack(c):
    return V.pack_coords(c)


def min_subwin(nbr, chunk):
    return _cb.min_subwin(_cb.band_extents(nbr, chunk))


def permute_stage(stages, s, perm):
    """Apply row permutation perm to stage s (rows -> perm order)."""
    st = stages[s]
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    st.coords = st.coords[perm]
    st.owner = st.owner[perm]
    nbr = st.nbr3[perm]
    st.nbr3 = np.where(nbr >= 0, inv[np.maximum(nbr, 0)].astype(np.int32), -1)
    if st.down.shape[1]:
        st.down = st.down[perm]
    if s + 1 < len(stages):
        dn = stages[s + 1].down
        stages[s + 1].down = np.where(
            dn >= 0, inv[np.maximum(dn, 0)].astype(np.int32), -1
        )


def order_keys(st, mode):
    c = st.coords
    stride = st.stride
    if mode == "raster":
        return pack(c)
    if mode == "ymajor":
        return pack(c[:, [1, 0, 2]])
    if mode == "parent":
        parent = (c // (2 * stride)) * (2 * stride)
        return pack(parent) * (1 << 14) + (pack(c) & ((1 << 14) - 1))
    if mode == "paired_x":
        cc = c.copy()
        px = (c[:, 0] // (2 * stride))
        # key: (x-pair, y, z, x)
        return (
            (px.astype(np.int64) << 44)
            | ((c[:, 1].astype(np.int64) + 8192) << 30)
            | ((c[:, 2].astype(np.int64) + 8192) << 16)
            | (c[:, 0].astype(np.int64) + 8192)
        )
    raise ValueError(mode)


def build(mode, seed):
    rng = np.random.default_rng(seed)
    mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    core = make_core_sample(rng, num_points=40000, num_instances=12,
                            num_candidates=4, mean_size_arr=mean_size)
    coords, _ = V.quantize(core.point_cloud[:, :3], core.point_cloud[:, :7],
                           0.05, raster_order=True)
    stages = V.build_pyramid(coords, owner=0, num_stages=5, raster=True)
    if mode != "raster":
        for s in range(5):
            keys = order_keys(stages[s], mode)
            perm = np.argsort(keys, kind="stable")
            permute_stage(stages, s, perm)
    return stages


def measure(mode, seeds=(0, 1, 2)):
    subm = [0] * 5
    down = [0] * 5
    up = [0] * 5
    sizes = [0] * 5
    for seed in seeds:
        stages = build(mode, seed)
        for s in range(5):
            st = stages[s]
            v = len(st.coords)
            sizes[s] = max(sizes[s], v)
            # pad to chunk multiple like the pipeline does
            cap = -(-v // 256) * 256
            stp = V.pad_stage(st, cap, None if s == 0 else 10**9)
            subm[s] = max(subm[s], min_subwin(stp.nbr3, 256))
            if s > 0:
                capd = -(-v // 128) * 128
                std = V.pad_stage(st, capd, 10**9)
                down[s] = max(down[s], min_subwin(std.down, 128))
                up_row, up_k = V.invert_down(st.down, len(stages[s - 1].coords))
                up8 = np.where(
                    up_k[:, None] == np.arange(8, dtype=np.int32)[None, :],
                    up_row[:, None], -1,
                ).astype(np.int32)
                vprev = len(up8)
                capu = -(-vprev // 256) * 256
                pad = capu - vprev
                up8p = np.concatenate([up8, np.full((pad, 8), -1, np.int32)])
                up[s] = max(up[s], min_subwin(up8p, 256))
    # cost model: per stage, fwd+bwd banded passes
    #   stem (s=0): subm fwd + fused bwd: 2 * V0 * 27 * subwin0
    #   stage s>=1: down fwd + dW: 2 * Vs * 8 * down_s; dX: Vprev * 8 * up_s
    #               2 residual subm convs, each fwd + fused bwd: 4 * Vs * 27 * subwin_s
    cost = 2 * sizes[0] * 27 * subm[0]
    for s in range(1, 5):
        cost += 2 * sizes[s] * 8 * down[s]
        cost += sizes[s - 1] * 8 * up[s]
        cost += 4 * sizes[s] * 27 * subm[s]
    return subm, down, up, sizes, cost


base_cost = None
for mode in ("raster", "parent", "paired_x", "ymajor"):
    subm, down, up, sizes, cost = measure(mode)
    if base_cost is None:
        base_cost = cost
    print(f"{mode:9s} subm={subm} down={down} up={up}")
    print(f"{'':9s} sizes={sizes} cost={cost/1e9:.3f}G rel={cost/base_cost:.3f}")
