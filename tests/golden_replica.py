"""CPU-torch replica of the reference InstanceRefer model — the oracle for the
golden end-to-end parity test (tests/test_golden_model.py).

This re-implements, in plain torch on ragged per-sample data, exactly what the
reference computes (cited per part below):

* ``models/lang_module.py``      — word MLP, packed 2-layer bi-GRU, 4 attention
  heads, text classifier (torch's own GRU + pack/pad is used, i.e. the real
  reference op),
* ``models/attribute_module.py`` — per-sample class filtering, per-candidate
  0.02 m re-voxelization, SparseConvEncoder, global max pool, vis/lang MLPs,
  L2-norm dot scores,
* ``models/relation_module.py`` + ``DynamicEdgeConv``
  (``models/basic_blocks.py:98-133``) — flat node assembly over qualifying
  samples, per-batch kNN, edge-weighted messages, max aggregation, cosine,
* ``models/scene_module.py``     — BEVEncoder, SparseCrop, ToDenseBEVConvolution,
  conv2d head, cell attention, 9-way classifier, scene<->object cosine,
* ``lib/loss_helper.py:196-269`` — ContrastiveLoss orchestration with the
  per-sample 0/1/>=2 + IoU<0.2 skip rules and host IoU target assignment,
* ``lib/eval_helper.py:11-113``  — prediction selection and metrics.

The ONLY substitution is torchsparse's CUDA sparse conv (unavailable off-GPU):
it becomes an explicit gather-conv over brute-force dict-based kernel maps —
the same mathematical operator (gather -> per-offset GEMM -> sum).  The kernel
maps here are built independently of ``instancerefer_tpu.ops.voxelize`` (plain
python dict hash), so a map-construction bug on either side breaks parity.
The per-offset weight layout contract ([K, Cin, Cout] enumerated in
``KERNEL_OFFSETS_3/2`` order) is shared — it defines which slice is which
offset, not the math.

Everything runs in eval mode (dropout off, BN on running stats), which is the
deterministic configuration both frameworks can share bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import torch
import torch.nn.functional as F

from instancerefer_tpu.ops.voxelize import KERNEL_OFFSETS_2, KERNEL_OFFSETS_3

# ---------------------------------------------------------------------------
# independent voxel hashing + kernel maps (torchsparse semantics)
# ---------------------------------------------------------------------------


def quantize_first(xyz: np.ndarray, feats: np.ndarray, voxel_size: float):
    """sparse_quantize: floor coords, keep the FIRST row per voxel
    (reference lib/dataset.py:256-261, models/attribute_module.py:65-69)."""
    coords = np.floor(xyz / voxel_size).astype(np.int32)
    seen = {}
    keep = []
    for i, c in enumerate(map(tuple, coords)):
        if c not in seen:
            seen[c] = i
            keep.append(i)
    keep = np.asarray(keep, np.int64)
    return coords[keep], feats[keep]


def build_nbr3_dict(coords: np.ndarray, stride: int) -> np.ndarray:
    """3^3 submanifold kernel map via a python dict (independent of
    ops/voxelize's sort-based lookup)."""
    table = {tuple(c): i for i, c in enumerate(coords)}
    nbr = np.full((len(coords), 27), -1, np.int32)
    for i, c in enumerate(coords):
        for k, off in enumerate(KERNEL_OFFSETS_3):
            j = table.get((c[0] + off[0] * stride, c[1] + off[1] * stride,
                           c[2] + off[2] * stride))
            if j is not None:
                nbr[i, k] = j
    return nbr


def downsample_dict(coords: np.ndarray, stride: int):
    """torchsparse ks=2/stride=2: outputs = unique floor(c/2s)*2s, each
    gathering inputs at out + {0, stride}^3."""
    new_stride = stride * 2
    down = (coords // new_stride) * new_stride
    seen = {}
    out = []
    for c in map(tuple, down):
        if c not in seen:
            seen[c] = len(out)
            out.append(c)
    out_coords = np.asarray(out, np.int32).reshape(-1, 3)
    table = {tuple(c): i for i, c in enumerate(coords)}
    kmap = np.full((len(out_coords), 8), -1, np.int32)
    for i, c in enumerate(out_coords):
        for k, off in enumerate(KERNEL_OFFSETS_2):
            j = table.get((c[0] + off[0] * stride, c[1] + off[1] * stride,
                           c[2] + off[2] * stride))
            if j is not None:
                kmap[i, k] = j
    return out_coords, kmap


def gather_conv_t(feats: torch.Tensor, nbr: np.ndarray, weight: torch.Tensor):
    """sum_k feats[nbr[:, k]] @ weight[k], empty (-1) neighbors contribute 0."""
    n, k = nbr.shape
    out = torch.zeros(n, weight.shape[-1], dtype=feats.dtype)
    for kk in range(k):
        idx = nbr[:, kk]
        valid = idx >= 0
        if valid.any():
            rows = feats[torch.from_numpy(idx[valid].astype(np.int64))]
            out[torch.from_numpy(np.nonzero(valid)[0])] += rows @ weight[kk]
    return out


# ---------------------------------------------------------------------------
# parameter ingestion from the flax trees
# ---------------------------------------------------------------------------


def _t(a) -> torch.Tensor:
    if isinstance(a, torch.Tensor):
        return a  # pre-built (possibly requires_grad) leaf — keep identity
    return torch.tensor(np.asarray(a), dtype=torch.float32)


class Linear:
    def __init__(self, p):  # flax TorchLinear {kernel [in,out], bias [out]}
        self.w = _t(p["kernel"])
        self.b = _t(p["bias"]) if "bias" in p else None

    def __call__(self, x):
        y = x @ self.w
        return y + self.b if self.b is not None else y


class BNEval:
    """torch BatchNorm eval mode: running stats from the flax batch_stats."""

    def __init__(self, p, stats, eps=1e-5):
        self.w, self.b = _t(p["scale"]), _t(p["bias"])
        self.rm, self.rv = _t(stats["mean"]), _t(stats["var"])
        self.eps = eps

    def __call__(self, x):
        return (x - self.rm) / torch.sqrt(self.rv + self.eps) * self.w + self.b


class LN:
    def __init__(self, p, eps=1e-5):  # torch nn.LayerNorm default eps
        self.w, self.b = _t(p["scale"]), _t(p["bias"])
        self.eps = eps

    def __call__(self, x):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + self.eps) * self.w + self.b


class ConvBNReLU:
    """BasicConvolutionBlock (reference models/basic_blocks.py:10-25)."""

    def __init__(self, p, stats):
        self.kernel = _t(p["conv"]["kernel"])  # [K, Cin, Cout]
        self.bn = BNEval(p["bn"], stats["bn"])

    def subm(self, feats, nbr):
        return F.relu(self.bn(gather_conv_t(feats, nbr, self.kernel)))

    def down(self, feats, kmap):
        return F.relu(self.bn(gather_conv_t(feats, kmap, self.kernel)))


class Residual:
    """ResidualBlock (reference models/basic_blocks.py:28-56; identity skip)."""

    def __init__(self, p, stats):
        self.k1 = _t(p["conv1"]["kernel"])
        self.bn1 = BNEval(p["bn1"], stats["bn1"])
        self.k2 = _t(p["conv2"]["kernel"])
        self.bn2 = BNEval(p["bn2"], stats["bn2"])

    def __call__(self, feats, nbr):
        x = F.relu(self.bn1(gather_conv_t(feats, nbr, self.k1)))
        x = self.bn2(gather_conv_t(x, nbr, self.k2))
        return F.relu(x + feats)


class SparseEncoder:
    """SparseConvEncoder / BEVEncoder (reference models/basic_blocks.py:59-95,
    136-171): stem 3^3 conv, then 4x [stride-2 conv + residual]."""

    def __init__(self, p, stats):
        self.stem = ConvBNReLU(p["stem"], stats["stem"])
        self.downs = [ConvBNReLU(p[f"stage{i}_down"], stats[f"stage{i}_down"]) for i in range(1, 5)]
        self.res = [Residual(p[f"stage{i}_res"], stats[f"stage{i}_res"]) for i in range(1, 5)]

    def __call__(self, coords: np.ndarray, feats: torch.Tensor):
        """Returns (final_coords, final_feats, final_stride)."""
        stride = 1
        nbr = build_nbr3_dict(coords, stride)
        x = self.stem.subm(feats, nbr)
        for i in range(4):
            coords, kmap = downsample_dict(coords, stride)
            stride *= 2
            x = self.downs[i].down(x, kmap)
            nbr = build_nbr3_dict(coords, stride)
            x = self.res[i](x, nbr)
        return coords, x, stride


def load_gru(p) -> torch.nn.GRU:
    gru = torch.nn.GRU(256, 128, num_layers=2, batch_first=True, bidirectional=True)
    with torch.no_grad():
        for layer in range(2):
            for sfx, key in (("", "fwd"), ("_reverse", "bwd")):
                sub = p[f"l{layer}_{key}"]
                getattr(gru, f"weight_ih_l{layer}{sfx}").copy_(_t(sub["wx"]).T)
                getattr(gru, f"weight_hh_l{layer}{sfx}").copy_(_t(sub["wh"]).T)
                getattr(gru, f"bias_ih_l{layer}{sfx}").copy_(_t(sub["bx"]))
                getattr(gru, f"bias_hh_l{layer}{sfx}").copy_(_t(sub["bh"]))
    gru.eval()
    return gru


# ---------------------------------------------------------------------------
# the replica model
# ---------------------------------------------------------------------------


class ReplicaLang:
    """models/lang_module.py (hidden=128, bidir; models/instancerefer.py:21)."""

    def __init__(self, p):
        self.wp0, self.wp1 = Linear(p["word_projection_0"]), Linear(p["word_projection_1"])
        self.gru = load_gru(p["gru"])
        self.fc = {h: Linear(p[h]) for h in ("fc_a", "fc_cls", "fc_rel", "fc_scene")}
        self.cls = Linear(p["lang_cls"])

    def __call__(self, dd: Dict, enable_grad: bool = False):
        embed = F.relu(self.wp1(F.relu(self.wp0(dd["lang_feat"]))))  # dropout off
        lengths = torch.as_tensor(dd["lang_len"])
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            embed, lengths, batch_first=True, enforce_sorted=False
        )
        if enable_grad:
            out, _ = self.gru(packed)
        else:
            with torch.no_grad():
                out, _ = self.gru(packed)
        feats, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
        dd["lang_feat_gru"] = feats
        tmax = feats.shape[1]
        mask = (torch.arange(tmax)[None, :] < lengths[:, None]).float()

        def head(name):
            atten = torch.softmax(self.fc[name](feats).squeeze(2), dim=1)
            atten = atten * mask
            atten = atten / atten.sum(1, keepdim=True)
            pooled = torch.bmm(atten.unsqueeze(1), embed[:, :tmax]).squeeze(1)
            return atten, pooled

        dd["atten_attr"], dd["lang_attr_feats"] = head("fc_a")
        _, dd["lang_cls_feats"] = head("fc_cls")
        dd["atten_rel"], dd["lang_rel_feats"] = head("fc_rel")
        dd["atten_scene"], dd["lang_scene_feats"] = head("fc_scene")
        dd["lang_scores"] = self.cls(dd["lang_cls_feats"])
        return dd


class ReplicaAttribute:
    """models/attribute_module.py with the explicit gather sparse conv."""

    def __init__(self, p, stats, voxel_size=0.02):
        self.voxel_size = voxel_size
        self.net = SparseEncoder(p["net"], stats["net"])
        self.vis0, self.vis1 = Linear(p["vis_emb_fc_0"]), Linear(p["vis_emb_fc_1"])
        self.vis_ln = LN(p["vis_emb_fc_ln"])
        self.lang0, self.lang1 = Linear(p["lang_emb_fc_0"]), Linear(p["lang_emb_fc_1"])
        self.lang_bn = BNEval(p["lang_emb_fc_bn"], stats["lang_emb_fc_bn"])

    def __call__(self, dd: Dict):
        lang = self.lang1(F.relu(self.lang_bn(self.lang0(dd["lang_attr_feats"]))))
        lang = F.normalize(lang, p=2, dim=1)

        lang_cls_pred = dd["object_cat"]  # use_gt_lang=True (yaml :21)
        pred_obb_batch, pooled_all, num_filtered = [], [], []
        bsz = len(dd["instance_points"])
        for i in range(bsz):
            pts, obbs = [], []
            for j in range(len(dd["instance_points"][i])):
                if dd["instance_class"][i][j] == lang_cls_pred[i]:
                    obbs.append(dd["instance_obbs"][i][j])
                    pc = dd["instance_points"][i][j]
                    coords, feats = quantize_first(pc[:, :3], pc, self.voxel_size)
                    pts.append((coords, feats))
            num_filtered.append(len(pts))
            if len(pts) < 2:
                pts = []  # reference drops <2-candidate samples (:75-76)
            for coords, feats in pts:
                _, x, _ = self.net(coords, torch.tensor(feats, dtype=torch.float32))
                pooled_all.append(x.max(0).values)  # GlobalMaxPooling
            pred_obb_batch.append(np.asarray(obbs, np.float32).reshape(-1, 7))

        dd["num_filtered_objs"] = num_filtered
        obj_feats = (
            torch.stack(pooled_all) if pooled_all else torch.zeros(0, 128)
        )
        dd["obj_feats"] = obj_feats

        vis = self.vis1(F.relu(self.vis_ln(self.vis0(obj_feats))))
        vis = F.normalize(vis, p=2, dim=1)
        lang_flat = []
        for i in range(bsz):
            n = len(pred_obb_batch[i])
            if n < 2:
                continue
            lang_flat.append(lang[i : i + 1].repeat(n, 1))
        lang_flat = torch.cat(lang_flat) if lang_flat else torch.zeros(0, lang.shape[1])
        dd["attribute_scores"] = (vis * lang_flat).sum(1)
        dd["pred_obb_batch"] = pred_obb_batch
        return dd


class ReplicaRelation:
    """models/relation_module.py + DynamicEdgeConv (basic_blocks.py:98-133)."""

    def __init__(self, p, stats, k=8, num_classes=18):
        self.k, self.nc = k, num_classes
        self.lang0, self.lang1 = Linear(p["lang_emb_fc_0"]), Linear(p["lang_emb_fc_1"])
        self.lang_bn = BNEval(p["lang_emb_fc_bn"], stats["lang_emb_fc_bn"])
        self.vis0, self.vis1 = Linear(p["vis_emb_fc_0"]), Linear(p["vis_emb_fc_1"])
        self.vis_ln = LN(p["vis_emb_fc_ln"])
        g = p["gcn"]
        self.w0, self.w1 = Linear(g["weight_0"]), Linear(g["weight_1"])
        self.m0, self.m1 = Linear(g["mlp_0"]), Linear(g["mlp_1"])

    def __call__(self, dd: Dict):
        lang = self.lang1(F.relu(self.lang_bn(self.lang0(dd["lang_rel_feats"]))))
        lang_cls_pred = dd["object_cat"]
        eye = np.eye(self.nc)

        # flat node assembly over qualifying (>=2 candidates) samples only
        # (reference filter_candidates :38-78)
        feats, batch_index, filtered_index, support_xyz, lang_flat = [], [], [], [], []
        bsz = len(dd["instance_points"])
        for i in range(bsz):
            if len(dd["pred_obb_batch"][i]) < 2:
                continue
            n = len(dd["pred_obb_batch"][i])
            lang_flat.append(lang[i : i + 1].repeat(n, 1))
            for j in range(len(dd["instance_points"][i])):
                node = dd["instance_points"][i][j].mean(0).copy()
                node[:3] = dd["instance_obbs"][i][j][:3]
                node = np.concatenate([node, eye[dd["instance_class"][i][j]]], -1)
                if dd["instance_class"][i][j] == lang_cls_pred[i]:
                    filtered_index.append(len(batch_index))
                feats.append(node)
                support_xyz.append(dd["instance_obbs"][i][j][:3])
                batch_index.append(i)

        feats = torch.tensor(np.asarray(feats), dtype=torch.float32)
        support_xyz = torch.tensor(np.asarray(support_xyz), dtype=torch.float32)
        batch_index = np.asarray(batch_index)
        filtered_index = np.asarray(filtered_index)
        lang_flat = torch.cat(lang_flat) if lang_flat else torch.zeros(0, lang.shape[1])

        # per-query kNN within the same batch element (torch-cluster knn)
        agg = torch.full((len(filtered_index), 128), -float("inf"))
        for qi, q in enumerate(filtered_index):
            same = np.nonzero(batch_index == batch_index[q])[0]
            d = torch.norm(support_xyz[same] - support_xyz[q], dim=1)
            k = min(self.k, len(same))
            nn_idx = same[torch.topk(-d, k).indices.numpy()]
            x_i = feats[q].expand(k, -1)
            x_j = feats[nn_idx]
            pos_d = support_xyz[nn_idx] - support_xyz[q].expand(k, -1)
            w = self.w1(F.relu(self.w0(torch.cat(
                [pos_d, x_i[:, -self.nc:], x_j[:, -self.nc:]], -1))))
            msg = self.m1(F.relu(self.m0(torch.cat([x_i, w, x_j], 1))))
            agg[qi] = msg.max(0).values

        vis = self.vis1(F.relu(self.vis_ln(self.vis0(agg))))
        dd["relation_scores"] = F.cosine_similarity(vis, lang_flat, dim=1)
        return dd


class ReplicaScene:
    """models/scene_module.py (loc crop [240,400,80], z_dim=2, stride 16)."""

    def __init__(self, p, stats):
        self.net = SparseEncoder(p["net"], stats["net"])
        self.bev_kernel = _t(p["to_bev_conv"]["kernel"])  # [5, 128, 128]
        self.bev_bn = BNEval(p["to_bev_bn"], stats["to_bev_bn"])
        self.conv0_w = _t(p["vis_emb_fc_conv0"]["conv"]["kernel"])  # HWIO
        self.conv0_b = _t(p["vis_emb_fc_conv0"]["conv"]["bias"])
        self.conv1_w = _t(p["vis_emb_fc_conv1"]["conv"]["kernel"])
        self.conv1_b = _t(p["vis_emb_fc_conv1"]["conv"]["bias"])
        self.conv_bn = BNEval(p["vis_emb_fc_bn"], stats["vis_emb_fc_bn"])
        self.lang0, self.lang1 = Linear(p["lang_emb_fc_0"]), Linear(p["lang_emb_fc_1"])
        self.lang_ln = LN(p["lang_emb_fc_ln"])
        self.cls0, self.cls1 = Linear(p["cls_0"]), Linear(p["cls_1"])
        self.cls_bn = BNEval(p["cls_bn"], stats["cls_bn"])
        self.obj0, self.obj1 = Linear(p["vis_emb_fc1_0"]), Linear(p["vis_emb_fc1_1"])
        self.obj_ln = LN(p["vis_emb_fc1_ln"])

    @staticmethod
    def _conv2d(x, w_hwio, b):
        w = torch.permute(w_hwio, (3, 2, 0, 1))  # HWIO -> OIHW
        return torch.conv2d(x, w, b)  # VALID padding

    def __call__(self, dd: Dict):
        bsz = len(dd["lidar"])
        bevs = []
        for coords, feats in dd["lidar"]:
            coords, x, stride = self.net(coords, torch.tensor(feats, dtype=torch.float32))
            # SparseCrop (:174-192)
            ok = ((coords >= 0) & (coords < np.array([240, 400, 80]))).all(1)
            coords, x = coords[ok], x[torch.from_numpy(np.nonzero(ok)[0])]
            # ToDenseBEVConvolution (:195-243): per-z kernel, scatter-add
            zbin = torch.from_numpy((coords[:, 2] // stride).astype(np.int64))
            rows = torch.einsum("vc,vcd->vd", x, self.bev_kernel[zbin])
            h, w = 240 // stride, 400 // stride  # 15, 25
            lin = torch.from_numpy(
                ((coords[:, 0] // stride) * w + coords[:, 1] // stride).astype(np.int64)
            )
            grid = torch.zeros(h * w, 128)
            grid.index_add_(0, lin, rows)
            bevs.append(grid.reshape(h, w, 128))
        bev = torch.stack(bevs)  # [B, 15, 25, 128] -> BCHW
        bev = F.relu(self.bev_bn(bev)).permute(0, 3, 1, 2)

        x = self._conv2d(bev, self.conv0_w, self.conv0_b)
        x = self.conv_bn(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        x = F.relu(x)
        x = self._conv2d(x, self.conv1_w, self.conv1_b)  # [B, 128, 11, 21]

        hdim = x.shape[1]
        cells = x.reshape(bsz, hdim, -1).permute(0, 2, 1)  # (B, 231, 128)
        lang = self.lang1(F.relu(self.lang_ln(self.lang0(dd["lang_scene_feats"]))))
        atten = torch.bmm(cells, lang.unsqueeze(2)).squeeze(2) / math.sqrt(hdim)
        atten = torch.softmax(atten, dim=1)
        dd["vis_atten"] = atten.reshape(bsz, x.shape[2], x.shape[3])
        scene_feats = (cells * atten.unsqueeze(2)).sum(1)
        dd["seg_scores"] = self.cls1(F.relu(self.cls_bn(self.cls0(scene_feats))))

        scene_flat = []
        for i in range(bsz):
            n = len(dd["pred_obb_batch"][i])
            if n < 2:
                continue
            scene_flat.append(scene_feats[i : i + 1].repeat(n, 1))
        scene_flat = torch.cat(scene_flat) if scene_flat else torch.zeros(0, hdim)
        obj = self.obj1(F.relu(self.obj_ln(self.obj0(dd["obj_feats"]))))
        dd["scene_scores"] = F.cosine_similarity(obj, scene_flat, dim=1)
        return dd


class Replica:
    def __init__(self, params, batch_stats, voxel_size_ap=0.02):
        params = _np_tree(params)
        batch_stats = _np_tree(batch_stats)
        self.lang = ReplicaLang(params["lang"])
        self.attribute = ReplicaAttribute(
            params["attribute"], batch_stats["attribute"], voxel_size_ap
        )
        self.relation = ReplicaRelation(params["relation"], batch_stats["relation"])
        self.scene = ReplicaScene(params["scene"], batch_stats["scene"])

    def forward(self, dd: Dict, enable_grad: bool = False) -> Dict:
        ctx = torch.enable_grad() if enable_grad else torch.no_grad()
        with ctx:
            dd = self.lang(dd, enable_grad=enable_grad)
            dd = self.attribute(dd)
            dd = self.relation(dd)
            dd = self.scene(dd)
        return dd


def _np_tree(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _np_tree(v) for k, v in tree.items()}
    if isinstance(tree, torch.Tensor):
        return tree  # keep identity so .grad lands on the caller's leaves
    return np.asarray(tree)


# ---------------------------------------------------------------------------
# loss + eval replicas (lib/loss_helper.py:196-269, lib/eval_helper.py:11-113)
# ---------------------------------------------------------------------------


def _aabb_iou(obb1: np.ndarray, obb2: np.ndarray) -> float:
    """box3d_iou over axis-aligned min/max corners (utils/box_util.py:120-133)."""
    lo1, hi1 = obb1[:3] - obb1[3:6] / 2, obb1[:3] + obb1[3:6] / 2
    lo2, hi2 = obb2[:3] - obb2[3:6] / 2, obb2[:3] + obb2[3:6] / 2
    inter = np.prod(np.maximum(np.minimum(hi1, hi2) - np.maximum(lo1, lo2), 0))
    v1, v2 = np.prod(hi1 - lo1), np.prod(hi2 - lo2)
    return float(inter / (v1 + v2 - inter + 1e-8))


def contrastive_loss(score: torch.Tensor, label: torch.Tensor, margin=0.2, gamma=5.0):
    """ContrastiveLoss (lib/loss_helper.py:93-107), incl. the logit-0 quirk."""
    s = score * gamma
    sim = (s * label).sum()
    neg = torch.logsumexp(s * (1.0 - label), dim=0)
    return torch.clamp(neg - sim + margin, min=0)


def replica_get_loss(dd: Dict, mean_size_arr: np.ndarray) -> Dict:
    lang_loss = F.cross_entropy(
        dd["lang_scores"], torch.as_tensor(np.asarray(dd["object_cat"], np.int64))
    )

    # 9-region scene label truth table (lib/loss_helper.py:131-161)
    pmin, pmax = np.asarray(dd["point_min"]), np.asarray(dd["point_max"])
    c = np.asarray(dd["ref_center_label"])
    first, second = pmin + (pmax - pmin) / 3, pmin + (pmax - pmin) / 3 * 2
    rf, rs = c <= first, c <= second
    label = np.where(rf[:, 0] & rf[:, 1], 0, 4)
    label = np.where(~rf[:, 0] & rs[:, 0] & rf[:, 1], 1, label)
    label = np.where(~rs[:, 0] & rf[:, 1], 2, label)
    label = np.where(rf[:, 0] & ~rf[:, 1] & rs[:, 1], 3, label)
    label = np.where(~rs[:, 0] & ~rf[:, 1] & rs[:, 1], 5, label)
    label = np.where(rf[:, 0] & ~rs[:, 1], 6, label)
    label = np.where(~rf[:, 0] & rs[:, 0] & ~rs[:, 1], 7, label)
    label = np.where(~rs[:, 0] & ~rs[:, 1], 8, label)
    seg_loss = F.cross_entropy(dd["seg_scores"], torch.as_tensor(label.astype(np.int64)))
    seg_acc = (dd["seg_scores"].argmax(1).numpy() == label).mean()

    # ref gt obb via param2obb (model_util_scannet.py:174-181; heading 0)
    ref_gt_obb = np.zeros((len(c), 7))
    ref_gt_obb[:, :3] = c
    ref_gt_obb[:, 3:6] = (
        mean_size_arr[np.asarray(dd["ref_size_class_label"])]
        + np.asarray(dd["ref_size_residual_label"])
    )

    scores = dd["attribute_scores"] + dd["relation_scores"] + dd["scene_scores"]
    bsz = len(dd["pred_obb_batch"])
    cluster_label: List[np.ndarray] = []
    ref_loss = torch.zeros(())
    start = 0
    for i in range(bsz):
        pred_obb = dd["pred_obb_batch"][i]
        n = pred_obb.shape[0]
        if n == 0:
            cluster_label.append(np.zeros(0))
            continue
        ious = np.array([_aabb_iou(pred_obb[j], ref_gt_obb[i]) for j in range(n)])
        lab = np.zeros(n)
        lab[ious.argmax()] = 1
        cluster_label.append(lab)
        if n == 1:
            continue
        score = scores[start : start + n]
        start += n
        if ious.max() < 0.2:
            continue
        ref_loss = ref_loss + contrastive_loss(score, torch.tensor(lab, dtype=torch.float32))
    ref_loss = ref_loss / bsz

    dd["ref_gt_obb"] = ref_gt_obb
    dd["cluster_label"] = cluster_label
    dd["lang_loss"] = lang_loss
    dd["seg_loss"] = seg_loss
    dd["seg_acc"] = seg_acc
    dd["ref_loss"] = ref_loss
    dd["loss"] = 10 * ref_loss + lang_loss + seg_loss
    return dd


def replica_get_eval(dd: Dict) -> Dict:
    lang_pred = dd["lang_scores"].argmax(1).numpy()
    dd["lang_acc"] = float((lang_pred == np.asarray(dd["object_cat"])).mean())

    scores = (dd["attribute_scores"] + dd["relation_scores"] + dd["scene_scores"]).numpy()
    ious, ref_acc = [], []
    start = 0
    num_missed = 0
    bsz = len(dd["pred_obb_batch"])
    for i in range(bsz):
        pred_obbs = dd["pred_obb_batch"][i]
        n = pred_obbs.shape[0]
        if n == 0:
            pred_obb = np.zeros(7)
            num_missed += 1
        elif n == 1:
            pred_obb = pred_obbs[0]
        else:
            score = scores[start : start + n]
            start += n
            cluster_pred = int(score.argmax())
            target = int(dd["cluster_label"][i].argmax())
            ref_acc.append(float(cluster_pred == target))
            pred_obb = pred_obbs[cluster_pred]
        iou = _aabb_iou(pred_obb, dd["ref_gt_obb"][i])
        ious.append(iou)
        if n <= 1:
            ref_acc.append(1.0 if iou > 0.25 else 0.0)
    dd["ref_acc_list"] = ref_acc
    dd["ref_iou"] = ious
    dd["ref_iou_rate_0.25"] = float((np.array(ious) >= 0.25).mean())
    dd["ref_iou_rate_0.5"] = float((np.array(ious) >= 0.5).mean())
    dd["num_missed"] = num_missed
    return dd


# ---------------------------------------------------------------------------
# train-mode replica: torch BN train semantics + joint-batch statistics
# ---------------------------------------------------------------------------
#
# The eval replica above runs each candidate/scene through the encoders
# separately — valid because eval BN is row-independent.  Train-mode BN is
# not: the reference collates all candidates (and all scenes) into ONE
# SparseTensor, so batch statistics pool over every row of the batch
# (reference models/attribute_module.py:101, models/scene_module.py:69 via
# torchsparse spnn.BatchNorm train mode).  The classes below run the same
# math with *joint* statistics: conv per group, BatchNorm over the
# concatenated rows, split back.  Running stats follow torch BN exactly
# (normalize by biased batch var, accumulate the unbiased estimate,
# running = (1-m)*running + m*batch), which is also MaskedBatchNorm's
# contract (models/basic_blocks.py:61-125).


class BNTrain:
    """torch BatchNorm train mode over row-major [..., C] tensors, stateful
    running stats, schedulable momentum (lib/scheduler_helper.py)."""

    def __init__(self, p, stats, eps=1e-5):
        self.w, self.b = _t(p["scale"]), _t(p["bias"])
        self.rm = _t(stats["mean"]).detach().clone()
        self.rv = _t(stats["var"]).detach().clone()
        self.eps = eps
        self.momentum = 0.1

    def __call__(self, x):
        c = x.shape[-1]
        flat = x.reshape(-1, c)
        mean = flat.mean(0)
        var = flat.var(0, unbiased=False)
        n = flat.shape[0]
        with torch.no_grad():
            unbiased = var.detach() * n / max(n - 1, 1)
            m = self.momentum
            self.rm = (1 - m) * self.rm + m * mean.detach()
            self.rv = (1 - m) * self.rv + m * unbiased
        return (x - mean) / torch.sqrt(var + self.eps) * self.w + self.b


class JointConvBNReLU:
    """BasicConvolutionBlock over a LIST of row groups with joint BN stats."""

    def __init__(self, p, stats):
        self.kernel = _t(p["conv"]["kernel"])
        self.bn = BNTrain(p["bn"], stats["bn"])

    def __call__(self, items):
        """items: list of (feats, kernel_map) -> list of activated outputs."""
        outs = [gather_conv_t(f, m, self.kernel) for f, m in items]
        cat = torch.cat(outs) if outs else torch.zeros(0, self.kernel.shape[-1])
        catn = F.relu(self.bn(cat))
        res, off = [], 0
        for o in outs:
            res.append(catn[off : off + len(o)])
            off += len(o)
        return res


class JointResidual:
    def __init__(self, p, stats):
        self.k1 = _t(p["conv1"]["kernel"])
        self.bn1 = BNTrain(p["bn1"], stats["bn1"])
        self.k2 = _t(p["conv2"]["kernel"])
        self.bn2 = BNTrain(p["bn2"], stats["bn2"])

    def _joint(self, bn, rows):
        cat = torch.cat(rows) if rows else torch.zeros(0, self.k1.shape[-1])
        catn = bn(cat)
        out, off = [], 0
        for r in rows:
            out.append(catn[off : off + len(r)])
            off += len(r)
        return out

    def __call__(self, feats_list, nbrs):
        x1 = self._joint(
            self.bn1, [gather_conv_t(f, n, self.k1) for f, n in zip(feats_list, nbrs)]
        )
        x1 = [F.relu(x) for x in x1]
        x2 = self._joint(
            self.bn2, [gather_conv_t(x, n, self.k2) for x, n in zip(x1, nbrs)]
        )
        return [F.relu(a + b) for a, b in zip(x2, feats_list)]


class JointSparseEncoder:
    """SparseConvEncoder/BEVEncoder over a list of sparse tensors with the
    reference's collated-batch BN statistics."""

    def __init__(self, p, stats):
        self.stem = JointConvBNReLU(p["stem"], stats["stem"])
        self.downs = [
            JointConvBNReLU(p[f"stage{i}_down"], stats[f"stage{i}_down"])
            for i in range(1, 5)
        ]
        self.res = [
            JointResidual(p[f"stage{i}_res"], stats[f"stage{i}_res"])
            for i in range(1, 5)
        ]

    def __call__(self, items):
        """items: list of (coords, feats) -> (final_coords_list, final_feats_list, stride)."""
        coords_l = [c for c, _ in items]
        stride = 1
        nbrs = [build_nbr3_dict(c, stride) for c in coords_l]
        xs = self.stem([(f, n) for (_, f), n in zip(items, nbrs)])
        for i in range(4):
            pairs = [downsample_dict(c, stride) for c in coords_l]
            coords_l = [p[0] for p in pairs]
            kmaps = [p[1] for p in pairs]
            stride *= 2
            xs = self.downs[i](list(zip(xs, kmaps)))
            nbrs = [build_nbr3_dict(c, stride) for c in coords_l]
            xs = self.res[i](xs, nbrs)
        return coords_l, xs, stride

    def bns(self):
        out = [self.stem.bn]
        for d in self.downs:
            out.append(d.bn)
        for r in self.res:
            out += [r.bn1, r.bn2]
        return out


class ReplicaTrain:
    """Train-mode forward of the whole model (dropout off — compare against
    the flax model with dropout_override=0.0): joint-batch BN statistics
    everywhere, stateful running stats, torch-exact momentum handling."""

    def __init__(self, params, batch_stats, voxel_size_ap=0.02):
        params = _np_tree(params)
        stats = _np_tree(batch_stats)
        self.voxel_size_ap = voxel_size_ap
        self.lang = ReplicaLang(params["lang"])

        ap, ast = params["attribute"], stats["attribute"]
        self.attr_net = JointSparseEncoder(ap["net"], ast["net"])
        self.attr_vis0, self.attr_vis1 = Linear(ap["vis_emb_fc_0"]), Linear(ap["vis_emb_fc_1"])
        self.attr_vis_ln = LN(ap["vis_emb_fc_ln"])
        self.attr_lang0, self.attr_lang1 = Linear(ap["lang_emb_fc_0"]), Linear(ap["lang_emb_fc_1"])
        self.attr_lang_bn = BNTrain(ap["lang_emb_fc_bn"], ast["lang_emb_fc_bn"])

        rp, rst = params["relation"], stats["relation"]
        self.rel = ReplicaRelation(rp, rst)
        self.rel_lang_bn = BNTrain(rp["lang_emb_fc_bn"], rst["lang_emb_fc_bn"])
        self.rel.lang_bn = self.rel_lang_bn  # swap eval BN for the train one

        sp, sst = params["scene"], stats["scene"]
        self.scene_net = JointSparseEncoder(sp["net"], sst["net"])
        self.scene_eval = ReplicaScene(sp, sst)  # reuse heads; BNs replaced
        self.scene_bev_bn = BNTrain(sp["to_bev_bn"], sst["to_bev_bn"])
        self.scene_conv_bn = BNTrain(sp["vis_emb_fc_bn"], sst["vis_emb_fc_bn"])
        self.scene_cls_bn = BNTrain(sp["cls_bn"], sst["cls_bn"])
        self.scene_eval.bev_bn = self.scene_bev_bn
        self.scene_eval.conv_bn = self.scene_conv_bn
        self.scene_eval.cls_bn = self.scene_cls_bn

    def all_bns(self):
        return (
            self.attr_net.bns()
            + self.scene_net.bns()
            + [self.attr_lang_bn, self.rel_lang_bn, self.scene_bev_bn,
               self.scene_conv_bn, self.scene_cls_bn]
        )

    def set_bn_momentum(self, m: float):
        for bn in self.all_bns():
            bn.momentum = m

    def running_stats_tree(self):
        """Current running stats in the flax batch_stats layout."""

        def bn(b):
            return {"mean": b.rm.numpy().copy(), "var": b.rv.numpy().copy()}

        def enc(e):
            out = {"stem": {"bn": bn(e.stem.bn)}}
            for i in range(1, 5):
                out[f"stage{i}_down"] = {"bn": bn(e.downs[i - 1].bn)}
                out[f"stage{i}_res"] = {
                    "bn1": bn(e.res[i - 1].bn1), "bn2": bn(e.res[i - 1].bn2)
                }
            return out

        return {
            "attribute": {
                "net": enc(self.attr_net),
                "lang_emb_fc_bn": bn(self.attr_lang_bn),
            },
            "relation": {"lang_emb_fc_bn": bn(self.rel_lang_bn)},
            "scene": {
                "net": enc(self.scene_net),
                "to_bev_bn": bn(self.scene_bev_bn),
                "vis_emb_fc_bn": bn(self.scene_conv_bn),
                "cls_bn": bn(self.scene_cls_bn),
            },
        }

    def forward(self, dd: Dict) -> Dict:
        dd = self.lang(dd, enable_grad=True)

        # ---- attribute (train): filter + joint-encode all candidates
        lang = self.attr_lang1(
            F.relu(self.attr_lang_bn(self.attr_lang0(dd["lang_attr_feats"])))
        )
        lang = F.normalize(lang, p=2, dim=1)
        lang_cls_pred = dd["object_cat"]
        bsz = len(dd["instance_points"])
        pred_obb_batch, groups, group_sample = [], [], []
        for i in range(bsz):
            pts, obbs = [], []
            for j in range(len(dd["instance_points"][i])):
                if dd["instance_class"][i][j] == lang_cls_pred[i]:
                    obbs.append(dd["instance_obbs"][i][j])
                    pc = dd["instance_points"][i][j]
                    coords, feats = quantize_first(pc[:, :3], pc, self.voxel_size_ap)
                    pts.append((coords, torch.tensor(feats, dtype=torch.float32)))
            if len(pts) >= 2:
                groups += pts
                group_sample += [i] * len(pts)
            pred_obb_batch.append(np.asarray(obbs, np.float32).reshape(-1, 7))
        dd["pred_obb_batch"] = pred_obb_batch
        _, xs, _ = self.attr_net(groups) if groups else ([], [], 1)
        pooled = (
            torch.stack([x.max(0).values for x in xs]) if xs else torch.zeros(0, 128)
        )
        dd["obj_feats"] = pooled
        vis = self.attr_vis1(F.relu(self.attr_vis_ln(self.attr_vis0(pooled))))
        vis = F.normalize(vis, p=2, dim=1)
        lang_flat = (
            lang[np.asarray(group_sample, np.int64)]
            if group_sample
            else torch.zeros(0, lang.shape[1])
        )
        dd["attribute_scores"] = (vis * lang_flat).sum(1)

        # ---- relation (train BN swapped in)
        dd = self.rel(dd)

        # ---- scene: joint-encode all scenes, then the eval head machinery
        # with the train BNs swapped in
        items = [
            (coords, torch.tensor(feats, dtype=torch.float32))
            for coords, feats in dd["lidar"]
        ]
        coords_l, xs, stride = self.scene_net(items)
        se = self.scene_eval
        bevs = []
        for coords, x in zip(coords_l, xs):
            ok = ((coords >= 0) & (coords < np.array([240, 400, 80]))).all(1)
            coords, x = coords[ok], x[torch.from_numpy(np.nonzero(ok)[0])]
            zbin = torch.from_numpy((coords[:, 2] // stride).astype(np.int64))
            rows = torch.einsum("vc,vcd->vd", x, se.bev_kernel[zbin])
            h, w = 240 // stride, 400 // stride
            lin = torch.from_numpy(
                ((coords[:, 0] // stride) * w + coords[:, 1] // stride).astype(np.int64)
            )
            grid = torch.zeros(h * w, 128)
            grid.index_add_(0, lin, rows)
            bevs.append(grid.reshape(h, w, 128))
        bev = torch.stack(bevs)
        bev = F.relu(se.bev_bn(bev)).permute(0, 3, 1, 2)
        x = se._conv2d(bev, se.conv0_w, se.conv0_b)
        x = se.conv_bn(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        x = F.relu(x)
        x = se._conv2d(x, se.conv1_w, se.conv1_b)
        hdim = x.shape[1]
        cells = x.reshape(bsz, hdim, -1).permute(0, 2, 1)
        lang_s = se.lang1(F.relu(se.lang_ln(se.lang0(dd["lang_scene_feats"]))))
        atten = torch.bmm(cells, lang_s.unsqueeze(2)).squeeze(2) / math.sqrt(hdim)
        atten = torch.softmax(atten, dim=1)
        dd["vis_atten"] = atten.reshape(bsz, x.shape[2], x.shape[3])
        scene_feats = (cells * atten.unsqueeze(2)).sum(1)
        dd["seg_scores"] = se.cls1(F.relu(se.cls_bn(se.cls0(scene_feats))))
        scene_flat = []
        for i in range(bsz):
            n = len(dd["pred_obb_batch"][i])
            if n >= 2:
                scene_flat.append(scene_feats[i : i + 1].repeat(n, 1))
        scene_flat = (
            torch.cat(scene_flat) if scene_flat else torch.zeros(0, hdim)
        )
        obj = se.obj1(F.relu(se.obj_ln(se.obj0(dd["obj_feats"]))))
        dd["scene_scores"] = F.cosine_similarity(obj, scene_flat, dim=1)
        return dd


def gru_value_tree(gru) -> Dict:
    """Current torch nn.GRU parameter VALUES in the flax layout (mirror of
    collect_param_grads' gradient mapping)."""
    out = {}
    for layer in range(2):
        for sfx, key in (("", "fwd"), ("_reverse", "bwd")):
            out[f"l{layer}_{key}"] = {
                "wx": getattr(gru, f"weight_ih_l{layer}{sfx}").detach().numpy().T.copy(),
                "wh": getattr(gru, f"weight_hh_l{layer}{sfx}").detach().numpy().T.copy(),
                "bx": getattr(gru, f"bias_ih_l{layer}{sfx}").detach().numpy().copy(),
                "bh": getattr(gru, f"bias_hh_l{layer}{sfx}").detach().numpy().copy(),
            }
    return out


def param_value_tree(params_t, replica) -> Dict:
    """Current torch parameter VALUES in the flax layout (the trajectory
    comparison reads this after each optimizer step)."""

    def walk(t):
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        return t.detach().numpy().copy()

    out = walk(params_t)
    out["lang"]["gru"] = gru_value_tree(replica.lang.gru)
    return out


# ---------------------------------------------------------------------------
# gradient goldens: requires_grad param trees + grad collection
# ---------------------------------------------------------------------------


def torch_param_tree(params):
    """flax params (numpy) -> same-structure dict of requires_grad tensors.

    Passing this tree to Replica keeps leaf identity (_t/_np_tree pass
    torch.Tensors through), so after loss.backward() each leaf's ``.grad``
    is the reference gradient for the corresponding flax parameter.
    """
    if isinstance(params, dict) or hasattr(params, "items"):
        return {k: torch_param_tree(v) for k, v in params.items()}
    t = torch.tensor(np.asarray(params), dtype=torch.float32)
    t.requires_grad_(True)
    return t


def collect_param_grads(params_t, replica):
    """Read gradients off a torch_param_tree after backward; the GRU's grads
    come from the nn.GRU parameters load_gru copied the weights into (the
    copy breaks the autograd chain to the tree leaves), mapped back through
    the same (transposed) layout."""

    def walk(t):
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        g = t.grad
        return np.zeros(t.shape, np.float32) if g is None else g.numpy().copy()

    out = walk(params_t)
    gru = replica.lang.gru
    gru_tree = {}
    for layer in range(2):
        for sfx, key in (("", "fwd"), ("_reverse", "bwd")):
            def g(name):
                p = getattr(gru, name)
                return (np.zeros(p.shape, np.float32) if p.grad is None
                        else p.grad.numpy().copy())
            gru_tree[f"l{layer}_{key}"] = {
                "wx": g(f"weight_ih_l{layer}{sfx}").T,
                "wh": g(f"weight_hh_l{layer}{sfx}").T,
                "bx": g(f"bias_ih_l{layer}{sfx}"),
                "bh": g(f"bias_hh_l{layer}{sfx}"),
            }
    out["lang"]["gru"] = gru_tree
    return out
