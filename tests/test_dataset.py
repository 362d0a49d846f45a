"""ScannetReferenceDataset integration over a fake on-disk ScanNet tree."""

import json
import os
import pickle

import numpy as np
import pytest

from instancerefer_tpu.data.dataset import (
    PaddedLoader,
    ScannetReferenceDataset,
    get_scanrefer,
)
from instancerefer_tpu.data.pipeline import BatchSpec
from instancerefer_tpu.data.scannet_config import ScannetDatasetConfig

SPEC = BatchSpec(
    max_tokens=16, max_instances=8, max_candidates=4,
    scene_caps=(256, 128, 64, 32, 16), inst_caps=(256, 128, 64, 32, 16),
)


@pytest.fixture
def fake_data_root(tmp_path, rng):
    root = tmp_path
    pg = root / "scannet" / "pointgroup_data"
    pg.mkdir(parents=True)
    (root / "scannet" / "meta_data").mkdir(parents=True)

    n = 800
    scene_id = "scene0000_00"
    xyz = rng.uniform(0, 4, size=(n, 3))
    rgb = rng.uniform(0, 255, size=(n, 3))
    verts = np.concatenate([xyz, rgb], axis=1).astype(np.float32)
    # 3 instances: two chairs (nyu40 5), one table (nyu40 7), rest background
    ins = np.zeros(n, np.int64)
    sem = np.zeros(n, np.int64)
    ins[0:200] = 1; sem[0:200] = 5
    ins[200:400] = 2; sem[200:400] = 5
    ins[400:600] = 3; sem[400:600] = 7
    boxes = []
    for i in (1, 2, 3):
        pc = xyz[ins == i]
        mn, mx = pc.min(0), pc.max(0)
        boxes.append(np.concatenate([(mn + mx) / 2, mx - mn, [5 if i < 3 else 7, i - 1]]))
    boxes = np.stack(boxes)

    np.save(pg / f"{scene_id}_aligned_vert.npy", verts)
    np.save(pg / f"{scene_id}_ins_label_pg.npy", ins)
    np.save(pg / f"{scene_id}_sem_label_pg.npy", sem)
    np.save(pg / f"{scene_id}_aligned_bbox.npy", boxes)

    (root / "scannet" / "meta_data" / "scannetv2-labels.combined.tsv").write_text(
        "id\traw_category\tcategory\tcount\tnyu40id\teigen13id\tnyuClass\tnyu40class\n"
        "1\tchair\tchair\t10\t5\t4\tchair\tchair\n"
        "2\ttable\ttable\t10\t7\t10\ttable\ttable\n"
    )

    glove = {w: rng.normal(size=300) for w in ["the", "chair", "next", "to", "table", "unk"]}
    with open(root / "glove.p", "wb") as f:
        pickle.dump(glove, f)

    scanrefer = [
        {
            "scene_id": scene_id,
            "object_id": "0",
            "object_name": "chair",
            "ann_id": "0",
            "token": ["the", "chair", "next", "to", "the", "table"],
            "description": "the chair next to the table",
        },
        {
            "scene_id": scene_id,
            "object_id": "2",
            "object_name": "table",
            "ann_id": "0",
            "token": ["the", "table"],
            "description": "the table",
        },
        {
            "scene_id": scene_id,
            "object_id": "1",
            "object_name": "chair",
            "ann_id": "1",
            "token": ["the", "chair"],
            "description": "the chair",
        },
    ]
    with open(root / "ScanRefer_filtered_val.json", "w") as f:
        json.dump(scanrefer, f)
    return str(root), scanrefer


def _make_ds(root, scanrefer, split="val"):
    return ScannetReferenceDataset(
        scanrefer, split, data_root=root, num_points=500,
        use_augment=(split == "train"), seed=7,
    )


def test_core_sample_semantics(fake_data_root):
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    core = ds.get_core(0)
    assert core.object_cat == 2  # chair
    assert core.lang_len == 6
    assert core.point_cloud.shape == (500, 7)  # xyz rgb height
    assert len(core.instance_points) == 3
    assert sorted(core.instance_class) == [2, 2, 4]  # chair chair table
    for p in core.instance_points:
        assert p.shape == (1024, 7)
    # unique_multiple: two chairs -> multiple (1); one table -> unique (0)
    assert core.unique_multiple == 1
    core2 = ds.get_core(1)
    assert core2.object_cat == 4
    assert core2.unique_multiple == 0
    # ref target: chair query marks instance with matching id
    assert core.ref_target.sum() == 1


def test_color_normalization(fake_data_root):
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    core = ds.get_core(0)
    # (rgb - MEAN)/256 keeps values in about [-0.5, 1)
    assert np.abs(core.point_cloud[:, 3:6]).max() < 1.0


def test_augmentation_changes_geometry_deterministically(fake_data_root):
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer, split="train")
    rng1 = np.random.default_rng(11)
    rng2 = np.random.default_rng(11)
    rng3 = np.random.default_rng(99)
    a = ds.get_core(0, rng1)
    b = ds.get_core(0, rng2)
    c = ds.get_core(0, rng3)
    np.testing.assert_array_equal(a.point_cloud, b.point_cloud)
    assert not np.allclose(a.point_cloud, c.point_cloud)


def test_padded_loader_batches(fake_data_root):
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    loader = PaddedLoader(ds, SPEC, batch_size=2, shuffle=False, num_workers=0,
                          drop_last=False)
    batches = list(loader)
    assert len(batches) == 2  # 3 annotations, batch_size 2, keep remainder
    b = batches[0]
    assert b["lang_feat"].shape == (2, 16, 300)
    assert b["cand_mask"].shape == (2, 4)
    # chair query: 2 chair candidates; table query: 1 table candidate
    assert b["cand_mask"][0].sum() == 2
    assert b["cand_mask"][1].sum() == 1
    assert b["scene_nbr3_0"].shape == (2 * 256, 27)
    # instance voxels exist only for the >=2-candidate sample
    owners0 = b["inst_owner_0"]
    assert (owners0[: 256] >= 0).any()      # sample 0 block has rows
    assert (owners0[256:] == -1).all()      # sample 1 block empty


def test_class_override_changes_candidates(fake_data_root):
    """use_gt_lang=False second pass: candidates follow the predicted class
    while labels keep GT object_cat."""
    from instancerefer_tpu.data.pipeline import pad_sample

    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    # query 0 targets a chair (class 2); override filter to table (class 4)
    core = ds.get_core(0, class_override=4)
    assert core.object_cat == 2  # GT label untouched
    padded = pad_sample(core, SPEC)
    assert padded["object_cat"] == 2
    assert padded["cand_mask"].sum() == 1  # one table instance
    slot = padded["cand_slot"][0]
    assert padded["instance_class"][slot] == 4


def test_threaded_loader_matches_serial(fake_data_root):
    """num_workers>0 (thread pool) must produce the same batches as serial."""
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    a = list(PaddedLoader(ds, SPEC, batch_size=2, shuffle=False, num_workers=0,
                          drop_last=False, seed=3))
    b = list(PaddedLoader(ds, SPEC, batch_size=2, shuffle=False, num_workers=2,
                          drop_last=False, seed=3))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_scene_cache_coalesces_concurrent_misses(fake_data_root, monkeypatch):
    """Annotations are grouped by scene, so at a scene boundary every loader
    thread misses the LRU at once — the in-flight event must make exactly ONE
    thread read the four .npy files while the rest wait for the cached
    tuple."""
    import threading

    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    loads = []
    real_load = np.load

    def counting_load(path, *a, **k):
        loads.append(path)
        return real_load(path, *a, **k)

    monkeypatch.setattr(np, "load", counting_load)
    barrier = threading.Barrier(4)
    results = []

    def worker():
        barrier.wait()
        results.append(ds._load_scene("scene0000_00"))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(loads) == 4  # one read per file, not per thread
    for r in results[1:]:
        for x, y in zip(results[0], r):
            assert x is y  # all threads share the cached arrays

    # a second call is a pure cache hit
    ds._load_scene("scene0000_00")
    assert len(loads) == 4


def test_multihost_loader_partitions_epoch(fake_data_root):
    """Multi-host input sharding (parallel.mesh.host_shard_indices wired into
    PaddedLoader): per-host sample sets are disjoint, their union is the
    single-host epoch, and each sample's padded arrays are bit-identical to
    the single-host build (seeds are positional in the global permutation)."""
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)

    def run(pi, pc):
        return list(
            PaddedLoader(
                ds, SPEC, batch_size=2, shuffle=True, num_workers=0,
                drop_last=False, seed=5, process_index=pi, process_count=pc,
            )
        )

    def rows(batches):
        out = {}
        for b in batches:
            for i in range(len(b["sample_valid"])):
                if b["sample_valid"][i]:
                    out[int(b["scan_idx"][i])] = (
                        b["lang_feat"][i].copy(),
                        b["scene_feats"][i * SPEC.scene_caps[0]:(i + 1) * SPEC.scene_caps[0]].copy(),
                    )
        return out

    single = rows(run(0, 1))
    h0_batches, h1_batches = run(0, 2), run(1, 2)
    # lockstep: both hosts yield the same number of batches == len(loader)
    assert len(h0_batches) == len(h1_batches) == len(
        PaddedLoader(ds, SPEC, batch_size=2, process_count=2)
    )
    h0, h1 = rows(h0_batches), rows(h1_batches)
    assert set(h0).isdisjoint(h1)
    assert set(h0) | set(h1) == set(single) == {0, 1, 2}
    for hs in (h0, h1):
        for idx, (lang, scene) in hs.items():
            np.testing.assert_array_equal(lang, single[idx][0])
            np.testing.assert_array_equal(scene, single[idx][1])


def test_predicted_class_loader_refreshes_candidates(fake_data_root):
    """use_gt_lang=False at train time (PredictedClassLoader): candidates
    follow the per-epoch predictions of the injected classifier, refreshed
    with whatever the predictor returns at each epoch start."""
    from instancerefer_tpu.data.dataset import PredictedClassLoader

    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    calls = []
    # epoch 0 predicts 'table' (class 4) for everything; epoch 1 'chair' (2)
    pred_by_epoch = {0: 4, 1: 2}

    def predict_fn(lang_feat, lang_len):
        # the prediction pass must see the same token grid pad_sample gives
        # the model (spec.max_tokens-clamped, bucketed) — NOT get_lang's raw
        # 126-token grid: the checkpoint was trained on max_tokens, and a
        # longer grid can argmax a different class
        assert lang_feat.shape[1:] == (SPEC.bucketed_tokens(lang_len.max()), 300)
        assert lang_feat.shape[1] <= SPEC.max_tokens
        assert (lang_len <= SPEC.max_tokens).all()
        calls.append(lang_feat.shape[0])
        epoch = len([c for c in calls]) - 1
        return np.full(lang_feat.shape[0], pred_by_epoch[min(epoch, 1)], np.int64)

    loader = PredictedClassLoader(
        ds, SPEC, 2, predict_fn, predict_batch=8,
        shuffle=False, num_workers=0, drop_last=False,
    )
    assert len(loader) == 2

    epoch0 = list(loader)
    # all 3 queries filtered to the 'table' class -> exactly 1 candidate each
    cand0 = np.concatenate([b["cand_mask"].sum(1)[b["sample_valid"]] for b in epoch0])
    assert (cand0 == 1).all()
    for b in epoch0:
        slots = b["cand_slot"][b["cand_mask"]]
        classes = b["instance_class"][np.arange(len(b["cand_mask"]))[:, None], b["cand_slot"]]
        assert (classes[b["cand_mask"]] == 4).all()

    epoch1 = list(loader)
    # refreshed prediction: 'chair' (2 instances per scene) -> 2 candidates
    cand1 = np.concatenate([b["cand_mask"].sum(1)[b["sample_valid"]] for b in epoch1])
    assert (cand1 == 2).all()


def test_get_scanrefer_roundtrip(fake_data_root):
    root, scanrefer = fake_data_root
    loaded = get_scanrefer(root, "val")
    assert len(loaded) == 3
    assert loaded[0]["scene_id"] == "scene0000_00"


def test_multiview_features_end_to_end(fake_data_root):
    """use_multiview=True: per-point 128-d ENet features from the HDF5 are
    concatenated before height (reference lib/dataset.py:112-123), flow
    through pad/collate, and the model forward accepts the 135-ch input
    (scripts/train.py channel arithmetic: 128 + color 3 + xyz 3 + height 1)."""
    import functools

    import h5py
    import jax
    import jax.numpy as jnp

    from instancerefer_tpu.data.pipeline import (
        BatchSpec,
        batch_to_device_dict,
        collate,
        pad_sample,
    )
    from instancerefer_tpu.models.instancerefer import InstanceRefer

    root, scanrefer = fake_data_root
    rng = np.random.default_rng(5)
    n = len(np.load(f"{root}/scannet/pointgroup_data/scene0000_00_aligned_vert.npy"))
    with h5py.File(f"{root}/enet_feats_maxpool.hdf5", "w") as f:
        f["scene0000_00"] = rng.normal(size=(n, 128)).astype(np.float32)

    ds = ScannetReferenceDataset(
        scanrefer, "val", data_root=root, num_points=400,
        use_augment=False, seed=7, use_multiview=True,
    )
    core = ds.get_core(0)
    assert core.point_cloud.shape == (400, 135)  # xyz rgb mv128 height
    # height stays the LAST channel (computed after the multiview concat):
    # z minus a constant floor (the floor percentile is taken over the full
    # cloud, before sampling)
    z = core.point_cloud[:, 2]
    diff = core.point_cloud[:, -1] - z
    np.testing.assert_allclose(diff, diff[0], atol=1e-5)

    spec = BatchSpec(
        max_tokens=12, max_instances=8, max_candidates=4,
        scene_caps=(256, 128, 64, 32, 16), inst_caps=(256, 128, 64, 32, 16),
        feat_dim=135,
    )
    dd = batch_to_device_dict(collate([pad_sample(core, spec)], spec), spec)
    model = InstanceRefer(
        input_feature_dim=135, num_classes=18, max_candidates=4
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, dd
    )
    out = model.apply(variables, dd, train=False)
    assert out["attribute_scores"].shape == (1, 4)


def test_static_scene_sampling_shares_bundle(fake_data_root):
    """Non-train splits default to deterministic PER-SCENE sampling: every
    annotation of a scene shares one point-cloud draw (documented deviation
    from the reference's per-annotation draws), independent of the passed
    rng and of epoch."""
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    assert ds.static_scene_sampling
    a = ds.get_core(0, np.random.default_rng(1))
    b = ds.get_core(0, np.random.default_rng(2))
    np.testing.assert_array_equal(a.point_cloud, b.point_cloud)
    # annotation-level fields still differ per annotation
    c = ds.get_core(1, np.random.default_rng(3))
    if scanrefer[0]["scene_id"] == scanrefer[1]["scene_id"]:
        np.testing.assert_array_equal(a.point_cloud, c.point_cloud)
    assert a.object_cat != c.object_cat or a.object_id != c.object_id
    # train split: augmentation on -> per-annotation rng still varies
    ds_t = _make_ds(root, scanrefer, split="train")
    assert not ds_t.static_scene_sampling
    t1 = ds_t.get_core(0, np.random.default_rng(1))
    t2 = ds_t.get_core(0, np.random.default_rng(2))
    assert not np.allclose(t1.point_cloud, t2.point_cloud)
    # train split with augmentation OFF still defaults to per-annotation
    # redraws (reference lib/dataset.py:125) — freezing the 40k subsample
    # across epochs would silently collapse training-data diversity
    from instancerefer_tpu.data.dataset import ScannetReferenceDataset

    ds_na = ScannetReferenceDataset(
        scanrefer, "train", data_root=root, num_points=500,
        use_augment=False, seed=7,
    )
    assert not ds_na.static_scene_sampling
    n1 = ds_na.get_core(0, np.random.default_rng(1))
    n2 = ds_na.get_core(0, np.random.default_rng(2))
    assert not np.allclose(n1.point_cloud, n2.point_cloud)


def test_scene_block_cache_hit_matches_recompute(fake_data_root):
    """The padded scene block served from the cache must equal a fresh
    pad_sample (no scene_block) bit-for-bit, across annotations and epochs."""
    from instancerefer_tpu.data.pipeline import pad_sample

    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    loader = PaddedLoader(ds, SPEC, batch_size=2, shuffle=False, num_workers=0,
                          drop_last=False)
    assert loader._scene_blocks_on
    batches_cached = list(loader)
    batches_cached2 = list(loader)  # second epoch: served from the cache
    # recompute without any cache: static sampling, but scene_block=None
    fresh = []
    for i in range(len(ds)):
        core = ds.get_core(i, np.random.default_rng(100 + i))
        fresh.append(pad_sample(core, SPEC))
    from instancerefer_tpu.data.pipeline import finalize_batch

    want = [finalize_batch(fresh[:2], 2, SPEC), finalize_batch(fresh[2:], 2, SPEC)]
    for got_ep in (batches_cached, batches_cached2):
        assert len(got_ep) == len(want)
        for bg, bw in zip(got_ep, want):
            assert set(bg) == set(bw)
            for k in bg:
                np.testing.assert_array_equal(bg[k], bw[k], err_msg=k)


def test_scene_block_cache_keyed_by_geometry(fake_data_root):
    """Loaders with different specs must not serve each other's blocks."""
    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)
    l1 = PaddedLoader(ds, SPEC, batch_size=2, shuffle=False, num_workers=0)
    spec2 = BatchSpec(
        max_tokens=16, max_instances=8, max_candidates=4,
        scene_caps=(128, 64, 32, 16, 16), inst_caps=(256, 128, 64, 32, 16),
    )
    l2 = PaddedLoader(ds, spec2, batch_size=2, shuffle=False, num_workers=0)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    assert b1["scene_nbr3_0"].shape == (2 * 256, 27)
    assert b2["scene_nbr3_0"].shape == (2 * 128, 27)


def test_predicted_class_loader_shards_prediction_multihost(fake_data_root, monkeypatch):
    """Multi-host use_gt_lang=False: each host predicts classes ONLY for its
    epoch shard (O(n/process_count) per host), the shards are disjoint and
    cover the epoch, and override keys still line up with what each host's
    loader builds (candidates follow the predicted class)."""
    from instancerefer_tpu.data.dataset import PredictedClassLoader

    root, scanrefer = fake_data_root
    ds = _make_ds(root, scanrefer)

    def predict_fn(lang_feat, lang_len):
        return np.full(lang_feat.shape[0], 4, np.int64)  # 'table'

    captured = {}
    orig = PredictedClassLoader._predict_overrides

    def spy(self, sample_idxs=None):
        captured[self._spy_host] = sample_idxs
        return orig(self, sample_idxs)

    monkeypatch.setattr(PredictedClassLoader, "_predict_overrides", spy)

    hosts = {}
    for pi in (0, 1):
        loader = PredictedClassLoader(
            ds, SPEC, 1, predict_fn, predict_batch=2,
            shuffle=True, seed=3, num_workers=0, drop_last=False,
            process_index=pi, process_count=2,
        )
        loader._spy_host = pi
        hosts[pi] = list(loader)

    s0, s1 = captured[0], captured[1]
    assert s0 is not None and s1 is not None, "shard not passed to predictor"
    assert set(s0).isdisjoint(s1)
    assert set(s0) | set(s1) == set(range(len(ds)))
    # shard sizes ~ n / process_count, not n
    assert max(len(s0), len(s1)) <= -(-len(ds) // 2)
    # the predicted class drove candidate filtering on both hosts
    for batches in hosts.values():
        for b in batches:
            classes = b["instance_class"][
                np.arange(len(b["cand_mask"]))[:, None], b["cand_slot"]
            ]
            assert (classes[b["cand_mask"]] == 4).all()
