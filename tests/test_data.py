"""Data layer tests: parsers, P x K sampler invariants, loader, transforms."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.data import (
    EvalLoader,
    TrainLoader,
    augment_batch,
    build_epoch_plan,
    init_dataset,
    normalize_batch,
    occurrences_per_pid,
)


def _make_market(tmp_path, pid_sizes, n_query=6, n_gallery=10):
    """Create a tiny market1501-style dir tree with random JPEGs."""
    root = tmp_path / "data"
    base = root / "market1501"
    rng = np.random.RandomState(0)
    for sub in ("bounding_box_train", "query", "bounding_box_test"):
        (base / sub).mkdir(parents=True)

    def write(subdir, pid, camid, i):
        arr = rng.randint(0, 255, (64, 32, 3), np.uint8)
        Image.fromarray(arr).save(base / subdir / f"{pid:04d}_c{camid}s1_{i:06d}_00.jpg")

    for pid, n in pid_sizes.items():
        for i in range(n):
            write("bounding_box_train", pid, (i % 6) + 1, i)
    # junk pid -1 must be ignored
    write("bounding_box_train", -1, 1, 0)
    for i in range(n_query):
        write("query", 100 + (i % 3), (i % 6) + 1, i)
    for i in range(n_gallery):
        write("bounding_box_test", 100 + (i % 3), ((i + 1) % 6) + 1, i)
    return str(root)


@pytest.fixture()
def market_root(tmp_path):
    return _make_market(
        tmp_path, pid_sizes={7: 6, 23: 4, 55: 2, 70: 5, 81: 9, 90: 4}
    )


def test_market_parser(market_root):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = market_root
    ds = init_dataset("market1501", cfg)
    # 6 pids relabelled to 0..5; junk -1 skipped
    assert ds.num_classes == 6
    assert sorted(ds.train_dict) == list(range(6))
    assert len(ds.train) == 6 + 4 + 2 + 5 + 9 + 4
    assert ds.num_query == 6
    assert len(ds.val) == 6 + 10
    # query/gallery keep raw pids, camids 0-based
    assert {r.pid for r in ds.query} == {100, 101, 102}
    assert all(0 <= r.camid <= 5 for r in ds.train)


def test_occurrences_rule():
    # ceil(len/K) with the %1 reduction (distributed_pids_sampler.py:32-40)
    assert occurrences_per_pid(8, 4) == 2
    assert occurrences_per_pid(9, 4) == 2   # 9 % 4 == 1 -> use 8
    assert occurrences_per_pid(6, 4) == 2
    assert occurrences_per_pid(2, 4) == 1
    assert occurrences_per_pid(5, 4) == 1   # 5 % 4 == 1 -> use 4


def test_epoch_plan_invariants(market_root):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = market_root
    ds = init_dataset("market1501", cfg)
    p, k, g = 2, 4, 2
    plan = build_epoch_plan(ds.train_dict, p, k, g, epoch=0,
                            use_resampling=False)
    assert plan.pids.shape[1:] == (g, p)
    assert plan.sample_idx.shape == plan.pids.shape + (k,)

    # distinct pids within every step (sampled without replacement)
    for t in range(plan.num_steps):
        flat = plan.pids[t].reshape(-1)
        assert len(set(flat.tolist())) == p * g

    # mocks only at the tail of a pid's K slots
    for t in range(plan.num_steps):
        for gi in range(g):
            for pi in range(p):
                real = plan.is_real[t, gi, pi]
                assert real[0] and real[1]  # >= 2 real always
                if not real.all():
                    first_mock = int(np.argmin(real))
                    assert not real[first_mock:].any()

    # per-group without-replacement consumption of real instances
    for gi in range(g):
        for pid in ds.train_dict:
            used = []
            for t in range(plan.num_steps):
                for pi in range(p):
                    if plan.pids[t, gi, pi] == pid:
                        used.extend(
                            plan.sample_idx[t, gi, pi][plan.is_real[t, gi, pi]]
                        )
            assert len(used) == len(set(used)), f"pid {pid} reused an instance"

    # determinism + epoch variation
    plan2 = build_epoch_plan(ds.train_dict, p, k, g, 0, False)
    np.testing.assert_array_equal(plan.pids, plan2.pids)
    plan3 = build_epoch_plan(ds.train_dict, p, k, g, 1, False)
    assert not np.array_equal(plan.pids, plan3.pids)


def test_epoch_plan_resampling_all_real(market_root):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = market_root
    ds = init_dataset("market1501", cfg)
    plan = build_epoch_plan(ds.train_dict, 2, 4, 1, 0, use_resampling=True)
    assert plan.is_real.all()


def test_train_loader_batches(market_root):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = market_root
    cfg.INPUT.SIZE_TRAIN = [64, 32]
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.DATALOADER.USE_RESAMPLING = False
    ds = init_dataset("market1501", cfg)
    loader = TrainLoader(ds, cfg, num_groups=2)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch(0)
    b = batches[0]
    assert b["images"].shape == (2, 8, 64, 32, 3)
    assert b["labels"].shape == (2, 8)
    # pid-major: each pid occupies K consecutive slots
    for gi in range(2):
        lab = b["labels"][gi].reshape(2, 4)
        assert (lab == lab[:, :1]).all()
    # mock images are zero
    assert (b["images"][~b["is_real"]] == 0).all()


def test_eval_loader_padding(market_root):
    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = market_root
    cfg.INPUT.SIZE_TEST = [64, 32]
    ds = init_dataset("market1501", cfg)
    loader = EvalLoader(ds.val, cfg, batch_size=7)
    batches = list(loader)
    assert len(batches) == len(loader)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == len(ds.val)
    last = batches[-1]
    assert last["images"].shape[0] == 7
    assert not last["valid"][-1] or len(ds.val) % 7 == 0


def test_augment_batch_semantics():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (1, 8, 32, 16, 3), np.uint8)
    is_real = np.ones((1, 8), bool)
    is_real[0, -1] = False
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = augment_batch(
        jnp.asarray(imgs), jnp.asarray(is_real), jax.random.PRNGKey(0),
        (32, 16), 10, mean, std, 0.5, 0.5,
    )
    out = np.asarray(out)
    assert out.shape == (1, 8, 32, 16, 3)
    # mocks exactly zero in normalised space (bases.py:398-400)
    assert (out[0, -1] == 0).all()
    # real outputs within the normalised dynamic range
    lo = (0 - max(mean)) / min(std)
    hi = (1 - min(mean)) / min(std)
    assert out[0, 0].min() >= lo - 1e-4 and out[0, 0].max() <= hi + 1e-4
    # deterministic per key
    out2 = augment_batch(
        jnp.asarray(imgs), jnp.asarray(is_real), jax.random.PRNGKey(0),
        (32, 16), 10, mean, std, 0.5, 0.5,
    )
    np.testing.assert_array_equal(out, np.asarray(out2))


def test_random_erase_placement_statistics():
    """Erase decision ⊥ placement; placement uniform over valid corners.

    Guards the round-2 fix of the RNG key reuse (transforms.py: position keys
    now derive from a fresh split, not the consumed decision key)."""
    n = 256
    h, w = 32, 16
    imgs = np.full((n, h, w, 3), 255, np.uint8)
    is_real = np.ones((n,), bool)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    key = jax.random.PRNGKey(7)

    def run(re_p):
        out = augment_batch(
            jnp.asarray(imgs), jnp.asarray(is_real), key,
            (h, w), 0, mean, std, 0.0, re_p,
        )
        # erased pixels equal the fill value (PIXEL_MEAN in normalised space)
        return np.isclose(np.asarray(out)[..., 0], mean[0], atol=1e-5)

    m1 = run(1.0)   # always erase
    m5 = run(0.5)   # erase ~half, same per-image keys

    # p=1.0: every image has a rectangle
    assert m1.any(axis=(1, 2)).all()

    # decision ⊥ placement: images erased at p=0.5 have the IDENTICAL
    # rectangle as at p=1.0 (threshold change must not move the placement)
    erased5 = m5.any(axis=(1, 2))
    frac = erased5.mean()
    assert 0.35 < frac < 0.65, frac
    np.testing.assert_array_equal(m5[erased5], m1[erased5])

    # placement uniform: normalised top-left corner u = y0/(h-eh+1) should
    # have mean ~0.5 (std of the mean ≈ 0.29/sqrt(256) ≈ 0.018)
    ys, xs = [], []
    for i in range(n):
        rows = np.where(m1[i].any(axis=1))[0]
        cols = np.where(m1[i].any(axis=0))[0]
        eh, ew = len(rows), len(cols)
        ys.append(rows[0] / max(h - eh, 1))
        xs.append(cols[0] / max(w - ew, 1))
    assert abs(np.mean(ys) - 0.5) < 0.08, np.mean(ys)
    assert abs(np.mean(xs) - 0.5) < 0.08, np.mean(xs)
    # spread: corners are not clustered (buggy key reuse collapsed diversity)
    assert np.std(ys) > 0.15 and np.std(xs) > 0.15


def test_normalize_batch_matches_manual():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (3, 8, 8, 3), np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = np.asarray(normalize_batch(jnp.asarray(imgs), mean, std))
    ref = (imgs / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_coco_reid_parser(tmp_path):
    root = tmp_path / "fashion"
    for sub in ("train", "query", "gallery"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)

    def make_json(split, pairs):
        images, anns = [], []
        next_img = 1
        for pair_id, n in pairs.items():
            for i in range(n):
                fname = f"{split}_{pair_id}_{i}.jpg"
                Image.fromarray(
                    rng.randint(0, 255, (32, 16, 3), np.uint8)
                ).save(root / split / fname)
                images.append({"id": next_img, "file_name": fname})
                anns.append({
                    "id": next_img, "image_id": next_img,
                    "pair_id": pair_id, "source": "shop",
                })
                next_img += 1
        path = root / f"{split}_reid.json"
        path.write_text(json.dumps({"images": images, "annotations": anns}))
        return str(path)

    train_json = make_json("train", {10: 3, 20: 1, 30: 2})  # 20 filtered out
    make_json("query", {10: 2, 30: 1})
    make_json("gallery", {10: 2, 30: 2})

    cfg = get_default_cfg()
    cfg.DATASETS.ROOT_DIR = str(root)
    cfg.DATASETS.JSON_TRAIN_PATH = train_json
    ds = init_dataset("df1", cfg)
    assert ds.num_classes == 2                  # pair 20 filtered (single image)
    assert sorted(ds.train_dict) == [0, 1]      # relabelled
    assert len(ds.train) == 5
    assert ds.num_query == 3
    assert all(r.camid == 0 for r in ds.query)
    assert all(r.camid == 1 for r in ds.gallery)
