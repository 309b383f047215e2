"""Serving fast-ingest path (TPU.FAST_DECODE): DCT-scaled decode +
planar-YUV420 wire format + on-device unpack.

Contracts under test:
* the native packer is BIT-EXACT vs the numpy oracle ``rgb_to_yuv420_np``
  when no scaling/resample is involved (shared fixed-point constants);
* the DCT-scaled decode + pack + device unpack stays close to the
  bit-exact path (bounded pixel error, near-identical embeddings);
* the path is opt-in: default config keeps the exact RGB ingest, odd
  target sizes and custom embed fns (int8) refuse/skip it cleanly.

This is a documented serving-only divergence from the reference decode
path (/root/reference/datasets/bases.py:29-33); training/eval never use it.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from centroids_reid_tpu.native import (
    available,
    decode_fast,
    decode_fast_batch,
    decode_resize,
    fast_available,
    rgb_to_yuv420_np,
    yuv420_packed_len,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native decoder unavailable (no g++/libjpeg)"
)


def _jpeg(arr, **save_kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **save_kw)
    return buf.getvalue()


def _smooth(rng, h, w):
    """Natural-image proxy: upsampled low-frequency noise."""
    base = rng.randint(0, 256, (max(2, h // 8), max(2, w // 8), 3), np.uint8)
    return np.asarray(
        Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8
    )


def test_pack_bit_exact_vs_oracle():
    rng = np.random.RandomState(0)
    for shape, q in [((64, 32), 90), ((256, 128), 75), ((320, 320), 95)]:
        data = _jpeg(rng.randint(0, 256, (*shape, 3), np.uint8), quality=q)
        rgb = decode_resize(data, shape)  # source == target: no resample
        packed = decode_fast(data, shape)
        assert packed is not None and packed.shape == (
            yuv420_packed_len(shape),
        )
        assert np.array_equal(packed, rgb_to_yuv420_np(rgb))


def test_oracle_rejects_odd_dims():
    with pytest.raises(ValueError, match="even"):
        rgb_to_yuv420_np(np.zeros((33, 32, 3), np.uint8))


def test_fast_unavailable_for_odd_target():
    assert not fast_available((257, 128))
    assert not fast_available((256, 127))
    assert fast_available((256, 128))
    data = _jpeg(np.zeros((64, 32, 3), np.uint8))
    assert decode_fast(data, (63, 32)) is None


def test_dct_scaled_decode_close_to_exact():
    """Large source: the 1/k-scale IDCT + resize + 4:2:0 roundtrip must
    stay within a few grey levels of full decode + exact resize."""
    import jax.numpy as jnp

    from centroids_reid_tpu.data.transforms import yuv420_to_rgb

    rng = np.random.RandomState(1)
    data = _jpeg(_smooth(rng, 512, 256), quality=90)
    exact = decode_resize(data, (256, 128)).astype(np.float32)
    packed = decode_fast(data, (256, 128))
    rec = np.asarray(yuv420_to_rgb(jnp.asarray(packed), (256, 128)))
    diff = np.abs(rec - exact)
    # lossy by design (scaled IDCT + chroma subsample); ~1.5% mean error
    assert diff.mean() < 5.0, diff.mean()
    assert np.percentile(diff, 99) < 20.0


def test_unpack_inverts_pack_closely():
    """Pack(exact RGB) -> device unpack: chroma-only loss, luma near-exact."""
    import jax.numpy as jnp

    from centroids_reid_tpu.data.transforms import yuv420_to_rgb

    rng = np.random.RandomState(2)
    img = _smooth(rng, 128, 64)
    rec = np.asarray(
        yuv420_to_rgb(jnp.asarray(rgb_to_yuv420_np(img)), (128, 64))
    )
    assert np.abs(rec - img.astype(np.float32)).mean() < 3.0


def test_batch_matches_single_and_reports_failures():
    rng = np.random.RandomState(3)
    blobs = [
        _jpeg(rng.randint(0, 256, (80, 60, 3), np.uint8), quality=85)
        for _ in range(5)
    ]
    blobs[2] = b"not a jpeg"
    out, failed = decode_fast_batch(blobs, (64, 32), n_threads=2)
    assert failed == [2]
    for i, b in enumerate(blobs):
        if i == 2:
            continue
        assert np.array_equal(out[i], decode_fast(b, (64, 32)))


def test_store_and_loader_yuv_mode(tmp_path):
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.data.datasets import Record
    from centroids_reid_tpu.data.loader import EvalLoader, ImageStore

    rng = np.random.RandomState(4)
    paths = []
    for i in range(3):
        p = tmp_path / f"{i}.jpg"
        p.write_bytes(_jpeg(rng.randint(0, 256, (70, 40, 3), np.uint8)))
        paths.append(str(p))
    # PNG exercises the PIL fallback inside the yuv store
    png = tmp_path / "x.png"
    arr = rng.randint(0, 256, (70, 40, 3), np.uint8)
    Image.fromarray(arr).save(png)
    paths.append(str(png))

    cfg = get_default_cfg()
    cfg.INPUT.SIZE_TEST = [64, 32]
    cfg.TEST.IMS_PER_BATCH = 4
    store = ImageStore((64, 32), cache=False, fmt="yuv420")
    assert store.item_shape() == (yuv420_packed_len((64, 32)),)
    recs = [Record(p, 0, 0, i) for i, p in enumerate(paths)]
    batches = list(EvalLoader(recs, cfg, store=store))
    assert len(batches) == 1
    imgs = batches[0]["images"]
    assert imgs.shape == (4, yuv420_packed_len((64, 32)))
    # PNG fallback: PIL decode is exact, so pack == oracle(exact resize)
    exact = np.asarray(
        Image.fromarray(arr).resize((32, 64), Image.BILINEAR), np.uint8
    )
    assert np.array_equal(imgs[3], rgb_to_yuv420_np(exact))


def test_serving_ingest_format_gating():
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.inference.utils import serving_ingest_format

    cfg = get_default_cfg()
    assert serving_ingest_format(cfg) == "rgb"  # off by default
    cfg.TPU.FAST_DECODE = True
    assert serving_ingest_format(cfg) == "yuv420"
    cfg.TPU.INT8_EVAL = True  # int8 serving consumes RGB
    assert serving_ingest_format(cfg) == "rgb"
    cfg.TPU.INT8_EVAL = False
    cfg.INPUT.SIZE_TEST = [257, 128]  # odd dims unsupported
    assert serving_ingest_format(cfg) == "rgb"


def test_run_inference_fast_matches_exact(tmp_path):
    """End-to-end: FAST_DECODE embeddings ~= exact-path embeddings."""
    import jax

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.inference.utils import run_inference
    from centroids_reid_tpu.models import create_model, init_model

    rng = np.random.RandomState(5)
    paths = []
    for i in range(6):
        p = tmp_path / f"{i}.jpg"
        p.write_bytes(_jpeg(_smooth(rng, 128, 64), quality=90))
        paths.append(str(p))

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.INPUT.SIZE_TEST = [64, 32]
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.USE_MIXED_PRECISION = False
    model = create_model(cfg, num_classes=0)
    params, bs = init_model(model, jax.random.PRNGKey(0), (64, 32))

    exact, _ = run_inference(model, cfg, params, bs, paths, 10**9)
    cfg.TPU.FAST_DECODE = True
    fast, _ = run_inference(model, cfg, params, bs, paths, 10**9)
    assert exact.shape == fast.shape == (6, 512)
    cos = np.sum(exact * fast, axis=1) / (
        np.linalg.norm(exact, axis=1) * np.linalg.norm(fast, axis=1)
    )
    assert cos.min() > 0.995, cos


@pytest.mark.parametrize("fmt", ["rgb", "yuv420"])
@pytest.mark.parametrize("cache", [False, True])
def test_get_many_matches_get(tmp_path, fmt, cache):
    """Batched GIL-free decode must produce byte-identical results to the
    per-image path, including the PIL fallback for non-JPEG files."""
    from centroids_reid_tpu.data.loader import ImageStore

    rng = np.random.RandomState(7)
    paths = []
    for i in range(4):
        p = tmp_path / f"{i}.jpg"
        p.write_bytes(_jpeg(rng.randint(0, 256, (50, 40, 3), np.uint8)))
        paths.append(str(p))
    png = tmp_path / "x.png"
    Image.fromarray(rng.randint(0, 256, (50, 40, 3), np.uint8)).save(png)
    paths.append(str(png))

    ref_store = ImageStore((32, 16), cache=False, fmt=fmt)
    expected = np.stack([ref_store.get(p) for p in paths])

    store = ImageStore((32, 16), cache=cache, fmt=fmt)
    out = np.zeros((len(paths), *store.item_shape()), np.uint8)
    store.get_many(paths, out, n_threads=2)
    assert np.array_equal(out, expected)
    if cache:  # second call served from cache, still identical
        out2 = np.zeros_like(out)
        store.get_many(paths, out2)
        assert np.array_equal(out2, expected)


def test_validation_path_ignores_fast_decode():
    """The divergent serving ingest must never leak into training/eval:
    the validation store stays bit-exact RGB even with FAST_DECODE on."""
    from types import SimpleNamespace

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine.evaluate import _shared_store

    cfg = get_default_cfg()
    cfg.TPU.FAST_DECODE = True
    dataset = SimpleNamespace()
    store = _shared_store(dataset, cfg)
    assert store.fmt == "rgb"
    assert store.item_shape() == (*cfg.INPUT.SIZE_TEST, 3)


def test_retrieval_service_fast_ingest(tmp_path):
    """FAST_DECODE through the one-dispatch serving program: a query that
    is byte-identical to a gallery image still ranks itself first (both
    sides travel the same lossy-but-deterministic packed pipeline)."""
    import jax

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.inference import RetrievalService, build_embeddings
    from centroids_reid_tpu.engine import CheckpointManager, create_train_state
    from centroids_reid_tpu.models import create_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.TPU.NUM_GROUPS = 1
    cfg.TPU.FAST_DECODE = True
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()

    rng = np.random.RandomState(0)
    gallery = tmp_path / "gallery"
    gallery.mkdir()
    arrays = {}
    for pid in ("a", "b", "c"):
        for i in range(3):
            arr = _smooth(rng, 32, 16)
            name = f"{pid}_{i}.jpg"
            Image.fromarray(arr).save(gallery / name)
            arrays[name] = arr
    query = tmp_path / "query"
    query.mkdir()
    Image.fromarray(arrays["b_1.jpg"]).save(query / "q_b_1.jpg")

    cfg.DATASETS.ROOT_DIR = str(gallery)
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    svc = RetrievalService(
        cfg, emb, paths, k=3, normalize=True, use_bf16_kernel=False,
    )
    d, idx, res_paths = svc.query_files([str(query / "q_b_1.jpg")])
    assert os.path.basename(res_paths[0, 0]) == "b_1.jpg"
    assert d[0, 0] == pytest.approx(0.0, abs=1e-3)


def test_retrieval_service_sharded_gallery_matches_single(tmp_path):
    """mesh= shards the resident gallery over 8 virtual devices; results
    must match the single-chip service exactly (same selection resolution,
    same exact fp32 re-score, same tie-stable merge order on distances)."""
    import jax

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.models import create_model, init_model
    from centroids_reid_tpu.parallel.mesh import make_retrieval_mesh

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    model = create_model(cfg, num_classes=0)
    params, bs = init_model(model, jax.random.PRNGKey(0), (32, 16))

    rng = np.random.RandomState(11)
    gal = rng.randn(203, 512).astype(np.float32)  # odd G: exercises padding
    paths = np.array([f"g{i}" for i in range(203)])
    imgs = rng.randint(0, 256, (3, 32, 16, 3), np.uint8)

    kw = dict(k=7, normalize=True, use_bf16_kernel=False,
              model_bundle=(model, params, bs))
    single = RetrievalService(cfg, gal, paths, **kw)
    sharded = RetrievalService(
        cfg, gal, paths, mesh=make_retrieval_mesh(8), **kw
    )
    d1, i1, p1 = single.query_arrays(imgs)
    d2, i2, p2 = sharded.query_arrays(imgs)
    np.testing.assert_allclose(d2, d1, rtol=1e-5, atol=1e-5)
    assert np.array_equal(i1, i2)
    assert np.array_equal(p1, p2)

    # query chunking (memory bound for huge batches): same results,
    # chunked dispatches with a zero-padded tail
    chunked = RetrievalService(cfg, gal, paths, max_query_batch=2, **kw)
    d3, i3, p3 = chunked.query_arrays(imgs)
    np.testing.assert_allclose(d3, d1, rtol=1e-5, atol=1e-5)
    assert np.array_equal(i3, i1)

    # capacity mode: exact_rescore=False drops the fp32 gallery copy;
    # with the fp32 kernel the alias is exact, both topologies
    for svc in (
        RetrievalService(cfg, gal, paths, exact_rescore=False, **kw),
        RetrievalService(
            cfg, gal, paths, exact_rescore=False,
            mesh=make_retrieval_mesh(8), **kw
        ),
    ):
        assert svc._gf32 is svc._gf
        d4, i4, _ = svc.query_arrays(imgs)
        np.testing.assert_allclose(d4, d1, rtol=1e-5, atol=1e-5)
        assert np.array_equal(i4, i1)


def test_run_inference_rejects_yuv_store_with_custom_fn(tmp_path):
    import jax

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.data.loader import ImageStore
    from centroids_reid_tpu.inference.utils import run_inference
    from centroids_reid_tpu.models import create_model, init_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.MODEL.PRETRAINED = False
    cfg.INPUT.SIZE_TEST = [64, 32]
    model = create_model(cfg, num_classes=0)
    params, bs = init_model(model, jax.random.PRNGKey(0), (64, 32))
    store = ImageStore((64, 32), fmt="yuv420")
    with pytest.raises(ValueError, match="yuv420"):
        run_inference(
            model, cfg, params, bs, ["x.jpg"], embed_fn=lambda *a: None,
            store=store,
        )
