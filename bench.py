#!/usr/bin/env python
"""Headline benchmark: embedding extraction throughput on one TPU chip.

Flagship configuration = the reference's canonical person-reid inference
path (ResNet-50, last_stride 1, 256x128, bf16 compute, BNNeck embedding —
see BASELINE.md "north-star targets": >= 10,000 embeddings/sec/chip).

Prints ONE JSON line:
  {"metric": "embeddings_per_sec", "value": N, "unit": "imgs/s",
   "vs_baseline": N / 10000}

Timing notes: the axon tunnel has ~40-50 ms fixed latency per dispatch, so
the model is scanned over S batches inside a single jitted call and the
result is forced with a scalar transfer (block_until_ready alone returns
early through the tunnel).
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.models import create_model, init_model

    cfg = get_default_cfg()  # resnet50, bf16
    model = create_model(cfg, num_classes=0)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (256, 128))

    # B=512 is within 2% of the B=1024 saturation point and compiles much
    # faster — the bench must stay well inside the driver's time budget.
    batch, scans = 512, 8

    @jax.jit
    def embed_many(p, bs, xs):
        def body(carry, x):
            e = model.apply(
                {"params": p, "batch_stats": bs}, x, method=model.embed
            )
            return carry + e.sum(), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return total

    xs = jax.random.normal(
        jax.random.PRNGKey(1), (scans, batch, 256, 128, 3), jnp.bfloat16
    )
    # compile + warmup
    float(embed_many(params, batch_stats, xs))

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        s = float(embed_many(params, batch_stats, xs))
    dt = (time.time() - t0) / reps
    imgs_per_sec = batch * scans / dt

    print(json.dumps({
        "metric": "embeddings_per_sec",
        "value": round(imgs_per_sec, 1),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / 10000.0, 3),
        # secondary driver-visible rows (VERDICT r1: track training
        # throughput and an end-to-end number, keep the headline)
        "extra": _extra_rows((cfg, model, params, batch_stats)),
    }))


def _train_imgs_per_sec(mixed_precision: bool) -> float:
    """Canonical CTL step (ResNet-50 256x128, P=16 x K=4 = 64 imgs)."""
    import numpy as np

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine import create_train_state, make_train_step
    from centroids_reid_tpu.models import create_model

    cfg = get_default_cfg()
    cfg.USE_MIXED_PRECISION = mixed_precision
    num_classes, pk = 751, 64
    model = create_model(cfg, num_classes=num_classes)
    state, tx = create_train_state(cfg, model, num_classes, seed=0)
    step = jax.jit(
        make_train_step(model, tx, cfg, num_classes, "ctl"), donate_argnums=0
    )
    rng = np.random.RandomState(0)
    labels = np.repeat(rng.choice(num_classes, 16, replace=False), 4)
    dt = jnp.bfloat16 if mixed_precision else jnp.float32
    batch = {
        "images": jnp.asarray(rng.randn(1, pk, 256, 128, 3), dt),
        "labels": jnp.asarray(labels)[None],
        "is_real": jnp.ones((1, pk), bool),
    }
    state, m = step(state, batch)
    float(m["loss"])
    steps = 20
    t0 = time.time()
    for _ in range(steps):
        state, m = step(state, batch)
    float(m["loss"])
    return pk * steps / (time.time() - t0)


def _e2e_embed_imgs_per_sec(fast: bool = False) -> float:
    """End-to-end offline embedding over JPEG files on disk — the real
    ``create_embeddings`` surface (``run_inference``): threaded host decode
    pipelined against async device dispatch, uint8 H2D, on-device
    normalize + ResNet-50 embed, embeddings fetched back to host.

    ``fast`` = the serving ingest configuration (TPU.FAST_DECODE:
    DCT-scaled decode + planar-YUV420 wire format, half the host->device
    bytes, unpack fused into the embed program). The e2e row reports the
    serving configuration; the bit-exact path (the eval default) is kept
    as its own row."""
    import os
    import tempfile

    import numpy as np
    from PIL import Image

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.inference.utils import run_inference
    from centroids_reid_tpu.models import create_model, init_model

    cfg = get_default_cfg()
    cfg.TPU.CACHE_IMAGES = False  # honest cold-decode numbers
    cfg.TPU.FAST_DECODE = fast
    if fast:
        # serving config also tunes the batch: fewer dispatch roundtrips
        # on the high-latency link (the exact row keeps the default 128)
        cfg.TEST.IMS_PER_BATCH = 256
    model = create_model(cfg, num_classes=0)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (256, 128))

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    n = 256
    paths = []
    for i in range(n):
        p = os.path.join(tmp, f"{i:04d}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (256, 128, 3), np.uint8)
        ).save(p, "JPEG")
        paths.append(p)

    run_inference(model, cfg, params, batch_stats, paths[:8], 10**9)  # warmup
    best = 0.0
    for _ in range(3):  # best-of-3: tunnel RTT jitter dominates short runs
        t0 = time.time()
        embs, _ = run_inference(model, cfg, params, batch_stats, paths, 10**9)
        dt = time.time() - t0
        assert embs.shape == (n, 2048)
        best = max(best, n / dt)
    return best


def _make_jpeg_corpus(n: int = 256):
    import os
    import tempfile

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    paths = []
    for i in range(n):
        p = os.path.join(tmp, f"{i:04d}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (256, 128, 3), np.uint8)
        ).save(p, "JPEG")
        paths.append(p)
    return paths


def _ingest_roofline_rows() -> dict:
    """Isolation measurement for the serving ingest (the fast-decode e2e
    ceiling): DECODE-ONLY host rate vs DEVICE-ONLY dispatch rate on
    pre-decoded batches. The interleaved e2e row can at best reach
    min(decode, device) — on this ONE-core host the decoder is the
    roofline, and these two rows prove where the e2e number sits against
    it (the same isolation story that closed the int8 IBN-a question in
    round 2)."""
    import numpy as np

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.data.loader import ImageStore
    from centroids_reid_tpu.engine.evaluate import make_embed_fn
    from centroids_reid_tpu.models import create_model, init_model

    cfg = get_default_cfg()
    cfg.TPU.CACHE_IMAGES = False
    cfg.TPU.FAST_DECODE = True
    cfg.TEST.IMS_PER_BATCH = 256
    size = tuple(cfg.INPUT.SIZE_TEST)
    paths = _make_jpeg_corpus(256)
    n = len(paths)

    store = ImageStore(size, cache=False, fmt="yuv420")
    buf = np.zeros((n, *store.item_shape()), np.uint8)
    store.get_many(paths[:8], buf[:8], n_threads=4)  # warm the codec path
    best_decode = 0.0
    for _ in range(3):
        t0 = time.time()
        store.get_many(paths, buf, n_threads=4)
        best_decode = max(best_decode, n / (time.time() - t0))

    # device-only: the SAME fused unpack+embed program over pre-decoded
    # packed batches, 2-deep async pipeline like run_inference. Tiled to
    # 4 dispatches per rep: with a single batch the pipeline never
    # overlaps and every rep pays the full ~45 ms tunnel RTT unamortised,
    # understating the device ceiling the roofline is computed against.
    model = create_model(cfg, num_classes=0)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), size)
    embed = make_embed_fn(model, cfg, input_format="yuv420")
    b = int(cfg.TEST.IMS_PER_BATCH)
    batches = [buf[i:i + b] for i in range(0, n, b)] * 4
    n_dev = sum(x.shape[0] for x in batches)
    float(np.asarray(embed(params, batch_stats, batches[0])).sum())  # warm
    best_dev = 0.0
    for _ in range(3):
        t0 = time.time()
        pending = []
        for x in batches:
            pending.append(embed(params, batch_stats, x))
            if len(pending) > 2:
                np.asarray(pending.pop(0))
        for e in pending:
            np.asarray(e)
        best_dev = max(best_dev, n_dev / (time.time() - t0))
    return {
        "ingest_decode_only_imgs_per_sec": round(best_decode, 1),
        "ingest_device_only_imgs_per_sec": round(best_dev, 1),
    }


def _int8_imgs_per_sec() -> float:
    """int8 PTQ serving path (models/quantized.py): uint8 in, same scanned
    single-dispatch shape as the headline."""
    import numpy as np

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.models import create_model, init_model
    from centroids_reid_tpu.models.quantized import quantize_reid_model

    cfg = get_default_cfg()
    model = create_model(cfg, num_classes=0)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (256, 128))
    rng = np.random.RandomState(0)
    batch, scans = 512, 8
    imgs = rng.randint(0, 256, (scans, batch, 256, 128, 3), "uint8")
    qfn = quantize_reid_model(
        model, params, batch_stats, [imgs[0][:64]],
        cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
    )
    xs = jnp.asarray(imgs)
    float(qfn.embed_many(xs).sum())  # compile + warmup
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        float(qfn.embed_many(xs).sum())
    dt = (time.time() - t0) / reps
    return batch * scans / dt


def _retrieval_ms(kernel_dtype, k: int, g: int = 100_000, q: int = 128,
                  d: int = 2048, n1: int = 10, n2: int = 110) -> float:
    """North-star retrieval latency (BASELINE.md target #3: <5 ms p50 for a
    100k-gallery centroid query; /root/reference/inference/get_similar.py:
    112-119 is the surface this fuses): per-dispatch device time of the
    unified ``ops.retrieval.topk_select`` program at Q=128, D=2048.

    Difference method (same as benchmarks/bench_retrieval.py): run the
    kernel n1 and n2 times inside one jitted scan and divide the wall-time
    delta by (n2 - n1) — the tunnel's ~45 ms fixed dispatch cost and its
    RTT jitter cancel / divide out; the median of 3 differences rejects
    stragglers. Two query buffers are cycled so XLA cannot hoist the body.
    """
    from centroids_reid_tpu.ops.retrieval import _G_TILE, topk_select

    gf = jax.random.normal(jax.random.PRNGKey(0), (g, d), kernel_dtype)
    qf = jax.random.normal(jax.random.PRNGKey(1), (q, d), kernel_dtype)
    gn = jax.jit(
        lambda a: jnp.einsum(
            "gd,gd->g", a, a, preferred_element_type=jnp.float32
        )[None, :]
    )(gf)
    pad = (-g) % _G_TILE
    if pad:
        gf = jnp.concatenate([gf, jnp.zeros((pad, d), gf.dtype)])
        gn = jnp.concatenate([gn, jnp.full((1, pad), jnp.inf)], axis=1)
    # 1 + 2^-7 stays exactly representable in bf16 (2^-10 would round away)
    qf2 = jnp.stack([qf, qf * jnp.asarray(1.0078125, qf.dtype)])

    def run(n):
        @jax.jit
        def prog(qf2_, gf_, gn_):
            def body(c, i):
                v, idx = topk_select(qf2_[i % 2], gf_, gn_, k)
                return c + v.sum() + idx.sum().astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c

        float(prog(qf2, gf, gn))  # compile + warm
        t0 = time.time()
        float(prog(qf2, gf, gn))
        return time.time() - t0

    diffs = sorted((run(n2) - run(n1)) / (n2 - n1) for _ in range(3))
    return diffs[1] * 1e3


def _artifact_retrieval_rows(bundle, g: int = 100_000, d: int = 2048,
                             qb: int = 128, k: int = 100) -> dict:
    """What an ARTIFACT-served query actually costs (VERDICT r4 #2): a
    real ``export_retriever`` -> ``save_artifact`` -> ``load_retriever``
    roundtrip at the north-star scale (100k x 2048 gallery, k=100,
    ResNet-50 embed), then

    - ``retrieval_artifact_p50_ms``: per-dispatch latency of the loaded
      artifact's RANK stage — the exact jitted ``service.ranked_query``
      program ``LoadedRetriever`` dispatches (kernel-dtype selection +
      exact fp32 re-score), over the artifact's own resident gallery
      buffers, measured with the same difference method as the live
      ``retrieval_p50_ms_*`` rows so the two are directly comparable
      (the round-4 gap this row closes: the old fused artifact pinned
      exact-fp32 XLA selection at ~4x this);
    - ``retrieval_artifact_e2e_p50_ms``: one full
      ``LoadedRetriever.query_arrays`` call at Q=128 — uint8 H2D, embed,
      rank, fetch, including the tunnel's fixed dispatch cost: the
      honest per-request serving number (on this dev tunnel the 12.5 MB
      uint8 H2D at ~40 MB/s dominates it; a production host's PCIe
      makes the same program ~15-20 ms).

    ``bundle`` is the headline's already-initialised
    ``(cfg, model, params, batch_stats)`` — re-initialising ResNet-50
    here would add ~90 s of pure setup to the row.
    """
    import os
    import tempfile

    import numpy as np

    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
        save_artifact,
    )
    from centroids_reid_tpu.inference.service import ranked_query

    cfg, model, params, batch_stats = bundle
    rng = np.random.RandomState(0)
    gallery = rng.randn(g, d).astype(np.float32)
    paths = np.array([f"g/{i:06d}.jpg" for i in range(g)])
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, gallery, paths, k=k, batch_size=qb,
    )
    del gallery
    tmp = tempfile.mkdtemp(prefix="bench_artifact_")
    apath = os.path.join(tmp, "retriever.crtpu")
    save_artifact(apath, blob, meta, aux=aux)
    del blob, aux
    loaded = load_retriever(apath)  # auto-selects bf16+Pallas on TPU
    os.remove(apath)
    os.rmdir(tmp)

    imgs = rng.randint(0, 256, (qb, 256, 128, 3), np.uint8)
    loaded.query_arrays(imgs)  # compile embed + rank, first dispatch
    times = []
    for _ in range(5):
        t0 = time.time()
        loaded.query_arrays(imgs)  # np.asarray inside forces completion
        times.append(time.time() - t0)
    e2e_ms = sorted(times)[2] * 1e3

    # rank stage alone, same difference method as _retrieval_ms, over the
    # loaded artifact's own resident buffers (gf kernel-dtype, gf32, gn)
    gf, gf32, gn = loaded._gf, loaded._gf32, loaded._gn
    e = jnp.asarray(rng.randn(qb, d), jnp.float32)
    e2 = jnp.stack([e, e * jnp.asarray(1.0078125, e.dtype)])
    kk = loaded.k

    def run(n):
        @jax.jit
        def prog(e2_, gf_, gf32_, gn_):
            def body(c, i):
                v, idx = ranked_query(e2_[i % 2], gf_, gf32_, gn_, kk)
                return c + v.sum() + idx.sum().astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c

        float(prog(e2, gf, gf32, gn))  # compile + warm
        t0 = time.time()
        float(prog(e2, gf, gf32, gn))
        return time.time() - t0

    diffs = sorted((run(110) - run(10)) / 100 for _ in range(3))
    return {
        "retrieval_artifact_p50_ms": round(diffs[1] * 1e3, 3),
        "retrieval_artifact_e2e_p50_ms": round(e2e_ms, 3),
    }


def _rerank_s(q: int = 3368, g: int = 15913, d: int = 2048) -> float:
    """Beyond-parity k-reciprocal re-ranking (ops/rerank.py, Zhong
    CVPR'17 — the reference has no re-ranking) at Market1501 eval scale:
    end-to-end seconds to produce the full re-ranked [Q, G] matrix with
    the canonical k1=20/k2=6/lambda=0.3. Offline-eval latency, so wall
    time of one warm call (runtime >> the ~45 ms tunnel overhead; no
    difference method needed)."""
    import numpy as np

    from centroids_reid_tpu.ops.rerank import rerank_distmat

    rng = np.random.RandomState(0)
    qf = rng.randn(q, d).astype(np.float32)
    gf = rng.randn(g, d).astype(np.float32)
    out = rerank_distmat(qf, gf, 20, 6, 0.3)
    float(jnp.asarray(out).sum())  # compile + warmup, forced completion
    t0 = time.time()
    out = rerank_distmat(qf, gf, 20, 6, 0.3)
    float(jnp.asarray(out).sum())
    return time.time() - t0


def _extra_rows(bundle):
    # e2e first: it is tunnel-bandwidth-sensitive and measures ~3x low
    # when the train benches run before it (device/tunnel still busy).
    # retrieval rows next: they carry the <5 ms north star (BASELINE.md
    # target #3) into the driver artifact, so they must not be the ones a
    # tight budget skips; the artifact roundtrip rides with them (it is
    # the round-5 deployment-latency claim).
    rows = (
        ("e2e_decode_embed_imgs_per_sec",
         lambda: _e2e_embed_imgs_per_sec(fast=True)),
        ("e2e_bitexact_decode_embed_imgs_per_sec", _e2e_embed_imgs_per_sec),
        ("retrieval_p50_ms_100k_k100_fp32",
         lambda: _retrieval_ms(jnp.float32, 100)),
        ("retrieval_p50_ms_100k_k100_bf16",
         lambda: _retrieval_ms(jnp.bfloat16, 100)),
        ("retrieval_p50_ms_100k_k10_bf16",
         lambda: _retrieval_ms(jnp.bfloat16, 10)),
        ("retrieval_artifact",
         lambda: _artifact_retrieval_rows(bundle)),
        ("ingest_roofline", _ingest_roofline_rows),
        ("int8_eval_imgs_per_sec", _int8_imgs_per_sec),
        ("train_imgs_per_sec_bf16", lambda: _train_imgs_per_sec(True)),
        ("train_imgs_per_sec_fp32", lambda: _train_imgs_per_sec(False)),
        # last: beyond-parity row, the first the budget guard sacrifices
        ("rerank_market_scale_s", _rerank_s),
    )
    out = {}
    t0 = time.time()
    for name, fn in rows:
        # cold-compile guard: the headline JSON line must always appear
        # within the driver's budget, extras are best-effort (a row that
        # starts under the limit can still overrun it, hence the margin).
        # 420 s: the r5 artifact-roundtrip row measures a real
        # export/save/load at 100k x 2048 (~2 min of setup that IS the
        # thing being proven), so the guard grew from 330 s with it.
        if time.time() - t0 > 420:
            out[name] = "skipped (time budget)"
            continue
        try:
            v = fn()
            if isinstance(v, dict):  # grouped rows (ingest roofline)
                out.update(v)
            else:
                out[name] = round(v, 3 if "_ms" in name else 1)
        except Exception as e:  # never break the headline contract
            out[name] = f"error {type(e).__name__}: {e}"
    _add_ingest_fraction(out)
    return out


def _add_ingest_fraction(out: dict) -> None:
    """Self-checking roofline claim (VERDICT r4 #5): the serialized 1-core
    budget is the harmonic combination of the decode-only and device-only
    rates (one core must do both, so the best possible interleaved rate is
    1 / (1/decode + 1/device)); the emitted fraction is the measured e2e
    rate against THAT budget, computed from this run's own rows — never a
    frozen README number. 1.0 = perfect decode/dispatch overlap on this
    host; the gap below it is tunnel/dispatch stall time."""
    e2e = out.get("e2e_decode_embed_imgs_per_sec")
    dec = out.get("ingest_decode_only_imgs_per_sec")
    dev = out.get("ingest_device_only_imgs_per_sec")
    if all(isinstance(v, (int, float)) and v > 0 for v in (e2e, dec, dev)):
        budget = 1.0 / (1.0 / dec + 1.0 / dev)
        out["ingest_serial_budget_imgs_per_sec"] = round(budget, 1)
        out["ingest_e2e_fraction_of_serial_budget"] = round(e2e / budget, 3)


if __name__ == "__main__":
    main()
