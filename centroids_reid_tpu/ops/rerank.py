"""k-reciprocal re-ranking (Zhong et al., CVPR 2017, arXiv:1701.08398) —
TPU-native, fully vectorised.

The reference repo has NO re-ranking anywhere (verified: no rerank /
jaccard / k_reciprocal symbol in /root/reference); this is a
beyond-parity capability — the standard post-hoc accuracy booster every
major reid framework ships, rebuilt for TPU: each stage is ONE
static-shape XLA program (`lax.scan` over row/block chunks — a Python
chunk loop would issue tens of thousands of tiny dispatches at Market
scale, ruinous over a high-latency link), the set algebra runs as
gather/scatter on dense indicator rows, and the O(N^2) state stays in
HBM end to end.

Algorithm (this module's documented semantics; the NumPy loop oracle in
tests/np_oracle.py::oracle_rerank implements the same spec):

1. ``d``: pairwise eval-mode distance over ``concat(qf, gf)`` ([N, N],
   fp32; squared-euclidean or cosine per ``dist``), row-max normalised to
   ``dn`` so the exp() weights in step 4 are scale-free.
2. Initial ranks: per-row indices of the ``k1+1`` nearest rows (self
   included). k-reciprocal set ``R(i)`` = neighbours j of i with i among
   j's ``k1+1`` nearest.
3. Expansion: for each candidate ``j in R(i)``, with ``Rh(j)`` the
   half-level (``k1//2 + 1``) reciprocal set, add ``Rh(j)`` to ``R*(i)``
   when ``|Rh(j) ∩ R(i)| * 3 > 2 * |Rh(j)|`` (integer arithmetic — no
   float-threshold edge cases).
4. Sparse membership vector ``V[i, :]``: ``exp(-dn[i, j])`` for
   ``j in R*(i)``, L1-normalised per row.
5. Local query expansion (``k2 > 1``): ``V[i] <- mean(V[rank(i, :k2)])``.
6. Jaccard distance over the query/gallery split of V:
   ``jac = 1 - minsum / (|Vq|_1 + |Vg|_1 - minsum)`` with
   ``minsum = sum_k min(Vq[i,k], Vg[j,k])`` (blocked on device).
7. ``final = lambda * dn[:Q, Q:] + (1 - lambda) * jac``.

Memory: the method is inherently O(N^2) — ``dn`` and ``V`` are [N, N]
fp32 resident in HBM (plus one transient copy during assembly), so the
guard refuses N past ``max_n`` (default 26,000 ≈ 10 GB peak: Market1501
and DukeMTMC eval sets fit a v5e with room; fashion-scale galleries
should stay on the streaming evaluator, which this module intentionally
does not replace).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.distances import get_dist_func

# Rows per V-construction / query-expansion scan step.
_ROW_CHUNK = 128
# Jaccard min-sum blocking: [QB, GB, N] broadcast-reduce per scan step.
_JAC_QB = 16
_JAC_GB = 128

DEFAULT_MAX_N = 26_000


def _ceil_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _pad_idx(n: int, chunk: int):
    """[ceil(n/chunk)*chunk] row ids, clipped so padding duplicates the
    last row (harmless: results are sliced back to n)."""
    return jnp.arange(_ceil_to(n, chunk)).clip(max=n - 1)


@partial(jax.jit, static_argnames=("dist", "chunk"))
def _build_distmat(feats, dist: str, chunk: int):
    """[N, D] -> [N, N] fp32 eval-mode distances: one scanned program,
    each step an MXU-sized [chunk, D] x [D, N] block."""
    fn = get_dist_func(dist, eval_mode=True)
    n = feats.shape[0]
    idx = _pad_idx(n, chunk).reshape(-1, chunk)

    def body(_, rows):
        return None, fn(feats[rows], feats)

    _, parts = jax.lax.scan(body, None, idx)
    return parts.reshape(-1, n)[:n]


@partial(jax.jit, static_argnames=("kk", "hk"))
def _ranks_and_recip(d, kk: int, hk: int):
    """Initial ranks + reciprocal masks at the full (kk) and half (hk)
    neighbourhood levels. d: [N, N] fp32."""
    n = d.shape[0]
    _, rank = jax.lax.top_k(-d, kk)            # [N, kk] nearest-first
    rows = jnp.arange(n, dtype=rank.dtype)
    back = rank[rank]                          # [N, kk, kk]
    recip = (back == rows[:, None, None]).any(-1)          # [N, kk]
    backh = rank[rank[:, :hk], :hk]            # [N, hk, hk]
    reciph = (backh == rows[:, None, None]).any(-1)        # [N, hk]
    return rank, recip, reciph


@partial(jax.jit, static_argnames=("chunk",))
def _build_v(dn, rank, recip, reciph, chunk: int):
    """Membership-weight matrix V (steps 2-4): one scanned program over
    row chunks of ``chunk`` rows each."""
    n = dn.shape[0]
    hk = reciph.shape[1]
    hsize = reciph.sum(-1).astype(jnp.int32)
    idx = _pad_idx(n, chunk).reshape(-1, chunk)
    ar_c = jnp.arange(chunk)

    def body(_, rows):
        nb = rank[rows]                        # [C, kk]
        rc = recip[rows]                       # [C, kk]
        # R(i) as dense indicator rows (top-k indices are distinct per
        # row; scatter-max keeps duplicate pad rows harmless)
        ri = jnp.zeros((chunk, n), jnp.float32).at[ar_c[:, None], nb].max(
            rc.astype(jnp.float32)
        )
        # half-level sets of every candidate j in N(i, k1+1)
        ch_idx = rank[nb][:, :, :hk]                       # [C, kk, hk]
        ch_msk = reciph[nb]                                # [C, kk, hk]
        # |Rh(j) ∩ R(i)|: gather R(i)'s indicator at Rh(j)'s members
        ri_at = jax.vmap(lambda r, i: r[i])(ri, ch_idx)    # [C, kk, hk]
        inter = (ri_at * ch_msk).sum(-1).astype(jnp.int32)  # [C, kk]
        hs = hsize[nb]                                     # [C, kk]
        sel = rc & (3 * inter > 2 * hs)
        grow = (sel[:, :, None] & ch_msk).astype(jnp.float32)
        rstar = ri.at[ar_c[:, None, None], ch_idx].max(grow)
        w = jnp.exp(-dn[rows]) * rstar
        return None, w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)

    _, v = jax.lax.scan(body, None, idx)
    return v.reshape(-1, n)[:n]


@partial(jax.jit, static_argnames=("chunk",))
def _query_expand(v, rank_k2, chunk: int):
    """Local query expansion (step 5): one scanned program,
    ``V[i] <- mean(V[rank(i, :k2)])`` per row chunk."""
    n = v.shape[0]
    idx = _pad_idx(n, chunk).reshape(-1, chunk)

    def body(_, rows):
        return None, v[rank_k2[rows]].mean(axis=1)

    _, vq = jax.lax.scan(body, None, idx)
    return vq.reshape(-1, n)[:n]


@partial(jax.jit, static_argnames=("qb", "gb"))
def _jaccard(vq, vg, qb: int, gb: int):
    """[Q, N] x [G, N] -> [Q, G] Jaccard distances (step 6): one program,
    nested scans over [qb]-row query and [gb]-row gallery blocks."""
    q, g = vq.shape[0], vg.shape[0]
    sq, sg = vq.sum(-1), vg.sum(-1)
    qidx = _pad_idx(q, qb).reshape(-1, qb)
    gidx = _pad_idx(g, gb).reshape(-1, gb)

    def g_body(qrows, grows):
        a = vq[qrows]                          # [qb, N]
        b = vg[grows]                          # [gb, N]
        minsum = jnp.minimum(a[:, None, :], b[None, :, :]).sum(-1)
        denom = jnp.maximum(
            sq[qrows][:, None] + sg[grows][None, :] - minsum, 1e-12
        )
        return 1.0 - minsum / denom            # [qb, gb]

    def q_body(_, qrows):
        _, blocks = jax.lax.scan(
            lambda c, grows: (None, g_body(qrows, grows)), None, gidx
        )                                      # [ngb, qb, gb]
        return None, blocks.transpose(1, 0, 2).reshape(qb, -1)

    _, rows = jax.lax.scan(q_body, None, qidx)  # [nqb, qb, Gpad]
    return rows.reshape(-1, rows.shape[-1])[:q, :g]


def rerank_distmat(
    qf,
    gf,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    dist: str = "euclidean",
    max_n: int = DEFAULT_MAX_N,
):
    """k-reciprocal re-ranked distance matrix: [Q, D] x [G, D] -> [Q, G]
    fp32 (device array; ``np.asarray`` it for host use).

    ``lambda_value`` weighs the (row-max-normalised) original distance
    against the Jaccard distance — 1.0 reproduces the original ranking
    exactly, 0.0 ranks purely on k-reciprocal set overlap.
    """
    qf = jnp.asarray(qf, jnp.float32)
    gf = jnp.asarray(gf, jnp.float32)
    q, g = int(qf.shape[0]), int(gf.shape[0])
    n = q + g
    if q == 0 or g == 0:
        return jnp.zeros((q, g), jnp.float32)
    if n > max_n:
        raise ValueError(
            f"re-ranking holds two [N, N] fp32 matrices in HBM; "
            f"N={n} exceeds max_n={max_n} (~{2 * n * n * 4 / 2**30:.1f} GB"
            f" + transients). Re-rank a centroid gallery, raise max_n on "
            f"a bigger chip, or use the streaming evaluator without "
            f"re-ranking for galleries at this scale."
        )
    k1 = max(1, min(int(k1), n - 1))
    # the rank matrix only carries k1+1 columns, so the effective local
    # query-expansion neighbourhood is min(k2, k1+1) — clamp explicitly
    # (the oracle's rank[:, :k2] slice has the same semantics implicitly)
    k2 = max(1, min(int(k2), k1 + 1))
    kk = k1 + 1
    hk = k1 // 2 + 1
    lam = float(lambda_value)
    c = min(_ROW_CHUNK, _ceil_to(n, 8))

    d = _build_distmat(jnp.concatenate([qf, gf]), dist,
                       max(1, min(n, (16 * 1024 * 1024) // max(n, 1))))
    dn = d / jnp.maximum(d.max(axis=1, keepdims=True), 1e-12)
    rank, recip, reciph = _ranks_and_recip(d, kk, hk)
    del d
    v = _build_v(dn, rank, recip, reciph, c)
    if k2 > 1:
        v = _query_expand(v, rank[:, :k2], c)

    jac = _jaccard(v[:q], v[q:], min(_JAC_QB, _ceil_to(q, 8)),
                   min(_JAC_GB, _ceil_to(g, 8)))
    return lam * dn[:q, q:] + (1.0 - lam) * jac


# ---------------------------------------------------------------------------
# Windowed (top-R candidate) re-ranking — production scale
# ---------------------------------------------------------------------------

# Queries per scan step of the windowed program. Peak per-step state is
# the [C, R+1, D] candidate gather plus the [C, R+1, R+1] local matrices:
# C=32, R=500, D=2048 ≈ 131 MB + 32 MB — comfortably transient.
_WIN_CHUNK = 32


def _local_dist(f, dist: str):
    """[C, n, D] -> [C, n, n] eval-mode distances per candidate set —
    the batched form of losses/distances.py's eval table (squared
    euclidean without sqrt / |1-cos| clamped), fp32 accumulation."""
    f = f.astype(jnp.float32)
    if dist == "euclidean":
        sq = jnp.einsum("cnd,cnd->cn", f, f)
        return (sq[:, :, None] + sq[:, None, :]
                - 2.0 * jnp.einsum("cnd,cmd->cnm", f, f))
    if dist == "cosine":
        fn = f / jnp.maximum(
            jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12
        )
        return jnp.clip(
            jnp.abs(1.0 - jnp.einsum("cnd,cmd->cnm", fn, fn)), min=1e-12
        )
    raise ValueError(dist)


def _core_one(d, kk: int, hk: int, k2: int, lam):
    """Steps 1-7 of the module spec on ONE small candidate set: d is the
    [n, n] local distance matrix whose row 0 is the query and rows 1..n-1
    its gallery candidates. Returns the re-ranked distances of the query
    to the candidates, [n-1]. Same algebra as the full-matrix stages
    above, un-chunked (n is small) so it vmaps cleanly over a batch of
    candidate sets."""
    n = d.shape[0]
    dn = d / jnp.maximum(d.max(axis=1, keepdims=True), 1e-12)
    _, rank = jax.lax.top_k(-d, kk)
    rows = jnp.arange(n, dtype=rank.dtype)
    back = rank[rank]                                      # [n, kk, kk]
    recip = (back == rows[:, None, None]).any(-1)          # [n, kk]
    backh = rank[rank[:, :hk], :hk]                        # [n, hk, hk]
    reciph = (backh == rows[:, None, None]).any(-1)        # [n, hk]
    hsize = reciph.sum(-1).astype(jnp.int32)

    ri = jnp.zeros((n, n), jnp.float32).at[rows[:, None], rank].max(
        recip.astype(jnp.float32)
    )
    ch_idx = back[:, :, :hk]                               # [n, kk, hk]
    ch_msk = reciph[rank]                                  # [n, kk, hk]
    ri_at = jax.vmap(lambda r, i: r[i])(ri, ch_idx)
    inter = (ri_at * ch_msk).sum(-1).astype(jnp.int32)
    sel = recip & (3 * inter > 2 * hsize[rank])
    grow = (sel[:, :, None] & ch_msk).astype(jnp.float32)
    rstar = ri.at[rows[:, None, None], ch_idx].max(grow)
    w = jnp.exp(-dn) * rstar
    v = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    if k2 > 1:
        v = v[rank[:, :k2]].mean(axis=1)

    vq, vg = v[0], v[1:]
    minsum = jnp.minimum(vq[None, :], vg).sum(-1)
    denom = jnp.maximum(vq.sum() + vg.sum(-1) - minsum, 1e-12)
    jac = 1.0 - minsum / denom
    return lam * dn[0, 1:] + (1.0 - lam) * jac


@partial(jax.jit,
         static_argnames=("kk", "hk", "k2", "chunk", "dist"))
def _windowed(qf, gf, idx, lam, kk: int, hk: int, k2: int, chunk: int,
              dist: str):
    """One scanned program: per chunk of ``chunk`` queries, gather each
    query's candidate rows, build the [C, n, n] local distance matrices,
    and vmap the per-set core. Output [Q, R] re-ranked distances in the
    candidate order of ``idx``."""
    q = qf.shape[0]
    rows_idx = _pad_idx(q, chunk).reshape(-1, chunk)

    def body(_, rows):
        f = jnp.concatenate(
            [qf[rows][:, None, :], gf[idx[rows]]], axis=1
        )                                                  # [C, n, D]
        d = _local_dist(f, dist)
        return None, jax.vmap(
            lambda dd: _core_one(dd, kk, hk, k2, lam)
        )(d)

    _, out = jax.lax.scan(body, None, rows_idx)
    return out.reshape(-1, out.shape[-1])[:q]


@partial(jax.jit,
         static_argnames=("kk", "hk", "k2", "chunk", "dist"))
def _windowed_feats(qf, cand, lam, kk: int, hk: int, k2: int, chunk: int,
                    dist: str):
    """``_windowed`` over PRE-GATHERED candidate rows ``cand [Q, R, D]``
    instead of a resident ``(gf, idx)`` pair — the form a gallery-sharded
    serving path needs (its candidate rows arrive from a cross-shard psum
    gather, parallel/retrieval.py::make_sharded_row_gather, so there is no
    replicated ``gf`` to index). Identical math and output contract."""
    q = qf.shape[0]
    rows_idx = _pad_idx(q, chunk).reshape(-1, chunk)

    def body(_, rows):
        f = jnp.concatenate(
            [qf[rows][:, None, :], cand[rows]], axis=1
        )                                                  # [C, n, D]
        d = _local_dist(f, dist)
        return None, jax.vmap(
            lambda dd: _core_one(dd, kk, hk, k2, lam)
        )(d)

    _, out = jax.lax.scan(body, None, rows_idx)
    return out.reshape(-1, out.shape[-1])[:q]


def rerank_topk(
    qf,
    gf,
    r: int = 100,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    dist: str = "euclidean",
    use_pallas: bool = True,
    q_chunk: int = _WIN_CHUNK,
    mesh=None,
):
    """Windowed k-reciprocal re-ranking for production-scale galleries:
    [Q, D] x [G, D] -> re-ranked ``(distances [Q, r], indices [Q, r])``,
    nearest first.

    ``mesh``: a Mesh with a gallery axis routes the candidate-window
    selection through the gallery-sharded retrieval path
    (parallel/retrieval.py::sharded_topk), which splits the selection
    FLOPs and the per-shard score state across chips. NOTE the capacity
    bound: this entry takes a host/replicated ``gf`` (and the windowed
    core gathers candidate rows from it), so gallery RESIDENCY is still
    one chip's HBM — aggregate-HBM residency needs a caller-sharded
    gallery end to end, which the serving path implements
    (inference/service.py + make_sharded_row_gather) and this offline
    entry does not. The per-candidate-set re-rank core is O(Q·r²) and
    stays a single replicated program either way.

    Composes the fused retrieval kernel with the re-ranker the TPU way:
    ``ops.retrieval.topk_retrieval`` first narrows each query to its top-r
    candidates (any gallery size — the kernel never materialises [Q, G]),
    then each query is re-ranked against ITS OWN candidate set — exactly
    ``rerank_distmat(qf[i:i+1], gf[cands_i])`` per query, which is how the
    oracle tests it. Memory is O(C·r²) transient instead of the full
    re-ranker's O((Q+G)²) resident, so this is the variant that serves
    million-row galleries; the trade is that reciprocal neighbourhoods
    see only the candidate window (the standard deployment approximation
    for k-reciprocal re-ranking — candidates outside the window keep
    their original relative order by never entering it).

    ``r`` should comfortably exceed the k you finally keep (r ≈ 5-10× k1
    works well); it is clamped to the gallery size.
    """
    qf = jnp.asarray(qf, jnp.float32)
    gf = jnp.asarray(gf, jnp.float32)
    q, g = int(qf.shape[0]), int(gf.shape[0])
    if q == 0 or g == 0:
        z = jnp.zeros((q, 0), jnp.float32)
        return z, z.astype(jnp.int32)
    r = max(1, min(int(r), g))
    n = r + 1                    # query + its candidates, per set
    k1 = max(1, min(int(k1), n - 1))
    k2 = max(1, min(int(k2), k1 + 1))  # rank has k1+1 columns (see above)

    if mesh is not None:
        from ..parallel.retrieval import sharded_topk

        _, idx0 = sharded_topk(qf, gf, r, mesh, dist=dist)
    else:
        from .retrieval import topk_retrieval

        _, idx0 = topk_retrieval(
            qf, gf, r, dist=dist, use_pallas=use_pallas
        )
    idx0 = jnp.asarray(idx0)
    vals = _windowed(
        qf, gf, idx0, float(lambda_value), k1 + 1, k1 // 2 + 1, k2,
        max(1, min(q_chunk, q)), dist,
    )
    order = jnp.argsort(vals, axis=1)
    return (
        jnp.take_along_axis(vals, order, axis=1),
        jnp.take_along_axis(idx0, order, axis=1),
    )
