"""R1/mAP evaluator: normalise, distance matrix, rank, score.

Equivalent of ``R1_mAP.compute`` (/root/reference/utils/reid_metric.py:112-150):
optional L2 feature normalisation, query/gallery split at num_query, full
Q x G distance matrix + argsort, then the market protocol metrics. The
reference chunks galleries > 30,000 rows on the host (:93-110); here the
distance matrix is computed on device in gallery chunks of bounded memory —
same result, MXU-sized blocks.
"""

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..losses.distances import get_dist_func
from .eval_reid import ReidMetrics, eval_func

# Max fp32 elements of the distance matrix kept resident per chunk (~256 MB).
_CHUNK_ELEMS = 64 * 1024 * 1024


@partial(jax.jit, static_argnames=("dist_name",))
def _dist_chunk(qf, gf_chunk, dist_name):
    return get_dist_func(dist_name, eval_mode=True)(qf, gf_chunk)


def compute_distmat_device(qf, gf, dist_name: str = "euclidean"):
    """[Q,D] x [G,D] -> [Q,G] fp32 distances as a DEVICE array.

    Chunked over gallery so each matmul stays bounded; the result never
    leaves HBM (the reference's host chunking moved every chunk through
    host memory, reid_metric.py:93-110)."""
    q, g = qf.shape[0], gf.shape[0]
    chunk = max(1, min(g, _CHUNK_ELEMS // max(q, 1)))
    qj = jnp.asarray(qf, jnp.float32)
    parts = [
        _dist_chunk(qj, jnp.asarray(gf[s:min(s + chunk, g)], jnp.float32),
                    dist_name)
        for s in range(0, g, chunk)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def compute_distmat(
    qf: np.ndarray, gf: np.ndarray, dist_name: str = "euclidean"
) -> np.ndarray:
    """Host-output variant of compute_distmat_device."""
    return np.asarray(compute_distmat_device(qf, gf, dist_name))


def l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    """torch F.normalize(p=2, dim=1) parity: x / max(||x||, eps)."""
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


# [Q, G] cells beyond which compute() switches to the streaming evaluator
# (score matrix + argsort indices would otherwise occupy Q*G*8 bytes of
# HBM — 2 GB at this threshold; a 3,368-query x 1M-gallery eval needs ~27
# GB and OOMs a v5e chip on the materialising path).
_STREAMING_CELLS = 256 * 1024 * 1024


class R1mAP:
    """Functional evaluator (no trainer plumbing needed).

    ``streaming``: None (auto — switch when Q*G exceeds the HBM-safe
    threshold), or force True/False. Streaming computes identical metrics
    by chunked rank-counting (metrics/streaming_eval.py) and never builds
    the distance matrix — so ``last_distmat`` (rank visualisation) is only
    available on the materialising path. ``mesh`` shards the streaming
    gallery over the mesh's gallery axis.

    ``rerank``: k-reciprocal re-ranking (ops/rerank.py — beyond-parity
    feature, the reference has no re-ranking). With ``rerank_window=0``
    it replaces the distance matrix with the fully re-ranked one before
    scoring — inherently O(N^2), so it pins the materialising path and
    refuses eval sets past the module guard rather than silently falling
    back. With ``rerank_window=r > 0`` evaluation runs the WINDOWED
    re-ranker on the streaming rank path (each query's top-r candidates
    re-ranked, original order for the tail — streaming_eval.py::
    eval_func_streaming_reranked), which works at any gallery scale; the
    window defines the metric's semantics, so it applies regardless of
    gallery size or the ``streaming`` flag."""

    def __init__(
        self,
        num_query: int,
        max_rank: int = 50,
        feat_norm: bool = True,
        dist_name: str = "euclidean",
        streaming: bool = None,
        mesh=None,
        rerank: bool = False,
        rerank_k1: int = 20,
        rerank_k2: int = 6,
        rerank_lambda: float = 0.3,
        rerank_window: int = 0,
    ):
        self.num_query = num_query
        self.max_rank = max_rank
        self.feat_norm = feat_norm
        self.dist_name = dist_name
        self.streaming = streaming
        self.mesh = mesh
        self.rerank = rerank
        self.rerank_k1 = rerank_k1
        self.rerank_k2 = rerank_k2
        self.rerank_lambda = rerank_lambda
        self.rerank_window = int(rerank_window)
        self._last_distmat_device = None

    def compute(
        self, feats, pids, camids, respect_camids: bool = False
    ) -> ReidMetrics:
        feats = np.asarray(feats, np.float32)
        if self.feat_norm:
            print("The test feature is normalized")
            feats = l2_normalize_rows(feats)

        nq = self.num_query
        qf, gf = feats[:nq], feats[nq:]
        q_pids = np.asarray(pids[:nq])
        g_pids = np.asarray(pids[nq:])
        q_camids = np.asarray(camids[:nq])
        g_camids = np.asarray(camids[nq:])

        if self.rerank and self.rerank_window > 0:
            # windowed re-ranked evaluation: the window (not gallery
            # size) defines the metric, and the streaming rank path
            # handles any scale — takes precedence over ``streaming``
            from .streaming_eval import eval_func_streaming_reranked

            self._last_distmat_device = None
            return eval_func_streaming_reranked(
                qf, gf, q_pids, g_pids, q_camids, g_camids,
                r=self.rerank_window, k1=self.rerank_k1,
                k2=self.rerank_k2, lambda_value=self.rerank_lambda,
                max_rank=self.max_rank, respect_camids=respect_camids,
                dist=self.dist_name, mesh=self.mesh,
            )

        stream = self.streaming
        if stream is None:
            stream = (not self.rerank
                      and qf.shape[0] * gf.shape[0] > _STREAMING_CELLS)
        if self.rerank and stream:
            raise ValueError(
                "full re-ranking is O(N^2) and incompatible with the "
                "streaming evaluator; set TPU.RERANK_WINDOW > 0 (windowed "
                "re-ranking at any gallery scale), run with "
                "streaming=False (small/centroid galleries), or disable "
                "TPU.RERANK"
            )
        if stream:
            from .streaming_eval import eval_func_streaming

            self._last_distmat_device = None
            return eval_func_streaming(
                qf, gf, q_pids, g_pids, q_camids, g_camids,
                max_rank=self.max_rank, respect_camids=respect_camids,
                dist=self.dist_name, mesh=self.mesh,
            )

        # the whole ranking pipeline stays on device: distances, argsort
        # and the metric mask algebra — only the scalar-ish results come
        # back to the host (a [Q,G] round-trip through the host costs more
        # than the compute at Market1501 scale)
        if self.rerank:
            from ..ops.rerank import rerank_distmat

            distmat = rerank_distmat(
                qf, gf, k1=self.rerank_k1, k2=self.rerank_k2,
                lambda_value=self.rerank_lambda, dist=self.dist_name,
            )
        else:
            distmat = compute_distmat_device(qf, gf, self.dist_name)
        indices = jnp.argsort(distmat, axis=1)

        metrics = eval_func(
            indices,
            q_pids,
            g_pids,
            q_camids,
            g_camids,
            self.max_rank,
            respect_camids,
        )
        self._last_distmat_device = distmat  # for rank visualisation
        return metrics

    @property
    def last_distmat(self) -> np.ndarray:
        """Host copy of the last distance matrix (lazy — only the
        visualisation path pays for the transfer)."""
        if self._last_distmat_device is None:
            raise RuntimeError(
                "last_distmat is unavailable on the streaming evaluation "
                "path (the distance matrix is never materialised); run "
                "with streaming=False for rank visualisation"
            )
        return np.asarray(self._last_distmat_device)
