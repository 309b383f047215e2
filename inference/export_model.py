#!/usr/bin/env python
"""Export a checkpoint as a self-contained serving artifact.

No reference counterpart (the reference deploys by re-instantiating the
model from source + .ckpt); this writes a single file — StableHLO program
via ``jax.export`` with the weights baked in — that a serving host can run
with JAX alone (``centroids_reid_tpu.inference.load_embedder``), no model
code, no checkpoint, no converter.

  python inference/export_model.py --config_file configs/256_resnet50.yml \\
      --output model.crtpu MODEL.PRETRAIN_PATH ckpt

``--retriever --gallery_data /index`` exports the FULL serving pipeline
instead: the one-dispatch embed + fused top-k program with the gallery
rows + paths attached in the artifact (attach-at-load), served by
``inference/serve.py --artifact`` with no checkpoint or index on the
serving host (``centroids_reid_tpu.inference.load_retriever``).

With TPU.INT8_EVAL True the exported program is the int8 PTQ pipeline
(requires a calibrated TPU.INT8_CACHE_PATH artifact from a previous run).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centroids_reid_tpu.config import get_default_cfg  # noqa: E402
from centroids_reid_tpu.inference import export_from_config  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))


def main():
    parser = argparse.ArgumentParser(
        description="Export a self-contained TPU/CPU serving artifact"
    )
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--output", required=True, type=str)
    parser.add_argument(
        "--batch-size", type=int, default=None,
        help="fix the serving batch (default: symbolic — any batch size)",
    )
    parser.add_argument(
        "--platforms", default="tpu,cpu",
        help="comma-separated lowering targets (default: tpu,cpu)",
    )
    parser.add_argument(
        "--no-normalize", action="store_true",
        help="skip the L2-normalize epilogue (raw BNNeck embeddings)",
    )
    parser.add_argument(
        "--retriever", action="store_true",
        help="export the FULL serving pipeline (embed + fused top-k "
        "against the gallery, with gallery rows + paths attached): "
        "requires --gallery_data; serve it with inference/serve.py "
        "--artifact",
    )
    parser.add_argument(
        "--gallery_data", default="", type=str,
        help="(--retriever) dir with embeddings.npy/paths.npy from "
        "create_embeddings",
    )
    parser.add_argument(
        "--topk", type=int, default=100,
        help="(--retriever) ranking depth baked into the program",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    from centroids_reid_tpu.utils import enable_compile_cache

    enable_compile_cache()
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p)
    if args.retriever:
        if not args.gallery_data:
            raise SystemExit("--retriever requires --gallery_data")
        from centroids_reid_tpu.inference import export_retriever_from_config

        meta = export_retriever_from_config(
            cfg, args.gallery_data, args.output, k=args.topk,
            batch_size=args.batch_size, platforms=platforms,
            normalize=not args.no_normalize,
        )
    else:
        meta = export_from_config(
            cfg, args.output, batch_size=args.batch_size,
            platforms=platforms,
            normalize=not args.no_normalize,
        )
    print(f"wrote {args.output}: {meta}")


if __name__ == "__main__":
    main()
