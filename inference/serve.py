#!/usr/bin/env python
"""HTTP retrieval serving over a previously built gallery.

Online-serving counterpart to the reference's offline get_similar
(/root/reference/inference/get_similar.py): loads create_embeddings
artifacts (<gallery_data>/embeddings.npy + paths.npy) into a
device-resident RetrievalService and answers JSON /search queries —
one TPU dispatch per request batch. See
centroids_reid_tpu/inference/server.py for the endpoint schema.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centroids_reid_tpu.inference.server import main  # noqa: E402

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))


if __name__ == "__main__":
    main()
