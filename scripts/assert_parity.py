#!/usr/bin/env python
"""Accuracy-parity gate: evaluate a checkpoint and ASSERT the paper's table.

Runs the TEST.ONLY_TEST double evaluation (centroids on AND off, exactly
like /root/reference/utils/misc.py:128-139) and compares the centroid-mode
mAP / Rank-1 against the CTL paper's published results
(arXiv:2104.13643, Table 2 — the numbers the reference repo's linked
weights, /root/reference/README.md:98-100, are expected to reproduce).
Exits non-zero with a loud per-metric diff on any miss, so reference
parity is ONE command with a pass/fail once the real datasets + weights
are mounted:

  python scripts/assert_parity.py --config_file configs/256_resnet50.yml \\
      --ckpt ~/ckpts/market1501_resnet50_256_128_epoch_120.ckpt \\
      --root /data --dataset market1501

EXPECTED values below were transcribed from the published record of
arXiv:2104.13643 (no copy of the paper ships in this environment — verify
the transcription against Table 2 when the paper is at hand; ``--expect``
overrides any entry without editing this file). Standard-protocol
(non-centroid) results are printed but not asserted by default: add
``--expect plain_mAP=0.xxx`` style overrides to gate them too.

``--int8`` additionally gates DEPLOYMENT accuracy: it re-runs the same
double evaluation through the int8 PTQ serving path (TPU.INT8_EVAL,
engine/evaluate.py) and asserts every mAP / Top-1 is within
``--int8-tol`` of the fp32 result (shortfall-only — an int8 result above
fp32 passes). This turns the quantized artifact's protocol metrics into
one pass/fail command, instead of trusting the embedding-cosine unit
test as a proxy. Calibration flags (TPU.INT8_CACHE_PATH,
TPU.INT8_CALIB_BATCHES, ...) pass through the trailing config overrides.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dataset -> {metric: (expected_fraction, tolerance)}; metrics are keys of
# the ONLY_TEST output dict (engine/runner.py::run_single), fractions in
# [0, 1]. Tolerances are absolute: 0.005 = half a point, covering seed
# variance (the reference trains 3 seeds, README.md:74).
EXPECTED = {
    "market1501": {
        "test_centroids_mAP": (0.983, 0.005),
        "test_centroids_Top-1": (0.980, 0.005),
    },
    "dukemtmcreid": {
        "test_centroids_mAP": (0.968, 0.010),
        "test_centroids_Top-1": (0.965, 0.010),
    },
}


def check(results: dict, expected: dict) -> bool:
    """Compare a result dict against {metric: (value, tol)}; print a table
    and return overall pass. Pure + tested (tests/test_cli.py)."""
    ok = True
    print(f"{'metric':<28}{'got':>10}{'expected':>12}{'tol':>8}  verdict")
    for metric, (want, tol) in sorted(expected.items()):
        got = results.get(metric)
        if got is None:
            print(f"{metric:<28}{'MISSING':>10}{want:>12.4f}{tol:>8.3f}  FAIL")
            ok = False
            continue
        hit = abs(got - want) <= tol
        # a result *above* the expected band is a pass for parity purposes
        # (better than the paper); only a shortfall fails
        if not hit and got > want:
            hit = True
        print(
            f"{metric:<28}{got:>10.4f}{want:>12.4f}{tol:>8.3f}  "
            f"{'ok' if hit else 'FAIL'}"
        )
        ok = ok and hit
    for metric in sorted(results):
        if metric not in expected:
            print(f"{metric:<28}{results[metric]:>10.4f}{'—':>12}{'—':>8}  (info)")
    return ok


def parse_expect(items):
    out = {}
    for item in items or []:
        key, _, val = item.partition("=")
        want, _, tol = val.partition(":")
        out[key] = (float(want), float(tol) if tol else 0.005)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config_file", default="configs/256_resnet50.yml")
    p.add_argument("--ckpt", required=True,
                   help="reference .ckpt/.pth or native orbax dir")
    p.add_argument("--root", required=True, help="DATASETS.ROOT_DIR")
    p.add_argument("--dataset", default="market1501")
    p.add_argument(
        "--expect", action="append", metavar="METRIC=VALUE[:TOL]",
        help="override/add an expected entry, e.g. "
        "test_plain_mAP=0.856:0.01 (repeatable)",
    )
    p.add_argument(
        "--int8", action="store_true",
        help="also evaluate through the int8 PTQ serving path and assert "
        "its mAP/Top-1 within --int8-tol of the fp32 run",
    )
    p.add_argument(
        "--int8-tol", type=float, default=0.01,
        help="max allowed int8-vs-fp32 shortfall per gated metric "
        "(absolute fraction; default 0.01 = one point)",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="trailing KEY VALUE config overrides")
    args = p.parse_args()

    from centroids_reid_tpu.config import get_default_cfg
    from centroids_reid_tpu.engine import run_main

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.TEST.ONLY_TEST = True
    cfg.MODEL.PRETRAIN_PATH = args.ckpt
    cfg.DATASETS.NAMES = args.dataset
    cfg.DATASETS.ROOT_DIR = args.root
    cfg.MODEL.USE_CENTROIDS = True
    cfg.REPRODUCIBLE_NUM_RUNS = 1
    cfg.merge_from_list(args.opts)

    expected = dict(EXPECTED.get(args.dataset, {}))
    expected.update(parse_expect(args.expect))
    if not expected:
        print(f"No expected table for dataset '{args.dataset}' and no "
              f"--expect overrides given; nothing to assert.", file=sys.stderr)
        return 2

    results = run_main(cfg, "ctl", "assert_parity")
    print(f"\n=== parity vs arXiv:2104.13643 ({args.dataset}) ===")
    ok = check(results, expected)
    print("PARITY OK" if ok else "PARITY FAILED")

    report = {"dataset": args.dataset, "fp32": dict(results), "pass": ok}
    if args.int8:
        # deployment-accuracy gate: the SAME double evaluation, embeddings
        # from the int8 serving path (engine/evaluate.py:_maybe_int8_eval_fn)
        cfg_q = cfg.clone()
        cfg_q.TPU.INT8_EVAL = True
        results_q = run_main(cfg_q, "ctl", "assert_parity_int8")
        # gate the mAP/Top-1 metrics the parity table asserts (for the
        # real datasets: the paper's headline centroid-mode numbers) —
        # falling back to ALL mAP/Top-1 rows when the table asserts none.
        # Rationale: a tiny validation fixture gates what is statistically
        # meaningful at its query count (one Top-1 flip on a 48-query set
        # is 2.1% — pure rank-granularity, not quantization error), while
        # a real dataset's table puts every headline metric under the
        # bound; anything ungated still prints as info.
        gated_keys = [
            m for m in expected if m.endswith("mAP") or m.endswith("Top-1")
        ] or [
            m for m in results if m.endswith("mAP") or m.endswith("Top-1")
        ]
        gated = {
            m: (results[m], args.int8_tol) for m in gated_keys
            if m in results
        }
        print(f"\n=== int8 deployment accuracy vs fp32 "
              f"(tol {args.int8_tol}) ===")
        ok_q = check(results_q, gated)
        print("INT8 PARITY OK" if ok_q else "INT8 PARITY FAILED")
        ok = ok and ok_q
        report.update({
            "int8": dict(results_q),
            "int8_tol": args.int8_tol,
            # shortfall per gated metric (positive = int8 below fp32):
            # the number the gate actually bounds, so a caller (the soak,
            # the README table) quotes the measured delta, not "0.000 on
            # a saturated metric"
            "int8_shortfall": {
                m: round(results[m] - results_q[m], 4)
                for m in gated if m in results_q
            },
            "pass": ok,
        })
    import json

    print("PARITY_JSON " + json.dumps(report, sort_keys=True))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
