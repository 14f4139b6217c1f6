"""Optimization probe: idle per-query timing + plan capture.

For each named query: warm at sf0.001 (codegen), then time N reps at the
probe sf_dir via the noop sink (guide §1.4), System.gc() outside the timed
region (bench.py methodology), and optionally write .explain("formatted")
to plans/<round>/<query>_<label>.txt.

Usage:
    python scripts/opt_probe.py [--sf DIR] [--reps N] [--plans LABEL]
                                [--plandir rNN] [--conf k=v ...]
                                query [query ...]
    python scripts/opt_probe.py --json OUT.json ... query ...

Prints one JSON line: {"sf": ..., "reps": N, "times": {q: [..]},
"median": {q: s}}. Times are wall seconds per rep (median is the
committed number, same policy as bench.py's fresh-session re-times).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ocs_duckdb_runner_spark.registry import all_queries  # noqa: E402
from ocs_duckdb_runner_spark.session import build_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="write plans/<DIR>/<q>_<LABEL>.txt")
    ap.add_argument("--plandir", default="r13", help="plans/ subdirectory")
    ap.add_argument("--json", default=None)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    extra = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra[k] = v
    spark = build_spark(app_name="opt-probe", extra_conf=extra or None)
    qs = all_queries()
    warm_dir = "/root/testdata/sf0.001"
    # prime the parquet reader path; not every sf dir carries lineitem
    # (ADVICE r12: an unconditional read crashed on table-less dirs)
    if os.path.exists(f"{args.sf}/lineitem.parquet"):
        spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    times: dict[str, list[float]] = {}
    for name in args.queries:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        if os.path.isdir(warm_dir):
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        if args.plans:
            plan_dir = REPO / "plans" / args.plandir
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{args.plans}.txt").write_text(txt)
        reps = []
        for _ in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"opt-probe: {name}")
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            reps.append(round(time.monotonic() - t0, 3))
        times[name] = reps
    out = {
        "sf": args.sf,
        "reps": args.reps,
        "conf": extra,
        "times": times,
        # statistics.median: true median for even rep counts too (ADVICE
        # r12 — sorted(t)[len//2] was the upper-middle element)
        "median": {q: round(statistics.median(t), 3) for q, t in times.items()},
    }
    line = json.dumps(out)
    print(line)
    if args.json:
        Path(args.json).write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
