"""Simulate the driver's verify pass against __spark_entry__.py:
smoke entry() at sf0.001, then run every queries() entry at the given sf
and compare to oracle_sql() via DuckDB (row-count + sorted-column +
order-insensitive value equality). Usage:
    python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from ocs_duckdb_runner_spark.registry import TABLES  # noqa: E402
from ocs_duckdb_runner_spark.session import build_spark  # noqa: E402


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        return "NULL" if pd.isna(v) else v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(canon_val(x)) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return repr(v)


def canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        tuple(canon_val(v) for v in row) for row in pdf.itertuples(index=False)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_spark(app_name="driver-sim")

    t0 = time.monotonic()
    smoke = entrymod.entry(spark)
    rows = smoke.collect()
    print(f"SMOKE entry(): {len(rows)} rows, schema={smoke.schema.simpleString()}"
          f" ({time.monotonic() - t0:.1f}s)")
    assert len(rows) > 0

    duck = duckdb.connect()
    for t in TABLES:
        p = Path(f"{sf_dir}/{t}.parquet")
        if p.is_dir():  # directory-parquet (e.g. scale-probe output)
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif p.exists():
            duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            n_pass += 1
            continue
        try:
            want = duck.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {ex}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: columns spark={sorted(got.columns)}"
                  f" oracle={sorted(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL  {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
        elif canon(got) != canon(want):
            g, w = canon(got), canon(want)
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL  {name}: value mismatch {diff}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(got)} rows match oracle ({dt:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
