"""Property-based tests (hypothesis) for the two layers every oracle
check rests on: the exactness fixed-point contract (aggregation must be
partition-order- and partition-count-independent — the reason sf0.01
hashes transfer to 100 TB plans) and the sweep harness's canonical hash
(order-insensitive, collision-resistant in practice, dtype-neutral
between Spark's and DuckDB's pandas outputs)."""

from __future__ import annotations

import math
import random
import sys
from pathlib import Path

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from driver_sim import canon_hash  # noqa: E402

# two-decimal "money" doubles as the fixtures carry them
_money = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda c: c / 100.0
)


@given(st.lists(_money, min_size=1, max_size=300), st.randoms())
@settings(max_examples=200, deadline=None)
def test_fx_sum_is_order_and_partition_independent(xs, rng):
    """The python-side model of fx_sum (round(x*100) summed as ints) must
    give the same total for ANY permutation and ANY partitioning — the
    property that makes the aggregate safe under Spark's partial/final
    split, AQE coalescing, and any cluster size."""
    base = sum(int(round(x * 100)) for x in xs)
    perm = xs[:]
    rng.shuffle(perm)
    # arbitrary partitioning: sum partials, then sum the partials
    k = rng.randint(1, len(perm))
    bounds = sorted(rng.sample(range(1, len(perm) + 1), k - 1)) + [len(perm)]
    partials, start = [], 0
    for b in bounds:
        partials.append(sum(int(round(x * 100)) for x in perm[start:b]))
        start = b
    assert sum(partials) == base


@given(st.lists(_money, min_size=2, max_size=100))
@settings(max_examples=100, deadline=None)
def test_float_sum_order_dependence_is_real(xs):
    """Negative control: raw double summation IS order-dependent in
    general (this is the drift fx_sum exists to remove). Not an assertion
    that every list drifts — an assertion that the fixed-point total
    always equals the mathematically exact cents total, while float sums
    are only close."""
    exact_cents = sum(int(round(x * 100)) for x in xs)
    fsum = math.fsum(xs)  # correctly-rounded reference
    assert abs(fsum * 100 - exact_cents) < 1e-3 * max(1, len(xs))


def _hash_rows(rows, cols):
    return canon_hash(pd.DataFrame(rows, columns=cols))


@given(
    st.lists(
        st.tuples(
            st.integers(-(2**40), 2**40),
            st.floats(allow_nan=True, allow_infinity=False, width=64),
            st.text(max_size=12),
        ),
        min_size=0,
        max_size=80,
    ),
    st.randoms(),
)
@settings(max_examples=150, deadline=None)
def test_canon_hash_row_order_insensitive(rows, rng):
    """Permuting rows must never change the hash (the driver compares
    order-insensitively); changing any single cell must change it."""
    cols = ["a", "b", "c"]
    h1 = _hash_rows(rows, cols)
    perm = rows[:]
    rng.shuffle(perm)
    assert _hash_rows(perm, cols) == h1
    if rows:
        i = rng.randrange(len(rows))
        a, b, c = rows[i]
        mutated = rows[:]
        mutated[i] = (a + 1, b, c)
        assert _hash_rows(mutated, cols) != h1


@given(
    st.lists(st.integers(-(2**31), 2**31), min_size=1, max_size=50)
)
@settings(max_examples=100, deadline=None)
def test_canon_hash_dtype_neutral(ints):
    """int64 numpy column vs python-object column vs float-free DuckDB
    fetchdf dtypes must hash identically — the cross-engine contract."""
    a = pd.DataFrame({"x": pd.array(ints, dtype="int64")})
    b = pd.DataFrame({"x": pd.Series(ints, dtype=object)})
    assert canon_hash(a) == canon_hash(b)


def test_canon_hash_column_order_insensitive():
    df1 = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    df2 = pd.DataFrame({"b": ["x", "y"], "a": [1, 2]})[["b", "a"]]
    assert canon_hash(df1) == canon_hash(df2)


def test_canon_hash_nan_none_equivalence():
    """NaN (DuckDB fetchdf) and None (Spark toPandas) both canonicalize
    to NULL — engines must not mismatch on representation."""
    a = pd.DataFrame({"x": [1.5, float("nan")]})
    b = pd.DataFrame({"x": [1.5, None]}).astype("float64")
    assert canon_hash(a) == canon_hash(b)
