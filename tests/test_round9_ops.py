"""Round-9 locks: cache-vacuum tag anchoring and sink-scratch hygiene
(no Spark session needed — pure filesystem semantics)."""

from __future__ import annotations

import os
import time


def test_vacuum_cache_siblings_is_fingerprint_anchored(tmp_path):
    """A tag that PREFIXES another tag (sf0.1 vs sf0.1_alt) must not
    vacuum the longer tag's valid fingerprinted generation — the round-8
    bare-prefix match did, forcing spurious rebuilds."""
    from ocs_duckdb_runner_spark.registry import vacuum_cache_siblings

    parent = str(tmp_path)
    keep = "sf0.1_aaaaaaaaaaaa"
    victims = ["sf0.1", "sf0.1_bbbbbbbbbbbb"]  # pre-fp layout + stale gen
    survivors = [
        keep,
        "sf0.1_alt_cccccccccccc",  # longer tag's valid generation
        "sf0.1_notafingerprint",  # not 12-hex → not a generation
        "sf0.15_dddddddddddd",  # different tag entirely
    ]
    for name in victims + survivors:
        os.makedirs(os.path.join(parent, name))
    vacuum_cache_siblings(parent, "sf0.1", keep)
    left = set(os.listdir(parent))
    assert left == set(survivors)


def test_vacuum_stale_sink_runs_keeps_fresh_dirs(tmp_path):
    """The sink-scratch vacuum removes prior runs' dirs but never a
    fresh (possibly concurrent) run's."""
    from ocs_duckdb_runner_spark.sources.python_datasource import (
        _vacuum_stale_sink_runs,
    )

    parent = str(tmp_path)
    old = os.path.join(parent, "deadbeef")
    fresh = os.path.join(parent, "cafebabe")
    os.makedirs(old)
    os.makedirs(fresh)
    past = time.time() - 7200
    os.utime(old, (past, past))
    _vacuum_stale_sink_runs(parent)
    assert not os.path.exists(old)
    assert os.path.exists(fresh)
