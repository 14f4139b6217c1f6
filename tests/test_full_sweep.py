"""The full-coverage oracle sweep as a pytest entry point, so the sweep
evidence can't silently go stale (the r4 verdict: 95/182 queries' driver
evidence predated a fixture migration that had broken 13 of them).

Runs scripts/driver_sim.py — every registered query vs its DuckDB oracle
at sf0.01 — in a subprocess (own SparkSession, like the driver). Opt-in
because it takes ~10 minutes:

    python -m pytest tests/test_full_sweep.py --run-sweep -q

The default `pytest tests/` run skips it; CI/round hygiene is to run it
once per round and commit the JSON artifact (CORRECTNESS_LOCAL_r*.json).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def pytest_addoption_checker(config):  # pragma: no cover - doc helper
    return config.getoption("--run-sweep", default=False)


def test_auto_retime_ref_discovery(tmp_path):
    """r11 verdict Next #1: the sweep must arm its own stall-resistance.

    A round-numbered --json target auto-discovers the highest prior-round
    artifact of the same family in the same directory; retime suffixes
    (``_r11_RETIMES.json``) and other families never match; the first
    artifact of a family returns None (proceed un-reffed, printed notice).
    """
    sys.path.insert(0, str(REPO / "scripts"))
    from driver_sim import auto_retime_ref

    for f in [
        "SCALE_SWEEP_r05.json", "SCALE_SWEEP_r10.json",
        "SCALE_SWEEP_r11.json", "SCALE_SWEEP_r11_RETIMES.json",
        "CORRECTNESS_LOCAL_r11.json", "BENCH_r11.json",
    ]:
        (tmp_path / f).write_text("{}")

    got = auto_retime_ref(str(tmp_path / "SCALE_SWEEP_r12.json"))
    assert got == str(tmp_path / "SCALE_SWEEP_r11.json")
    got = auto_retime_ref(str(tmp_path / "CORRECTNESS_LOCAL_r12.json"))
    assert got == str(tmp_path / "CORRECTNESS_LOCAL_r11.json")
    # strictly-prior only: re-running r11 refs r10, not itself
    got = auto_retime_ref(str(tmp_path / "SCALE_SWEEP_r11.json"))
    assert got == str(tmp_path / "SCALE_SWEEP_r10.json")
    assert auto_retime_ref(str(tmp_path / "NEWFAM_r01.json")) is None
    assert auto_retime_ref(str(tmp_path / "adhoc.json")) is None


@pytest.mark.sweep
def test_full_oracle_sweep(request, tmp_path):
    if not request.config.getoption("--run-sweep"):
        pytest.skip("full sweep is opt-in: pass --run-sweep (~10 min)")
    out = tmp_path / "sweep.json"
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/driver_sim.py",
            "--json",
            str(out),
            "/root/testdata/sf0.01",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert out.exists()


@pytest.mark.hotshingle
def test_hot_shingle_probe(request, tmp_path):
    """The df-cap-BINDING oracle check as a pytest entry point, so it
    can't silently rot between rounds (r9 verdict Next #6): builds the
    planted-viral-shingle fixture (df ~2500 >> cap 256) and oracle-checks
    the whole shingle/gram family there. Opt-in (~2 min):

        python -m pytest tests/test_full_sweep.py --run-hotshingle -q

    Round hygiene is to run it at the round's final tree and commit the
    JSON artifact (HOTSHINGLE_r*.json)."""
    if not request.config.getoption("--run-hotshingle"):
        pytest.skip("hot-shingle probe is opt-in: pass --run-hotshingle")
    out = tmp_path / "hotshingle.json"
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/hot_shingle_probe.py",
            "/root/testdata/sf0.1",
            "--json",
            str(out),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    assert proc.returncode == 0, f"probe failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert out.exists()
