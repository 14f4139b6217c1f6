"""Codec tests: decode_pnm is a real Netpbm parser — pin its grammar
handling (P5/P6, truncation, junk input) independently of the Spark
plumbing, which the driver oracle covers end-to-end."""

import numpy as np
import pytest

from ocs_duckdb_runner_spark.llm.multimodal import decode_pnm


def test_decode_p5_grayscale():
    px = bytes(range(6))
    f = decode_pnm(b"P5\n3 2\n255\n" + px)
    assert (f["fmt"], f["width"], f["height"], f["maxval"]) == ("P5", 3, 2, 255)
    assert f["n_px"] == 6 and not f["truncated"]
    assert f["mean_px"] == np.mean(list(px))
    assert f["max_px"] == 5
    assert f["c0_mean"] == f["mean_px"] and f["c1_mean"] == 0.0


def test_decode_p6_rgb_channel_means():
    # 2x1 RGB: pixels (10,20,30) and (40,60,80)
    f = decode_pnm(b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 60, 80]))
    assert f["fmt"] == "P6" and f["n_px"] == 6
    assert (f["c0_mean"], f["c1_mean"], f["c2_mean"]) == (25.0, 40.0, 55.0)


def test_decode_truncated_flagged():
    # header promises 4x4 but only 5 pixel bytes follow
    f = decode_pnm(b"P5\n4 4\n255\n" + bytes([1, 2, 3, 4, 5]))
    assert f["truncated"] and f["n_px"] == 5
    assert f["mean_px"] == 3.0


def test_decode_rejects_non_pnm():
    with pytest.raises(ValueError):
        decode_pnm(b"\x89PNG\r\n\x1a\nnot a pnm")


def test_decode_wav_roundtrip_and_chunk_walk():
    """Hand-built canonical WAV: 4 samples at 8 kHz — decode must parse
    the real chunk grammar, not fixed offsets (an extra chunk between
    fmt and data must be skipped, including its alignment pad byte)."""
    from ocs_duckdb_runner_spark.llm.multimodal import decode_wav

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little")
        + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    data = bytes([128, 138, 118, 255])
    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"LIST", b"junk!") + chunk(
        b"data", data
    )
    buf = b"RIFF" + len(body).to_bytes(4, "little") + body
    d = decode_wav(buf)
    assert d["sample_rate"] == 8000
    assert d["n_samples"] == 4
    assert d["duration_ms"] == 0  # 4 samples / 8000 Hz < 1 ms
    assert d["peak"] == 255
    assert d["energy"] == 0 + 10 * 10 + 10 * 10 + 127 * 127
    assert abs(d["mean_amp"] - (128 + 138 + 118 + 255) / 4) < 1e-12


def test_decode_wav_rejects_junk():
    import pytest as _pytest

    from ocs_duckdb_runner_spark.llm.multimodal import decode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    with _pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00JUNK")


def test_resize_handles_truncated_plane():
    # ADVICE r7: a payload whose pixel plane is shorter than w*h (blen < w
    # clamps h to 1) must not raise in reshape — the kept set is derived by
    # index arithmetic exactly like the oracle's least(blen, w*h) cap
    import pandas as pd

    from ocs_duckdb_runner_spark.llm.multimodal import _resize_pnm_batches

    full = b"P5 4 2 255 " + bytes(range(8))        # full 4x2 plane
    trunc = b"P5 6 1 255 " + bytes([10, 20])       # 2 of 6 pixels present
    empty = b"P5 5 1 255 "                          # zero pixels -> dropped
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [full, trunc, empty]})
    out = pd.concat(list(_resize_pnm_batches(iter([pdf]))))
    assert list(out["doc_id"]) == [1, 2]
    r1 = out[out.doc_id == 1].iloc[0]
    # full plane: rows 0, cols 0&2 kept -> pixels 0 and 2
    assert (r1.out_w, r1.out_h, r1.n_out, r1.sum_px) == (2, 1, 2, 0 + 2)
    r2 = out[out.doc_id == 2].iloc[0]
    # truncated: only idx 0 (r=0,c=0) kept of the declared 6x1 grid
    assert (r2.out_w, r2.out_h, r2.n_out, r2.sum_px) == (3, 1, 1, 10)
