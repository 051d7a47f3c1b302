"""HEVC inter decode conformance: P/B slices bit-exact vs libavcodec on
x265 streams (merge/AMVP, TMVP, AMP partitions, weighted prediction,
B-pyramid display reorder).

Capability match: the reference's HEVC decode plugin handles every
conformant stream in silicon (intel_dec/intel_dec.cpp:722-741,
nv_dec/nv_dec.h:37-46); here the inter path is in-tree
(codec/hevc/inter.py + refdec.py).
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _roundtrip(frames, w, h, qp=30, gop=20, extra=""):
    stream = oracle_encode(frames, w, h, qp=qp, codec="libx265", gop=gop,
                           extra=extra)
    want, W, H = oracle_decode(stream, suffix=".h265")
    got = HevcRefDecoder().decode(stream)
    assert len(got) == len(want) == len(frames)
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(got, want)):
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu), f"frame {i} cb mismatch"
        assert np.array_equal(gv, wv), f"frame {i} cr mismatch"


def _moving(W, H, n, seed=0):
    """Translating content so ME finds real (fractional) motion."""
    rng = np.random.default_rng(seed)
    BY, BU, BV = make_frame(W * 2, H * 2, seed=seed)
    out = []
    for i in range(n):
        dx, dy = 3 * i + (i % 2), 2 * i
        Y = BY[dy:dy + H, dx:dx + W].copy()
        Y = np.clip(Y.astype(np.int32) +
                    rng.integers(-2, 3, Y.shape), 0, 255).astype(np.uint8)
        U = BU[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2]
        V = BV[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2]
        out.append((Y, U, V))
    return out


def _fade(W, H, n, seed=9):
    base = make_frame(W, H, seed=seed)
    out = []
    for i in range(n):
        s = 1.0 - 0.09 * i
        Y = np.clip(base[0].astype(np.float64) * s, 0, 255).astype(np.uint8)
        out.append((Y, base[1], base[2]))
    return out


def test_p_frames_single_ctu():
    _roundtrip(_moving(64, 64, 4), 64, 64)


def test_p_frames_multi_ctu():
    _roundtrip(_moving(176, 144, 5), 176, 144, qp=27)


def test_p_frames_partial_ctus():
    # non-CTU-multiple dims: boundary-forced splits interact with merge
    _roundtrip(_moving(168, 80, 4), 168, 80, qp=24)


def test_b_frames_pyramid():
    # x265 adaptive B placement + pyramid -> POC reorder through the DPB
    _roundtrip(_moving(96, 96, 9), 96, 96, extra="bframes=3")


def test_b_frames_no_pyramid():
    _roundtrip(_moving(96, 96, 8), 96, 96, extra="bframes=2:b-pyramid=0")


def test_amp_partitions():
    # asymmetric motion partitions + rect partitions at high quality
    _roundtrip(_moving(128, 128, 5), 128, 128, qp=17,
               extra="amp=1:rect=1")


def test_weighted_p_fade():
    _roundtrip(_fade(96, 96, 8), 96, 96, qp=28, extra="weightp=1")


def test_weighted_b_fade():
    _roundtrip(_fade(96, 96, 8), 96, 96, qp=28,
               extra="bframes=3:weightp=1:weightb=1")


def test_multiple_references():
    _roundtrip(_moving(96, 96, 8), 96, 96, qp=30, extra="ref=4")


def test_two_gops_idr_reset():
    # second IDR flushes the DPB + resets POC
    _roundtrip(_moving(96, 96, 8), 96, 96, gop=4, extra="bframes=2")


def test_qp_sweep_inter():
    for qp in (17, 37):
        _roundtrip(_moving(96, 96, 4, seed=qp), 96, 96, qp=qp,
                   extra="bframes=2")


def test_wpp_inter():
    # multiple CTU rows -> WPP substreams on P/B slices
    _roundtrip(_moving(192, 192, 5), 192, 192, qp=27, extra="bframes=2")
