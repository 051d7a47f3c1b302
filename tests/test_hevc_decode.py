"""HEVC all-intra decode conformance: bit-exact vs libavcodec on x265
streams (deblock + SAO + WPP active, x265 defaults).

Capability match: the reference's HEVC decode plugin
(intel_dec/intel_dec.cpp:722-741, nv_dec/nv_dec.h:37-46); here the full
codec math is in-tree (SURVEY §7.4 hard part #2).
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _roundtrip(frames, w, h, qp=30, gop=1):
    stream = oracle_encode(frames, w, h, qp=qp, codec="libx265", gop=gop)
    want, W, H = oracle_decode(stream, suffix=".h265")
    got = HevcRefDecoder().decode(stream)
    assert len(got) == len(want) == len(frames)
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(got, want)):
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu), f"frame {i} cb mismatch"
        assert np.array_equal(gv, wv), f"frame {i} cr mismatch"


def test_flat_single_ctu():
    _roundtrip([make_frame(64, 64, kind="flat")], 64, 64)


def test_gradient_noise_single_ctu():
    _roundtrip([make_frame(64, 64, seed=i) for i in range(3)], 64, 64)


def test_noise_high_qp():
    _roundtrip([make_frame(64, 64, seed=7, kind="noise")], 64, 64, qp=45)


def test_noise_low_qp():
    _roundtrip([make_frame(64, 64, seed=8, kind="noise")], 64, 64, qp=12)


def test_edges_content():
    _roundtrip([make_frame(128, 64, seed=3, kind="edges")], 128, 64, qp=27)


def test_multi_ctu_rows_wpp():
    # 3 CTU rows -> WPP substreams + entry points + context sync
    _roundtrip([make_frame(176, 144, seed=i) for i in range(2)], 176, 144)


def test_partial_ctus():
    # dimensions not a CTU multiple: forced quadtree boundary splits
    _roundtrip([make_frame(168, 80, seed=4)], 168, 80, qp=24)


def test_larger_frame_qp_sweep():
    for qp in (17, 34, 51):
        _roundtrip([make_frame(352, 288, seed=qp)], 352, 288, qp=qp)


def test_streaming_two_frames_display_order():
    # all-intra: decode order == display order; two IDRs in one stream
    _roundtrip([make_frame(96, 96, seed=11), make_frame(96, 96, seed=12)],
               96, 96, qp=30)
