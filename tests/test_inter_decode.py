"""P-slice decode conformance: our reference decoder vs libavcodec golden on
x264 streams with real motion (MC, MV prediction, P_Skip, multi-ref,
sub-partitions, inter deblocking)."""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(), reason="no oracle")


def moving_frames(W, H, n, seed=3, step=(3, 2), kind="gradient_noise"):
    base = make_frame(W + 64, H + 64, seed=seed, kind=kind)
    out = []
    for i in range(n):
        dy, dx = i * step[0], i * step[1]
        Y = base[0][dy:dy + H, dx:dx + W]
        U = base[1][dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2]
        V = base[2][dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2]
        out.append((Y.copy(), U.copy(), V.copy()))
    return out


def check(stream):
    golden, _, _ = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    ours = dec.decode_annexb(stream)
    assert len(ours) == len(golden)
    sps = list(dec.sps.values())[0]
    for i, fr in enumerate(ours):
        for name, a, b in zip("YUV", fr.crop(sps), golden[i]):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {name}")
    return len(golden)


@pytest.mark.parametrize("qp", [22, 28, 36])
def test_p_frames_basic(qp):
    frames = moving_frames(64, 64, 5)
    stream = oracle_encode(frames, 64, 64, qp=qp, gop=5)
    assert check(stream) == 5


def test_p_frames_multiple_gops():
    frames = moving_frames(64, 48, 8, step=(2, 5))
    stream = oracle_encode(frames, 64, 48, qp=30, gop=4)
    assert check(stream) == 8


def test_p_frames_larger_picture_fast_preset():
    frames = moving_frames(176, 144, 4, step=(4, 7))
    stream = oracle_encode(frames, 176, 144, qp=26, gop=4, preset="veryslow")
    assert check(stream) == 4


def test_p_frames_static_content_skips():
    # identical frames -> mostly P_Skip macroblocks
    f = make_frame(64, 64, seed=9)
    stream = oracle_encode([f] * 4, 64, 64, qp=30, gop=4)
    assert check(stream) == 4


def test_p_frames_noise_high_motion():
    frames = moving_frames(96, 96, 4, step=(9, 13), kind="noise")
    stream = oracle_encode(frames, 96, 96, qp=24, gop=4)
    assert check(stream) == 4


@pytest.mark.parametrize("slices", [2, 4])
def test_multislice_frames(slices):
    """Multiple slices per picture: nC/intra-pred availability must reset at
    slice boundaries (both I and P frames)."""
    frames = moving_frames(96, 96, 3, step=(2, 3))
    stream = oracle_encode(frames, 96, 96, qp=28, gop=3,
                           extra=f"slices={slices}")
    assert check(stream) == 3


def test_multislice_intra_only():
    frames = [make_frame(128, 96, seed=2, kind="edges")]
    stream = oracle_encode(frames, 128, 96, qp=26, gop=1, extra="slices=3")
    assert check(stream) == 1
