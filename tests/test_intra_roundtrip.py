"""End-to-end intra codec tests.

Three independent seals:
 1. self round-trip: our encoder's stream -> our decoder == encoder recon
 2. conformance out: our stream -> libavcodec decode == our recon (bit-exact)
 3. conformance in:  x264 stream -> our decoder == libavcodec decode
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder
from jmcodec_tpu.codec.h264.refenc import EncoderConfig, H264ReferenceEncoder, encode_stream

from util_oracle import (have_oracle, make_frame, oracle_decode,
                         oracle_encode, psnr)

HAVE_ORACLE = have_oracle()
needs_oracle = pytest.mark.skipif(not HAVE_ORACLE, reason="no libavcodec oracle")


def self_roundtrip(W, H, qp, kind, disable_deblock=False, nframes=1):
    frames = [make_frame(W, H, seed=i, kind=kind) for i in range(nframes)]
    stream, recons = encode_stream(frames, W, H, qp=qp,
                                   disable_deblock=disable_deblock)
    dec = H264ReferenceDecoder()
    out = dec.decode_annexb(stream)
    assert len(out) == nframes
    sps = list(dec.sps.values())[0]
    for i, fr in enumerate(out):
        Yd, Ud, Vd = fr.crop(sps)
        Ye, Ue, Ve = recons[i]
        np.testing.assert_array_equal(Yd, Ye, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(Ud, Ue, err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(Vd, Ve, err_msg=f"frame {i} cr")
        # sanity: recon tracks source (bound loose at high QP / noisy content)
        assert psnr(Ye, frames[i][0]) > (28 if qp <= 32 else 20)
    return stream, recons, frames


@pytest.mark.parametrize("qp", [12, 24, 30, 40])
def test_self_roundtrip_qp(qp):
    self_roundtrip(64, 64, qp, "gradient_noise")


@pytest.mark.parametrize("kind", ["flat", "noise", "edges"])
def test_self_roundtrip_content(kind):
    self_roundtrip(64, 64, 28, kind)


def test_self_roundtrip_nondivisible_size():
    # exercises frame cropping (SURVEY: crop-aware repack intel_dec.cpp:244-332)
    self_roundtrip(68, 52, 30, "gradient_noise")


def test_self_roundtrip_no_deblock():
    self_roundtrip(64, 64, 30, "edges", disable_deblock=True)


def test_self_roundtrip_multiframe():
    self_roundtrip(48, 48, 30, "gradient_noise", nframes=3)


@needs_oracle
@pytest.mark.parametrize("qp,kind", [(24, "gradient_noise"), (32, "edges"),
                                     (28, "noise"), (36, "flat")])
def test_conformance_our_stream_ffmpeg_decode(qp, kind):
    """libavcodec must decode our stream to exactly our reconstruction."""
    W = H = 64
    frames = [make_frame(W, H, seed=3, kind=kind)]
    stream, recons = encode_stream(frames, W, H, qp=qp)
    got, gw, gh = oracle_decode(stream)
    assert (gw, gh) == (W, H)
    assert len(got) == 1
    for (a, b) in zip(got[0], recons[0]):
        np.testing.assert_array_equal(a, b)


@needs_oracle
def test_conformance_our_stream_deblock_off():
    W = H = 64
    frames = [make_frame(W, H, seed=5, kind="edges")]
    stream, recons = encode_stream(frames, W, H, qp=30, disable_deblock=True)
    got, _, _ = oracle_decode(stream)
    for (a, b) in zip(got[0], recons[0]):
        np.testing.assert_array_equal(a, b)


@needs_oracle
@pytest.mark.parametrize("qp", [22, 30, 38])
def test_conformance_x264_stream_our_decode(qp):
    """Our decoder must match libavcodec bit-exactly on an x264 stream."""
    W, H = 64, 48
    frames = [make_frame(W, H, seed=9, kind="gradient_noise"),
              make_frame(W, H, seed=10, kind="edges")]
    stream = oracle_encode(frames, W, H, qp=qp, gop=1)
    golden, gw, gh = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    ours = dec.decode_annexb(stream)
    assert len(ours) == len(golden)
    sps = list(dec.sps.values())[0]
    for i, fr in enumerate(ours):
        for a, b in zip(fr.crop(sps), golden[i]):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


@needs_oracle
def test_conformance_x264_larger_picture():
    W, H = 176, 144  # QCIF
    frames = [make_frame(W, H, seed=1, kind="gradient_noise")]
    stream = oracle_encode(frames, W, H, qp=28, gop=1)
    golden, _, _ = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    ours = dec.decode_annexb(stream)
    sps = list(dec.sps.values())[0]
    for a, b in zip(ours[0].crop(sps), golden[0]):
        np.testing.assert_array_equal(a, b)
