"""High profile (8x8 transform) conformance: x264 High streams decode
bit-exactly vs libavcodec — CAVLC and CABAC, intra and P.

Covers: transform_size_8x8_flag syntax (both entropy coders), CAVLC 4x4
interleaved 8x8 residual, CABAC cat5 residual, 8x8 dequant/IDCT
(ops/transform.py), intra 8x8 prediction with reference filtering
(ops/intra.py), and the deblock rules for 8x8 MBs (inner-edge suppression +
8x8 nz aggregation). Reference capability: High profile came free from the
vendor silicon (intel_dec/intel_dec.cpp:722-741, nv_dec/nv_dec.h:37-46).
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")

W, H = 64, 48


def check(frames, qp, gop, extra):
    stream = oracle_encode(frames, W, H, qp=qp, gop=gop, extra=extra,
                           profile="high")
    ref, _, _ = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    out = dec.decode_annexb(stream)
    sps = list(dec.sps.values())[0]
    assert len(out) == len(ref)
    for fr, rf in zip(out, ref):
        for a, b in zip(fr.crop(sps), rf):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("qp", [20, 30, 38, 46])
@pytest.mark.parametrize("entropy", ["8x8dct=1", "cabac=1:8x8dct=1"])
def test_high_intra(qp, entropy):
    check([make_frame(W, H, seed=0)], qp, 1, entropy)


@pytest.mark.parametrize("kind", ["flat", "edges", "noise"])
def test_high_intra_content(kind):
    check([make_frame(W, H, seed=2, kind=kind)], 36, 1, "cabac=1:8x8dct=1")


@pytest.mark.parametrize("entropy", ["8x8dct=1", "cabac=1:8x8dct=1"])
def test_high_inter(entropy):
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    check(frames, 32, 4, entropy)


def test_high_full_toolset():
    """x264 defaults-like: CABAC + 8x8 + all partitions + multi-ref."""
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    check(frames, 28, 4, "cabac=1:8x8dct=1:partitions=all:ref=3:subme=7")


def test_high_through_session():
    from jmcodec_tpu.api.session import DecoderSession
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    stream = oracle_encode(frames, W, H, qp=30, gop=4,
                           extra="cabac=1:8x8dct=1", profile="high")
    ref, _, _ = oracle_decode(stream)
    dec = DecoderSession()
    dec.input_data(stream)
    dec.set_eof()
    got = []
    while True:
        fr = dec.get_frame()
        if fr is None:
            break
        got.append(fr)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
