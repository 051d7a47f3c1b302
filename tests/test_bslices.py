"""B-slice conformance: x264 B-frame streams decode bit-exactly vs libavcodec
in display order — CAVLC and CABAC, spatial and temporal direct, b-pyramid
(MMCO + ref list modification), implicit weighted bipred, multi-ref,
sub-partitions, High profile 8x8.

Capability parity: B-frames + display-order reordering were the vendor
parser/silicon's job in the reference (nv_enc/nv_enc.cpp:527-528
frameIntervalP; nv_dec/nv_dec.cpp:44-52,113-186 display-order queue).
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")

W, H = 64, 48


def check(extra, qp=30, n=10, gop=10):
    frames = [make_frame(W, H, seed=i) for i in range(n)]
    stream = oracle_encode(frames, W, H, qp=qp, gop=gop, extra=extra)
    ref, _, _ = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    out = dec.decode_annexb(stream)
    out += dec.flush()
    sps = list(dec.sps.values())[0]
    assert len(out) == len(ref)
    for fr, rf in zip(out, ref):
        for a, b in zip(fr.crop(sps), rf):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("entropy", ["cabac=0", "cabac=1"])
@pytest.mark.parametrize("direct", ["spatial", "temporal"])
def test_b_direct_modes(entropy, direct):
    check(f"{entropy}:bframes=3:direct={direct}")


@pytest.mark.parametrize("entropy", ["cabac=0", "cabac=1"])
def test_b_pyramid_mmco(entropy):
    # b-pyramid (default) exercises MMCO + ref list modification + B-refs
    check(f"{entropy}:bframes=3")


@pytest.mark.parametrize("qp", [20, 32, 44])
def test_b_qp_sweep(qp):
    check("cabac=1:8x8dct=1:bframes=3", qp=qp)


def test_b_full_toolset():
    check("cabac=1:8x8dct=1:bframes=3:ref=3:partitions=all:subme=7")
    check("cabac=0:bframes=3:ref=3:partitions=all:subme=7")


def test_b_no_weighting():
    check("cabac=1:bframes=3:weightb=0")


def test_b_long_run():
    check("cabac=1:bframes=5")


def test_b_multi_gop():
    check("cabac=1:8x8dct=1:bframes=3:keyint=5:min-keyint=5", n=12, gop=5)


def test_b_through_session_display_order():
    """Streaming session emits B streams in display order with EOF drain."""
    from jmcodec_tpu.api.session import DecoderSession
    frames = [make_frame(W, H, seed=i) for i in range(8)]
    stream = oracle_encode(frames, W, H, qp=30, gop=8,
                           extra="cabac=1:8x8dct=1:bframes=3")
    ref, _, _ = oracle_decode(stream)
    dec = DecoderSession()
    got = []
    pos = 0
    while not dec.is_exit():
        if dec.need_more_data() and pos < len(stream):
            pos += dec.input_data(stream[pos:pos + 499])
        if pos >= len(stream):
            dec.set_eof()
        fr = dec.get_frame()
        if fr is not None:
            got.append(fr)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
