"""CABAC entropy decoding conformance: x264 CABAC streams (Main profile,
4x4 transform) must decode bit-exactly vs libavcodec through the host
reference decoder.

Capability parity: the reference gets CABAC from the vendor parser/ASIC
(nv_dec/nv_dec.cpp:278-366,394); here it is jmcodec_tpu/codec/h264/cabac.py
(SURVEY §7.4 hard part #1). These tests also revalidate the spec tables
recovered by native/gen_cabac_tables.py end-to-end.
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")

W, H = 64, 48


def check(frames, qp, gop, extra="cabac=1", w=W, h=H):
    stream = oracle_encode(frames, w, h, qp=qp, gop=gop, extra=extra,
                           profile="main")
    ref, _, _ = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    out = dec.decode_annexb(stream)
    sps = list(dec.sps.values())[0]
    assert len(out) == len(ref)
    for fr, rf in zip(out, ref):
        for a, b in zip(fr.crop(sps), rf):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("qp", [16, 24, 30, 36, 42, 48, 51])
def test_cabac_intra_qp_sweep(qp):
    check([make_frame(W, H, seed=0)], qp, gop=1)


@pytest.mark.parametrize("kind", ["flat", "edges", "noise", "gradient_noise"])
def test_cabac_intra_content(kind):
    check([make_frame(W, H, seed=2, kind=kind)], 34, gop=1)


@pytest.mark.parametrize("qp", [22, 30, 38, 46])
def test_cabac_inter_qp_sweep(qp):
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    check(frames, qp, gop=4)


def test_cabac_multi_ref():
    frames = [make_frame(W, H, seed=i) for i in range(5)]
    check(frames, 30, gop=5, extra="cabac=1:ref=3")


def test_cabac_partitions_and_subpel():
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    check(frames, 28, gop=4, extra="cabac=1:partitions=all:subme=7:me=umh")


def test_cabac_ipcm():
    # qp=0 noise forces I_PCM macroblocks (raw bytes + engine re-init,
    # spec 9.3.1)
    check([make_frame(W, H, seed=3, kind="noise")], 0, gop=1)
    frames = [make_frame(W, H, seed=i, kind="noise") for i in range(3)]
    check(frames, 0, gop=3)


def test_cabac_multi_slice():
    check([make_frame(W, H, seed=1)], 30, gop=1, extra="cabac=1:slices=3")
    frames = [make_frame(W, H, seed=i) for i in range(3)]
    check(frames, 30, gop=3, extra="cabac=1:slices=3")


def test_cabac_through_session():
    """CABAC streams decode through the streaming DecoderSession (host
    fallback path until the native CABAC parser lands)."""
    from jmcodec_tpu.api.session import DecoderSession
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    stream = oracle_encode(frames, W, H, qp=30, gop=4, extra="cabac=1",
                           profile="main")
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
