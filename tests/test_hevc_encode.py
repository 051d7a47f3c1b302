"""HEVC intra encoder: CABAC-coded Main-profile all-intra streams
(codec/hevc/refenc.py + cabac_enc.py).

Gates: streams decode identically through libavcodec and our reference
decoder; the encoder's internal recon is bit-exact with what a decoder
outputs (closed loop); QP sweep; non-CTB-multiple sizes via the
conformance window; session API round trip with SPS/PPS export.

Capability match: the reference's HEVC encode paths
(intel_enc/intel_enc.cpp:501-580 MFX_CODEC_HEVC; nv_enc/nv_enc.cpp:610-651
HEVC GUID) — codec math in-tree instead of vendor silicon.
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder
from jmcodec_tpu.codec.hevc.refenc import (HevcIntraEncoder,
                                           encode_stream_hevc)

from util_oracle import have_oracle, make_frame, oracle_decode, psnr

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _check(frames, W, H, qp=30):
    enc = HevcIntraEncoder(W, H, qp=qp)
    stream = enc.headers_annexb()
    recons = []
    for (Y, U, V) in frames:
        stream += enc.encode_frame(Y, U, V)
        recons.append(enc.last_recon)
    want, Wd, Hd = oracle_decode(stream, suffix=".h265")
    assert (Wd, Hd) == (W, H)
    assert len(want) == len(frames)
    ours = HevcRefDecoder(use_native=False).decode(stream)
    assert len(ours) == len(frames)
    for i in range(len(frames)):
        for a, b, r in zip(ours[i], want[i], recons[i]):
            assert np.array_equal(a, b), f"frame {i}: ours != libav"
            assert np.array_equal(r, b), f"frame {i}: encoder recon drift"
    return stream, want


def test_single_ctu_multiframe():
    _check([make_frame(64, 64, seed=i) for i in range(3)], 64, 64)


def test_qp_extremes():
    _check([make_frame(64, 64, seed=2)], 64, 64, qp=12)
    _check([make_frame(64, 64, seed=3)], 64, 64, qp=45)
    _check([make_frame(64, 64, seed=4, kind="noise")], 64, 64, qp=51)


def test_flat_content_zero_cbf():
    stream, want = _check([make_frame(64, 64, kind="flat")], 64, 64, qp=35)
    assert len(stream) < 400  # flat frame: nearly everything cbf=0


def test_multi_ctb_rows():
    _check([make_frame(176, 144, seed=5)], 176, 144, qp=27)


def test_conformance_window_crop():
    # 100x60 is not a multiple of the 16x16 CTB: coded 112x64 + crop
    _check([make_frame(100, 60, seed=6)], 100, 60, qp=24)


def test_quality_reasonable():
    frames = [make_frame(176, 144, seed=7)]
    stream = encode_stream_hevc(frames, 176, 144, qp=22)
    want, _, _ = oracle_decode(stream, suffix=".h265")
    assert psnr(want[0][0], frames[0][0]) > 36.0


def test_session_hevc_encode():
    from jmcodec_tpu.api.session import (Codec, EncoderParams,
                                         EncoderSession, PixFmt)
    frames = [make_frame(64, 64, seed=i) for i in range(2)]
    # gop_len=1 keeps this all-intra: since the HEVC P encoder landed,
    # the default GOP of 30 emits IDR + P pictures (keys = [True, False])
    sess = EncoderSession(EncoderParams(width=64, height=64, qp=30,
                                        gop_len=1, codec=Codec.HEVC))
    sps, pps = sess.get_spspps()
    assert sps and pps
    stream = b""
    keys = []
    for f in frames:
        raw = (np.asarray(f[0], np.uint8).tobytes() +
               np.asarray(f[1], np.uint8).tobytes() +
               np.asarray(f[2], np.uint8).tobytes())
        sess.encode_frame(raw, PixFmt.I420)
        while (pkt := sess.output_bitstream()) is not None:
            stream += pkt[0]
            keys.append(pkt[1])
    assert all(keys)  # all-intra: every frame is a keyframe
    want, _, _ = oracle_decode(stream, suffix=".h265")
    assert len(want) == 2
    for a, w in zip(HevcRefDecoder(use_native=False).decode(stream), want):
        for p, q in zip(a, w):
            assert np.array_equal(p, q)
