"""HEVC P-frame encoding (VERDICT r4: HEVC inter encode): IDR + P GOPs with
merge/skip/AMVP 2Nx2N CUs, single reference. Gates: libavcodec decodes the
stream bit-exactly to the encoder's own recon, OUR decoder (incl. the
native inter parser) agrees, and P frames beat all-intra on bytes."""

import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _pan(W, H, n, seed=3):
    base = make_frame(W + 32, H + 32, seed=seed)
    out = []
    for i in range(n):
        dy, dx = (i * 2) % 32, (i * 3) % 32
        out.append((base[0][dy:dy + H, dx:dx + W],
                    base[1][dy // 2:dy // 2 + H // 2,
                            dx // 2:dx // 2 + W // 2],
                    base[2][dy // 2:dy // 2 + H // 2,
                            dx // 2:dx // 2 + W // 2]))
    return out


def _encode(frames, W, H, qp=30, gop=8):
    from jmcodec_tpu.codec.hevc.refenc import HevcEncoder
    enc = HevcEncoder(W, H, qp=qp, gop_len=gop)
    out = enc.headers_annexb()
    recs = []
    for (Y, U, V) in frames:
        out += enc.encode_frame(Y, U, V)
        recs.append(enc.last_recon)
    return out, recs


def _check(frames, W, H, qp=30, gop=8):
    from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder
    stream, recs = _encode(frames, W, H, qp=qp, gop=gop)
    want, _, _ = oracle_decode(stream, suffix=".h265")
    assert len(want) == len(frames)
    for i, (wy, wu, wv) in enumerate(want):
        assert np.array_equal(wy, recs[i][0]), f"frame {i} luma (libav)"
        assert np.array_equal(wu, recs[i][1]), f"frame {i} cb (libav)"
        assert np.array_equal(wv, recs[i][2]), f"frame {i} cr (libav)"
    ours = HevcRefDecoder().decode(stream)
    assert len(ours) == len(frames)
    for i, (gy, gu, gv) in enumerate(ours):
        assert np.array_equal(np.asarray(gy), recs[i][0]), f"our dec {i}"
    return stream


def test_hevc_p_roundtrip():
    _check(_pan(96, 80, 6), 96, 80)


def test_hevc_p_idr_boundary_and_crop():
    _check(_pan(100, 60, 7), 100, 60, qp=28, gop=3)


def test_hevc_p_qp_sweep():
    frames = _pan(64, 64, 4, seed=9)
    for qp in (20, 37):
        _check(frames, 64, 64, qp=qp)


def test_hevc_p_beats_intra_on_pan():
    frames = _pan(96, 96, 8)
    p_stream, _ = _encode(frames, 96, 96, qp=32, gop=8)
    i_stream, _ = _encode(frames, 96, 96, qp=32, gop=1)
    assert len(p_stream) < 0.7 * len(i_stream), \
        (len(p_stream), len(i_stream))


def test_hevc_p_session():
    from jmcodec_tpu.api.session import (Codec, EncoderParams,
                                         EncoderSession)
    W, H = 64, 64
    frames = _pan(W, H, 5)
    sess = EncoderSession(EncoderParams(width=W, height=H, qp=30,
                                        gop_len=5, codec=Codec.HEVC))
    stream = b""
    for fr in frames:
        sess.encode_frame(tuple(np.asarray(p, np.uint8) for p in fr))
        while (pkt := sess.output_bitstream()) is not None:
            stream += pkt[0]
    want, _, _ = oracle_decode(stream, suffix=".h265")
    assert len(want) == len(frames)
    for i, (wy, _, _) in enumerate(want):
        mse = np.mean((wy.astype(float)
                       - np.asarray(frames[i][0], float)) ** 2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 27
