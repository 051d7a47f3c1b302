"""B-frame encoding (frameIntervalP parity, nv_enc/nv_enc.cpp:527-528):
IBBP groups with display reorder, spatial direct + B_Skip, bipred.

Gates: streams decode bit-exactly in libavcodec AND in our own decoder
(display order), B_Skip/direct actually fire, bytes improve vs P-only on
coherent content, and the EncoderSession path round-trips with reorder.
"""

import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _pan_frames(W, H, n, seed=3):
    """Panning crop of a bigger frame: coherent motion, B-friendly."""
    base = make_frame(W + 64, H + 64, seed=seed)
    out = []
    for i in range(n):
        dy, dx = (i * 3) % 64, (i * 5) % 64
        out.append((base[0][dy:dy + H, dx:dx + W],
                    base[1][dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2],
                    base[2][dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2]))
    return out


def _encode(frames, W, H, qp=28, num_bframe=2, gop=30):
    from jmcodec_tpu.codec.h264.refenc import (EncoderConfig,
                                               H264ReferenceEncoder)
    enc = H264ReferenceEncoder(EncoderConfig(W, H, qp=qp, gop_len=gop,
                                             num_bframe=num_bframe))
    out = enc.headers_annexb()
    for (Y, U, V) in frames:
        out += enc.encode_frame(np.asarray(Y, np.int32),
                                np.asarray(U, np.int32),
                                np.asarray(V, np.int32))
    out += enc.flush()
    return out


def _check_stream(stream, frames, W, H, min_psnr=28.0):
    from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

    want, _, _ = oracle_decode(stream)
    assert len(want) == len(frames)
    dec = H264ReferenceDecoder()
    ours = dec.decode_annexb(stream) + dec.flush()
    sps = list(dec.sps.values())[0]
    assert len(ours) == len(want)
    for i, (fr, (wy, wu, wv)) in enumerate(zip(ours, want)):
        gy, gu, gv = fr.crop(sps)
        assert np.array_equal(gy, wy), f"frame {i} luma vs libavcodec"
        assert np.array_equal(gu, wu) and np.array_equal(gv, wv), i
    for i, (wy, _, _) in enumerate(want):
        mse = np.mean((wy.astype(float)
                       - np.asarray(frames[i][0], float)) ** 2)
        psnr = 10 * np.log10(255 * 255 / max(mse, 1e-9))
        assert psnr > min_psnr, f"frame {i} psnr {psnr:.1f}"


def test_b_stream_bit_exact_and_sane():
    W, H = 96, 80
    frames = [make_frame(W, H, seed=i) for i in range(8)]
    _check_stream(_encode(frames, W, H), frames, W, H)


def test_b_group_flush_partial():
    """EOF mid-group: trailing frames become a P anchor."""
    W, H = 64, 64
    for n in (2, 3, 4, 6):
        frames = [make_frame(W, H, seed=i) for i in range(n)]
        _check_stream(_encode(frames, W, H, num_bframe=2), frames, W, H)


def test_b_with_idr_boundary():
    """Closed GOPs: B groups never cross the IDR."""
    W, H = 64, 64
    frames = [make_frame(W, H, seed=i) for i in range(9)]
    _check_stream(_encode(frames, W, H, num_bframe=2, gop=4), frames, W, H)


def test_b_improves_bytes_on_pan():
    W, H = 96, 96
    frames = _pan_frames(W, H, 9)
    b = _encode(frames, W, H, qp=30, num_bframe=2)
    p = _encode(frames, W, H, qp=30, num_bframe=0)
    _check_stream(b, frames, W, H, min_psnr=27.0)
    assert len(b) < len(p), f"B stream {len(b)}B not smaller than P {len(p)}B"


def test_b_skip_and_direct_fire():
    """Static content must produce B_Skip / direct MBs (cheap bits)."""
    from jmcodec_tpu.codec.h264 import nal
    from jmcodec_tpu.codec.h264.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.h264.slicehdr import SLICE_B, parse_slice_header
    W, H = 64, 64
    still = make_frame(W, H, seed=5)
    frames = [still] * 6
    s = _encode(frames, W, H, qp=30)
    _check_stream(s, frames, W, H, min_psnr=30.0)
    # B slices on a still scene should be tiny (skip runs)
    sps = pps = None
    b_sizes = []
    for u in nal.parse_nal_units(s):
        if u.nal_unit_type == nal.NAL_SPS:
            sps = parse_sps(u.rbsp)
        elif u.nal_unit_type == nal.NAL_PPS:
            pps = parse_pps(u.rbsp)
        elif u.is_slice:
            h, _ = parse_slice_header(u.rbsp, sps, pps, u.nal_unit_type,
                                      u.nal_ref_idc)
            if h.slice_type == SLICE_B:
                b_sizes.append(len(u.rbsp))
    assert b_sizes and max(b_sizes) < 64, b_sizes


def test_b_session_roundtrip():
    from jmcodec_tpu.api.session import EncoderParams, EncoderSession

    W, H = 64, 64
    frames = [make_frame(W, H, seed=i) for i in range(7)]
    sess = EncoderSession(EncoderParams(width=W, height=H, qp=30,
                                        gop_len=30, num_bframe=2,
                                        engine="host"))
    stream = b""
    for fr in frames:
        sess.encode_frame(fr)
        while (pkt := sess.output_bitstream()) is not None:
            stream += pkt[0]
    sess.set_eof()
    while (pkt := sess.output_bitstream()) is not None:
        stream += pkt[0]
    assert sess.is_exit()
    want, _, _ = oracle_decode(stream)
    assert len(want) == len(frames)
    for i, (wy, _, _) in enumerate(want):
        mse = np.mean((wy.astype(float)
                       - np.asarray(frames[i][0], float)) ** 2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 28
