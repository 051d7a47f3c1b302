"""Session API tests, mirroring the reference test apps' flows
(test_intel_dec.cpp:78-105 decode loop; test_intel_enc.cpp:83-110 encode loop)."""

import numpy as np
import pytest

from jmcodec_tpu.api.session import (Codec, DecoderSession, EncoderParams,
                                     EncoderSession, PixFmt, repack)
from jmcodec_tpu.codec.h264.refenc import encode_stream

from util_oracle import have_oracle, make_frame, oracle_decode, psnr


def test_decode_session_streaming_loop():
    """Feed a stream in small chunks with backpressure, like the reference's
    read-loop; collect frames in display order; drain at EOF."""
    W = H = 64
    frames = [make_frame(W, H, seed=i) for i in range(4)]
    stream, recons = encode_stream(frames, W, H, qp=28)
    dec = DecoderSession(Codec.H264, PixFmt.I420)
    got = []
    pos = 0
    while not dec.is_exit():
        if dec.need_more_data() and pos < len(stream):
            take = dec.input_data(stream[pos:pos + 777])
            pos += take
        if pos >= len(stream):
            dec.set_eof()
        fr = dec.get_frame()
        if fr is not None:
            got.append(fr)
    assert len(got) == 4
    for (g, r) in zip(got, recons):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b)
    assert dec.get_stream_info() == (W, H)
    assert "fps=" in dec.info()


def test_decode_session_output_formats():
    W = H = 32
    frames = [make_frame(W, H, seed=1)]
    stream, recons = encode_stream(frames, W, H, qp=28)
    for fmt in (PixFmt.I420, PixFmt.NV12, PixFmt.YV12):
        dec = DecoderSession(out_fmt=fmt)
        dec.input_data(stream)
        dec.set_eof()
        raw = dec.output_frame()
        assert raw is not None and len(raw) == W * H * 3 // 2
        assert raw == repack(*recons[0], fmt)


def test_decode_session_yuv_callback():
    W = H = 32
    stream, recons = encode_stream([make_frame(W, H, seed=2)], W, H, qp=30)
    seen = []
    dec = DecoderSession()
    dec.set_yuv_callback(lambda Y, U, V: seen.append(Y.shape))
    dec.input_data(stream)
    dec.set_eof()
    dec.output_frame()
    assert seen == [(H, W)]


def test_encode_session_loop_and_spspps():
    p = EncoderParams(width=64, height=48, qp=30, gop_len=1)
    enc = EncoderSession(p)
    src = [make_frame(64, 48, seed=i) for i in range(3)]
    out = b""
    keyframes = 0
    for fr in src:
        assert enc.more_data()
        enc.encode_frame(fr)
        while True:
            pkt = enc.output_bitstream()
            if pkt is None:
                break
            data, key = pkt
            out += data
            keyframes += key
    enc.set_eof()
    assert enc.is_exit()
    assert keyframes == 3
    sps, pps = enc.get_spspps()
    assert sps.startswith(b"\x00\x00\x00\x01") and (sps[4] & 0x1F) == 7
    assert (pps[4] & 0x1F) == 8
    # stream must decode (self-consistency)
    dec = DecoderSession()
    dec.input_data(out)
    dec.set_eof()
    n = 0
    while True:
        fr = dec.get_frame()
        if fr is None:
            break
        assert psnr(fr[0], src[n][0]) > 28
        n += 1
    assert n == 3


def test_encoder_bitrate_to_qp_mapping():
    # higher bitrate -> lower QP
    q_low = EncoderParams(bitrate_kb=500).effective_qp()
    q_high = EncoderParams(bitrate_kb=8000).effective_qp()
    assert q_high < q_low


def test_encode_session_nv12_input():
    p = EncoderParams(width=32, height=32, qp=28)
    enc = EncoderSession(p)
    Y, U, V = make_frame(32, 32, seed=3)
    packed = repack(Y, U, V, PixFmt.NV12)
    enc.encode_frame(packed, PixFmt.NV12)
    data, key = enc.output_bitstream()
    assert key
    dec = DecoderSession()
    dec.input_data(data)
    dec.set_eof()
    fr = dec.get_frame()
    np.testing.assert_array_equal(fr[1].shape, U.shape)


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
def test_encode_session_stream_is_conformant():
    p = EncoderParams(width=64, height=64, qp=26)
    enc = EncoderSession(p)
    enc.encode_frame(make_frame(64, 64, seed=5))
    data, _ = enc.output_bitstream()
    frames, w, h = oracle_decode(data)
    assert (w, h) == (64, 64) and len(frames) == 1


@pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")
def test_decode_session_chunked_ip_stream():
    """ADVICE r1 #1 repro: an I+P x264 stream fed in streaming chunks must
    decode bit-exactly — the device fast path decodes the IDR, then the P
    pictures fall back to the host path whose DPB must have been primed with
    the device-decoded reference."""
    from util_oracle import oracle_encode
    W, H = 64, 48
    frames = [make_frame(W, H, seed=i) for i in range(5)]
    stream = oracle_encode(frames, W, H, qp=30, gop=5)  # IDR + 4 P
    ref_frames, _, _ = oracle_decode(stream)
    dec = DecoderSession(Codec.H264, PixFmt.I420)
    got = []
    pos = 0
    while not dec.is_exit():
        if dec.need_more_data() and pos < len(stream):
            pos += dec.input_data(stream[pos:pos + 101])
        if pos >= len(stream):
            dec.set_eof()
        fr = dec.get_frame()
        if fr is not None:
            got.append(fr)
    assert len(got) == len(ref_frames)
    for (g, r) in zip(got, ref_frames):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")
def test_decode_session_multi_picture_chunk_with_pcm_fallback():
    """ADVICE r1 #2: a chunk holding several pictures where a later one needs
    the host path must not duplicate earlier frames."""
    from util_oracle import oracle_encode
    W, H = 48, 48
    frames = [make_frame(W, H, seed=i, kind="noise") for i in range(3)]
    # qp=0 noise makes x264 pick I_PCM macroblocks on some MBs
    stream = oracle_encode(frames, W, H, qp=0, gop=1)
    ref_frames, _, _ = oracle_decode(stream)
    dec = DecoderSession(Codec.H264, PixFmt.I420)
    dec.input_data(stream)
    dec.set_eof()
    got = []
    while True:
        fr = dec.get_frame()
        if fr is None:
            break
        got.append(fr)
    assert len(got) == len(ref_frames)
    for (g, r) in zip(got, ref_frames):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")
def test_decode_session_hevc_streaming():
    """HEVC through the streaming session API (host recon path), chunked
    feed, bit-exact vs libavcodec."""
    from util_oracle import oracle_encode
    W, H = 128, 64
    frames = [make_frame(W, H, seed=i) for i in range(3)]
    stream = oracle_encode(frames, W, H, qp=30, codec="libx265", gop=1)
    want, _, _ = oracle_decode(stream, suffix=".h265")
    dec = DecoderSession(Codec.HEVC, PixFmt.I420)
    got = []
    pos = 0
    while not dec.is_exit():
        if dec.need_more_data() and pos < len(stream):
            pos += dec.input_data(stream[pos:pos + 999])
        if pos >= len(stream):
            dec.set_eof()
        fr = dec.get_frame()
        if fr is not None:
            got.append(fr)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            np.testing.assert_array_equal(a, b)
    assert dec.get_stream_info() == (W, H)
