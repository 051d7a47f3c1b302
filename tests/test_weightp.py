"""H.264 explicit weighted prediction (pred_weight_table, 7.3.3.2 +
8.4.2.3.2), host reference decoder AND the device fast path, bit-exact vs
libavcodec on x264 fade streams.

The reference's driver parser handles weighted streams transparently
(nv_dec/nv_dec.cpp:394 cuvidParseVideoData); x264 enables weightp by
default, so a typical real-world H.264 file depends on this path.
"""

import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _fade(W, H, n, seed=0, rise=True):
    """Fade-in (or out) sequence: the content that makes x264 emit real
    (non-identity) luma weights."""
    base = make_frame(W, H, seed=seed)
    out = []
    for i in range(n):
        s = (i + 1) / n if rise else 1.0 - i / n
        y = np.clip(base[0].astype(np.float32) * s, 0, 255).astype(np.uint8)
        u = np.clip((base[1].astype(np.float32) - 128) * s + 128,
                    0, 255).astype(np.uint8)
        v = np.clip((base[2].astype(np.float32) - 128) * s + 128,
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _host_roundtrip(frames, W, H, qp=28, extra="weightp=2", profile=None):
    from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

    stream = oracle_encode(frames, W, H, qp=qp, gop=len(frames),
                           extra=extra, profile=profile)
    want, _, _ = oracle_decode(stream)
    dec = H264ReferenceDecoder()
    got = dec.decode_annexb(stream) + dec.flush()
    assert len(got) == len(want)
    n_weighted = 0
    for i, (fr, (wy, wu, wv)) in enumerate(zip(got, want)):
        sps = list(dec.sps.values())[0]
        gy, gu, gv = fr.crop(sps)
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu), f"frame {i} cb mismatch"
        assert np.array_equal(gv, wv), f"frame {i} cr mismatch"
    return stream


def _stream_has_wp(stream):
    """True if any slice of the stream carries a pred_weight_table."""
    from jmcodec_tpu.codec.h264 import nal
    from jmcodec_tpu.codec.h264.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.h264.slicehdr import parse_slice_header
    sps, pps = {}, {}
    found = False
    for u in nal.parse_nal_units(stream):
        if u.nal_unit_type == nal.NAL_SPS:
            s = parse_sps(u.rbsp)
            sps[s.seq_parameter_set_id] = s
        elif u.nal_unit_type == nal.NAL_PPS:
            p = parse_pps(u.rbsp)
            pps[p.pic_parameter_set_id] = p
        elif u.is_slice:
            from jmcodec_tpu.utils.bits import BitReader
            r = BitReader(u.rbsp)
            r.ue()
            r.ue()
            pp = pps[r.ue()]
            h, _ = parse_slice_header(u.rbsp, sps[pp.seq_parameter_set_id],
                                      pp, u.nal_unit_type, u.nal_ref_idc)
            if h.weights_l0 is not None:
                found = True
    return found


def test_weightp_fade_host():
    stream = _host_roundtrip(_fade(96, 96, 6), 96, 96)
    assert _stream_has_wp(stream), "x264 emitted no weights on a fade?"


def test_weightp_fade_out_multi_ref():
    _host_roundtrip(_fade(96, 96, 6, seed=2, rise=False), 96, 96,
                    extra="weightp=2:ref=3")


def test_weightp_cabac_bframes():
    """weightb explicit bipred (weighted_bipred_idc==1) + CABAC."""
    _host_roundtrip(_fade(96, 96, 8, seed=1), 96, 96,
                    extra="cabac=1:bframes=2:weightp=2:weightb=1")


def test_weightp_session_device_path():
    """x264 default-flag fade stream decodes through DecoderSession with
    zero dropped pictures (device fast path applies the weights)."""
    from jmcodec_tpu.api.session import Codec, DecoderSession
    from jmcodec_tpu.utils.metrics import counters

    frames = _fade(96, 96, 6, seed=3)
    stream = oracle_encode(frames, 96, 96, qp=28, gop=len(frames),
                           extra="weightp=2")
    assert _stream_has_wp(stream)
    want, _, _ = oracle_decode(stream)
    before = counters.get("frames_device")
    sess = DecoderSession(codec=Codec.H264)
    got = []
    pos = 0
    while pos < len(stream):
        take = sess.input_data(stream[pos:pos + 4096])
        pos += take
        while (fr := sess.get_frame()) is not None:
            got.append(fr)
    sess.set_eof()
    while (fr := sess.get_frame()) is not None:
        got.append(fr)
    assert len(got) == len(want), "dropped pictures on a weighted stream"
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(got, want)):
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu) and np.array_equal(gv, wv), i
    assert counters.get("frames_device") - before == len(want), \
        "weighted P pictures fell off the device fast path"
