"""Native (C++) H.264 CABAC slice parser: the production fast path for
High-profile-style CABAC streams (reference analog: the hardware CABAC
engine behind nv_dec/nv_dec.cpp:394 cuvidParseVideoData).

Checks the session decodes x264 CABAC streams bit-exactly vs libavcodec
with every picture on the DEVICE path (no host fallback), plus plane-level
equality of the native parse vs the validated Python CABAC decoder.
"""

import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _session_roundtrip(stream, expect_device):
    from jmcodec_tpu.api.session import Codec, DecoderSession
    from jmcodec_tpu.utils.metrics import counters

    want, _, _ = oracle_decode(stream)
    before = counters.get("frames_device")
    sess = DecoderSession(codec=Codec.H264)
    got = []
    pos = 0
    while pos < len(stream):
        take = sess.input_data(stream[pos:pos + 8192])
        pos += take
        while (fr := sess.get_frame()) is not None:
            got.append(fr)
    sess.set_eof()
    while (fr := sess.get_frame()) is not None:
        got.append(fr)
    assert len(got) == len(want)
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(got, want)):
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu) and np.array_equal(gv, wv), i
    if expect_device:
        assert counters.get("frames_device") - before == len(want), \
            "CABAC pictures fell off the device fast path"


def test_cabac_intra_session():
    frames = [make_frame(96, 80, seed=i) for i in range(3)]
    s = oracle_encode(frames, 96, 80, qp=28, gop=1, extra="cabac=1")
    _session_roundtrip(s, expect_device=True)


def test_cabac_ipp_session():
    frames = [make_frame(96, 80, seed=i) for i in range(5)]
    s = oracle_encode(frames, 96, 80, qp=30, gop=5, extra="cabac=1")
    _session_roundtrip(s, expect_device=True)


def test_cabac_multiref_qp_sweep():
    frames = [make_frame(112, 96, seed=7 + i, kind="edges")
              for i in range(6)]
    s = oracle_encode(frames, 112, 96, qp=22, gop=6,
                      extra="cabac=1:ref=3")
    _session_roundtrip(s, expect_device=True)


def test_cabac_weightp_fade():
    base = make_frame(96, 96, seed=3)
    frames = []
    for i in range(5):
        sc = (i + 1) / 5
        frames.append(tuple(
            np.clip(p.astype(np.float32) * sc, 0, 255).astype(np.uint8)
            for p in base))
    s = oracle_encode(frames, 96, 96, qp=28, gop=5,
                      extra="cabac=1:weightp=2")
    _session_roundtrip(s, expect_device=True)


def test_cabac_noise_qp_extremes():
    frames = [make_frame(64, 64, seed=9, kind="noise")]
    for qp in (10, 44):
        s = oracle_encode(frames, 64, 64, qp=qp, gop=1, extra="cabac=1")
        _session_roundtrip(s, expect_device=True)


def test_cabac_planes_match_python_oracle():
    """The native parse and the Python CABAC decoder must produce identical
    symbol planes (coeffs, modes, qp, motion)."""
    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

    frames = [make_frame(96, 80, seed=i + 20) for i in range(4)]
    s = oracle_encode(frames, 96, 80, qp=26, gop=4, extra="cabac=1")
    ref = H264ReferenceDecoder()
    decoded = ref.decode_annexb(s) + ref.flush()
    parser = FastH264Parser()
    pics = parser.parse_annexb(s)
    assert len(pics) == len(decoded) == 4
    for i, ((fs, _), fr) in enumerate(zip(pics, decoded)):
        gt = fr.symbols
        for name in ("mb_class", "qp", "i4_modes", "i16_mode",
                     "chroma_mode", "luma_coeffs", "luma_dc",
                     "chroma_coeffs", "chroma_dc"):
            assert np.array_equal(getattr(fs, name), getattr(gt, name)), \
                f"frame {i}: {name} differs"
        if gt.mv is not None:
            assert np.array_equal(fs.mv, gt.mv), f"frame {i}: mv differs"
            assert np.array_equal(fs.ref, gt.ref), f"frame {i}: ref differs"


def test_cabac_t8_falls_back_cleanly():
    """8x8-transform CABAC pictures stay on the (correct) host path: the
    native parser raises at the first transform_size_8x8_flag == 1 and the
    session still decodes bit-exactly."""
    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser

    # smooth gradients at low qp make x264 pick the 8x8 transform
    frames = [make_frame(128, 96, seed=2, kind="flat"),
              make_frame(128, 96, seed=5)]
    s = oracle_encode(frames, 128, 96, qp=18, gop=2,
                      extra="cabac=1:8x8dct=1", profile="high")
    parser = FastH264Parser()
    try:
        pics = parser.parse_annexb(s)
        # stream happened not to use t8 anywhere: planes must be complete
        assert all(not fs.has_t8 for fs, _ in pics)
    except NotImplementedError:
        pass
    _session_roundtrip(s, expect_device=False)   # host path, still bit-exact
