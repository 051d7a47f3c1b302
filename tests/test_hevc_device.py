"""HEVC device decode: host entropy parse -> plan tensors -> TPU recon
kernel (kernels/hevc_tiles.py), bit-exact vs libavcodec on x265 streams.

This is the TPU replacement for the reference's HEVC decode silicon
(intel_dec/intel_dec.cpp:722-741 HEVC plugin; nv_dec cuvidDecodePicture) —
the host keeps only the bit-serial CABAC stage, the device does residuals,
intra prediction, deblocking and SAO.
"""

import numpy as np
import pytest

from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder
from jmcodec_tpu.kernels.hevc_tiles import decode_plan

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _device_roundtrip(frames, w, h, qp=30):
    stream = oracle_encode(frames, w, h, qp=qp, codec="libx265", gop=1)
    want, W, H = oracle_decode(stream, suffix=".h265")
    dec = HevcRefDecoder(plan_only=True)
    dec.decode(stream)
    assert len(dec.plans) == len(want) == len(frames)
    for i, (plan, (wy, wu, wv)) in enumerate(zip(dec.plans, want)):
        assert plan.supported, plan.reason
        gy, gu, gv = (np.asarray(p) for p in decode_plan(plan))
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu), f"frame {i} cb mismatch"
        assert np.array_equal(gv, wv), f"frame {i} cr mismatch"


def test_flat_single_ctu():
    _device_roundtrip([make_frame(64, 64, kind="flat")], 64, 64)


def test_gradient_noise_single_ctu():
    _device_roundtrip([make_frame(64, 64, seed=i) for i in range(3)], 64, 64)


def test_noise_qp_extremes():
    _device_roundtrip([make_frame(64, 64, seed=7, kind="noise")], 64, 64,
                      qp=45)
    _device_roundtrip([make_frame(64, 64, seed=8, kind="noise")], 64, 64,
                      qp=12)


def test_edges_content():
    _device_roundtrip([make_frame(64, 64, seed=3, kind="edges")], 64, 64,
                      qp=27)


def test_multi_ctu_rows_wpp():
    # 3 CTU rows -> WPP substreams; plan extraction must match pixel path
    _device_roundtrip([make_frame(176, 144, seed=i) for i in range(2)],
                      176, 144)


def test_partial_ctus():
    # non-CTU-multiple dims: forced quadtree boundary splits + crop
    _device_roundtrip([make_frame(168, 80, seed=4)], 168, 80, qp=24)


def test_larger_frame_qp_sweep():
    # same geometry as the WPP test: one XLA compile covers the sweep
    # (distinct geometries cost minutes each on the CPU test backend)
    for qp in (17, 34, 51):
        _device_roundtrip([make_frame(176, 144, seed=qp)], 176, 144, qp=qp)


def test_session_hevc_device_path():
    """DecoderSession routes HEVC through the device kernel and stays
    bit-exact, streaming chunk-by-chunk with EOF drain."""
    from jmcodec_tpu.api.session import Codec, DecoderSession
    from jmcodec_tpu.utils.metrics import counters

    frames = [make_frame(64, 64, seed=i) for i in range(3)]
    stream = oracle_encode(frames, 64, 64, qp=30, codec="libx265", gop=1)
    want, _, _ = oracle_decode(stream, suffix=".h265")

    before = counters.get("frames_device")
    sess = DecoderSession(codec=Codec.HEVC)
    got = []
    pos = 0
    while pos < len(stream):
        take = sess.input_data(stream[pos:pos + 1024])
        pos += take
        while (fr := sess.get_frame()) is not None:
            got.append(fr)
    sess.set_eof()
    while (fr := sess.get_frame()) is not None:
        got.append(fr)
    assert sess.is_exit()
    assert len(got) == len(want)
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(got, want)):
        assert np.array_equal(gy, wy), f"frame {i} luma mismatch"
        assert np.array_equal(gu, wu) and np.array_equal(gv, wv), i
    assert counters.get("frames_device") - before == len(want)
