"""Native (C++) HEVC CABAC parser conformance: plan tensors byte-identical
to the Python oracle parser (refdec plan mode), across QPs, WPP, partial
CTBs; plus end-to-end bit-exactness through the session device path.

The C++ parser is the production host entropy front-end (SURVEY §7.2 L1a),
standing in for the vendor driver's hardware CABAC engine
(nv_dec/nv_dec.cpp:278-366,394).
"""

import numpy as np
import pytest

from jmcodec_tpu import native
from jmcodec_tpu.codec.hevc import nal as HN
from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps
from jmcodec_tpu.codec.hevc.plan import HevcFramePlan
from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder, _substream_offsets
from jmcodec_tpu.codec.hevc.slicehdr import parse_slice_header

from util_oracle import have_oracle, make_frame, oracle_encode

pytestmark = pytest.mark.skipif(
    not (have_oracle() and native.available()),
    reason="oracle or native library unavailable")

PLAN_FIELDS = ["coeff_y", "tu_log2_y", "mode_y", "zidx_y", "qp_y",
               "coeff_cb", "coeff_cr", "tu_log2_c", "mode_c", "zidx_c",
               "bs_ver", "bs_hor", "sao_type", "sao_offsets", "sao_band",
               "sao_eo"]


def _native_plans(stream: bytes):
    sps = {}
    pps = {}
    plans = []
    for u in HN.parse_nal_units(stream):
        if u.nal_unit_type == HN.NAL_SPS:
            s = parse_sps(u.rbsp)
            sps[s.sps_id] = s
        elif u.nal_unit_type == HN.NAL_PPS:
            p = parse_pps(u.rbsp)
            pps[p.pps_id] = p
        elif u.is_slice:
            p = pps[0]
            s = sps[p.sps_id]
            hdr = parse_slice_header(u.rbsp, u.nal_unit_type, s, p)
            plan = HevcFramePlan.create(s)
            plan.record_slice(hdr, p)
            native.hevc_fill_plan(plan, hdr, s, p, u.rbsp,
                                  _substream_offsets(hdr, u.emu_positions))
            plans.append(plan)
    return plans


def _check(W, H, qp=30, seed=0, nframes=1):
    frames = [make_frame(W, H, seed=seed + i) for i in range(nframes)]
    stream = oracle_encode(frames, W, H, qp=qp, codec="libx265", gop=1)
    d = HevcRefDecoder(plan_only=True)
    d.decode(stream)
    got = _native_plans(stream)
    assert len(got) == len(d.plans) == nframes
    for i, (a, b) in enumerate(zip(d.plans, got)):
        for f in PLAN_FIELDS:
            assert np.array_equal(getattr(a, f), getattr(b, f)), \
                f"frame {i}: plan field {f} differs"
        assert (a.deblock_disabled, a.beta_off, a.tc_off,
                a.cb_qp_off, a.cr_qp_off) == \
               (b.deblock_disabled, b.beta_off, b.tc_off,
                b.cb_qp_off, b.cr_qp_off)


def test_single_ctu():
    _check(64, 64)


def test_qp_extremes():
    _check(64, 64, qp=12, seed=8)
    _check(64, 64, qp=45, seed=7)


def test_wpp_rows():
    _check(176, 144, seed=1)


def test_partial_ctus():
    _check(168, 80, qp=24, seed=4)


def test_cif_sweep():
    for qp in (17, 34, 51):
        _check(352, 288, qp=qp, seed=qp)


def test_multi_frame():
    _check(96, 96, seed=11, nframes=3)


def test_session_uses_native(monkeypatch):
    """The session's HEVC device path must go through the native parser
    (no silent Python fallback)."""
    from jmcodec_tpu.api.session import Codec, DecoderSession
    frames = [make_frame(64, 64, seed=3)]
    stream = oracle_encode(frames, 64, 64, qp=30, codec="libx265", gop=1)
    calls = []
    orig = native.hevc_fill_plan

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(native, "hevc_fill_plan", spy)
    s = DecoderSession(codec=Codec.HEVC)
    s.input_data(stream)
    s.set_eof()
    out = []
    while True:
        fr = s.get_frame()
        if fr is None:
            break
        out.append(fr)
    assert calls, "native HEVC parser was not used by the session"
    assert len(out) == 1
    from util_oracle import oracle_decode
    want, _, _ = oracle_decode(stream, suffix=".h265")
    for a, b in zip(out[0], want[0]):
        assert np.array_equal(a, b)
