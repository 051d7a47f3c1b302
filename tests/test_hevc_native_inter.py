"""Native (C++) HEVC P/B slice parser: plan tensors + derived motion must
match the Python oracle parser exactly, and the device decode stays
bit-exact vs libavcodec (VERDICT r3 item #4)."""

import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

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


def _decode_both(stream):
    """Returns (native-path frames, python-path frames)."""
    from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder
    fn = HevcRefDecoder().decode(stream)       # use_native=True default
    fp = HevcRefDecoder(use_native=False).decode(stream)
    return fn, fp


def _check(frames, W, H, qp=30, extra="", gop=8, codec_extra=""):
    ex = ":".join(x for x in ("", extra) if x)
    stream = oracle_encode(frames, W, H, qp=qp, codec="libx265", gop=gop,
                           extra=extra or None)
    want, _, _ = oracle_decode(stream, suffix=".h265")
    fn, fp = _decode_both(stream)
    assert len(fn) == len(want) == len(fp)
    for i, ((gy, gu, gv), (wy, wu, wv)) in enumerate(zip(fn, want)):
        assert np.array_equal(np.asarray(gy), wy), f"native frame {i} luma"
        assert np.array_equal(np.asarray(gu), wu), f"native frame {i} cb"
        assert np.array_equal(np.asarray(gv), wv), f"native frame {i} cr"


def test_native_inter_ipp():
    _check(_pan(96, 96, 6), 96, 96, qp=30)


def test_native_inter_bframes():
    _check(_pan(96, 96, 8), 96, 96, qp=28, extra="bframes=3:b-adapt=0")


def test_native_inter_multiref_amp():
    _check(_pan(128, 96, 6), 128, 96, qp=26, extra="ref=3:amp=1:rect=1")


def test_native_inter_qp_extremes():
    frames = _pan(64, 64, 4, seed=7)
    _check(frames, 64, 64, qp=16)
    _check(frames, 64, 64, qp=45)


def test_native_plans_match_python_oracle():
    """Plan tensors from the native inter parse == the Python oracle's
    (motion, residuals, zidx, bS), per picture."""
    from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder

    frames = _pan(96, 96, 6, seed=11)
    stream = oracle_encode(frames, 96, 96, qp=30, codec="libx265", gop=6,
                           extra="bframes=2:b-adapt=0")

    def capture_decode(use_native):
        captured = []

        def capture(plan, ref_pixels):
            captured.append(plan)
            raise NotImplementedError("capture only")  # host re-decode path

        d = HevcRefDecoder(device_recon=capture, use_native=use_native)
        d.decode(stream)
        return [p for p in captured if p.inter4 is not None]

    py_plans = capture_decode(False)
    nat_plans = capture_decode(True)
    assert len(nat_plans) >= 4, "native inter fast path did not run"
    by_poc = {p.poc: p for p in py_plans}
    checked = 0
    for np_ in nat_plans:
        want = by_poc.get(np_.poc)
        if want is None:
            continue
        for name in ("inter4", "mv", "ref_slot", "pred_fl",
                     "tu_log2_inter_y", "tu_log2_inter_c",
                     "coeff_y", "coeff_cb", "coeff_cr",
                     "tu_log2_y", "mode_y", "zidx_y", "zidx_c",
                     "bs_ver", "bs_hor"):
            a = getattr(np_, name)
            b = getattr(want, name)
            assert np.array_equal(a, b), f"poc {np_.poc}: {name} differs"
        assert np_.ref_pocs == want.ref_pocs, np_.poc
        checked += 1
    assert checked >= 4


def test_native_inter_used_not_fallback():
    """The native parser must actually carry the P pictures (no silent
    Python fallback): forcing use_native=False must still agree, and the
    native path must run without raising through the plan fast path."""
    from jmcodec_tpu import native
    from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder

    frames = _pan(96, 96, 5, seed=9)
    stream = oracle_encode(frames, 96, 96, qp=30, codec="libx265", gop=5)
    calls = {"n": 0}
    orig = native.hevc_fill_plan_inter

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    native.hevc_fill_plan_inter = spy
    try:
        captured = []

        def capture(plan, ref_pixels):
            captured.append(plan)
            raise NotImplementedError("capture only")

        frames_out = HevcRefDecoder(device_recon=capture).decode(stream)
    finally:
        native.hevc_fill_plan_inter = orig
    assert len(frames_out) == 5
    assert calls["n"] >= 4, "native inter parser was not used"
