"""Rate control: CBR/VBR controller convergence + session integration.

Capability parity: QSV VBR default (intel_enc.cpp:512), NVENC CBR
(nv_enc.cpp:534-535) — `bitrate_kb` must actually control the bitrate.
"""

import numpy as np
import pytest

from jmcodec_tpu.pipeline.ratecontrol import (RateControlConfig,
                                              RateController, qscale_of)

from util_oracle import have_oracle, make_frame, oracle_decode


def _video(W, H, n):
    """Temporally-correlated clip: a panning scene (what RC convergence is
    defined over; independent-noise frames make P cost == I cost)."""
    base = make_frame(W * 2, H, seed=7)
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        Y = base[0][:, 2 * i:2 * i + W].copy()
        Y = np.clip(Y.astype(np.int32)
                    + rng.integers(-2, 3, Y.shape), 0, 255).astype(np.uint8)
        out.append((Y, base[1][:, i:i + W // 2],
                    base[2][:, i:i + W // 2]))
    return out


def _simulate(mode, complexity_curve, kbps=1000, fps=30.0, gop=30):
    """Drive the controller against a synthetic encoder whose bits track
    bits = comp/qscale (the model's own family — tests the feedback loop,
    not the model fit)."""
    rc = RateController(RateControlConfig(bitrate_kbps=kbps, fps=fps,
                                          mode=mode, init_qp=30))
    rng = np.random.default_rng(0)
    for i, comp in enumerate(complexity_curve):
        t = "I" if i % gop == 0 else "P"
        qp = rc.frame_qp(t)
        c = comp * (4.0 if t == "I" else 1.0)
        bits = int(c / qscale_of(qp) * rng.uniform(0.85, 1.15))
        rc.update(t, qp, bits)
    return rc


def test_cbr_converges_steady_content():
    R = 1000 * 1000 / 30.0
    comp = [R * qscale_of(30)] * 300
    rc = _simulate("cbr", comp, kbps=1000)
    assert abs(rc.achieved_kbps() - 1000) / 1000 < 0.05, rc.achieved_kbps()


def test_vbr_converges_steady_content():
    R = 1000 * 1000 / 30.0
    comp = [R * qscale_of(30)] * 300
    rc = _simulate("vbr", comp, kbps=1000)
    assert abs(rc.achieved_kbps() - 1000) / 1000 < 0.05, rc.achieved_kbps()


def test_cbr_tracks_complexity_step():
    """Scene change: complexity jumps 4x mid-stream; CBR must pull the rate
    back to target by the end."""
    R = 1000 * 1000 / 30.0
    comp = [R * qscale_of(30)] * 150 + [4 * R * qscale_of(30)] * 300
    rc = _simulate("cbr", comp, kbps=1000)
    assert abs(rc.achieved_kbps() - 1000) / 1000 < 0.08, rc.achieved_kbps()


def test_qp_bounded_and_stable():
    R = 500 * 1000 / 30.0
    rc = RateController(RateControlConfig(bitrate_kbps=500, fps=30,
                                          mode="cbr", init_qp=30))
    prev = None
    for i in range(100):
        qp = rc.frame_qp("P")
        assert 10 <= qp <= 51
        if prev is not None and i >= 4:
            assert abs(qp - prev) <= 3  # no QP pumping after warmup
        prev = qp
        rc.update("P", qp, int(R * 1.5))  # persistently over budget


@pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")
def test_session_vbr_hits_target_bitrate():
    """EncoderSession with rc_mode=vbr: achieved bitrate within 15% of
    bitrate_kb on real content, stream decodes via libavcodec."""
    from jmcodec_tpu.api.session import EncoderParams, EncoderSession

    W, H, N, FPS = 176, 144, 36, 30
    target = 600
    ses = EncoderSession(EncoderParams(width=W, height=H, fps=FPS,
                                       bitrate_kb=target, gop_len=12,
                                       rc_mode="vbr"))
    total = 0
    stream = b""
    for fr in _video(W, H, N):
        ses.encode_frame(fr)
        data, _ = ses.output_bitstream()
        stream += data
        total += len(data)
    kbps = total * 8 / 1000.0 * FPS / N
    assert abs(kbps - target) / target < 0.15, f"achieved {kbps:.0f} kbps"
    # conformance: the rate-controlled stream must still decode
    frames, w, h = oracle_decode(stream)
    assert len(frames) == N and (w, h) == (W, H)


@pytest.mark.skipif(not have_oracle(), reason="oracle unavailable")
def test_session_cbr_per_gop_rate():
    """CBR: every GOP's bits stay near target (the streaming guarantee CBR
    exists for), not just the whole-stream mean."""
    from jmcodec_tpu.api.session import EncoderParams, EncoderSession

    W, H, FPS, GOP = 176, 144, 30, 12
    target = 600
    ses = EncoderSession(EncoderParams(width=W, height=H, fps=FPS,
                                       bitrate_kb=target, gop_len=GOP,
                                       rc_mode="cbr"))
    gop_bits = []
    cur = 0
    for fr in _video(W, H, 48):
        ses.encode_frame(fr)
        data, is_key = ses.output_bitstream()
        if is_key and cur:
            gop_bits.append(cur)
            cur = 0
        cur += len(data) * 8
    gop_bits.append(cur)
    per_gop_target = target * 1000 * GOP / FPS
    # skip the first GOP (converging from the bits/pixel prior)
    for b in gop_bits[1:]:
        assert abs(b - per_gop_target) / per_gop_target < 0.25, gop_bits
