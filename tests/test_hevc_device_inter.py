"""HEVC device inter decode: phase-plane MC + inter residuals seeding the
intra wavefront, device-resident reference pyramids across pictures —
bit-exact vs libavcodec through the session (P, B-pyramid, IDR resets,
AMP, conformance-window crop).

This closes the decode loop for real-world (inter) HEVC streams on the
device; the host keeps entropy + motion derivation (SURVEY §7.2 L1a).

NOTE suite layout: these tests compile the inter wavefront kernel — keep
them in their own process chunk (tests/run_suite.sh), one geometry here.
"""

import jax
import numpy as np
import pytest

from jmcodec_tpu.api.session import Codec, DecoderSession
from jmcodec_tpu.utils.metrics import counters

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _moving(W, H, n, seed=0):
    BY, BU, BV = make_frame(W * 2, H * 2, seed=seed)
    out = []
    for i in range(n):
        dy, dx = 2 * i, 3 * i
        out.append((BY[dy:dy + H, dx:dx + W],
                    BU[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2],
                    BV[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2]))
    return out


def _run(stream, expect_device=None):
    want, _, _ = oracle_decode(stream, suffix=".h265")
    before = counters.get("frames_device")
    s = DecoderSession(codec=Codec.HEVC)
    s.input_data(stream)
    s.set_eof()
    got = []
    while (fr := s.get_frame()) is not None:
        got.append(fr)
    ndev = counters.get("frames_device") - before
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        for a, b in zip(g, w):
            assert np.array_equal(a, b), f"frame {i} mismatch"
    if expect_device is not None:
        assert ndev == expect_device, (ndev, expect_device)


def test_p_and_b_device_eager():
    """Every picture of P and B streams decodes on the device path
    (eager mode: the jitted variant is covered once below — each compile
    of the inter wavefront costs minutes on the CPU test backend)."""
    with jax.disable_jit():
        frames = _moving(64, 64, 6)
        _run(oracle_encode(frames, 64, 64, qp=30, codec="libx265", gop=20),
             expect_device=6)
        _run(oracle_encode(frames, 64, 64, qp=30, codec="libx265", gop=20,
                           extra="bframes=3"), expect_device=6)


def test_idr_reset_and_amp_eager():
    with jax.disable_jit():
        frames = _moving(64, 64, 4)
        _run(oracle_encode(frames, 64, 64, qp=30, codec="libx265", gop=2),
             expect_device=4)
        _run(oracle_encode(frames, 64, 64, qp=22, codec="libx265", gop=20,
                           extra="amp=1:rect=1"), expect_device=4)


def test_conf_window_crop_eager():
    with jax.disable_jit():
        frames = _moving(100, 60, 4)
        _run(oracle_encode(frames, 100, 60, qp=30, codec="libx265", gop=20),
             expect_device=4)


def test_weighted_pred_on_device():
    """Explicit weighted prediction decodes ON the device path (r5: the
    plan carries per-cell resolved (w, o) and the combine runs the
    spec's explicit formula uniformly — identity weights reproduce the
    default combine). A fading stream makes x265 emit real weights."""
    with jax.disable_jit():
        base = make_frame(64, 64, seed=9)
        frames = [(np.clip(base[0].astype(np.float64) * (1 - .09 * i), 0,
                           255).astype(np.uint8), base[1], base[2])
                  for i in range(5)]
        _run(oracle_encode(frames, 64, 64, qp=28, codec="libx265", gop=20,
                           extra="weightp=1"), expect_device=5)


def test_p_stream_jitted():
    """One real compile of the inter wavefront kernel."""
    frames = _moving(64, 64, 4)
    _run(oracle_encode(frames, 64, 64, qp=30, codec="libx265", gop=20,
                       extra="bframes=2"), expect_device=4)
