"""HEVC cu_qp_delta (7.4.9.10 / 8.6.1): per-QG QP derivation + delta
syntax, bit-exact vs libavcodec on x265 RATE-CONTROLLED output (ABR +
aq-mode emits cu_qp_delta on real-world streams — VERDICT r4 #7).

NOTE suite layout: device tests run eager (jax.disable_jit) — own chunk.
"""

import jax
import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")

EXTRA = "bitrate=150:aq-mode=2:vbv-bufsize=300:vbv-maxrate=150:ctu=32"


def _frames(n, W=64, H=64):
    base = make_frame(W, H, seed=3)
    return [(np.roll(base[0], 2 * i, 1), base[1], base[2])
            for i in range(n)]


def _assert_stream_has_cuqp(stream):
    from jmcodec_tpu.codec.hevc import nal as HN
    from jmcodec_tpu.codec.hevc.params import parse_pps
    for u in HN.parse_nal_units(stream):
        if u.nal_unit_type == HN.NAL_PPS:
            assert parse_pps(u.rbsp).cu_qp_delta_enabled
            return
    raise AssertionError("no PPS")


def test_cuqp_intra_host_bit_exact():
    frames = [make_frame(192, 128, seed=i) for i in range(3)]
    stream = oracle_encode(
        frames, 192, 128, qp=30, codec="libx265", gop=1,
        extra="bitrate=300:aq-mode=2:vbv-bufsize=600:vbv-maxrate=300")
    _assert_stream_has_cuqp(stream)
    from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder
    want, _, _ = oracle_decode(stream, suffix=".h265")
    got = HevcRefDecoder(use_native=False).decode(stream)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            assert np.array_equal(a, b)


def test_cuqp_inter_host_bit_exact():
    stream = oracle_encode(_frames(3), 64, 64, qp=30, codec="libx265",
                           gop=3, extra=EXTRA)
    _assert_stream_has_cuqp(stream)
    from jmcodec_tpu.codec.hevc.refdec import HevcRefDecoder
    want, _, _ = oracle_decode(stream, suffix=".h265")
    got = HevcRefDecoder(use_native=False).decode(stream)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            assert np.array_equal(a, b)


def _run_session(stream):
    from jmcodec_tpu.api.session import Codec, DecoderSession
    from jmcodec_tpu.utils.metrics import counters
    want, _, _ = oracle_decode(stream, suffix=".h265")
    before = counters.get("frames_device")
    s = DecoderSession(codec=Codec.HEVC)
    s.input_data(stream)
    s.set_eof()
    got = []
    while (fr := s.get_frame()) is not None:
        got.append(fr)
    ndev = counters.get("frames_device") - before
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        for a, b in zip(g, w):
            assert np.array_equal(a, b), f"frame {i} mismatch"
    return ndev


def test_cuqp_device_eager():
    """Intra + inter cu_qp_delta pictures decode ON the device path (the
    plan carries the decoded per-cell QP map for dequant + deblock)."""
    with jax.disable_jit():
        st1 = oracle_encode(_frames(3), 64, 64, qp=30, codec="libx265",
                            gop=1, extra=EXTRA)
        _assert_stream_has_cuqp(st1)
        assert _run_session(st1) == 3
        st2 = oracle_encode(_frames(3), 64, 64, qp=30, codec="libx265",
                            gop=3, extra=EXTRA)
        assert _run_session(st2) == 3


def test_transform_skip_bit_exact():
    """transform_skip recon (8.6.4.2): binary screen-content makes x265
    emit real TS blocks; host decode must match libavcodec bit-exactly
    (plan pictures with TS re-decode on the host path)."""
    from jmcodec_tpu.codec.hevc import refdec as RD
    rng = np.random.default_rng(1)
    frames = []
    for i in range(2):
        Y = (rng.integers(0, 2, (96, 128)) * 255).astype(np.uint8)
        U = np.full((48, 64), 128, np.uint8)
        frames.append((Y, U, U.copy()))
    stream = oracle_encode(frames, 128, 96, qp=32, codec="libx265",
                           gop=2, extra="tskip=1:ctu=16")
    orig = RD._Picture._residual
    cnt = {"ts": 0}

    def spy(self, c, log2size, cidx, scan_idx):
        out = orig(self, c, log2size, cidx, scan_idx)
        if self._tskip:
            cnt["ts"] += 1
        return out

    RD._Picture._residual = spy
    try:
        got = RD.HevcRefDecoder(use_native=False).decode(stream)
    finally:
        RD._Picture._residual = orig
    assert cnt["ts"] > 0, "content did not exercise transform_skip"
    want, _, _ = oracle_decode(stream, suffix=".h265")
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            assert np.array_equal(a, b)
