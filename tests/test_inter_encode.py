"""P-frame encoder: self round-trip bit-exactness, oracle conformance,
compression sanity."""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder
from jmcodec_tpu.codec.h264.refenc import EncoderConfig, H264ReferenceEncoder

from util_oracle import have_oracle, make_frame, oracle_decode, psnr
from test_inter_decode import moving_frames


def encode_gop(frames, W, H, qp=28, gop=4, **kw):
    enc = H264ReferenceEncoder(EncoderConfig(W, H, qp=qp, gop_len=gop, **kw))
    stream = enc.headers_annexb()
    recons = []
    for fr in frames:
        stream += enc.encode_frame(*[np.asarray(p, np.int32) for p in fr])
        recons.append(enc.recon_cropped())
    return stream, recons


def check_self(stream, recons):
    dec = H264ReferenceDecoder()
    ours = dec.decode_annexb(stream)
    sps = list(dec.sps.values())[0]
    assert len(ours) == len(recons)
    for i, fr in enumerate(ours):
        for nm, a, b in zip("YUV", fr.crop(sps), recons[i]):
            np.testing.assert_array_equal(a, np.asarray(b),
                                          err_msg=f"frame {i} {nm}")


@pytest.mark.parametrize("qp", [24, 32])
def test_p_encode_self_roundtrip(qp):
    frames = moving_frames(64, 64, 4)
    stream, recons = check_args = encode_gop(frames, 64, 64, qp=qp)
    check_self(stream, recons)
    for i, r in enumerate(recons):
        assert psnr(r[0], frames[i][0]) > (30 if qp <= 28 else 25)


def test_p_encode_compresses_vs_intra():
    frames = moving_frames(64, 64, 4, step=(1, 2))
    s_p, _ = encode_gop(frames, 64, 64, qp=28, gop=4)
    s_i, _ = encode_gop(frames, 64, 64, qp=28, gop=1)
    assert len(s_p) < 0.7 * len(s_i)


def test_p_encode_static_content_mostly_skip():
    f = make_frame(64, 64, seed=11)
    stream, recons = encode_gop([f] * 4, 64, 64, qp=30)
    check_self(stream, recons)
    # P frames of identical content should be tiny (skip runs)
    assert len(stream) < 4000


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
def test_p_encode_oracle_conformance():
    frames = moving_frames(64, 48, 5, step=(2, 3))
    stream, recons = encode_gop(frames, 64, 48, qp=26, gop=5)
    golden, w, h = oracle_decode(stream)
    assert (w, h) == (64, 48) and len(golden) == 5
    for i in range(5):
        for nm, a, b in zip("YUV", golden[i], recons[i]):
            np.testing.assert_array_equal(a, np.asarray(b),
                                          err_msg=f"frame {i} {nm}")


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
def test_p_encode_intra_fallback_on_scene_change():
    # second GOP frame totally different -> intra MBs inside a P frame
    f1 = make_frame(64, 64, seed=1, kind="gradient_noise")
    f2 = make_frame(64, 64, seed=99, kind="noise")
    stream, recons = encode_gop([f1, f2], 64, 64, qp=28, gop=2)
    check_self(stream, recons)
    golden, _, _ = oracle_decode(stream)
    for nm, a, b in zip("YUV", golden[1], recons[1]):
        np.testing.assert_array_equal(a, np.asarray(b))
