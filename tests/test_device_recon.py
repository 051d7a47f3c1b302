"""Device (jit/XLA) reconstruction must be bit-exact vs the numpy reference
decoder, on our streams and on x264 streams."""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder
from jmcodec_tpu.codec.h264.refenc import encode_stream
from jmcodec_tpu.kernels import recon, recon_tiles

from util_oracle import have_oracle, make_frame, oracle_encode

HAVE_ORACLE = have_oracle()


def check_stream(stream, kernels=(recon_tiles, recon)):
    dec = H264ReferenceDecoder()
    frames = dec.decode_annexb(stream)
    for i, fr in enumerate(frames):
        for K in kernels:
            Yd, Ud, Vd = K.decode_frame_symbols(fr.symbols)
            np.testing.assert_array_equal(Yd, fr.Y, err_msg=f"frame {i} luma")
            np.testing.assert_array_equal(Ud, fr.U, err_msg=f"frame {i} cb")
            np.testing.assert_array_equal(Vd, fr.V, err_msg=f"frame {i} cr")
    return len(frames)


@pytest.mark.parametrize("qp,kind", [(24, "gradient_noise"), (32, "edges"),
                                     (38, "noise")])
def test_device_matches_host_own_stream(qp, kind):
    frames = [make_frame(64, 64, seed=7, kind=kind)]
    stream, _ = encode_stream(frames, 64, 64, qp=qp)
    assert check_stream(stream) == 1


def test_device_matches_host_deblock_off():
    frames = [make_frame(64, 48, seed=8, kind="edges")]
    stream, _ = encode_stream(frames, 64, 48, qp=30, disable_deblock=True)
    assert check_stream(stream) == 1


def test_device_matches_host_nonsquare():
    frames = [make_frame(96, 32, seed=9, kind="gradient_noise")]
    stream, _ = encode_stream(frames, 96, 32, qp=28)
    assert check_stream(stream) == 1


@pytest.mark.skipif(not HAVE_ORACLE, reason="no libavcodec oracle")
@pytest.mark.parametrize("qp", [22, 30, 38])
def test_device_matches_host_x264_stream(qp):
    frames = [make_frame(80, 64, seed=11, kind="gradient_noise")]
    stream = oracle_encode(frames, 80, 64, qp=qp, gop=1)
    assert check_stream(stream) == 1


@pytest.mark.skipif(not HAVE_ORACLE, reason="no libavcodec oracle")
def test_device_matches_host_multislice():
    frames = [make_frame(96, 64, seed=12, kind="gradient_noise")]
    stream = oracle_encode(frames, 96, 64, qp=28, gop=1, extra="slices=3")
    assert check_stream(stream) == 1
