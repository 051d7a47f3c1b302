"""Device P-frame decode: batched MC + intra wavefront + bS-driven deblock
must be bit-exact vs the host reference decoder, with references staying
device-resident across frames."""

import jax.numpy as jnp
import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder
from jmcodec_tpu.kernels import recon_tiles as RT

from util_oracle import have_oracle, make_frame, oracle_encode
from test_inter_decode import moving_frames


def device_decode_stream(stream):
    """Sequential device decode: host entropy (reference parser), device
    recon; DPB kept on device."""
    dec = H264ReferenceDecoder()
    host_frames = dec.decode_annexb(stream)
    out = []
    dpb = []  # [(Yp, Up, Vp)] most recent first
    for fr in host_frames:
        fs = fr.symbols
        if fs.mv is None:
            Y, U, V = (jnp.asarray(p) for p in RT.decode_frame_symbols(fs))
            dpb = []
        else:
            Y, U, V = RT.decode_frame_symbols_inter(fs, dpb)
        out.append((np.asarray(Y), np.asarray(U), np.asarray(V)))
        dpb.insert(0, RT.pad_ref_device(Y, U, V))
        dpb = dpb[:4]
    return host_frames, out


def check(stream):
    host_frames, dev = device_decode_stream(stream)
    for i, fr in enumerate(host_frames):
        for nm, a, b in zip("YUV", (fr.Y, fr.U, fr.V), dev[i]):
            np.testing.assert_array_equal(b, a, err_msg=f"frame {i} {nm}")
    return len(host_frames)


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
@pytest.mark.parametrize("qp", [24, 32])
def test_device_inter_x264(qp):
    frames = moving_frames(64, 64, 4)
    stream = oracle_encode(frames, 64, 64, qp=qp, gop=4)
    assert check(stream) == 4


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
def test_device_inter_subpartitions_multiref():
    frames = moving_frames(96, 64, 5, step=(3, 5), kind="noise")
    stream = oracle_encode(frames, 96, 64, qp=26, gop=5, preset="veryslow")
    assert check(stream) == 5


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
def test_device_inter_static_skips():
    f = make_frame(64, 48, seed=4)
    stream = oracle_encode([f] * 3, 64, 48, qp=30, gop=3)
    assert check(stream) == 3


def test_device_inter_own_encoder():
    from jmcodec_tpu.codec.h264.refenc import EncoderConfig, H264ReferenceEncoder
    frames = moving_frames(64, 64, 4, step=(2, 2))
    enc = H264ReferenceEncoder(EncoderConfig(64, 64, qp=28, gop_len=4))
    stream = enc.headers_annexb()
    for fr in frames:
        stream += enc.encode_frame(*[np.asarray(p, np.int32) for p in fr])
    assert check(stream) == 4
