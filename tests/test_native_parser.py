"""Native C++ CAVLC slice parser must produce symbol planes identical to the
Python reference parser."""

import numpy as np
import pytest

from jmcodec_tpu import native
from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder
from jmcodec_tpu.codec.h264.refenc import encode_stream

from util_oracle import have_oracle, make_frame, oracle_encode

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native parser unavailable")

FIELDS = ["mb_class", "qp", "i4_modes", "i16_mode", "chroma_mode",
          "luma_coeffs", "luma_dc", "chroma_coeffs", "chroma_dc"]


def compare_stream(stream):
    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    ref = H264ReferenceDecoder()
    ref_frames = ref.decode_annexb(stream)
    fast = FastH264Parser()
    fast_frames = fast.parse_annexb(stream)
    assert len(ref_frames) == len(fast_frames)
    for i, (rf, (fs, sps)) in enumerate(zip(ref_frames, fast_frames)):
        for f in FIELDS:
            np.testing.assert_array_equal(
                getattr(fs, f), getattr(rf.symbols, f),
                err_msg=f"frame {i} field {f}")
        for f in ["avail_left", "avail_top", "avail_topright"]:
            np.testing.assert_array_equal(getattr(fs, f),
                                          getattr(rf.symbols, f))
        assert fs.deblock_enabled == rf.symbols.deblock_enabled
    return len(ref_frames)


@pytest.mark.parametrize("qp,kind", [(16, "gradient_noise"), (24, "noise"),
                                     (30, "edges"), (40, "flat"),
                                     (44, "gradient_noise")])
def test_native_matches_python_own_stream(qp, kind):
    frames = [make_frame(64, 64, seed=13, kind=kind)]
    stream, _ = encode_stream(frames, 64, 64, qp=qp)
    assert compare_stream(stream) == 1


@pytest.mark.skipif(not have_oracle(), reason="no oracle")
@pytest.mark.parametrize("qp", [20, 28, 36])
def test_native_matches_python_x264(qp):
    frames = [make_frame(96, 80, seed=14, kind="gradient_noise"),
              make_frame(96, 80, seed=15, kind="edges")]
    stream = oracle_encode(frames, 96, 80, qp=qp, gop=1)
    assert compare_stream(stream) == 2
