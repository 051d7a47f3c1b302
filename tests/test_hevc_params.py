"""HEVC NAL + SPS/PPS parsing vs real x265 streams."""

import numpy as np
import pytest

from jmcodec_tpu.codec.hevc import nal as HN
from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps, stream_info

from util_oracle import have_oracle, make_frame, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(), reason="no oracle")


def x265_stream(W=128, H=96, qp=30, n=2):
    frames = [make_frame(W, H, seed=i) for i in range(n)]
    return oracle_encode(frames, W, H, qp=qp, codec="libx265", gop=n)


def test_nal_layer_types():
    stream = x265_stream()
    units = HN.parse_nal_units(stream)
    types = [u.nal_unit_type for u in units]
    assert HN.NAL_VPS in types
    assert HN.NAL_SPS in types
    assert HN.NAL_PPS in types
    assert any(u.is_slice for u in units)
    assert any(u.is_idr or u.is_irap for u in units)
    for u in units:
        assert u.nuh_layer_id == 0
        assert u.nuh_temporal_id >= 0


def test_sps_geometry():
    stream = x265_stream(W=132, H=100)  # non-CTU-multiple: conformance window
    s = stream_info(stream)
    assert s is not None
    assert s.width == 132
    assert s.height == 100
    assert s.chroma_format_idc == 1
    assert s.bit_depth_luma == 8
    assert s.ctb_size in (16, 32, 64)


def test_pps_parse():
    stream = x265_stream()
    pps = None
    for u in HN.parse_nal_units(stream):
        if u.nal_unit_type == HN.NAL_PPS:
            pps = parse_pps(u.rbsp)
    assert pps is not None
    assert 0 <= pps.init_qp <= 51
    assert pps.num_tile_columns >= 1


def test_nal_roundtrip():
    payload = b"\x12\x34\x00\x00\x00\x56"
    raw = HN.write_nal_unit(HN.NAL_SPS, payload, temporal_id=0)
    units = HN.parse_nal_units(raw)
    assert len(units) == 1
    assert units[0].nal_unit_type == HN.NAL_SPS
    assert units[0].rbsp == payload
