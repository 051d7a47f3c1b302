import random

from jmcodec_tpu.codec.h264 import nal
from jmcodec_tpu.codec.h264.params import (PPS, SPS, parse_pps, parse_sps,
                                           write_pps, write_sps)


def test_ebsp_roundtrip():
    rng = random.Random(2)
    for _ in range(200):
        # biased toward zeros to exercise escaping
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randint(0, 64)))
        ebsp = nal.rbsp_to_ebsp(raw)
        assert b"\x00\x00\x00" not in ebsp or ebsp.endswith(b"\x00\x00")
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        assert nal.ebsp_to_rbsp(ebsp) == raw


def test_nal_unit_roundtrip():
    payloads = [b"\x00\x00\x01\x02\x03", b"\xff" * 10, b"\x00\x00\x00\x00\x80"]
    stream = b"".join(
        nal.write_nal_unit(3, 5, p, long_startcode=(i % 2 == 0))
        for i, p in enumerate(payloads))
    units = nal.parse_nal_units(stream)
    assert len(units) == len(payloads)
    for u, p in zip(units, payloads):
        assert u.nal_ref_idc == 3
        assert u.nal_unit_type == 5
        # trailing-zero stripping means payloads must end with a nonzero byte
        # for exact roundtrip; our RBSPs always end with a stop bit so that's
        # satisfied in practice.
        assert u.rbsp == p or p.rstrip(b"\x00") == u.rbsp


def test_sps_roundtrip():
    s = SPS(profile_idc=66, level_idc=30, pic_width_in_mbs=80,
            pic_height_in_map_units=45, max_num_ref_frames=2,
            frame_cropping_flag=1, crop_right=4, crop_bottom=2,
            pic_order_cnt_type=0)
    rbsp = write_sps(s)
    s2 = parse_sps(rbsp)
    assert s2.pic_width_in_mbs == 80
    assert s2.pic_height_in_map_units == 45
    assert s2.width == 80 * 16 - 8
    assert s2.height == 45 * 16 - 4
    assert s2.max_num_ref_frames == 2
    assert s2.pic_order_cnt_type == 0
    assert s2.log2_max_frame_num == s.log2_max_frame_num


def test_sps_high_profile_roundtrip():
    s = SPS(profile_idc=100, level_idc=41, pic_width_in_mbs=120,
            pic_height_in_map_units=68, pic_order_cnt_type=2)
    s2 = parse_sps(write_sps(s))
    assert s2.profile_idc == 100
    assert s2.chroma_format_idc == 1
    assert s2.mb_width == 120


def test_pps_roundtrip():
    p = PPS(pic_init_qp=30, chroma_qp_index_offset=-2,
            deblocking_filter_control_present_flag=1,
            entropy_coding_mode_flag=0)
    p2 = parse_pps(write_pps(p))
    assert p2.pic_init_qp == 30
    assert p2.chroma_qp_index_offset == -2
    assert p2.entropy_coding_mode_flag == 0
    assert p2.second_chroma_qp_index_offset is None

    p3 = parse_pps(write_pps(p, high_profile=True))
    assert p3.second_chroma_qp_index_offset == -2
