"""HEVC parameter sets: SPS/PPS parsing (spec 7.3.2.2/7.3.2.3).

Round-1 scope: geometry + coding-tool flags needed for stream info and for
the decoder skeleton; scaling lists and long-term ref syntax are parsed
through (skipped exactly) so offsets stay correct.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from ...utils.bits import BitReader


def _profile_tier_level(r: BitReader, max_sub_layers: int) -> dict:
    info = {}
    info["general_profile_space"] = r.u(2)
    info["general_tier_flag"] = r.u(1)
    info["general_profile_idc"] = r.u(5)
    r.u(32)  # profile compatibility flags
    r.u(4)   # progressive/interlaced/non-packed/frame-only source flags
    r.u(32)  # constraint flags (43 bits) part 1
    r.u(11)  # part 2
    r.u(1)   # general_inbld / reserved bit
    info["general_level_idc"] = r.u(8)
    sub_present = [(r.flag(), r.flag()) for _ in range(max_sub_layers - 1)]
    if max_sub_layers > 1:
        for _ in range(max_sub_layers - 1, 8):
            r.u(2)
    for (pp, lp) in sub_present:
        if pp:
            r.u(2 + 1 + 5)
            r.u(32)
            r.u(4)
            r.u(32)
            r.u(11)
            r.u(1)
        if lp:
            r.u(8)
    return info


def _skip_short_term_rps(r: BitReader, idx: int, num_sets: int,
                         prev_deltas: List[int]) -> int:
    """Parse one st_ref_pic_set (7.3.7); returns NumDeltaPocs, tracking only
    what is needed to keep bit offsets exact."""
    inter_pred = r.flag() if idx != 0 else 0
    if inter_pred:
        if idx == num_sets:
            r.ue()  # delta_idx_minus1
        r.flag()  # delta_rps_sign
        r.ue()    # abs_delta_rps_minus1
        num_delta = prev_deltas[-1]
        cnt = 0
        for _ in range(num_delta + 1):
            used = r.flag()
            if not used:
                if r.flag():
                    cnt += 1
            else:
                cnt += 1
        prev_deltas.append(cnt)
        return cnt
    neg = r.ue()
    pos = r.ue()
    for _ in range(neg):
        r.ue()
        r.flag()
    for _ in range(pos):
        r.ue()
        r.flag()
    prev_deltas.append(neg + pos)
    return neg + pos


@dataclass
class HevcSPS:
    sps_id: int = 0
    vps_id: int = 0
    max_sub_layers: int = 1
    chroma_format_idc: int = 1
    pic_width: int = 0
    pic_height: int = 0
    conf_win: tuple = (0, 0, 0, 0)  # l, r, t, b (in chroma units)
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    log2_max_poc_lsb: int = 8
    log2_min_cb: int = 3
    log2_ctb: int = 6
    log2_min_tb: int = 2
    log2_max_tb: int = 5
    max_transform_hierarchy_depth_inter: int = 0
    max_transform_hierarchy_depth_intra: int = 0
    scaling_list_enabled: int = 0
    amp_enabled: int = 0
    sao_enabled: int = 0
    pcm_enabled: int = 0
    num_short_term_rps: int = 0
    temporal_mvp_enabled: int = 0
    strong_intra_smoothing: int = 0

    @property
    def width(self) -> int:
        sub = 2 if self.chroma_format_idc in (1, 2) else 1
        return self.pic_width - sub * (self.conf_win[0] + self.conf_win[1])

    @property
    def height(self) -> int:
        sub = 2 if self.chroma_format_idc == 1 else 1
        return self.pic_height - sub * (self.conf_win[2] + self.conf_win[3])

    @property
    def ctb_size(self) -> int:
        return 1 << self.log2_ctb


def parse_sps(rbsp: bytes) -> HevcSPS:
    r = BitReader(rbsp)
    s = HevcSPS()
    s.vps_id = r.u(4)
    s.max_sub_layers = r.u(3) + 1
    r.flag()  # sps_temporal_id_nesting_flag
    _profile_tier_level(r, s.max_sub_layers)
    s.sps_id = r.ue()
    s.chroma_format_idc = r.ue()
    if s.chroma_format_idc == 3:
        r.flag()
    s.pic_width = r.ue()
    s.pic_height = r.ue()
    if r.flag():  # conformance_window_flag
        s.conf_win = (r.ue(), r.ue(), r.ue(), r.ue())
    s.bit_depth_luma = r.ue() + 8
    s.bit_depth_chroma = r.ue() + 8
    s.log2_max_poc_lsb = r.ue() + 4
    sub_layer_ordering = r.flag()
    lo = 0 if sub_layer_ordering else s.max_sub_layers - 1
    for _ in range(lo, s.max_sub_layers):
        r.ue()
        r.ue()
        r.ue()
    s.log2_min_cb = r.ue() + 3
    s.log2_ctb = s.log2_min_cb + r.ue()
    s.log2_min_tb = r.ue() + 2
    s.log2_max_tb = s.log2_min_tb + r.ue()
    s.max_transform_hierarchy_depth_inter = r.ue()
    s.max_transform_hierarchy_depth_intra = r.ue()
    s.scaling_list_enabled = r.flag()
    if s.scaling_list_enabled:
        if r.flag():  # sps_scaling_list_data_present
            raise NotImplementedError("HEVC scaling list data")
    s.amp_enabled = r.flag()
    s.sao_enabled = r.flag()
    s.pcm_enabled = r.flag()
    if s.pcm_enabled:
        r.u(4)
        r.u(4)
        r.ue()
        r.ue()
        r.flag()
    s.num_short_term_rps = r.ue()
    deltas: List[int] = []
    for i in range(s.num_short_term_rps):
        _skip_short_term_rps(r, i, s.num_short_term_rps, deltas)
    if r.flag():  # long_term_ref_pics_present
        n = r.ue()
        for _ in range(n):
            r.u(s.log2_max_poc_lsb)
            r.flag()
    s.temporal_mvp_enabled = r.flag()
    s.strong_intra_smoothing = r.flag()
    # vui / extensions ignored
    return s


@dataclass
class HevcPPS:
    pps_id: int = 0
    sps_id: int = 0
    dependent_slice_segments: int = 0
    output_flag_present: int = 0
    num_extra_slice_header_bits: int = 0
    sign_data_hiding: int = 0
    cabac_init_present: int = 0
    num_ref_idx_l0_default: int = 1
    num_ref_idx_l1_default: int = 1
    init_qp: int = 26
    constrained_intra_pred: int = 0
    transform_skip_enabled: int = 0
    cu_qp_delta_enabled: int = 0
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    weighted_pred: int = 0
    weighted_bipred: int = 0
    transquant_bypass_enabled: int = 0
    tiles_enabled: int = 0
    entropy_coding_sync_enabled: int = 0  # WPP
    num_tile_columns: int = 1
    num_tile_rows: int = 1
    uniform_spacing: int = 1
    loop_filter_across_tiles: int = 1
    loop_filter_across_slices: int = 1
    deblocking_filter_control_present: int = 0
    deblocking_filter_override_enabled: int = 0
    deblocking_filter_disabled: int = 0
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0


def parse_pps(rbsp: bytes) -> HevcPPS:
    r = BitReader(rbsp)
    p = HevcPPS()
    p.pps_id = r.ue()
    p.sps_id = r.ue()
    p.dependent_slice_segments = r.flag()
    p.output_flag_present = r.flag()
    p.num_extra_slice_header_bits = r.u(3)
    p.sign_data_hiding = r.flag()
    p.cabac_init_present = r.flag()
    p.num_ref_idx_l0_default = r.ue() + 1
    p.num_ref_idx_l1_default = r.ue() + 1
    p.init_qp = r.se() + 26
    p.constrained_intra_pred = r.flag()
    p.transform_skip_enabled = r.flag()
    p.cu_qp_delta_enabled = r.flag()
    if p.cu_qp_delta_enabled:
        p.diff_cu_qp_delta_depth = r.ue()
    p.cb_qp_offset = r.se()
    p.cr_qp_offset = r.se()
    r.flag()  # pps_slice_chroma_qp_offsets_present
    p.weighted_pred = r.flag()
    p.weighted_bipred = r.flag()
    p.transquant_bypass_enabled = r.flag()
    p.tiles_enabled = r.flag()
    p.entropy_coding_sync_enabled = r.flag()
    if p.tiles_enabled:
        p.num_tile_columns = r.ue() + 1
        p.num_tile_rows = r.ue() + 1
        p.uniform_spacing = r.flag()
        if not p.uniform_spacing:
            for _ in range(p.num_tile_columns - 1):
                r.ue()
            for _ in range(p.num_tile_rows - 1):
                r.ue()
        p.loop_filter_across_tiles = r.flag()
    p.loop_filter_across_slices = r.flag()
    p.deblocking_filter_control_present = r.flag()
    if p.deblocking_filter_control_present:
        p.deblocking_filter_override_enabled = r.flag()
        p.deblocking_filter_disabled = r.flag()
        if not p.deblocking_filter_disabled:
            p.beta_offset_div2 = r.se()
            p.tc_offset_div2 = r.se()
    return p


def stream_info(data: bytes):
    """Probe an HEVC Annex-B stream for geometry (DecodeHeader parity)."""
    from . import nal as HN
    for u in HN.parse_nal_units(data):
        if u.nal_unit_type == HN.NAL_SPS:
            s = parse_sps(u.rbsp)
            return s
    return None
