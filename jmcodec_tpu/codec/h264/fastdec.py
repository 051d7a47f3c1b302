"""Production decode front-end: Python header parsing + native (C++) CAVLC
slice parsing -> FrameSymbols -> device recon.

This is the fast path used by the session API and benchmarks; the pure-Python
reference decoder (refdec.py) is the oracle it is tested against. Covers
CAVLC I and P slices (motion parsed + MV-predicted natively); CABAC, B
slices and the 8x8 transform raise NotImplementedError so the caller falls
back to the host reference path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ...utils.bits import BitReader
from ... import native
from . import nal
from .params import PPS, SPS, parse_pps, parse_sps
from .slicehdr import SLICE_I, SLICE_P, parse_slice_header
from .symbols import FrameSymbols


class FastH264Parser:
    """Annex-B -> FrameSymbols stream (intra scope), using the C++ parser."""

    def __init__(self):
        self.sps: Dict[int, SPS] = {}
        self.pps: Dict[int, PPS] = {}
        if not native.available():
            raise RuntimeError("native parser could not be built")

    def parse_annexb(self, data: bytes) -> List[Tuple[FrameSymbols, SPS]]:
        pics: List[List[nal.NalUnit]] = []
        cur: List[nal.NalUnit] = []
        for u in nal.parse_nal_units(data):
            if u.nal_unit_type == nal.NAL_SPS:
                s = parse_sps(u.rbsp)
                self.sps[s.seq_parameter_set_id] = s
            elif u.nal_unit_type == nal.NAL_PPS:
                p = parse_pps(u.rbsp)
                self.pps[p.pic_parameter_set_id] = p
            elif u.is_slice:
                r = BitReader(u.rbsp)
                if r.ue() == 0 and cur:  # first_mb_in_slice == 0 -> new picture
                    pics.append(cur)
                    cur = []
                cur.append(u)
        if cur:
            pics.append(cur)
        return [self.parse_picture(p) for p in pics]

    def parse_picture(self, units: List[nal.NalUnit]) -> Tuple[FrameSymbols, SPS]:
        # headers via the Python syntax layer (tiny), slice_data via C++
        r0 = BitReader(units[0].rbsp)
        r0.ue()
        r0.ue()
        pps = self.pps[r0.ue()]
        sps = self.sps[pps.seq_parameter_set_id]
        mbw, mbh = sps.mb_width, sps.mb_height
        fs = FrameSymbols(mbw, mbh)
        parser = native.NativeSliceParser(mbw, mbh)
        hdr0 = None
        has_p = False
        wp0 = None
        rm0 = None
        for slice_id, u in enumerate(units):
            hdr, r = parse_slice_header(u.rbsp, sps, pps, u.nal_unit_type,
                                        u.nal_ref_idc)
            if hdr.slice_type not in (SLICE_I, SLICE_P):
                raise NotImplementedError("fast path: I/P slices only")
            cabac = bool(pps.entropy_coding_mode_flag)
            if (not cabac and hdr.slice_type == SLICE_I
                    and pps.transform_8x8_mode_flag):
                raise NotImplementedError("8x8 transform (native parser)")
            if hdr.mmco_ops or hdr.adaptive_ref_pic_marking_mode_flag:
                raise NotImplementedError("MMCO (host path)")
            if hdr0 is None:
                hdr0 = hdr
            elif len(units) > 1:
                # per-slice deblock control is not plumbed into the frame-level
                # bS planes; decode honestly or not at all (ADVICE r1 #5)
                cur = (hdr.disable_deblocking_filter_idc,
                       hdr.slice_alpha_c0_offset_div2,
                       hdr.slice_beta_offset_div2)
                ref = (hdr0.disable_deblocking_filter_idc,
                       hdr0.slice_alpha_c0_offset_div2,
                       hdr0.slice_beta_offset_div2)
                if cur != ref or hdr.disable_deblocking_filter_idc == 2:
                    raise NotImplementedError(
                        "per-slice deblock params differ (or idc==2)")
            if hdr.slice_type == SLICE_P:
                has_p = True
                rcur = (tuple(hdr.ref_mods_l0), hdr.num_ref_idx_active_l0)
                if rm0 is None:
                    rm0 = rcur
                elif rm0 != rcur:
                    raise NotImplementedError(
                        "per-slice ref list modifications differ (host path)")
                if hdr.weights_l0 is not None:
                    wcur = (hdr.luma_log2_weight_denom,
                            hdr.chroma_log2_weight_denom,
                            tuple(hdr.weights_l0))
                    if wp0 is None:
                        wp0 = wcur
                    elif wp0 != wcur:
                        raise NotImplementedError(
                            "per-slice pred_weight_tables differ (host path)")
                if cabac:
                    parser.parse_cabac_slice(
                        fs, u.rbsp, r.pos, hdr.first_mb_in_slice,
                        hdr.qp(pps), slice_id, True,
                        hdr.num_ref_idx_active_l0,
                        bool(pps.transform_8x8_mode_flag),
                        hdr.cabac_init_idc)
                else:
                    parser.parse_p_slice(
                        fs, u.rbsp, r.pos, hdr.first_mb_in_slice,
                        hdr.qp(pps), slice_id, hdr.num_ref_idx_active_l0,
                        bool(pps.transform_8x8_mode_flag))
            elif cabac:
                parser.parse_cabac_slice(
                    fs, u.rbsp, r.pos, hdr.first_mb_in_slice, hdr.qp(pps),
                    slice_id, False, 1,
                    bool(pps.transform_8x8_mode_flag), 0)
            else:
                parser.parse_slice(fs, u.rbsp, r.pos, hdr.first_mb_in_slice,
                                   hdr.qp(pps), slice_id)
        if has_p:
            fs.mv = parser.mv.copy()
            fs.ref = parser.ref.copy()
            if wp0 is not None:
                fs.wp = np.asarray(wp0[2], np.int32)
                fs.wp_logwd = (wp0[0], wp0[1])
            if rm0 is not None:
                fs.ref_mods_l0 = list(rm0[0])
                fs.num_ref_l0 = rm0[1]
        fs.fill_availability(parser.slice_map)
        fs.frame_num = hdr0.frame_num
        fs.is_idr = hdr0.is_idr
        fs.nal_ref_idc = units[0].nal_ref_idc
        fs.max_num_ref_frames = sps.max_num_ref_frames
        fs.log2_max_frame_num = sps.log2_max_frame_num
        fs.deblock_enabled = hdr0.disable_deblocking_filter_idc != 1
        fs.alpha_off = hdr0.slice_alpha_c0_offset_div2 * 2
        fs.beta_off = hdr0.slice_beta_offset_div2 * 2
        fs.chroma_qp_off = pps.chroma_qp_index_offset
        fs.second_chroma_qp_off = (pps.second_chroma_qp_index_offset
                                   if pps.second_chroma_qp_index_offset is not None
                                   else pps.chroma_qp_index_offset)
        # decode order == display order is guaranteed for poc type 2
        # (B-frame-free streams, e.g. x264 with bframes=0); the session's
        # fast path requires this to emit without a reorder buffer
        fs.no_reorder = sps.pic_order_cnt_type == 2
        return fs, sps
