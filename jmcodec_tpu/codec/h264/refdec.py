"""Pure-numpy H.264 reference decoder (intra/CAVLC scope for the walking
skeleton; SURVEY §7.3 step 1). Serves as the always-available CPU oracle, the
analog of the reference's MFX_IMPL_SOFTWARE fallback
(intel_dec/intel_dec.cpp:394-396).

Pipeline per frame: parse slice(s) -> per-MB intra recon on the *unfiltered*
frame -> deblocking pass -> output. Exposes decoded symbol planes so the TPU
device recon path can be driven by the same entropy front-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...ops import deblock as DB
from ...ops import intra as IP
from ...ops import transform as T
from ...utils.bits import BitReader
from ...ops import mc as MC
from . import inter as INTER
from . import macroblock as MB
from . import nal
from .params import PPS, SPS, parse_pps, parse_sps
from .slicehdr import SLICE_I, SLICE_P, parse_slice_header
from .symbols import (MBCLASS_I4x4, MBCLASS_I16x16, MBCLASS_IPCM,
                      FrameSymbols)


def scan8x8_to_raster(scan: List[int]) -> np.ndarray:
    """64 scan-order levels -> 8x8 raster block."""
    flat = np.zeros(64, np.int32)
    flat[T.ZIGZAG8x8] = np.asarray(scan[:64], np.int32)
    return flat.reshape(8, 8)


def recon_i8_block(Y: np.ndarray, g: MB.MBGrids, my: int, mx: int,
                   b8: int, mode: int, resid: np.ndarray,
                   cur_slice: int) -> None:
    """Reconstruct one intra 8x8 luma block (High profile, spec 8.3.2.2)."""
    x = mx * 16 + (b8 & 1) * 8
    y = my * 16 + (b8 >> 1) * 8
    avail_l = True if (b8 & 1) else g.mb_available(my, mx - 1, cur_slice)
    avail_t = True if (b8 >> 1) else g.mb_available(my - 1, mx, cur_slice)
    if b8 == 0:
        avail_tl = g.mb_available(my - 1, mx - 1, cur_slice)
        avail_tr = g.mb_available(my - 1, mx, cur_slice)
    elif b8 == 1:
        avail_tl = g.mb_available(my - 1, mx, cur_slice)
        avail_tr = g.mb_available(my - 1, mx + 1, cur_slice)
    elif b8 == 2:
        avail_tl = g.mb_available(my, mx - 1, cur_slice)
        avail_tr = True       # bottom row of blk 1, already decoded
    else:
        avail_tl = True
        avail_tr = False      # right MB not yet decoded
    t16 = np.zeros(16, np.int32)
    l8 = np.zeros(8, np.int32)
    tl = 0
    if avail_t:
        t16[:8] = Y[y - 1, x:x + 8]
        if avail_tr:
            t16[8:] = Y[y - 1, x + 8:x + 16]
        else:
            t16[8:] = t16[7]
    if avail_l:
        l8[:] = Y[y:y + 8, x - 1]
    if avail_tl:
        tl = int(Y[y - 1, x - 1])
    pred = IP.pred8x8(mode, t16, l8, tl, avail_t, avail_l, avail_tl)
    Y[y:y + 8, x:x + 8] = np.clip(pred + resid, 0, 255)


def suppress_t8_inner_edges(bs_v: np.ndarray, bs_h: np.ndarray,
                            t8: np.ndarray) -> None:
    """Zero bS on the non-8x8-aligned internal luma edges of 8x8-transform
    MBs (8.7: no filtering of 4x4 boundaries inside an 8x8 transform)."""
    t8blk = np.repeat(np.repeat(t8.astype(bool), 4, 0), 4, 1)
    gh, gw = t8blk.shape
    coloff = (np.arange(gw) % 4) % 2 == 1
    rowoff = (np.arange(gh) % 4) % 2 == 1
    bs_v[t8blk & coloff[None, :]] = 0
    bs_h[t8blk & rowoff[:, None]] = 0


def scan_to_raster4x4(scan: List[int], dc: Optional[int] = None) -> np.ndarray:
    """Scan-order coefficient list -> 4x4 raster block. If dc is given, the
    list holds 15 AC coefficients for scan positions 1..15."""
    flat = np.zeros(16, np.int32)
    if dc is None:
        flat[T.ZIGZAG4x4] = np.asarray(scan[:16], np.int32)
    else:
        flat[T.ZIGZAG4x4[1:]] = np.asarray(scan[:15], np.int32)
        flat[0] = dc
    return flat.reshape(4, 4)


def _tr_available(g: MB.MBGrids, my: int, mx: int, blk_idx: int,
                  by: int, bx: int, cur_slice: int) -> bool:
    """Top-right availability of luma 4x4 block (by,bx) = block blk_idx of MB
    (my,mx), following decode order (spec 6.4.11)."""
    nbx, nby = bx + 1, by - 1
    if nby < 0 or nbx >= g.mb_width * 4:
        return False
    nmy, nmx = nby // 4, nbx // 4
    if (nmy, nmx) == (my, mx):
        return blk_idx not in MB.TR_UNAVAILABLE_IN_MB
    return g.mb_available(nmy, nmx, cur_slice)


def recon_i4_block(Y: np.ndarray, g: MB.MBGrids, my: int, mx: int,
                   blk_idx: int, mode: int, resid: np.ndarray,
                   cur_slice: int) -> None:
    """Reconstruct one intra 4x4 luma block in place on the unfiltered frame."""
    x = mx * 16 + int(MB.BLK_X[blk_idx])
    y = my * 16 + int(MB.BLK_Y[blk_idx])
    by, bx = y // 4, x // 4
    # left/top neighbors inside the current MB precede this block in decode
    # order, so they are always available; across MB boundaries availability
    # follows the slice/decoded state.
    if bx == 0:
        avail_l = False
    elif (bx - 1) // 4 == mx:
        avail_l = True
    else:
        avail_l = g.mb_available(my, mx - 1, cur_slice)
    if by == 0:
        avail_t = False
    elif (by - 1) // 4 == my:
        avail_t = True
    else:
        avail_t = g.mb_available(my - 1, mx, cur_slice)
    avail_tr = _tr_available(g, my, mx, blk_idx, by, bx, cur_slice)

    t8 = np.zeros(8, np.int32)
    l4 = np.zeros(4, np.int32)
    tl = 0
    if avail_t:
        t8[:4] = Y[y - 1, x:x + 4]
        if avail_tr:
            t8[4:] = Y[y - 1, x + 4:x + 8]
        else:
            t8[4:] = t8[3]
    if avail_l:
        l4[:] = Y[y:y + 4, x - 1]
    if avail_t and avail_l:
        tl = int(Y[y - 1, x - 1])
    pred = IP.pred4x4(mode, t8, l4, tl, avail_t, avail_l)
    Y[y:y + 4, x:x + 4] = np.clip(pred + resid, 0, 255)


@dataclass
class DecodedFrame:
    Y: np.ndarray
    U: np.ndarray
    V: np.ndarray
    poc: int = 0
    frame_num: int = 0
    is_idr: bool = True
    qp_mb: Optional[np.ndarray] = None
    pre_deblock: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
    symbols: Optional["FrameSymbols"] = None

    def crop(self, sps: SPS):
        w, h = sps.width, sps.height
        return (self.Y[:h, :w], self.U[:h // 2, :w // 2], self.V[:h // 2, :w // 2])


@dataclass
class RefPicture:
    """One DPB entry: deblocked planes + lazily padded MC references."""
    frame_num: int
    Y: np.ndarray
    U: np.ndarray
    V: np.ndarray
    _padded: Optional[Tuple[np.ndarray, ...]] = None

    def padded(self):
        if self._padded is None:
            self._padded = (MC.pad_ref(self.Y), MC.pad_ref(self.U),
                            MC.pad_ref(self.V))
        return self._padded


class DPB:
    """Decoded picture buffer with sliding-window marking (no MMCO).
    The reference's vendor parser handled this internally; the display-order
    queue analog is nv_dec.cpp:113-186."""

    def __init__(self, max_refs: int = 16):
        self.max_refs = max_refs
        self.refs: List[RefPicture] = []

    def clear(self):
        self.refs = []

    def add(self, pic: RefPicture):
        self.refs.append(pic)
        while len(self.refs) > self.max_refs:
            self.refs.pop(0)

    def list0(self, cur_frame_num: int, max_frame_num: int) -> List[RefPicture]:
        """P ref list: descending PicNum (most recent first, wrap-aware)."""
        def dist(r):
            return (cur_frame_num - r.frame_num) % max_frame_num
        return sorted(self.refs, key=dist)


class H264ReferenceDecoder:
    """Stateful Annex-B decoder (Baseline/Main progressive, CAVLC)."""

    def __init__(self):
        self.sps: Dict[int, SPS] = {}
        self.pps: Dict[int, PPS] = {}
        self.frames: List[DecodedFrame] = []
        self.dpb = DPB()

    def decode_annexb(self, data: bytes) -> List[DecodedFrame]:
        out = []
        slices = []
        for u in nal.parse_nal_units(data):
            if u.nal_unit_type == nal.NAL_SPS:
                s = parse_sps(u.rbsp)
                self.sps[s.seq_parameter_set_id] = s
            elif u.nal_unit_type == nal.NAL_PPS:
                p = parse_pps(u.rbsp)
                self.pps[p.pic_parameter_set_id] = p
            elif u.is_slice:
                slices.append(u)
        # group slices into pictures by first_mb_in_slice == 0 boundaries
        cur: List[nal.NalUnit] = []
        pics: List[List[nal.NalUnit]] = []
        for u in slices:
            r = BitReader(u.rbsp)
            first_mb = r.ue()
            if first_mb == 0 and cur:
                pics.append(cur)
                cur = []
            cur.append(u)
        if cur:
            pics.append(cur)
        for pic in pics:
            out.append(self.decode_picture(pic))
        self.frames.extend(out)
        return out

    def decode_picture(self, units: List[nal.NalUnit]) -> DecodedFrame:
        # parse first slice header to size the frame
        h0, _ = parse_slice_header(units[0].rbsp,
                                   self._sps_for(units[0]), self._pps_for(units[0]),
                                   units[0].nal_unit_type, units[0].nal_ref_idc)
        pps = self.pps[h0.pic_parameter_set_id]
        sps = self.sps[pps.seq_parameter_set_id]
        mbw, mbh = sps.mb_width, sps.mb_height
        Y = np.zeros((mbh * 16, mbw * 16), np.int32)
        U = np.zeros((mbh * 8, mbw * 8), np.int32)
        V = np.zeros((mbh * 8, mbw * 8), np.int32)
        g = MB.MBGrids(mbw, mbh)
        m = INTER.MotionGrids(mbw, mbh)
        fs = FrameSymbols(mbw, mbh)
        deblock_params = []
        has_inter = False

        if h0.is_idr:
            self.dpb.clear()
        self.dpb.max_refs = max(1, sps.max_num_ref_frames)
        ref_list = self.dpb.list0(h0.frame_num, 1 << sps.log2_max_frame_num)

        cstate = None
        if pps.entropy_coding_mode_flag:
            from .cabac import CabacMBState
            cstate = CabacMBState(mbw, mbh)
        for slice_idx, u in enumerate(units):
            hdr, r = parse_slice_header(u.rbsp, sps, pps, u.nal_unit_type,
                                        u.nal_ref_idc)
            refs = []
            if hdr.slice_type == SLICE_P:
                has_inter = True
                refs = ref_list[:hdr.num_ref_idx_active_l0]
                if not refs:
                    raise ValueError("P slice with empty reference list")
            elif hdr.slice_type != SLICE_I:
                raise NotImplementedError("B slices land in a later round")
            if pps.entropy_coding_mode_flag:
                self._decode_slice_data_cabac(u.rbsp, r.pos, hdr, sps, pps,
                                              g, m, Y, U, V, slice_idx, refs,
                                              fs, cstate)
            elif hdr.slice_type == SLICE_I:
                self._decode_slice_data(r, hdr, sps, pps, g, Y, U, V,
                                        slice_idx, fs)
            else:
                self._decode_p_slice_data(r, hdr, sps, pps, g, m, Y, U, V,
                                          slice_idx, refs, fs)
            deblock_params.append(hdr)

        if len(deblock_params) > 1:
            # frame-level deblock uses the first slice's params; refuse to
            # emit wrong pixels when slices disagree or use idc==2
            # (no-filter-across-slice-boundaries), which the bS planes do not
            # model (ADVICE r1 #5)
            p0 = (deblock_params[0].disable_deblocking_filter_idc,
                  deblock_params[0].slice_alpha_c0_offset_div2,
                  deblock_params[0].slice_beta_offset_div2)
            for h in deblock_params:
                if ((h.disable_deblocking_filter_idc,
                     h.slice_alpha_c0_offset_div2,
                     h.slice_beta_offset_div2) != p0
                        or h.disable_deblocking_filter_idc == 2):
                    raise NotImplementedError(
                        "per-slice deblock params differ (or idc==2)")
        pre = (Y.copy(), U.copy(), V.copy())
        hdr = deblock_params[0]
        fs.fill_availability(g.slice_id)
        fs.frame_num = hdr.frame_num
        fs.is_idr = hdr.is_idr
        fs.nal_ref_idc = units[0].nal_ref_idc
        fs.max_num_ref_frames = sps.max_num_ref_frames
        fs.log2_max_frame_num = sps.log2_max_frame_num
        fs.deblock_enabled = hdr.disable_deblocking_filter_idc != 1
        fs.alpha_off = hdr.slice_alpha_c0_offset_div2 * 2
        fs.beta_off = hdr.slice_beta_offset_div2 * 2
        fs.chroma_qp_off = pps.chroma_qp_index_offset
        fs.second_chroma_qp_off = (pps.second_chroma_qp_index_offset
                                   if pps.second_chroma_qp_index_offset is not None
                                   else pps.chroma_qp_index_offset)
        if fs.deblock_enabled:
            if has_inter:
                bs_v, bs_h = compute_bs(g, m)
            else:
                bs_v, bs_h = DB.intra_frame_bs(mbh, mbw)
            if g.t8.any():
                suppress_t8_inner_edges(bs_v, bs_h, g.t8)
            DB.deblock_frame(Y, U, V, g.qp, bs_v, bs_h,
                             alpha_off=fs.alpha_off, beta_off=fs.beta_off,
                             chroma_qp_off=pps.chroma_qp_index_offset,
                             second_chroma_qp_off=pps.second_chroma_qp_index_offset)
        frame = DecodedFrame(
            Y=Y.astype(np.uint8), U=U.astype(np.uint8), V=V.astype(np.uint8),
            frame_num=hdr.frame_num, is_idr=hdr.is_idr, qp_mb=g.qp.copy(),
            pre_deblock=pre, symbols=fs)
        if units[0].nal_ref_idc != 0:
            self.dpb.add(RefPicture(hdr.frame_num, Y.copy(), U.copy(),
                                    V.copy()))
        return frame

    def _sps_for(self, u: nal.NalUnit) -> SPS:
        # slice header parsing needs sps/pps; peek pps id quickly
        r = BitReader(u.rbsp)
        r.ue()  # first_mb
        r.ue()  # slice_type
        pps_id = r.ue()
        return self.sps[self.pps[pps_id].seq_parameter_set_id]

    def _pps_for(self, u: nal.NalUnit) -> PPS:
        r = BitReader(u.rbsp)
        r.ue()
        r.ue()
        return self.pps[r.ue()]

    def _decode_slice_data(self, r: BitReader, hdr, sps: SPS, pps: PPS,
                           g: MB.MBGrids, Y, U, V, slice_idx: int,
                           fs: Optional[FrameSymbols] = None) -> None:
        mbw = sps.mb_width
        qp = pps.pic_init_qp + hdr.slice_qp_delta
        addr = hdr.first_mb_in_slice
        while True:
            my, mx = divmod(addr, mbw)
            if my >= sps.mb_height:
                raise ValueError("MB address out of range")
            mb_type = r.ue()
            s = MB.parse_i_macroblock(r, g, my, mx, slice_idx, qp, mb_type,
                                      bool(pps.transform_8x8_mode_flag))
            qp = s.qp
            reconstruct_intra_mb(Y, U, V, g, my, mx, slice_idx, s, pps)
            if fs is not None:
                fill_mb_symbols(fs, my, mx, s)
            addr += 1
            if not r.more_rbsp_data():
                break

    def _decode_slice_data_cabac(self, rbsp: bytes, bit_pos: int, hdr,
                                 sps: SPS, pps: PPS, g: MB.MBGrids,
                                 m: "INTER.MotionGrids", Y, U, V,
                                 slice_idx: int, refs, fs, cstate) -> None:
        """CABAC slice_data (7.3.4 ae(v) branch): per-MB mb_skip_flag (P),
        macroblock layer, end_of_slice_flag."""
        from .cabac import CabacSliceDecoder
        cd = CabacSliceDecoder(rbsp, bit_pos, hdr, sps, pps, g, m, cstate)
        mbw = sps.mb_width
        n_mbs = mbw * sps.mb_height
        qp = pps.pic_init_qp + hdr.slice_qp_delta
        addr = hdr.first_mb_in_slice
        is_p = hdr.slice_type == SLICE_P
        while True:
            if addr >= n_mbs:
                raise ValueError("MB address out of range")
            my, mx = divmod(addr, mbw)
            if is_p and cd.mb_skip_flag(my, mx, slice_idx):
                s = cd.apply_skip(my, mx, slice_idx, qp)
            elif is_p:
                s = cd.parse_p_mb_body(my, mx, slice_idx, qp, cd.p_mbtype())
                qp = s.qp
            else:
                s = cd.parse_intra_mb_body(my, mx, slice_idx, qp,
                                           cd.i_mbtype(my, mx, slice_idx))
                qp = s.qp
            if s.mb_class == INTER.MB_P:
                reconstruct_inter_mb(Y, U, V, g, my, mx, slice_idx, s, refs,
                                     pps)
            else:
                reconstruct_intra_mb(Y, U, V, g, my, mx, slice_idx, s, pps)
            if fs is not None:
                fill_mb_symbols(fs, my, mx, s,
                                motion=m if s.mb_class == INTER.MB_P else None)
            addr += 1
            if cd.end_of_slice():
                break

    def _decode_p_slice_data(self, r: BitReader, hdr, sps: SPS, pps: PPS,
                             g: MB.MBGrids, m: INTER.MotionGrids,
                             Y, U, V, slice_idx: int, refs,
                             fs: Optional[FrameSymbols] = None) -> None:
        mbw = sps.mb_width
        n_mbs = mbw * sps.mb_height
        qp = pps.pic_init_qp + hdr.slice_qp_delta
        addr = hdr.first_mb_in_slice
        num_ref = hdr.num_ref_idx_active_l0
        while True:
            skip_run = r.ue()
            for _ in range(skip_run):
                if addr >= n_mbs:
                    raise ValueError("skip run past end of picture")
                my, mx = divmod(addr, mbw)
                s = INTER.apply_skip(g, m, my, mx, slice_idx, qp)
                reconstruct_inter_mb(Y, U, V, g, my, mx, slice_idx, s, refs,
                                     pps)
                if fs is not None:
                    fill_mb_symbols(fs, my, mx, s, motion=m)
                addr += 1
            if not r.more_rbsp_data():
                break
            my, mx = divmod(addr, mbw)
            mb_type = r.ue()
            s = INTER.parse_p_macroblock(r, g, m, my, mx, slice_idx, qp,
                                         mb_type, num_ref,
                                         bool(pps.transform_8x8_mode_flag))
            qp = s.qp
            if s.mb_class == INTER.MB_P:
                reconstruct_inter_mb(Y, U, V, g, my, mx, slice_idx, s, refs,
                                     pps)
            else:
                reconstruct_intra_mb(Y, U, V, g, my, mx, slice_idx, s, pps)
            if fs is not None:
                fill_mb_symbols(fs, my, mx, s, motion=m)
            addr += 1
            if not r.more_rbsp_data():
                break


def fill_mb_symbols(fs: FrameSymbols, my: int, mx: int, s: MB.MBSymbols,
                    motion: Optional["INTER.MotionGrids"] = None) -> None:
    """Record one parsed MB into the dense symbol planes."""
    fs.qp[my, mx] = s.qp
    if getattr(s, "transform8x8", 0):
        # 8x8 residuals have no dense-plane form yet; flag the frame so the
        # device path defers to host recon
        fs.has_t8 = True
    if s.mb_class == INTER.MB_P:
        fs.mb_class[my, mx] = 3
        if fs.mv is None:
            fs.mv = np.zeros((fs.mb_height * 4, fs.mb_width * 4, 2), np.int32)
            fs.ref = np.full((fs.mb_height * 4, fs.mb_width * 4), -1, np.int32)
        sl = (slice(my * 4, my * 4 + 4), slice(mx * 4, mx * 4 + 4))
        fs.mv[sl] = motion.mv[sl]
        fs.ref[sl] = motion.ref[sl]
        for i in range(16):
            bx = mx * 4 + int(MB.BLK_X[i]) // 4
            by = my * 4 + int(MB.BLK_Y[i]) // 4
            fs.luma_coeffs[by, bx] = scan_to_raster4x4(s.luma_ac[i])
        for comp in range(2):
            fs.chroma_dc[comp, my, mx] = np.asarray(
                s.chroma_dc[comp], np.int32).reshape(2, 2)
            for i in range(4):
                bx = mx * 2 + int(MB.CBLK_X[i]) // 4
                by = my * 2 + int(MB.CBLK_Y[i]) // 4
                fs.chroma_coeffs[comp, by, bx] = scan_to_raster4x4(
                    list(s.chroma_ac[comp][i]), dc=0)
        return
    if s.mb_class == MB.MB_IPCM:
        fs.mb_class[my, mx] = MBCLASS_IPCM
        fs.has_pcm = True
        if fs.pcm_y is None:
            fs.pcm_y = np.zeros((fs.mb_height * 16, fs.mb_width * 16), np.int32)
            fs.pcm_u = np.zeros((fs.mb_height * 8, fs.mb_width * 8), np.int32)
            fs.pcm_v = np.zeros((fs.mb_height * 8, fs.mb_width * 8), np.int32)
        fs.pcm_y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = np.frombuffer(
            s.pcm_luma, np.uint8).reshape(16, 16)
        fs.pcm_u[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = np.frombuffer(
            s.pcm_chroma[:64], np.uint8).reshape(8, 8)
        fs.pcm_v[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = np.frombuffer(
            s.pcm_chroma[64:], np.uint8).reshape(8, 8)
        return
    is16 = s.mb_class == MB.MB_I16x16
    fs.mb_class[my, mx] = MBCLASS_I16x16 if is16 else MBCLASS_I4x4
    fs.i16_mode[my, mx] = s.i16_mode
    fs.chroma_mode[my, mx] = s.chroma_mode
    for i in range(16):
        bx = mx * 4 + int(MB.BLK_X[i]) // 4
        by = my * 4 + int(MB.BLK_Y[i]) // 4
        if is16:
            fs.luma_coeffs[by, bx] = scan_to_raster4x4(s.luma_ac[i], dc=0)
            fs.i4_modes[by, bx] = 0
        else:
            fs.luma_coeffs[by, bx] = scan_to_raster4x4(s.luma_ac[i])
            fs.i4_modes[by, bx] = s.i4_modes[i]
    if is16:
        fs.luma_dc[my, mx] = scan_to_raster4x4(s.luma_dc)
    for comp in range(2):
        fs.chroma_dc[comp, my, mx] = np.asarray(
            s.chroma_dc[comp], np.int32).reshape(2, 2)
        for i in range(4):
            bx = mx * 2 + int(MB.CBLK_X[i]) // 4
            by = my * 2 + int(MB.CBLK_Y[i]) // 4
            fs.chroma_coeffs[comp, by, bx] = scan_to_raster4x4(
                list(s.chroma_ac[comp][i]), dc=0)


def reconstruct_inter_mb(Y, U, V, g: MB.MBGrids, my: int, mx: int,
                         cur_slice: int, s, refs, pps: PPS) -> None:
    """Reconstruct one P macroblock: MC prediction + residual."""
    x0, y0 = mx * 16, my * 16
    predY = np.zeros((16, 16), np.int32)
    predU = np.zeros((8, 8), np.int32)
    predV = np.zeros((8, 8), np.int32)
    for part in s.partitions:
        ref = refs[part.ref_idx]
        pY, pU, pV = ref.padded()
        lx = part.bx * 4
        ly = part.by * 4
        w = part.w4 * 4
        h = part.h4 * 4
        blk = MC.mc_luma_block(pY, lx, ly, int(part.mv[0]), int(part.mv[1]),
                               w, h)
        predY[ly - y0:ly - y0 + h, lx - x0:lx - x0 + w] = blk
        cx, cy = part.bx * 2, part.by * 2
        cw, ch = part.w4 * 2, part.h4 * 2
        cu = MC.mc_chroma_block(pU, cx, cy, int(part.mv[0]), int(part.mv[1]),
                                cw, ch)
        cv = MC.mc_chroma_block(pV, cx, cy, int(part.mv[0]), int(part.mv[1]),
                                cw, ch)
        predU[cy - my * 8:cy - my * 8 + ch, cx - mx * 8:cx - mx * 8 + cw] = cu
        predV[cy - my * 8:cy - my * 8 + ch, cx - mx * 8:cx - mx * 8 + cw] = cv

    qp = s.qp
    mbres = np.zeros((16, 16), np.int32)
    if s.cbp_luma and s.transform8x8:
        for b8 in range(4):
            if s.cbp_luma & (1 << b8):
                x8, y8 = (b8 & 1) * 8, (b8 >> 1) * 8
                d = T.np_dequant_8x8(scan8x8_to_raster(s.luma8x8[b8]), qp)
                mbres[y8:y8 + 8, x8:x8 + 8] = T.np_inverse_transform_8x8(d)
    elif s.cbp_luma:
        for i in range(16):
            if s.cbp_luma & (1 << (i >> 2)):
                bx4, by4 = int(MB.BLK_X[i]), int(MB.BLK_Y[i])
                blk = scan_to_raster4x4(s.luma_ac[i])
                d = T.np_dequant_4x4(blk, qp)
                mbres[by4:by4 + 4, bx4:bx4 + 4] = T.np_inverse_transform_4x4(d)
    Y[y0:y0 + 16, x0:x0 + 16] = np.clip(predY + mbres, 0, 255)

    for comp, (plane, pred) in ((0, (U, predU)), (1, (V, predV))):
        qpc = int(T.chroma_qp(qp, pps.chroma_qp_offset(comp)))
        res = np.zeros((8, 8), np.int32)
        if s.cbp_chroma:
            dc2 = np.asarray(s.chroma_dc[comp], np.int32).reshape(2, 2)
            dc_vals = T.np_chroma_dc_decode(dc2, qpc)
            for i in range(4):
                bx4, by4 = int(MB.CBLK_X[i]), int(MB.CBLK_Y[i])
                ac = scan_to_raster4x4(list(s.chroma_ac[comp][i]), dc=0)
                d = T.np_dequant_4x4(ac, qpc)
                d[0, 0] = dc_vals[by4 // 4, bx4 // 4]
                res[by4:by4 + 4, bx4:bx4 + 4] = T.np_inverse_transform_4x4(d)
        plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = np.clip(pred + res, 0, 255)


def compute_bs(g: MB.MBGrids, m: INTER.MotionGrids):
    """Boundary strengths for a frame with inter MBs (spec 8.7.2.1).

    Vectorized over the 4x4 grid: intra rules first, then coefficients, then
    motion differences."""
    gh, gw = g.nz_luma.shape
    mb_intra = (g.mb_class >= 0) & (g.mb_class != INTER.MB_P)
    blk_intra = np.repeat(np.repeat(mb_intra, 4, 0), 4, 1)
    nzc = np.maximum(g.nz_luma, 0)
    if g.t8.any():
        # 8x8-transform MBs: "the 4x4 block has coefficients" means the
        # covering 8x8 block does (8.7.2.1 with transform_size_8x8_flag)
        agg = nzc.reshape(gh // 2, 2, gw // 2, 2).sum(axis=(1, 3))
        rep = np.repeat(np.repeat(agg, 2, 0), 2, 1)
        t8blk = np.repeat(np.repeat(g.t8.astype(bool), 4, 0), 4, 1)
        nzc = np.where(t8blk, rep, nzc)
    nz = nzc > 0

    def edge_bs(p_sl, q_sl, mb_edge):
        intra_either = blk_intra[p_sl] | blk_intra[q_sl]
        bs = np.where(intra_either, np.where(mb_edge, 4, 3), 0)
        coeff = nz[p_sl] | nz[q_sl]
        mvd = (np.abs(m.mv[p_sl][..., 0] - m.mv[q_sl][..., 0]) >= 4) | \
              (np.abs(m.mv[p_sl][..., 1] - m.mv[q_sl][..., 1]) >= 4)
        refd = m.ref[p_sl] != m.ref[q_sl]
        inter_bs = np.where(coeff, 2, np.where(mvd | refd, 1, 0))
        return np.where(intra_either, bs, inter_bs)

    bs_v = np.zeros((gh, gw), np.int32)
    bs_h = np.zeros((gh, gw), np.int32)
    col_is_mb_edge = (np.arange(1, gw) % 4) == 0
    row_is_mb_edge = (np.arange(1, gh) % 4) == 0
    bs_v[:, 1:] = edge_bs((slice(None), slice(0, gw - 1)),
                          (slice(None), slice(1, gw)),
                          col_is_mb_edge[None, :])
    bs_h[1:, :] = edge_bs((slice(0, gh - 1), slice(None)),
                          (slice(1, gh), slice(None)),
                          row_is_mb_edge[:, None])
    return bs_v, bs_h


def reconstruct_intra_mb(Y, U, V, g: MB.MBGrids, my: int, mx: int,
                         cur_slice: int, s: MB.MBSymbols, pps: PPS) -> None:
    """Reconstruct one intra MB onto the unfiltered frame planes (int32)."""
    x0, y0 = mx * 16, my * 16
    if s.mb_class == MB.MB_IPCM:
        Y[y0:y0 + 16, x0:x0 + 16] = np.frombuffer(
            s.pcm_luma, np.uint8).reshape(16, 16)
        cb = np.frombuffer(s.pcm_chroma[:64], np.uint8).reshape(8, 8)
        cr = np.frombuffer(s.pcm_chroma[64:], np.uint8).reshape(8, 8)
        U[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cb
        V[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cr
        return

    qp = s.qp
    if s.mb_class == MB.MB_I4x4 and s.transform8x8:
        for b8 in range(4):
            if s.cbp_luma & (1 << b8):
                d = T.np_dequant_8x8(scan8x8_to_raster(s.luma8x8[b8]), qp)
                resid = T.np_inverse_transform_8x8(d)
            else:
                resid = np.zeros((8, 8), np.int32)
            recon_i8_block(Y, g, my, mx, b8, s.i8_modes[b8], resid, cur_slice)
    elif s.mb_class == MB.MB_I4x4:
        for i in range(16):
            blk = scan_to_raster4x4(s.luma_ac[i])
            d = T.np_dequant_4x4(blk, qp)
            resid = T.np_inverse_transform_4x4(d)
            recon_i4_block(Y, g, my, mx, i, s.i4_modes[i], resid, cur_slice)
    else:
        # I16x16: prediction over the whole MB from unfiltered neighbors
        avail_l = g.mb_available(my, mx - 1, cur_slice)
        avail_t = g.mb_available(my - 1, mx, cur_slice)
        t16 = Y[y0 - 1, x0:x0 + 16] if avail_t else np.zeros(16, np.int32)
        l16 = Y[y0:y0 + 16, x0 - 1] if avail_l else np.zeros(16, np.int32)
        tl = int(Y[y0 - 1, x0 - 1]) if (avail_t and avail_l) else 0
        pred = IP.pred16x16(s.i16_mode, t16, l16, tl, avail_t, avail_l)
        dc_blk = scan_to_raster4x4(s.luma_dc)
        dc_vals = T.np_luma_dc_decode(dc_blk, qp)  # [4,4] per-block DC
        mbres = np.zeros((16, 16), np.int32)
        for i in range(16):
            bx, by = int(MB.BLK_X[i]), int(MB.BLK_Y[i])
            ac = scan_to_raster4x4(s.luma_ac[i], dc=0)
            d = T.np_dequant_4x4(ac, qp)
            d[0, 0] = dc_vals[by // 4, bx // 4]
            mbres[by:by + 4, bx:bx + 4] = T.np_inverse_transform_4x4(d)
        Y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred + mbres, 0, 255)

    # chroma
    cx0, cy0 = mx * 8, my * 8
    avail_l = g.mb_available(my, mx - 1, cur_slice)
    avail_t = g.mb_available(my - 1, mx, cur_slice)
    for comp, plane in ((0, U), (1, V)):
        qpc = int(T.chroma_qp(qp, pps.chroma_qp_offset(comp)))
        t8 = plane[cy0 - 1, cx0:cx0 + 8] if avail_t else np.zeros(8, np.int32)
        l8 = plane[cy0:cy0 + 8, cx0 - 1] if avail_l else np.zeros(8, np.int32)
        tl = int(plane[cy0 - 1, cx0 - 1]) if (avail_t and avail_l) else 0
        pred = IP.pred_chroma8x8(s.chroma_mode, t8, l8, tl, avail_t, avail_l)
        dc2 = np.asarray(s.chroma_dc[comp], np.int32).reshape(2, 2)
        dc_vals = T.np_chroma_dc_decode(dc2, qpc)
        res = np.zeros((8, 8), np.int32)
        for i in range(4):
            bx, by = int(MB.CBLK_X[i]), int(MB.CBLK_Y[i])
            ac = scan_to_raster4x4(list(s.chroma_ac[comp][i]), dc=0)
            d = T.np_dequant_4x4(ac, qpc)
            d[0, 0] = dc_vals[by // 4, bx // 4]
            res[by:by + 4, bx:bx + 4] = T.np_inverse_transform_4x4(d)
        plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(pred + res, 0, 255)
