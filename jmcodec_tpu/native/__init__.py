"""Native (C++) host runtime: fast CAVLC slice parser.

Built on demand with g++ into a shared library and bound via ctypes (the
image has no pybind11). Falls back gracefully: callers check `available()`
and use the Python reference parser otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src")
_BUILD = os.path.join(_DIR, "build")
_LIB = os.path.join(_BUILD, "libjmxnative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _gen_header(hdr_name: str, module: str, deps) -> str:
    hdr = os.path.join(_SRC, hdr_name)
    dep_paths = [os.path.join(_DIR, "..", *d) for d in deps]
    if os.path.exists(hdr) and all(
            os.path.getmtime(hdr) >= os.path.getmtime(p) for p in dep_paths):
        return hdr
    out = subprocess.run(
        [sys.executable, "-m", module],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(_DIR, "..", ".."))
    with open(hdr, "w") as f:
        f.write(out.stdout)
    return hdr


def _generate_tables() -> None:
    _gen_header("h264_tables.h", "jmcodec_tpu.native.gen_tables",
                [("codec", "h264", "cavlc.py")])
    _gen_header("hevc_tables.h", "jmcodec_tpu.native.gen_hevc_native_tables",
                [("codec", "hevc", "cabac_tables.py"),
                 ("codec", "h264", "cabac_tables.py")])
    _gen_header("h264_cabac_tables.h",
                "jmcodec_tpu.native.gen_h264_cabac_tables",
                [("codec", "h264", "cabac_tables.py")])


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns its path."""
    os.makedirs(_BUILD, exist_ok=True)
    srcs = [os.path.join(_SRC, "h264_parse.cc"),
            os.path.join(_SRC, "h264_cabac.cc"),
            os.path.join(_SRC, "hevc_parse.cc")]
    if (not force and os.path.exists(_LIB)
            and all(os.path.getmtime(_LIB) >= os.path.getmtime(s) for s in srcs)):
        return _LIB
    _generate_tables()
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB] + srcs
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            path = build()
            lib = ctypes.CDLL(path)
            lib.jmx_parse_i_slice.restype = ctypes.c_int
            lib.jmx_parse_cabac_slice.restype = ctypes.c_int
            lib.jmx_hevc_parse_i_slice.restype = ctypes.c_int
            lib.jmx_hevc_parse_pb_slice.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeSliceParser:
    """Per-picture parse context mirroring MBGrids, backed by the C parser."""

    def __init__(self, mbw: int, mbh: int):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native parser unavailable")
        self.mbw, self.mbh = mbw, mbh
        self.nz_luma = np.full((mbh * 4, mbw * 4), -1, np.int32)
        self.nz_chroma = np.full((2, mbh * 2, mbw * 2), -1, np.int32)
        self.i4_grid = np.full((mbh * 4, mbw * 4), -1, np.int32)
        self.slice_map = np.full((mbh, mbw), -1, np.int32)

    def parse_slice(self, fs, rbsp: bytes, bit_offset: int, first_mb: int,
                    slice_qp: int, slice_id: int) -> int:
        """Parse slice_data into FrameSymbols fs. Returns #MBs parsed."""
        buf = np.frombuffer(rbsp, np.uint8)
        if fs.pcm_y is None:
            # allocate lazily only when the stream needs PCM; pass scratch
            pcm_y = np.zeros((self.mbh * 16, self.mbw * 16), np.uint8)
            pcm_c = np.zeros((2, self.mbh * 8, self.mbw * 8), np.uint8)
        else:
            pcm_y = fs.pcm_y.astype(np.uint8)
            pcm_c = np.stack([fs.pcm_u, fs.pcm_v]).astype(np.uint8)
        n = self.lib.jmx_parse_i_slice(
            _ptr(buf), ctypes.c_int64(len(rbsp)), ctypes.c_int64(bit_offset),
            self.mbw, self.mbh, first_mb, slice_qp, slice_id,
            _ptr(self.nz_luma), _ptr(self.nz_chroma), _ptr(self.i4_grid),
            _ptr(self.slice_map), _ptr(fs.mb_class), _ptr(fs.qp),
            _ptr(fs.i4_modes), _ptr(fs.i16_mode), _ptr(fs.chroma_mode),
            _ptr(fs.luma_coeffs), _ptr(fs.luma_dc), _ptr(fs.chroma_coeffs),
            _ptr(fs.chroma_dc), _ptr(pcm_y), _ptr(pcm_c))
        if n < 0:
            raise ValueError(f"native slice parse error {n}")
        if (fs.mb_class == 2).any():
            fs.has_pcm = True
            fs.pcm_y = pcm_y.astype(np.int32)
            fs.pcm_u = pcm_c[0].astype(np.int32)
            fs.pcm_v = pcm_c[1].astype(np.int32)
        return n


class HevcNativeUnsupported(NotImplementedError):
    """Picture is outside the native HEVC parser's scope; callers fall back
    to the Python oracle parser."""


def hevc_fill_plan(plan, hdr, sps, pps, rbsp: bytes,
                   substream_rbsp) -> None:
    """Fill a HevcFramePlan's tensors by parsing one I slice natively.

    Raises HevcNativeUnsupported when the stream uses a feature the C++
    parser does not cover (PCM, transquant bypass, transform_skip, ...);
    ValueError on a corrupt bitstream.
    """
    lib = get_lib()
    if lib is None:
        raise HevcNativeUnsupported("native library unavailable")
    if sps.pcm_enabled:
        raise HevcNativeUnsupported("PCM")
    if pps.cu_qp_delta_enabled:
        # the C++ front-end has no cu_qp_delta syntax yet; the Python
        # parser covers it and still feeds the device plan path
        raise HevcNativeUnsupported("cu_qp_delta")
    buf = np.frombuffer(rbsp, np.uint8)
    iparams = np.array([
        sps.pic_width, sps.pic_height, sps.log2_ctb, sps.log2_min_cb,
        sps.log2_min_tb, sps.log2_max_tb,
        sps.max_transform_hierarchy_depth_intra,
        hdr.qp, hdr.init_type, hdr.sao_luma, hdr.sao_chroma,
        pps.entropy_coding_sync_enabled, pps.sign_data_hiding,
        pps.transform_skip_enabled, pps.transquant_bypass_enabled,
        sps.pcm_enabled, hdr.segment_address, len(substream_rbsp),
    ], np.int32)
    subs = np.asarray(substream_rbsp or [0], np.int64)
    cw = (sps.pic_width + 3) // 4
    ch = (sps.pic_height + 3) // 4
    scratch = np.zeros(5 * cw * ch, np.uint8)
    n = lib.jmx_hevc_parse_i_slice(
        _ptr(buf), ctypes.c_int64(len(rbsp)),
        ctypes.c_int64(hdr.data_bitpos),
        _ptr(iparams), _ptr(subs),
        _ptr(plan.coeff_y), _ptr(plan.tu_log2_y), _ptr(plan.mode_y),
        _ptr(plan.zidx_y), _ptr(plan.qp_y),
        _ptr(plan.coeff_cb), _ptr(plan.coeff_cr),
        _ptr(plan.tu_log2_c), _ptr(plan.mode_c), _ptr(plan.zidx_c),
        _ptr(plan.bs_ver), _ptr(plan.bs_hor),
        _ptr(plan.sao_type), _ptr(plan.sao_offsets), _ptr(plan.sao_band),
        _ptr(plan.sao_eo), _ptr(scratch))
    if n in (-2, -3, -4, -7):
        raise HevcNativeUnsupported(f"native HEVC parser: code {n}")
    if n <= 0:
        raise ValueError(f"native HEVC slice parse error {n}")


def hevc_fill_plan_inter(plan, hdr, sps, pps, rbsp: bytes, substream_rbsp,
                         ictx) -> dict:
    """Fill an inter (P/B) HevcFramePlan natively. ictx: dict with the
    slice's motion context (ref lists, TMVP collocated picture arrays).
    Returns the parse-state cell grids the caller feeds into finish_bs and
    the DPB (pred/mv/ref_poc/intra4/cbf4/edges).

    Raises HevcNativeUnsupported outside native scope, ValueError on a
    corrupt stream. A return code of -40 (motion beyond the device MC pad)
    sets plan.supported = False but still returns complete state."""
    lib = get_lib()
    if lib is None:
        raise HevcNativeUnsupported("native library unavailable")
    if sps.pcm_enabled:
        raise HevcNativeUnsupported("PCM")
    if pps.cu_qp_delta_enabled:
        raise HevcNativeUnsupported("cu_qp_delta")
    # explicit weighted prediction needs NO parser support: the weight
    # table lives in the slice header (Python-parsed) and slice-data
    # syntax is weight-independent; the device combine consumes the
    # per-cell weights via plan.set_wp/fill_wp_cells (r5)
    buf = np.frombuffer(rbsp, np.uint8)
    iparams = np.array([
        sps.pic_width, sps.pic_height, sps.log2_ctb, sps.log2_min_cb,
        sps.log2_min_tb, sps.log2_max_tb,
        sps.max_transform_hierarchy_depth_intra,
        hdr.qp, hdr.init_type, hdr.sao_luma, hdr.sao_chroma,
        pps.entropy_coding_sync_enabled, pps.sign_data_hiding,
        pps.transform_skip_enabled, pps.transquant_bypass_enabled,
        sps.pcm_enabled, hdr.segment_address, len(substream_rbsp),
    ], np.int32)
    ip2 = np.array([
        ictx["slice_type"], ictx["num_ref"][0], ictx["num_ref"][1],
        ictx["max_merge"], ictx["tmvp_on"], ictx["col_from_l0"],
        ictx["col_ref_idx"], ictx["mvd_l1_zero"], ictx["no_backward"],
        ictx["cur_poc"], sps.max_transform_hierarchy_depth_inter,
        sps.amp_enabled, ictx["has_col"], ictx["col_poc"],
    ], np.int32)
    ref_poc = np.zeros((2, 16), np.int32)
    ref_slot = np.zeros((2, 16), np.int32)
    for lx in (0, 1):
        for k, (pc, sl) in enumerate(ictx["refs"][lx][:16]):
            ref_poc[lx, k] = pc
            ref_slot[lx, k] = sl
    subs = np.asarray(substream_rbsp or [0], np.int64)
    cw = (sps.pic_width + 3) // 4
    ch = (sps.pic_height + 3) // 4
    cell = (ch, cw)
    z8 = lambda *s: np.zeros(s, np.uint8)
    z32 = lambda *s: np.zeros(s, np.int32)
    st = {
        "pred": z8(2, *cell), "mv": z32(2, *cell, 2),
        "refidx": np.full((2,) + cell, -1, np.int32),
        "ref_poc": z32(2, *cell), "mot_done": z8(*cell),
        "intra4": z8(*cell), "skip4": z8(*cell), "cbf4": z8(*cell),
        "tu_ev": z8(*cell), "tu_eh": z8(*cell),
        "pu_ev": z8(*cell), "pu_eh": z8(*cell),
    }
    col = ictx.get("col")
    if col is None:
        cz8 = z8(*cell)
        cz32 = z32(*cell, 2)
        czp = z32(*cell)
        colp = (cz8, cz8, cz8, cz32, cz32, czp, czp)
    else:
        colp = (np.ascontiguousarray(col["pred"][0]),
                np.ascontiguousarray(col["pred"][1]),
                np.ascontiguousarray(col["intra"]),
                np.ascontiguousarray(col["mv"][0]),
                np.ascontiguousarray(col["mv"][1]),
                np.ascontiguousarray(col["ref_poc"][0]),
                np.ascontiguousarray(col["ref_poc"][1]))
    scratch = np.zeros(5 * cw * ch, np.uint8)
    n = lib.jmx_hevc_parse_pb_slice(
        _ptr(buf), ctypes.c_int64(len(rbsp)),
        ctypes.c_int64(hdr.data_bitpos),
        _ptr(iparams), _ptr(subs),
        _ptr(plan.coeff_y), _ptr(plan.tu_log2_y), _ptr(plan.mode_y),
        _ptr(plan.zidx_y), _ptr(plan.qp_y),
        _ptr(plan.coeff_cb), _ptr(plan.coeff_cr),
        _ptr(plan.tu_log2_c), _ptr(plan.mode_c), _ptr(plan.zidx_c),
        _ptr(plan.bs_ver), _ptr(plan.bs_hor),
        _ptr(plan.sao_type), _ptr(plan.sao_offsets), _ptr(plan.sao_band),
        _ptr(plan.sao_eo), _ptr(scratch),
        _ptr(ip2), _ptr(ref_poc), _ptr(ref_slot),
        *[_ptr(a) for a in colp],
        _ptr(st["pred"][0]), _ptr(st["pred"][1]),
        _ptr(st["mv"][0]), _ptr(st["mv"][1]),
        _ptr(st["refidx"][0]), _ptr(st["refidx"][1]),
        _ptr(st["ref_poc"][0]), _ptr(st["ref_poc"][1]),
        _ptr(st["mot_done"]), _ptr(st["intra4"]), _ptr(st["skip4"]),
        _ptr(st["cbf4"]),
        _ptr(st["tu_ev"]), _ptr(st["tu_eh"]),
        _ptr(st["pu_ev"]), _ptr(st["pu_eh"]),
        _ptr(plan.inter4), _ptr(plan.mv), _ptr(plan.ref_slot),
        _ptr(plan.pred_fl), _ptr(plan.tu_log2_inter_y),
        _ptr(plan.tu_log2_inter_c))
    if n == -40:
        plan.supported = False
        plan.reason = "MV beyond device MC pad"
        return st
    if n in (-2, -3, -4, -7):
        raise HevcNativeUnsupported(f"native HEVC parser: code {n}")
    if n <= 0:
        raise ValueError(f"native HEVC pb slice parse error {n}")
    return st


def hevc_available() -> bool:
    return get_lib() is not None


class NativePSliceMixin:
    """P-slice parsing for NativeSliceParser (motion grids + symbols)."""


def _extend_p(parser_cls):
    def init_motion(self):
        if not hasattr(self, "mv"):
            h, w = self.mbh * 4, self.mbw * 4
            self.mv = np.zeros((h, w, 2), np.int32)
            self.ref = np.full((h, w), -1, np.int32)
            self.done = np.zeros((h, w), np.uint8)

    def parse_p_slice(self, fs, rbsp: bytes, bit_offset: int, first_mb: int,
                      slice_qp: int, slice_id: int, num_ref: int,
                      t8_allowed: bool) -> int:
        """Parse P slice_data into FrameSymbols fs + self.mv/self.ref."""
        self.init_motion()
        buf = np.frombuffer(rbsp, np.uint8)
        if fs.pcm_y is None:
            pcm_y = np.zeros((self.mbh * 16, self.mbw * 16), np.uint8)
            pcm_c = np.zeros((2, self.mbh * 8, self.mbw * 8), np.uint8)
        else:
            pcm_y = fs.pcm_y.astype(np.uint8)
            pcm_c = np.stack([fs.pcm_u, fs.pcm_v]).astype(np.uint8)
        n = self.lib.jmx_parse_p_slice(
            _ptr(buf), ctypes.c_int64(len(rbsp)), ctypes.c_int64(bit_offset),
            self.mbw, self.mbh, first_mb, slice_qp, slice_id,
            int(num_ref), 1 if t8_allowed else 0,
            _ptr(self.nz_luma), _ptr(self.nz_chroma), _ptr(self.i4_grid),
            _ptr(self.slice_map), _ptr(fs.mb_class), _ptr(fs.qp),
            _ptr(fs.i4_modes), _ptr(fs.i16_mode), _ptr(fs.chroma_mode),
            _ptr(fs.luma_coeffs), _ptr(fs.luma_dc), _ptr(fs.chroma_coeffs),
            _ptr(fs.chroma_dc), _ptr(pcm_y), _ptr(pcm_c),
            _ptr(self.mv), _ptr(self.ref), _ptr(self.done))
        if n == -21:
            raise NotImplementedError("8x8 transform (native P fast path)")
        if n < 0:
            raise ValueError(f"native P slice parse error {n}")
        if (fs.mb_class == 2).any():
            fs.has_pcm = True
            fs.pcm_y = pcm_y.astype(np.int32)
            fs.pcm_u = pcm_c[0].astype(np.int32)
            fs.pcm_v = pcm_c[1].astype(np.int32)
        return n

    def init_cabac(self):
        if not hasattr(self, "cs_skip"):
            mh, mw = self.mbh, self.mbw
            z = lambda *s: np.zeros(s, np.int32)
            self.cs_skip = z(mh, mw)
            self.cs_t8 = z(mh, mw)
            self.cs_cbp_luma = z(mh, mw)
            self.cs_cbp_chroma = z(mh, mw)
            self.cs_cbf_dc = z(mh, mw)
            self.cs_cbf_luma = z(mh * 4, mw * 4)
            self.cs_cbf_cdc = z(2, mh, mw)
            self.cs_cbf_cac = z(2, mh * 2, mw * 2)
            self.cs_mvd = z(mh * 4, mw * 4, 2)

    def parse_cabac_slice(self, fs, rbsp: bytes, bit_offset: int,
                          first_mb: int, slice_qp: int, slice_id: int,
                          is_p: bool, num_ref: int, t8_allowed: bool,
                          cabac_init_idc: int) -> int:
        """Parse one CABAC I/P slice_data into FrameSymbols fs (+ motion
        for P). Raises NotImplementedError for out-of-scope features so the
        caller falls back to the host path."""
        self.init_motion()
        self.init_cabac()
        buf = np.frombuffer(rbsp, np.uint8)
        if fs.pcm_y is None:
            pcm_y = np.zeros((self.mbh * 16, self.mbw * 16), np.uint8)
            pcm_c = np.zeros((2, self.mbh * 8, self.mbw * 8), np.uint8)
        else:
            pcm_y = fs.pcm_y.astype(np.uint8)
            pcm_c = np.stack([fs.pcm_u, fs.pcm_v]).astype(np.uint8)
        n = self.lib.jmx_parse_cabac_slice(
            _ptr(buf), ctypes.c_int64(len(rbsp)), ctypes.c_int64(bit_offset),
            self.mbw, self.mbh, first_mb, slice_qp, slice_id,
            1 if is_p else 0, int(num_ref), 1 if t8_allowed else 0,
            int(cabac_init_idc),
            _ptr(self.nz_luma), _ptr(self.nz_chroma), _ptr(self.i4_grid),
            _ptr(self.slice_map), _ptr(fs.mb_class), _ptr(fs.qp),
            _ptr(fs.i4_modes), _ptr(fs.i16_mode), _ptr(fs.chroma_mode),
            _ptr(fs.luma_coeffs), _ptr(fs.luma_dc), _ptr(fs.chroma_coeffs),
            _ptr(fs.chroma_dc), _ptr(pcm_y), _ptr(pcm_c),
            _ptr(self.mv), _ptr(self.ref), _ptr(self.done),
            _ptr(self.cs_skip), _ptr(self.cs_t8), _ptr(self.cs_cbp_luma),
            _ptr(self.cs_cbp_chroma), _ptr(self.cs_cbf_dc),
            _ptr(self.cs_cbf_luma), _ptr(self.cs_cbf_cdc),
            _ptr(self.cs_cbf_cac), _ptr(self.cs_mvd))
        if n == -21:
            raise NotImplementedError("8x8 transform (native CABAC path)")
        if n < 0:
            raise ValueError(f"native CABAC slice parse error {n}")
        if (fs.mb_class == 2).any():
            fs.has_pcm = True
            fs.pcm_y = pcm_y.astype(np.int32)
            fs.pcm_u = pcm_c[0].astype(np.int32)
            fs.pcm_v = pcm_c[1].astype(np.int32)
        return n

    parser_cls.init_motion = init_motion
    parser_cls.parse_p_slice = parse_p_slice
    parser_cls.init_cabac = init_cabac
    parser_cls.parse_cabac_slice = parse_cabac_slice


_extend_p(NativeSliceParser)
