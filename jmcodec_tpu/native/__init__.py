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


def _generate_tables() -> str:
    hdr = os.path.join(_SRC, "h264_tables.h")
    src_cavlc = os.path.join(_DIR, "..", "codec", "h264", "cavlc.py")
    if os.path.exists(hdr) and os.path.getmtime(hdr) >= os.path.getmtime(src_cavlc):
        return hdr
    out = subprocess.run(
        [sys.executable, "-m", "jmcodec_tpu.native.gen_tables"],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(_DIR, "..", ".."))
    with open(hdr, "w") as f:
        f.write(out.stdout)
    return hdr


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns its path."""
    os.makedirs(_BUILD, exist_ok=True)
    srcs = [os.path.join(_SRC, "h264_parse.cc")]
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
