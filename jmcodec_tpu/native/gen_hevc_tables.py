"""Recover the HEVC CABAC context-init table (ITU-T H.265 Tables 9-5..9-31)
from the system codec libraries and emit codec/hevc/cabac_tables.py.

Like gen_cabac_tables.py (H.264), this avoids hand-transcribing ~600 spec
constants: libavcodec ships the per-initType initValue table as
init_values[3][199] (one uint8 per context).  We recover it twice — from the
static archive member hevc_cabac.o (whose .rodata layout pins the symbol
`init_values` exactly) and from the shared libavcodec.so by known-prefix
scan — and cross-validate byte-for-byte.  The context LAYOUT (which slice of
the 199 belongs to which syntax element) was recovered from the disassembly
of the per-element accessor functions in hevc_cabac.o (each loads its context
byte at a fixed immediate offset) and is re-asserted here against well-known
spec anchor values.  Stream-level validation (bit-exact decode of x265
streams vs libavcodec) lives in tests/test_hevc_decode.py.

The arithmetic engine tables (rangeTabLPS, state transitions) are shared
with H.264 (H.265 9.3.4.3 == H.264 9.3.3.2) and come from h264/cabac_tables.

Run: python -m jmcodec_tpu.native.gen_hevc_tables > codec/hevc/cabac_tables.py
(The generated module is committed; this generator is dev-time only.)
"""

from __future__ import annotations

import struct
import subprocess

import numpy as np

LIBAV_SO = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
LIBAV_A = "/usr/lib/x86_64-linux-gnu/libavcodec.a"

N_CTX = 199  # ffmpeg HEVC_CONTEXTS (indices 179..198 unused by the layout)

# Context layout within the 199-entry table, recovered from hevc_cabac.o
# disassembly (immediate context offsets in the accessor functions):
LAYOUT = [
    ("SAO_MERGE_FLAG", 0, 1),
    ("SAO_TYPE_IDX", 1, 1),
    ("SPLIT_CU_FLAG", 2, 3),
    ("CU_TRANSQUANT_BYPASS", 5, 1),
    ("SKIP_FLAG", 6, 3),
    ("CU_QP_DELTA", 9, 3),
    ("PRED_MODE_FLAG", 12, 1),
    ("PART_MODE", 13, 4),
    ("PREV_INTRA_LUMA_PRED", 17, 1),
    ("INTRA_CHROMA_PRED_MODE", 18, 2),
    ("MERGE_FLAG", 20, 1),
    ("MERGE_IDX", 21, 1),
    ("INTER_PRED_IDC", 22, 5),
    ("REF_IDX_L0", 27, 2),
    ("REF_IDX_L1", 29, 2),
    ("ABS_MVD_GREATER0", 31, 2),   # only +0 used
    ("ABS_MVD_GREATER1", 33, 2),   # only +1 used (HM context organisation)
    ("MVP_LX_FLAG", 35, 1),
    ("NO_RESIDUAL_DATA", 36, 1),
    ("SPLIT_TRANSFORM_FLAG", 37, 3),
    ("CBF_LUMA", 40, 2),
    ("CBF_CB_CR", 42, 5),
    ("TRANSFORM_SKIP", 47, 2),
    ("EXPLICIT_RDPCM_FLAG", 49, 2),
    ("EXPLICIT_RDPCM_DIR", 51, 2),
    ("LAST_SIG_X_PREFIX", 53, 18),
    ("LAST_SIG_Y_PREFIX", 71, 18),
    ("SIG_COEFF_GROUP", 89, 4),
    ("SIG_COEFF_FLAG", 93, 44),
    ("COEFF_ABS_GREATER1", 137, 24),
    ("COEFF_ABS_GREATER2", 161, 6),
    ("LOG2_RES_SCALE_ABS", 167, 8),
    ("RES_SCALE_SIGN", 175, 2),
    ("CU_CHROMA_QP_OFFSET_FLAG", 177, 1),
    ("CU_CHROMA_QP_OFFSET_IDX", 178, 1),
]

# I-table / P-table / B-table leading bytes (spec: sao_merge=153 everywhere;
# sao_type_idx 200/185/160; split_cu 139,141,157 / 107,139,126 / 107,139,126;
# transquant_bypass=154) — used both to locate the table in the .so and as
# anchor validation for the .a copy.
PREFIX = {
    0: bytes([153, 200, 139, 141, 157, 154]),
    1: bytes([153, 185, 107, 139, 126, 154]),
    2: bytes([153, 160, 107, 139, 126, 154]),
}


def from_shared() -> np.ndarray:
    data = open(LIBAV_SO, "rb").read()
    base = data.find(PREFIX[0])
    assert base >= 0, "I-table prefix not found in libavcodec.so"
    for t in (1, 2):
        assert data[base + t * N_CTX: base + t * N_CTX + 6] == PREFIX[t]
    return np.frombuffer(data[base: base + 3 * N_CTX],
                         np.uint8).reshape(3, N_CTX).copy()


def from_archive() -> np.ndarray:
    """Extract hevc_cabac.o, read `init_values` (.rodata) via its symbol."""
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        subprocess.run(["ar", "x", LIBAV_A, "hevc_cabac.o"], cwd=d, check=True)
        obj = os.path.join(d, "hevc_cabac.o")
        nm = subprocess.run(["nm", obj], capture_output=True, text=True).stdout
        off = None
        for line in nm.splitlines():
            parts = line.split()
            if len(parts) == 3 and parts[2] == "init_values":
                off = int(parts[0], 16)
        assert off is not None, "init_values symbol not found"
        # find .rodata file offset
        hdr = subprocess.run(["objdump", "-h", obj], capture_output=True,
                             text=True).stdout
        for line in hdr.splitlines():
            parts = line.split()
            if len(parts) >= 6 and parts[1] == ".rodata":
                sec_off = int(parts[5], 16)
                sec_size = int(parts[2], 16)
        assert off + 3 * N_CTX <= sec_size
        raw = open(obj, "rb").read()
        return np.frombuffer(raw[sec_off + off: sec_off + off + 3 * N_CTX],
                             np.uint8).reshape(3, N_CTX).copy()


def main():
    a = from_archive()
    b = from_shared()
    assert np.array_equal(a, b), "archive/shared init table mismatch"
    for t, p in PREFIX.items():
        assert bytes(a[t, :6]) == p
    print('"""HEVC CABAC context-init values (ITU-T H.265 Tables 9-5..9-31).')
    print()
    print("AUTO-GENERATED by jmcodec_tpu/native/gen_hevc_tables.py — spec")
    print("constants recovered from the system libavcodec (static archive +")
    print("shared object cross-validated byte-for-byte); bit-exact stream")
    print('decode vs libavcodec revalidates them in tests/test_hevc_decode.py.')
    print('"""')
    print()
    print("import numpy as np")
    print()
    print("# [3][199] uint8 initValue; rows = initType 0 (I), 1 (P), 2 (B)")
    flat = ", ".join(str(int(v)) for v in a.reshape(-1))
    print(f"CTX_INIT = np.array([{flat}], np.uint8).reshape(3, {N_CTX})")
    print()
    print("# context layout (base index, count) within the 199")
    for name, base, cnt in LAYOUT:
        print(f"{name} = {base}")
    print()
    used = {}
    for name, base, cnt in LAYOUT:
        for i in range(cnt):
            assert base + i not in used, (name, base + i)
            used[base + i] = name
    print(f"# {len(used)} contexts used; {N_CTX - len(used)} reserved/unused")


if __name__ == "__main__":
    main()
