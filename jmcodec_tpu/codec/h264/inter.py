"""P-slice inter syntax + motion vector prediction (spec 7.3.5.1, 8.4.1).

Extends the macroblock layer with inter MB parsing/writing and the normative
MV predictors (median, 16x8/8x16 directional rules, P_Skip). Motion state
lives in per-4x4 grids on MBGrids-like storage so CAVLC nC, MV prediction and
deblock bS derivation all share one source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ...utils.bits import BitReader, BitWriter
from . import cavlc
from . import macroblock as MB

# P mb_type (Table 7-13)
P_16x16 = 0
P_16x8 = 1
P_8x16 = 2
P_8x8 = 3
P_8x8REF0 = 4
# internal class id for inter MBs in MBGrids.mb_class
MB_P = 3

# sub_mb_type (Table 7-17): (parts, w4, h4) in 4x4 units per 8x8 block
SUB_SHAPES = {0: (1, 2, 2), 1: (2, 2, 1), 2: (2, 1, 2), 3: (4, 1, 1)}


@dataclass
class MotionGrids:
    """Per-4x4 motion state for one frame."""
    mb_width: int
    mb_height: int
    mv: np.ndarray = None        # [mbh*4, mbw*4, 2] int32 quarter-pel
    ref: np.ndarray = None       # [mbh*4, mbw*4] int32; -1 = intra/unset
    done: np.ndarray = None      # [mbh*4, mbw*4] 1 once the block's motion
    #                              is final (spec 6.4.11.7: a within-MB C
    #                              neighbor not yet decoded is unavailable)

    def __post_init__(self):
        if self.mv is None:
            self.mv = np.zeros((self.mb_height * 4, self.mb_width * 4, 2),
                               np.int32)
            self.ref = np.full((self.mb_height * 4, self.mb_width * 4), -1,
                               np.int32)
            self.done = np.zeros((self.mb_height * 4, self.mb_width * 4),
                                 np.int32)


def _neighbor(g: MB.MBGrids, m: MotionGrids, by: int, bx: int,
              cur_slice: int) -> Tuple[np.ndarray, int]:
    """(mv, ref) of the 4x4 block at (by,bx); ref -1 when unavailable/intra."""
    gh, gw = m.ref.shape
    if bx < 0 or by < 0 or bx >= gw or by >= gh:
        return np.zeros(2, np.int32), -1, False
    my, mx = by // 4, bx // 4
    if g.slice_id[my, mx] != cur_slice or g.mb_class[my, mx] < 0 \
            or not m.done[by, bx]:
        return np.zeros(2, np.int32), -1, False
    r = int(m.ref[by, bx])
    if r < 0:  # intra MB: "available" but has no motion info
        return np.zeros(2, np.int32), -1, True
    return m.mv[by, bx].copy(), r, True


def predict_mv(g: MB.MBGrids, m: MotionGrids, by: int, bx: int,
               w4: int, h4: int, ref_idx: int, cur_slice: int,
               part_kind: str = "other") -> np.ndarray:
    """Luma MV predictor (8.4.1.3). part_kind: '16x8_top', '16x8_bot',
    '8x16_left', '8x16_right', or 'other'."""
    mvA, refA, availA = _neighbor(g, m, by, bx - 1, cur_slice)
    mvB, refB, availB = _neighbor(g, m, by - 1, bx, cur_slice)
    mvC, refC, availC = _neighbor(g, m, by - 1, bx + w4, cur_slice)
    if not availC:
        mvC, refC, availC = _neighbor(g, m, by - 1, bx - 1, cur_slice)  # D

    # directional shortcuts (8.4.1.3 clause 2)
    if part_kind == "16x8_top" and refB == ref_idx:
        return mvB
    if part_kind == "16x8_bot" and refA == ref_idx:
        return mvA
    if part_kind == "8x16_left" and refA == ref_idx:
        return mvA
    if part_kind == "8x16_right" and refC == ref_idx:
        return mvC

    if not availB and not availC and availA:
        return mvA
    match = [r == ref_idx for r in (refA, refB, refC)]
    if sum(match) == 1:
        return (mvA, mvB, mvC)[match.index(True)]
    return np.array([int(np.median([mvA[0], mvB[0], mvC[0]])),
                     int(np.median([mvA[1], mvB[1], mvC[1]]))], np.int32)


def pskip_mv(g: MB.MBGrids, m: MotionGrids, my: int, mx: int,
             cur_slice: int) -> np.ndarray:
    """P_Skip motion (8.4.1.1): zero if edge conditions hit, else 16x16 pred."""
    by, bx = my * 4, mx * 4
    mvA, refA, availA = _neighbor(g, m, by, bx - 1, cur_slice)
    mvB, refB, availB = _neighbor(g, m, by - 1, bx, cur_slice)
    if not availA or not availB:
        return np.zeros(2, np.int32)
    if refA == 0 and mvA[0] == 0 and mvA[1] == 0:
        return np.zeros(2, np.int32)
    if refB == 0 and mvB[0] == 0 and mvB[1] == 0:
        return np.zeros(2, np.int32)
    return predict_mv(g, m, by, bx, 4, 4, 0, cur_slice)


def read_te(r: BitReader, max_val: int) -> int:
    """te(v) (spec 9.1.1): 1-bit inverted flag when range is [0,1]."""
    if max_val == 1:
        return 1 - r.u(1)
    return r.ue()


def write_te(w: BitWriter, v: int, max_val: int) -> None:
    if max_val == 1:
        w.u(1 - v, 1)
    else:
        w.ue(v)


@dataclass
class InterPartition:
    by: int          # 4x4-grid coords within frame
    bx: int
    w4: int
    h4: int
    ref_idx: int
    mv: np.ndarray   # [2]


@dataclass
class PMBSymbols(MB.MBSymbols):
    """Extends MBSymbols with inter partition info."""
    p_type: int = P_16x16
    sub_types: List[int] = field(default_factory=lambda: [0, 0, 0, 0])
    partitions: List[InterPartition] = field(default_factory=list)
    is_skip: bool = False


def parse_p_macroblock(r: BitReader, g: MB.MBGrids, m: MotionGrids,
                       my: int, mx: int, cur_slice: int, qp_prev: int,
                       mb_type: int, num_ref: int,
                       t8_allowed: bool = False) -> PMBSymbols:
    """Parse one non-skip P macroblock after its mb_type."""
    if mb_type >= 5:
        s0 = MB.parse_i_macroblock(r, g, my, mx, cur_slice, qp_prev,
                                   mb_type - 5, t8_allowed)
        s = PMBSymbols(**{f: getattr(s0, f) for f in s0.__dataclass_fields__})
        # intra in P slice: motion grid stays -1
        m.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
        m.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
        m.done[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 1
        return s

    s = PMBSymbols()
    s.mb_class = MB_P
    s.p_type = mb_type
    g.mb_class[my, mx] = MB_P
    g.slice_id[my, mx] = cur_slice
    g.i4_modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    by0, bx0 = my * 4, mx * 4

    def put_partition(by, bx, w4, h4, ref_idx, mvd, kind):
        mvp = predict_mv(g, m, by, bx, w4, h4, ref_idx, cur_slice, kind)
        mv = mvp + np.asarray(mvd, np.int32)
        m.mv[by:by + h4, bx:bx + w4] = mv
        m.ref[by:by + h4, bx:bx + w4] = ref_idx
        m.done[by:by + h4, bx:bx + w4] = 1
        s.partitions.append(InterPartition(by, bx, w4, h4, ref_idx, mv))

    if mb_type == P_16x16:
        ref = read_te(r, num_ref - 1) if num_ref > 1 else 0
        mvd = (r.se(), r.se())
        put_partition(by0, bx0, 4, 4, ref, mvd, "other")
    elif mb_type == P_16x8:
        refs = [read_te(r, num_ref - 1) if num_ref > 1 else 0 for _ in range(2)]
        mvds = [(r.se(), r.se()) for _ in range(2)]
        put_partition(by0, bx0, 4, 2, refs[0], mvds[0], "16x8_top")
        put_partition(by0 + 2, bx0, 4, 2, refs[1], mvds[1], "16x8_bot")
    elif mb_type == P_8x16:
        refs = [read_te(r, num_ref - 1) if num_ref > 1 else 0 for _ in range(2)]
        mvds = [(r.se(), r.se()) for _ in range(2)]
        put_partition(by0, bx0, 2, 4, refs[0], mvds[0], "8x16_left")
        put_partition(by0, bx0 + 2, 2, 4, refs[1], mvds[1], "8x16_right")
    elif mb_type in (P_8x8, P_8x8REF0):
        s.sub_types = [r.ue() for _ in range(4)]
        if any(t > 3 for t in s.sub_types):
            raise ValueError("bad sub_mb_type")
        if mb_type == P_8x8 and num_ref > 1:
            refs = [read_te(r, num_ref - 1) for _ in range(4)]
        else:
            refs = [0, 0, 0, 0]
        for b8 in range(4):
            n_parts, pw, ph = SUB_SHAPES[s.sub_types[b8]]
            oy = by0 + (b8 // 2) * 2
            ox = bx0 + (b8 % 2) * 2
            for p in range(n_parts):
                if s.sub_types[b8] == 1:      # 8x4: stacked vertically
                    py, px = oy + p * 1, ox
                elif s.sub_types[b8] == 2:    # 4x8: side by side
                    py, px = oy, ox + p * 1
                elif s.sub_types[b8] == 3:    # 4x4 raster
                    py, px = oy + (p // 2), ox + (p % 2)
                else:
                    py, px = oy, ox
                mvd = (r.se(), r.se())
                put_partition(py, px, pw, ph, refs[b8], mvd, "other")
    else:
        raise ValueError(f"bad P mb_type {mb_type}")

    # coded_block_pattern (inter mapping)
    code = r.ue()
    if code > 47:
        raise ValueError("cbp code out of range")
    cbp = int(MB.CBP_INTER_FROM_CODE[code])
    s.cbp_luma = cbp & 15
    s.cbp_chroma = cbp >> 4
    if s.cbp_chroma == 3:
        raise ValueError("invalid cbp_chroma")

    # transform_size_8x8_flag (7.3.5: after cbp, before mb_qp_delta; only
    # when luma is coded and no sub-partition is smaller than 8x8)
    if t8_allowed and s.cbp_luma and (
            mb_type not in (P_8x8, P_8x8REF0)
            or all(t == 0 for t in s.sub_types)):
        if r.flag():
            s.transform8x8 = 1
            g.t8[my, mx] = 1

    if s.cbp_luma or s.cbp_chroma:
        dq = r.se()
        if dq < -26 or dq > 25:
            raise ValueError("mb_qp_delta out of range")
        s.qp = (qp_prev + dq + 52) % 52
    else:
        s.qp = qp_prev
    g.qp[my, mx] = s.qp

    MB._parse_residual(r, g, my, mx, cur_slice, s)
    return s


def apply_skip(g: MB.MBGrids, m: MotionGrids, my: int, mx: int,
               cur_slice: int, qp_prev: int) -> PMBSymbols:
    """P_Skip macroblock: derived motion, no residual."""
    s = PMBSymbols()
    s.mb_class = MB_P
    s.p_type = P_16x16
    s.is_skip = True
    s.qp = qp_prev
    g.mb_class[my, mx] = MB_P
    g.slice_id[my, mx] = cur_slice
    g.qp[my, mx] = qp_prev
    g.i4_modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    g.nz_luma[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    g.nz_chroma[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
    mv = pskip_mv(g, m, my, mx, cur_slice)
    m.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = mv
    m.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    m.done[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 1
    s.partitions.append(InterPartition(my * 4, mx * 4, 4, 4, 0, mv))
    return s


# ---------------------------------------------------------------------------
# writing (encoder side)
# ---------------------------------------------------------------------------

def write_p_macroblock(w: BitWriter, g: MB.MBGrids, m: MotionGrids,
                       my: int, mx: int, cur_slice: int, qp_prev: int,
                       s: PMBSymbols, num_ref: int) -> None:
    if s.mb_class != MB_P:
        MB.write_i_macroblock(w, g, my, mx, cur_slice, qp_prev, s,
                              mb_type_offset=5)
        m.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
        m.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
        m.done[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 1
        return
    w.ue(s.p_type)
    g.mb_class[my, mx] = MB_P
    g.slice_id[my, mx] = cur_slice
    g.i4_modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1

    def emit_partition(part: InterPartition, kind):
        mvp = predict_mv(g, m, part.by, part.bx, part.w4, part.h4,
                         part.ref_idx, cur_slice, kind)
        mvd = part.mv - mvp
        m.mv[part.by:part.by + part.h4, part.bx:part.bx + part.w4] = part.mv
        m.ref[part.by:part.by + part.h4, part.bx:part.bx + part.w4] = part.ref_idx
        m.done[part.by:part.by + part.h4, part.bx:part.bx + part.w4] = 1
        return int(mvd[0]), int(mvd[1])

    parts = s.partitions
    if s.p_type == P_16x16:
        if num_ref > 1:
            write_te(w, parts[0].ref_idx, num_ref - 1)
        mvd = emit_partition(parts[0], "other")
        w.se(mvd[0])
        w.se(mvd[1])
    elif s.p_type in (P_16x8, P_8x16):
        kinds = (("16x8_top", "16x8_bot") if s.p_type == P_16x8
                 else ("8x16_left", "8x16_right"))
        if num_ref > 1:
            for p in parts:
                write_te(w, p.ref_idx, num_ref - 1)
        mvds = [emit_partition(p, k) for p, k in zip(parts, kinds)]
        for mvd in mvds:
            w.se(mvd[0])
            w.se(mvd[1])
    else:  # P_8x8
        for t in s.sub_types:
            w.ue(t)
        if s.p_type == P_8x8 and num_ref > 1:
            b8_refs = {}
            for p in parts:
                b8 = ((p.by - my * 4) // 2) * 2 + (p.bx - mx * 4) // 2
                b8_refs.setdefault(b8, p.ref_idx)
            for b8 in range(4):
                write_te(w, b8_refs[b8], num_ref - 1)
        for p in parts:
            mvd = emit_partition(p, "other")
            w.se(mvd[0])
            w.se(mvd[1])

    cbp = (s.cbp_chroma << 4) | s.cbp_luma
    w.ue(int(MB.CBP_INTER_TO_CODE[cbp]))
    if s.cbp_luma or s.cbp_chroma:
        delta = s.qp - qp_prev
        if delta > 25:
            delta -= 52
        elif delta < -26:
            delta += 52
        w.se(delta)
    else:
        s.qp = qp_prev
    g.qp[my, mx] = s.qp
    MB._write_residual(w, g, my, mx, cur_slice, s)
