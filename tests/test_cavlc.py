"""CAVLC encode<->decode round-trip across all nC classes and edge cases."""

import random

import numpy as np
import pytest

from jmcodec_tpu.codec.h264 import cavlc
from jmcodec_tpu.utils.bits import BitReader, BitWriter


def roundtrip(coeffs, nC, max_num):
    w = BitWriter()
    tc_enc = cavlc.encode_residual_block(w, coeffs, nC, max_num)
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    got, tc_dec = cavlc.decode_residual_block(r, nC, max_num)
    assert tc_enc == tc_dec
    assert got == list(coeffs), f"nC={nC} coeffs={coeffs} got={got}"
    return w.bitpos()


NC_VALUES = [0, 1, 2, 3, 4, 7, 8, 16, -1]


@pytest.mark.parametrize("nC", NC_VALUES)
def test_roundtrip_random(nC):
    rng = random.Random(42 + nC)
    max_num = 4 if nC == -1 else 16
    for _ in range(500):
        n_nz = rng.randint(0, max_num)
        coeffs = [0] * max_num
        pos = rng.sample(range(max_num), n_nz)
        for p in pos:
            mag = rng.choice([1, 1, 1, 2, 3, 5, 17, 300, 3000])
            coeffs[p] = mag * rng.choice([-1, 1])
        roundtrip(coeffs, nC, max_num)


def test_empty_block():
    for nC in NC_VALUES:
        max_num = 4 if nC == -1 else 16
        roundtrip([0] * max_num, nC, max_num)


def test_single_trailing_one():
    bits = roundtrip([1] + [0] * 15, 0, 16)
    # coeff_token(1,1)="01" + sign "0" + total_zeros[1][0]="1" = 4 payload bits;
    # rbsp stop bit + alignment pads to one byte.
    assert bits == 8


def test_all_sixteen_coeffs():
    rng = random.Random(7)
    for nC in [0, 2, 4, 8]:
        coeffs = [rng.choice([-2, -1, 1, 2, 9]) for _ in range(16)]
        roundtrip(coeffs, nC, 16)


def test_max_levels_escape_paths():
    # exercise suffix_length growth and prefix>=15/16 escapes
    for lv in [15, 16, 30, 31, 2000, 4000, 33000, 66000]:
        for sgn in [1, -1]:
            coeffs = [sgn * lv] + [0] * 15
            roundtrip(coeffs, 0, 16)
    # many large levels to push suffix_length to 6
    coeffs = [30000, -30000, 20000, -10000, 5000, -2500, 1200, -600,
              300, -150, 75, -40, 20, -10, 5, -2]
    roundtrip(coeffs, 0, 16)


def test_luma_dc_block_16():
    # I16x16 DC block uses maxNumCoeff 16 with luma nC
    coeffs = [3, 0, -1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    roundtrip(coeffs, 0, 16)


def test_ac_block_15():
    # AC blocks of I16x16 MBs have maxNumCoeff 15
    coeffs = [2, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1]
    roundtrip(coeffs, 1, 15)
    roundtrip([0] * 15, 3, 15)


def test_chroma_dc():
    for coeffs in ([1, 0, 0, 0], [0, 0, 0, -5], [3, -1, 1, -1], [0, 0, 0, 0]):
        roundtrip(coeffs, -1, 4)


def test_trailing_ones_capped_at_3():
    # four trailing +-1s: only 3 can be trailing ones, 4th is a level
    coeffs = [1, -1, 1, -1] + [0] * 12
    roundtrip(coeffs, 0, 16)
    coeffs = [5, 1, 1, -1, 1] + [0] * 11
    roundtrip(coeffs, 0, 16)


def test_known_bitpattern_simple():
    """Hand-checkable vector: coeffs=[0,3,0,1,-1,0,0,1] (scan order), nC=0.
    From spec 9.2 worked examples style: TotalCoeff=4, TrailingOnes=3,
    total_zeros=4."""
    coeffs = [0, 3, 0, 1, -1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0]
    w = BitWriter()
    cavlc.encode_residual_block(w, coeffs, 0, 16)
    # coeff_token(T1=3, TC=4) = 000011 (6b)
    # signs of trailing ones (hi freq first): +1(pos7)->0, -1(pos4)->1, +1(pos3)->0
    # level for coeff 3: suffixLength=0, levelCode=2*3-2=4, first-after-T1s but
    #   T1==3 so no -2 adjustment; prefix=4 -> 00001
    # total_zeros(TC=4, tz=4) = 110
    # run_before: zerosLeft=4: pos7->run 2 (tbl4 "01", zl->2),
    #   pos4->run 0 (tbl2 "1"), pos3->run 1 (tbl2 "01"); last coeff absorbs rest.
    expect = "000011" + "0" + "1" + "0" + "00001" + "110" + "01" + "1" + "01"
    got = "".join(format(b, "08b") for b in (w._buf)) + format(
        w._cur, f"0{w._curbits}b" if w._curbits else "b")[:w._curbits]
    assert got.startswith(expect) or got == expect, f"\ngot    {got}\nexpect {expect}"
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    dec, tc = cavlc.decode_residual_block(r, 0, 16)
    assert dec == coeffs and tc == 4
