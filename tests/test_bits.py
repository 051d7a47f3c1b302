import random

import pytest

from jmcodec_tpu.utils.bits import BitReader, BitWriter, se_len, ue_len


def test_u_roundtrip():
    rng = random.Random(0)
    w = BitWriter()
    fields = []
    for _ in range(1000):
        n = rng.randint(1, 24)
        v = rng.getrandbits(n)
        fields.append((v, n))
        w.u(v, n)
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    for v, n in fields:
        assert r.u(n) == v
    assert r.u(1) == 1  # stop bit


def test_ue_known_values():
    # spec 9.1 table: 0->1, 1->010, 2->011, 3->00100 ...
    w = BitWriter()
    for k in [0, 1, 2, 3, 4, 5, 6, 7, 8]:
        w.ue(k)
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    for k in [0, 1, 2, 3, 4, 5, 6, 7, 8]:
        assert r.ue() == k

    w2 = BitWriter()
    w2.ue(0)
    w2.align()
    assert w2.bytes() == b"\x80"
    w3 = BitWriter()
    w3.ue(1)
    w3.align()
    assert w3.bytes() == b"\x40"  # 010 00000


def test_ue_se_roundtrip_and_len():
    rng = random.Random(1)
    vals = [rng.randint(0, 100000) for _ in range(500)]
    svals = [rng.randint(-50000, 50000) for _ in range(500)]
    w = BitWriter()
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    total = sum(ue_len(v) for v in vals) + sum(se_len(v) for v in svals)
    assert w.bitpos() == total
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    for v in vals:
        assert r.ue() == v
    for v in svals:
        assert r.se() == v


def test_se_mapping():
    # spec 9.1.1: codeNum 0,1,2,3,4 -> 0, 1, -1, 2, -2
    w = BitWriter()
    for v in [0, 1, -1, 2, -2, 3, -3]:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    assert [r.se() for _ in range(7)] == [0, 1, -1, 2, -2, 3, -3]


def test_more_rbsp_data():
    w = BitWriter()
    w.u(0b1011, 4)
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    assert r.more_rbsp_data()
    r.u(4)
    assert not r.more_rbsp_data()


def test_peek_and_eof():
    r = BitReader(b"\xA5")
    assert r.peek(4) == 0xA
    assert r.u(4) == 0xA
    assert r.peek(8) == 0x50  # zero-padded past end
    assert r.u(4) == 0x5
    with pytest.raises(EOFError):
        r.u(1)
