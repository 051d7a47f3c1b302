"""The batched HEVC decode's three-program split (widen -> scan ->
filters, the r5 TPU-worker-fault workaround) is bit-exact vs libavcodec
on the CPU backend too — guards the seam between the stages (this path
was previously exercised only by the TPU bench).

NOTE suite layout: compiles one ctu=32 wavefront geometry — own chunk.
"""

import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_decode, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def test_batch_split_bit_exact():
    from jmcodec_tpu import native
    from jmcodec_tpu.codec.hevc import nal as HN
    from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.hevc.plan import HevcFramePlan
    from jmcodec_tpu.codec.hevc.refdec import _substream_offsets
    from jmcodec_tpu.codec.hevc.slicehdr import parse_slice_header
    from jmcodec_tpu.kernels.hevc_tiles import decode_plans_batch

    frames = [make_frame(128, 96, seed=i) for i in range(3)]
    stream = oracle_encode(frames, 128, 96, qp=30, codec="libx265",
                           gop=1, extra="ctu=32")
    sps, pps, plans = {}, {}, []
    for u in HN.parse_nal_units(stream):
        if u.nal_unit_type == HN.NAL_SPS:
            s = parse_sps(u.rbsp)
            sps[s.sps_id] = s
        elif u.nal_unit_type == HN.NAL_PPS:
            p = parse_pps(u.rbsp)
            pps[p.pps_id] = p
        elif u.is_slice:
            hdr = parse_slice_header(u.rbsp, u.nal_unit_type, sps[0],
                                     pps[0])
            plan = HevcFramePlan.create(sps[0])
            plan.record_slice(hdr, pps[0])
            native.hevc_fill_plan(plan, hdr, sps[0], pps[0], u.rbsp,
                                  _substream_offsets(hdr, u.emu_positions))
            plans.append(plan)
    assert len(plans) == 3

    Y, U, V = decode_plans_batch(plans)
    want, _, _ = oracle_decode(stream, suffix=".h265")
    for i, (gy, gu, gv) in enumerate(want):
        assert np.array_equal(np.asarray(Y[i]), gy), f"frame {i} Y"
        assert np.array_equal(np.asarray(U[i]), gu), f"frame {i} U"
        assert np.array_equal(np.asarray(V[i]), gv), f"frame {i} V"
