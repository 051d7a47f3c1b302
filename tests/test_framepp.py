"""Frame-pipeline parallelism (SURVEY §2.3 ②): the two-stage scan/filter
pipeline across two devices is bit-exact vs the single-device batch
decode, and the stages actually land on different devices.

NOTE suite layout: compiles one HEVC wavefront geometry (ctu=32 to keep
the CPU compile small) — own chunk in tests/run_suite.sh.
"""

import jax
import numpy as np
import pytest

from util_oracle import have_oracle, make_frame, oracle_encode

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="libavcodec oracle unavailable")


def _plans(stream):
    from jmcodec_tpu import native
    from jmcodec_tpu.codec.hevc import nal as HN
    from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.hevc.plan import HevcFramePlan
    from jmcodec_tpu.codec.hevc.refdec import _substream_offsets
    from jmcodec_tpu.codec.hevc.slicehdr import parse_slice_header
    sps, pps, out = {}, {}, []
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
            out.append(plan)
    return out


def test_two_stage_pipeline_bit_exact():
    from jmcodec_tpu.kernels.hevc_tiles import decode_plans_batch
    from jmcodec_tpu.parallel.framepp import decode_plans_pipelined

    frames = [make_frame(128, 96, seed=i) for i in range(4)]
    stream = oracle_encode(frames, 128, 96, qp=30, codec="libx265",
                           gop=1, extra="ctu=32")
    plans = _plans(stream)
    assert len(plans) == 4

    want = decode_plans_batch(plans)
    devs = jax.devices()
    assert len(devs) >= 2, "test mesh must expose >= 2 devices"
    got = decode_plans_pipelined(plans, d_scan=devs[0], d_filter=devs[1],
                                 batch=2)
    # outputs came off the FILTER device
    for (Y, U, V) in got:
        assert list(Y.devices())[0] == devs[1]
    gY = np.concatenate([np.asarray(g[0]) for g in got])
    gU = np.concatenate([np.asarray(g[1]) for g in got])
    gV = np.concatenate([np.asarray(g[2]) for g in got])
    assert np.array_equal(gY, np.asarray(want[0]))
    assert np.array_equal(gU, np.asarray(want[1]))
    assert np.array_equal(gV, np.asarray(want[2]))
