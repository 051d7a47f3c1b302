"""Frame-pipeline parallelism (SURVEY §2.3 ②): split the decode into its
two device programs — wavefront SCAN and in-loop FILTERS — and pin each
stage to a different chip, so frame t's scan overlaps frame t-1's
filtering. The reference's nearest analog is its AsyncDepth surface
pipeline (intel_dec.cpp:36); here the pipeline crosses CHIPS.

TPU-first shape: stage placement is "computation follows data" — each
stage's inputs are `jax.device_put` onto its chip and the jitted program
runs there; the inter-stage hand-off is a device-to-device transfer of
the int32 plane batch (ICI on a pod, host shuttle on the CPU test mesh),
and jax's async dispatch gives the overlap — no scheduler thread. The
hand-off is double-buffered by construction: stage 1 consumes batch t-1
while stage 0 produces batch t.

Bit-exactness: the stages are the SAME programs the single-chip path
runs (kernels/hevc_tiles.decode_frames_hevc_{scan,filters}), so output
equality with the one-device decode is structural; tests assert it.
"""

from __future__ import annotations

import jax


def decode_plans_pipelined(plans, d_scan=None, d_filter=None,
                           batch: int = 1):
    """Decode same-geometry all-intra HevcFramePlans with the scan stage
    on `d_scan` and the filter stage on `d_filter` (defaults: devices 0
    and 1). Returns a list of (Y, U, V) uint8 batches in input order;
    batch t's filtering is in flight while batch t+1 is being scanned."""
    from ..kernels.hevc_tiles import (_widen_i32, decode_frames_hevc_scan,
                                      decode_frames_hevc_filters,
                                      resolve_walk, stack_plans)

    devs = jax.devices()
    d_scan = d_scan if d_scan is not None else devs[0]
    d_filter = d_filter if d_filter is not None else devs[min(
        1, len(devs) - 1)]
    walk = resolve_walk()

    outs = []
    pending = None   # filter-stage args, already resident on d_filter
    for i in range(0, len(plans), batch):
        args = stack_plans(plans[i:i + batch])
        (Hp, Wp, l2, strong, dbk, pw, ph, w, h) = args[:9]
        (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr,
         tu_c, mode_c, zidx_c, cbo, cro, bo, to, bs_v, bs_h,
         s_t, s_o, s_b, s_e) = args[9:]
        put = lambda a: jax.device_put(a, d_scan)
        wide = _widen_i32(*map(put, (
            coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr,
            tu_c, mode_c, zidx_c)))
        Y, U, V = decode_frames_hevc_scan(
            Hp, Wp, l2, strong, *wide, put(cbo), put(cro), walk=walk)
        # hand off to the filter chip (async: the previous batch is
        # still filtering while this transfer is in flight)
        f = lambda a: jax.device_put(a, d_filter)
        nxt = ((l2, dbk, pw, ph, w, h) +
               tuple(map(f, (Y, U, V, qp_y, cbo, cro, bo, to, bs_v,
                             bs_h, s_t, s_o, s_b, s_e))))
        if pending is not None:
            outs.append(decode_frames_hevc_filters(*pending))
        pending = nxt
    if pending is not None:
        outs.append(decode_frames_hevc_filters(*pending))
    return outs
