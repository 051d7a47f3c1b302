#!/usr/bin/env python3
"""Bisect the full-program TPU-worker crash seen with the Pallas HEVC walk
(exp_hevc_walk crashes; the kernel-only repros don't). Composes the real
1080p decode from stages under env flags so the faulting combination can
be isolated:

  JMX_BS_RESID=1   compute residual planes in-program (else feed
                   precomputed device tensors)
  JMX_BS_SCANS=yl|c|both   which wavefront scans run
  JMX_BS_FILTERS=1 deblock + SAO in-program
  JMX_BS_UNSKEW=1  unskew gather in-program
  JMX_BS_REPS=n    re-executions after compile+first (default 4)

Usage: JMX_HEVC_WALK=pallas python tools/exp_bisect.py [frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    W, H = 1920, 1080
    cache = os.environ.get("JMX_XLA_CACHE")
    if cache:
        import jax
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import make_test_stream
    from jmcodec_tpu import native
    from jmcodec_tpu.codec.hevc import nal as HN
    from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.hevc.plan import HevcFramePlan
    from jmcodec_tpu.codec.hevc.refdec import _substream_offsets
    from jmcodec_tpu.codec.hevc.slicehdr import parse_slice_header
    import jmcodec_tpu.kernels.hevc_tiles as HT

    RESID = os.environ.get("JMX_BS_RESID", "0") == "1"
    SCANS = os.environ.get("JMX_BS_SCANS", "both")
    FILTERS = os.environ.get("JMX_BS_FILTERS", "0") == "1"
    UNSKEW = os.environ.get("JMX_BS_UNSKEW", "0") == "1"
    REPS = int(os.environ.get("JMX_BS_REPS", "4"))
    walk = HT.resolve_walk()
    log(f"bisect: walk={walk} resid={RESID} scans={SCANS} "
        f"filters={FILTERS} unskew={UNSKEW} frames={N}")

    stream = make_test_stream(W, H, 16, qp=30, codec="libx265")
    sps, pps, slices = {}, {}, []
    for u in HN.parse_nal_units(stream):
        if u.nal_unit_type == HN.NAL_SPS:
            s = parse_sps(u.rbsp)
            sps[s.sps_id] = s
        elif u.nal_unit_type == HN.NAL_PPS:
            p = parse_pps(u.rbsp)
            pps[p.pps_id] = p
        elif u.is_slice:
            slices.append(u)
    slices = slices[:N]
    p0 = pps[0]
    s0 = sps[p0.sps_id]
    plans = []
    for u in slices:
        hdr = parse_slice_header(u.rbsp, u.nal_unit_type, s0, p0)
        plan = HevcFramePlan.create(s0)
        plan.record_slice(hdr, p0)
        native.hevc_fill_plan(plan, hdr, s0, p0, u.rbsp,
                              _substream_offsets(hdr, u.emu_positions))
        plans.append(plan)
    pl0 = plans[0]
    C = 1 << pl0.log2_ctb
    Hp, Wp = pl0.Hp, pl0.Wp
    ctb_h, ctb_w = Hp // C, Wp // C
    maxtb = min(32, C)
    skew = 1 + (2 * maxtb + C - 1) // C
    cys, cxs, valid, has_left = HT._skew_geometry(ctb_h, ctb_w, skew)
    cys_j, cxs_j = jnp.asarray(cys), jnp.asarray(cxs)
    valid_j, hl_j = jnp.asarray(valid), jnp.asarray(has_left)
    F = len(plans)

    st = lambda f, dt: jnp.asarray(np.stack([f(p) for p in plans])
                                   .astype(dt))
    COMPACT = os.environ.get("JMX_BS_COMPACT", "0") == "1"
    if COMPACT:
        # the real entry point, exactly as the bench drives it
        cargs = HT.stack_plans(plans)
        if os.environ.get("JMX_BS_WIDE", "0") == "1":
            # host-upcast every tensor to i32: isolates whether the
            # compact-dtype H2D + in-jit upcast path is the crash trigger
            cargs = tuple(
                jnp.asarray(np.asarray(a, np.int32))
                if hasattr(a, "dtype") else a for a in cargs)
        MODE = os.environ.get("JMX_BS_SPLIT", "")
        if MODE:
            (Hp_, Wp_, l2, strong_, dbk, pw_, ph_, w_, h_) = cargs[:9]
            (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr,
             tu_c, mode_c, zidx_c, cbo, cro, bo, to, bs_v, bs_h,
             s_t, s_o, s_b, s_e) = cargs[9:]
            scan = lambda: HT.decode_frames_hevc_scan(
                Hp_, Wp_, l2, strong_, coeff_y, tu_y, mode_y, zidx_y,
                qp_y, coeff_cb, coeff_cr, tu_c, mode_c, zidx_c, cbo, cro,
                walk=walk)
            Y0, U0, V0 = scan()
            filt = lambda: HT.decode_frames_hevc_filters(
                l2, dbk, pw_, ph_, w_, h_, Y0, U0, V0, qp_y, cbo, cro,
                bo, to, bs_v, bs_h, s_t, s_o, s_b, s_e)
            run = scan if MODE == "scan" else filt
            t0 = time.time()
            out = run()
            s = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
            log(f"[{MODE}] compile+first {time.time()-t0:.1f}s sum={s}")
            for r in range(REPS):
                t0 = time.time()
                out = run()
                s = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
                log(f"[{MODE}] rep {r}: {(time.time()-t0)*1000:.0f} ms "
                    f"sum={s}")
            return
        if os.environ.get("JMX_BS_WIDE", "0") == "1":
            # host-upcast every tensor to i32: isolates whether the
            # compact-dtype H2D + in-jit upcast path is the crash trigger
            cargs = tuple(
                jnp.asarray(np.asarray(a, np.int32))
                if hasattr(a, "dtype") else a for a in cargs)
        t0 = time.time()
        out = HT.decode_frames_hevc_batch(*cargs, walk=walk)
        cks = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
        log(f"compile+first {time.time()-t0:.1f}s checksum={cks}")
        for r in range(REPS):
            t0 = time.time()
            out = HT.decode_frames_hevc_batch(*cargs, walk=walk)
            cks = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
            log(f"rep {r}: {(time.time()-t0)*1000:.0f} ms checksum={cks}")
        return
    coeff_y = st(lambda p: p.coeff_y, np.int32)
    tu_y = st(lambda p: p.tu_log2_y, np.int32)
    mode_y = st(lambda p: p.mode_y, np.int32)
    zidx_y = st(lambda p: p.zidx_y, np.int32)
    qp_y = st(lambda p: p.qp_y, np.int32)
    coeff_cb = st(lambda p: p.coeff_cb, np.int32)
    coeff_cr = st(lambda p: p.coeff_cr, np.int32)
    tu_c = st(lambda p: p.tu_log2_c, np.int32)
    mode_c = st(lambda p: p.mode_c, np.int32)
    zidx_c = st(lambda p: p.zidx_c, np.int32)

    def tf(planes, n):
        tiles = jax.vmap(lambda p: HT._skew(HT._plane_to_ctb_tiles(
            p, ctb_h, ctb_w, n), cys_j, cxs_j))(planes)
        return jnp.concatenate(list(tiles), axis=1)

    catF = lambda a: jnp.concatenate([a] * F, axis=1)
    cat2 = lambda a: jnp.concatenate([a, a], axis=1)

    @jax.jit
    def resid_fn(coeff_y, qp_y, tu_y, coeff_cb, coeff_cr, tu_c):
        resid_y = jax.vmap(lambda c, q, t: HT._residual_plane(
            c, q, t, True, (2, 3, 4, 5)))(coeff_y, qp_y, tu_y)
        qpc_cb = jnp.asarray(HT._QPC_T)[jnp.clip(qp_y[:, ::2, ::2], 0, 57)]
        rc_f = lambda c, q, t: HT._residual_plane(c, q, t, False, (2, 3, 4))
        resid_cb = jax.vmap(rc_f)(coeff_cb, qpc_cb, tu_c)
        resid_cr = jax.vmap(rc_f)(coeff_cr, qpc_cb, tu_c)
        return resid_y, resid_cb, resid_cr

    def build(resid_y, resid_cb, resid_cr, zidx_y, tu_y, mode_y,
              zidx_c, tu_c, mode_c):
        if RESID:
            resid_y, resid_cb, resid_cr = resid_fn(
                coeff_y, qp_y, tu_y, coeff_cb, coeff_cr, tu_c)
        outs = []
        Y = U = V = None
        if SCANS in ("yl", "both"):
            Yt = HT._intra_scan(
                tf(resid_y, C), tf(zidx_y, C // 4), tf(tu_y, C // 4),
                tf(mode_y, C // 4), catF(valid_j), catF(hl_j),
                C, skew, 32, is_chroma=False, strong=True, groups=F,
                walk=walk)
            if UNSKEW:
                Y = jnp.stack([HT._unskew_to_plane(
                    Yt[:, f * ctb_h:(f + 1) * ctb_h], cys_j, cxs_j,
                    valid_j, ctb_h, ctb_w, C) for f in range(F)])
                outs.append(jnp.sum(Y[:, ::64, ::64]))
            else:
                outs.append(jnp.sum(Yt[:, ::7, ::8, ::8]))
        if SCANS in ("c", "both"):
            Cc = C // 2
            rc = jnp.concatenate([tf(resid_cb, Cc), tf(resid_cr, Cc)],
                                 axis=1)
            Ct = HT._intra_scan(
                rc, cat2(tf(zidx_c, Cc // 4)), cat2(tf(tu_c, Cc // 4)),
                cat2(tf(mode_c, Cc // 4)), cat2(catF(valid_j)),
                cat2(catF(hl_j)), Cc, skew, 16, is_chroma=True,
                strong=False, groups=2 * F, walk=walk)
            if UNSKEW:
                unsk = lambda t, n: HT._unskew_to_plane(
                    t, cys_j, cxs_j, valid_j, ctb_h, ctb_w, n)
                U = jnp.stack([unsk(Ct[:, f * ctb_h:(f + 1) * ctb_h], Cc)
                               for f in range(F)])
                V = jnp.stack([unsk(Ct[:, (F + f) * ctb_h:
                                       (F + f + 1) * ctb_h], Cc)
                               for f in range(F)])
                outs.append(jnp.sum(U[:, ::64, ::64]))
            else:
                outs.append(jnp.sum(Ct[:, ::7, ::8, ::8]))
        if os.environ.get("JMX_BS_U8OUT", "0") == "1" and Y is not None:
            # mirror the real entry's output contract: big cropped uint8
            # planes returned from the program, checksum as a SEPARATE
            # dispatch (the bench's consumption pattern)
            return (Y[:, :1080, :1920].astype(jnp.uint8),
                    U[:, :540, :960].astype(jnp.uint8),
                    V[:, :540, :960].astype(jnp.uint8))
        if FILTERS and Y is not None and U is not None:
            bs_ver = st(lambda p: p.bs_ver, np.int32)
            bs_hor = st(lambda p: p.bs_hor, np.int32)
            z = jnp.zeros((F,), jnp.int32)
            if os.environ.get("JMX_BS_NODEBLOCK", "0") != "1":
                Y, U, V = jax.vmap(
                    lambda y, u, v, bv, bh, q, bo, to, cb, cr: HT._deblock(
                        y, u, v, bv, bh, q, bo, to, cb, cr)
                )(Y, U, V, bs_ver, bs_hor, qp_y, z, z, z, z)
            if os.environ.get("JMX_BS_NOSAO", "0") == "1":
                outs.append(jnp.sum(Y[:, ::63, ::63]))
                return sum(outs)
            sao_type = st(lambda p: p.sao_type, np.int32)
            sao_offsets = st(lambda p: p.sao_offsets, np.int32)
            sao_band = st(lambda p: p.sao_band, np.int32)
            sao_eo = st(lambda p: p.sao_eo, np.int32)
            pw, ph = pl0.pw, pl0.ph
            sao_f = lambda pl, t, o, b, e, l2, w2, h2: jax.vmap(
                lambda p, tt, oo, bb, ee: HT._sao_plane(
                    p, tt, oo, bb, ee, l2, w2, h2))(pl, t, o, b, e)
            Y = sao_f(Y, sao_type[..., 0], sao_offsets[..., 0, :],
                      sao_band[..., 0], sao_eo[..., 0], pl0.log2_ctb,
                      pw, ph)
            outs.append(jnp.sum(Y[:, ::63, ::63]))
        return sum(outs)

    fn = jax.jit(build)
    if not RESID:
        resid_y, resid_cb, resid_cr = resid_fn(
            coeff_y, qp_y, tu_y, coeff_cb, coeff_cr, tu_c)
        resid_y.block_until_ready()
    else:
        resid_y = resid_cb = resid_cr = jnp.zeros((1,), jnp.int32)

    U8 = os.environ.get("JMX_BS_U8OUT", "0") == "1"

    def once():
        out = fn(resid_y, resid_cb, resid_cr, zidx_y, tu_y, mode_y,
                 zidx_c, tu_c, mode_c)
        if U8:
            return int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
        return int(out)

    t0 = time.time()
    out = once()
    log(f"compile+first {time.time()-t0:.1f}s sum={out}")
    for r in range(REPS):
        t0 = time.time()
        out = once()
        log(f"rep {r}: {(time.time()-t0)*1000:.0f} ms sum={out}")


if __name__ == "__main__":
    main()
