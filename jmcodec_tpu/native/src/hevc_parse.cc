/* Fast HEVC CABAC I-slice parser: the host entropy front-end of the TPU
 * HEVC decode pipeline (SURVEY §7.2 L1a). Parses slice_data of one HEVC
 * I slice (WPP supported) into the HevcFramePlan tensors consumed by the
 * device CTB-wavefront recon kernel (kernels/hevc_tiles.py).
 *
 * Mirrors jmcodec_tpu/codec/hevc/refdec.py (the tested oracle twin)
 * exactly; tested for byte-for-byte equality of the produced plan tensors
 * and for bit-exact stream decode. Context tables are generated from the
 * Python source of truth (gen_hevc_native_tables.py).
 *
 * Capability analog: the vendor driver's hardware CABAC front-end behind
 * cuvidParseVideoData (nv_dec/nv_dec.cpp:278-366,394).
 *
 * Built as a shared library, bound via ctypes (no pybind11 in the image).
 */

#include <stdint.h>
#include <string.h>

#include "hevc_tables.h"

namespace {

/* ---- CABAC engine (H.265 9.3.4.3 == H.264 9.3.3.2) -------------------- */

struct Cabac {
    const uint8_t *data;
    int64_t nbytes;
    int64_t pos;          /* absolute bit position */
    uint32_t range, offset;
    uint8_t state[HEVC_NCTX];
    uint8_t mps[HEVC_NCTX];
    int error;

    inline int bit() {
        int64_t p = pos++;
        int64_t i = p >> 3;
        if (i >= nbytes) return 0;
        return (data[i] >> (7 - (p & 7))) & 1;
    }
    inline uint32_t bits(int n) {
        uint32_t v = 0;
        for (int k = 0; k < n; k++) v = (v << 1) | bit();
        return v;
    }
    void engine_init() {
        range = 510;
        offset = bits(9);
    }
    void init_contexts(int slice_qp, int init_type) {
        int qp = slice_qp < 0 ? 0 : (slice_qp > 51 ? 51 : slice_qp);
        const uint8_t *row = hevc_ctx_init + init_type * HEVC_NCTX;
        for (int i = 0; i < HEVC_NCTX; i++) {
            int iv = row[i];
            int m = (iv >> 4) * 5 - 45;
            int n = ((iv & 15) << 3) - 16;
            int pre = ((m * qp) >> 4) + n;
            if (pre < 1) pre = 1;
            if (pre > 126) pre = 126;
            if (pre > 63) { mps[i] = 1; state[i] = (uint8_t)(pre - 64); }
            else          { mps[i] = 0; state[i] = (uint8_t)(63 - pre); }
        }
    }
    void start(const uint8_t *d, int64_t nb, int64_t bit_pos,
               int slice_qp, int init_type) {
        data = d; nbytes = nb; error = 0;
        pos = ((bit_pos + 7) / 8) * 8;
        init_contexts(slice_qp, init_type);
        engine_init();
    }
    inline int decode(int ctx) {
        int s = state[ctx];
        uint32_t rng = range;
        uint32_t lps = lps_range[(s << 2) | ((rng >> 6) & 3)];
        rng -= lps;
        int b;
        if (offset >= rng) {
            b = 1 - mps[ctx];
            offset -= rng;
            rng = lps;
            if (s == 0) mps[ctx] ^= 1;
            state[ctx] = trans_idx_lps[s];
        } else {
            b = mps[ctx];
            state[ctx] = trans_idx_mps[s];
        }
        while (rng < 256) {
            rng <<= 1;
            offset = (offset << 1) | bit();
        }
        range = rng;
        return b;
    }
    inline int bypass() {
        offset = (offset << 1) | bit();
        if (offset >= range) { offset -= range; return 1; }
        return 0;
    }
    inline int terminate() {
        range -= 2;
        if (offset >= range) return 1;
        uint32_t rng = range;
        while (rng < 256) {
            rng <<= 1;
            offset = (offset << 1) | bit();
        }
        range = rng;
        return 0;
    }
    inline int tr_bypass(int cmax) {
        int v = 0;
        while (v < cmax && bypass()) v++;
        return v;
    }
    void save(uint8_t *st, uint8_t *mp) const {
        memcpy(st, state, HEVC_NCTX);
        memcpy(mp, mps, HEVC_NCTX);
    }
    void load(const uint8_t *st, const uint8_t *mp) {
        memcpy(state, st, HEVC_NCTX);
        memcpy(mps, mp, HEVC_NCTX);
    }
    void reposition(int64_t bit_pos) {   /* entry-point jump (9.3.1) */
        pos = bit_pos;
        engine_init();
    }
    void align_and_reinit() {            /* byte_alignment() (7.3.2.10) */
        pos = ((pos >> 3) + 1) << 3;
        engine_init();
    }
};

/* ---- scan orders (6.5.3-6.5.5); scanIdx: 0 diag, 1 hor, 2 ver --------- */

struct Scans {
    /* (x, y) pairs; for sizes 1, 2, 4, 8 */
    uint8_t xy[3][4][64][2];  /* [scan][log2size 0..3][pos][xy] */
    Scans() {
        for (int l = 0; l < 4; l++) {
            int n = 1 << l;
            int k = 0;
            for (int d = 0; d < 2 * n - 1; d++)       /* diag up-right */
                for (int x = 0; x <= d; x++) {
                    int y = d - x;
                    if (x < n && y < n) {
                        xy[0][l][k][0] = (uint8_t)x;
                        xy[0][l][k][1] = (uint8_t)y;
                        k++;
                    }
                }
            k = 0;
            for (int y = 0; y < n; y++)               /* horizontal */
                for (int x = 0; x < n; x++) {
                    xy[1][l][k][0] = (uint8_t)x;
                    xy[1][l][k][1] = (uint8_t)y;
                    k++;
                }
            k = 0;
            for (int x = 0; x < n; x++)               /* vertical */
                for (int y = 0; y < n; y++) {
                    xy[2][l][k][0] = (uint8_t)x;
                    xy[2][l][k][1] = (uint8_t)y;
                    k++;
                }
        }
    }
};
static const Scans SC;

/* 4x4 sig_coeff_flag ctx map (9.3.4.2.5 ctxIdxMap) */
static const uint8_t CTX_IDX_MAP[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                        6, 6, 8, 8, 7, 7, 8, 8};

/* intra modes */
enum { IP_PLANAR = 0, IP_DC = 1, IP_HOR = 10, IP_VER = 26 };

/* error codes */
enum {
    E_OK = 0,
    E_BITS = -1,
    E_PCM = -2,
    E_TQBYPASS = -3,
    E_TSKIP = -4,
    E_OVERRUN = -5,
    E_SUBSET = -6,
    E_NOTINTRA = -7,
};

/* ---- parser state ------------------------------------------------------ */

struct Ctx {
    /* geometry */
    int w, h;                /* coded picture size */
    int log2_ctb, log2_min_cb, log2_min_tb, log2_max_tb, max_tdepth_intra;
    int ctb_w, ctb_h;
    int Wp, Hp;              /* CTB-padded plane size */
    int cw, ch;              /* cell grid (coded): ceil(w/4), ceil(h/4) */
    int Wc, Hc;              /* padded cell grid: Wp/4, Hp/4 */
    /* slice */
    int qp, init_type, sao_luma, sao_chroma, wpp;
    int sdh, tskip_enabled, tqbypass_enabled;
    /* plan outputs (padded strides) */
    int32_t *coeff_y;                       /* [Hp, Wp] */
    int32_t *tu_log2_y, *mode_y_o, *zidx_y, *qp_y;   /* [Hc, Wc] */
    int32_t *coeff_cb, *coeff_cr;           /* [Hp/2, Wp/2] */
    int32_t *tu_log2_c, *mode_c_o, *zidx_c; /* [Hc/2, Wc/2] */
    int32_t *bs_ver, *bs_hor;               /* [Hc, Wc] */
    int32_t *sao_type, *sao_band, *sao_eo;  /* [ctb_h, ctb_w, 3] */
    int32_t *sao_offsets;                   /* [ctb_h, ctb_w, 3, 4] */
    int zctr;
    /* parse-side cell state (coded-size cell grid, row-major [ch][cw]) */
    uint8_t *avail_y;     /* recon availability (marked per luma TU) */
    uint8_t *mode_avail;  /* parse-order PU mode availability (MPM) */
    uint8_t *mode_y;      /* per-cell luma mode for MPM */
    uint8_t *ct_depth;    /* per-cell coding-tree depth */
    /* current CU */
    int cu_modes[4];
    int cu_cmode;
    int cu_part_nxn;
    int cu_x0, cu_y0, cu_log2;
    Cabac c;
    int err;
};

static inline void fail(Ctx *t, int e) { if (!t->err) t->err = e; }

/* ---- residual coding (7.3.8.11), mirrors refdec._residual ------------- */

static int last_prefix(Ctx *t, int base, int log2size, int cidx) {
    int off, shift;
    if (cidx == 0) {
        off = 3 * (log2size - 2) + ((log2size - 1) >> 2);
        shift = (log2size + 1) >> 2;
    } else {
        off = 15;
        shift = log2size - 2;
    }
    int cmax = (log2size << 1) - 1;
    int v = 0;
    while (v < cmax && t->c.decode(base + off + (v >> shift))) v++;
    return v;
}

static int last_suffix(Ctx *t, int prefix) {
    if (prefix <= 3) return prefix;
    int nbits = (prefix >> 1) - 1;
    int suf = 0;
    for (int i = 0; i < nbits; i++) suf = (suf << 1) | t->c.bypass();
    return ((2 + (prefix & 1)) << nbits) + suf;
}

static int abs_remaining(Ctx *t, int rice) {
    int prefix = 0;
    while (prefix < 32 && t->c.bypass()) prefix++;
    if (prefix <= 3) {
        int suf = 0;
        for (int i = 0; i < rice; i++) suf = (suf << 1) | t->c.bypass();
        return (prefix << rice) + suf;
    }
    int nbits = prefix - 3 + rice;
    int suf = 0;
    for (int i = 0; i < nbits; i++) suf = (suf << 1) | t->c.bypass();
    return (((1 << (prefix - 3)) + 3 - 1) << rice) + suf;
}

static inline int sig_ctx(int xc, int yc, int sx, int sy,
                          const uint8_t *csbf, int sb_n, int log2size,
                          int cidx, int scan_idx) {
    int sig;
    if (log2size == 2) {
        sig = CTX_IDX_MAP[(yc << 2) + xc];
    } else if (xc + yc == 0) {
        sig = 0;
    } else {
        int right = (sx + 1 < sb_n) ? csbf[sy * sb_n + sx + 1] : 0;
        int below = (sy + 1 < sb_n) ? csbf[(sy + 1) * sb_n + sx] : 0;
        int prev = right | (below << 1);
        int xp = xc & 3, yp = yc & 3;
        if (prev == 0)      sig = (xp + yp == 0) ? 2 : (xp + yp < 3 ? 1 : 0);
        else if (prev == 1) sig = (yp == 0) ? 2 : (yp == 1 ? 1 : 0);
        else if (prev == 2) sig = (xp == 0) ? 2 : (xp == 1 ? 1 : 0);
        else                sig = 2;
        if (cidx == 0) {
            if (sx != 0 || sy != 0) sig += 3;
            sig += (log2size == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
        } else {
            sig += (log2size == 3) ? 9 : 12;
        }
    }
    return sig + (cidx ? 27 : 0);
}

/* Decode one TU's coefficients into out (int32, `stride` row pitch),
 * positioned at (x0, y0) of that plane. */
static void residual(Ctx *t, int log2size, int cidx, int scan_idx,
                     int32_t *out, int stride, int x0, int y0) {
    Cabac &c = t->c;
    int n = 1 << log2size;
    if (t->tskip_enabled && log2size == 2) {
        if (c.decode(CTX_TRANSFORM_SKIP + (cidx ? 1 : 0))) {
            fail(t, E_TSKIP);
            return;
        }
    }
    int lx = last_prefix(t, CTX_LAST_SIG_X_PREFIX, log2size, cidx);
    int ly = last_prefix(t, CTX_LAST_SIG_Y_PREFIX, log2size, cidx);
    lx = last_suffix(t, lx);
    ly = last_suffix(t, ly);
    if (scan_idx == 2) { int tmp = lx; lx = ly; ly = tmp; }
    int sb_n = n >> 2; if (sb_n < 1) sb_n = 1;
    int sb_l = 0; while ((1 << sb_l) < sb_n) sb_l++;
    const uint8_t (*sb_scan)[2] = SC.xy[scan_idx][sb_l];
    const uint8_t (*in_scan)[2] = SC.xy[scan_idx][2];
    /* position-of lookup */
    int sb_pos[64], in_pos[16];
    for (int i = 0; i < sb_n * sb_n; i++)
        sb_pos[sb_scan[i][1] * sb_n + sb_scan[i][0]] = i;
    for (int i = 0; i < 16; i++)
        in_pos[in_scan[i][1] * 4 + in_scan[i][0]] = i;
    int i_last = sb_pos[(ly >> 2) * sb_n + (lx >> 2)];
    int k_last = in_pos[(ly & 3) * 4 + (lx & 3)];
    uint8_t csbf[64];
    memset(csbf, 0, sizeof csbf);
    int c1 = 1;
    for (int i = i_last; i >= 0; i--) {
        int sx = sb_scan[i][0], sy = sb_scan[i][1];
        int coded, infer_dc;
        if (i == i_last || i == 0) {
            coded = 1; infer_dc = 0;
        } else {
            int right = (sx + 1 < sb_n) ? csbf[sy * sb_n + sx + 1] : 0;
            int below = (sy + 1 < sb_n) ? csbf[(sy + 1) * sb_n + sx] : 0;
            int ctx = (right + below > 0 ? 1 : 0) + (cidx ? 2 : 0);
            coded = c.decode(CTX_SIG_COEFF_GROUP + ctx);
            infer_dc = 1;
        }
        csbf[sy * sb_n + sx] = (uint8_t)coded;
        if (!coded) continue;
        /* sig_coeff_flags: inner scan indices with sig, descending */
        int sig[16], nsig = 0;
        int start = (i == i_last) ? k_last - 1 : 15;
        if (i == i_last) sig[nsig++] = k_last;
        int found = nsig > 0;
        for (int k = start; k >= 0; k--) {
            if (k == 0 && infer_dc && !found) { sig[nsig++] = 0; break; }
            int xin = in_scan[k][0], yin = in_scan[k][1];
            int xc = (sx << 2) + xin, yc = (sy << 2) + yin;
            int ctx = sig_ctx(xc, yc, sx, sy, csbf, sb_n, log2size, cidx,
                              scan_idx);
            if (c.decode(CTX_SIG_COEFF_FLAG + ctx)) {
                sig[nsig++] = k;
                found = 1;
            }
        }
        if (!nsig) continue;
        /* greater1 / greater2 */
        int ctx_set = (i == 0 || cidx > 0) ? 0 : 2;
        if (c1 == 0) ctx_set += 1;
        c1 = 1;
        int base_g1 = CTX_COEFF_ABS_GREATER1 + (cidx ? 16 : 0) + 4 * ctx_set;
        int g1[8], first_g1 = -1;
        int ng1 = nsig < 8 ? nsig : 8;
        for (int j = 0; j < ng1; j++) {
            int b = c.decode(base_g1 + c1);
            g1[j] = b;
            if (b) {
                if (first_g1 < 0) first_g1 = j;
                c1 = 0;
            } else if (c1 > 0 && c1 < 3) {
                c1++;
            }
        }
        int g2 = 0;
        if (first_g1 >= 0)
            g2 = c.decode(CTX_COEFF_ABS_GREATER2 + (cidx ? 4 : 0) + ctx_set);
        /* signs */
        int hidden = t->sdh && (sig[0] - sig[nsig - 1] > 3);
        int nsigns = hidden ? nsig - 1 : nsig;
        int signs[16];
        for (int j = 0; j < nsigns; j++) signs[j] = c.bypass();
        /* levels */
        int rice = 0;
        long total = 0;
        int levels[16];
        for (int j = 0; j < nsig; j++) {
            int base = 1, thresh;
            if (j < 8) {
                base += g1[j];
                if (j == first_g1) base += g2;
                thresh = (j == first_g1) ? 3 : 2;
            } else {
                thresh = 1;
            }
            int level = base;
            if (base == thresh) {
                int rem = abs_remaining(t, rice);
                level += rem;
                if (level > (3 << rice)) rice = rice < 4 ? rice + 1 : 4;
            }
            total += level;
            levels[j] = level;
        }
        for (int j = 0; j < nsig; j++) {
            int k = sig[j];
            int xin = in_scan[k][0], yin = in_scan[k][1];
            int xc = (sx << 2) + xin, yc = (sy << 2) + yin;
            int neg = (j < nsigns) ? signs[j] : (int)(total & 1);
            out[(int64_t)(y0 + yc) * stride + (x0 + xc)] =
                neg ? -levels[j] : levels[j];
        }
    }
}

/* ---- plan recording (mirrors plan.record_luma_tu / record_chroma_tu) -- */

static void fill_cells(int32_t *grid, int stride, int cx, int cy,
                       int ncells, int32_t v) {
    for (int y = cy; y < cy + ncells; y++)
        for (int x = cx; x < cx + ncells; x++)
            grid[(int64_t)y * stride + x] = v;
}

static void record_luma_tu(Ctx *t, int x0, int y0, int n, int mode) {
    int cx = x0 >> 2, cy = y0 >> 2, nc = n >> 2;
    int log2 = 0; while ((1 << log2) < n) log2++;
    fill_cells(t->tu_log2_y, t->Wc, cx, cy, nc, log2);
    fill_cells(t->mode_y_o, t->Wc, cx, cy, nc, mode);
    fill_cells(t->zidx_y, t->Wc, cx, cy, nc, t->zctr++);
    fill_cells(t->qp_y, t->Wc, cx, cy, nc, t->qp);
    /* availability + intra deblock bS (bS 2 at TU edges off picture edge) */
    for (int y = cy; y < cy + nc; y++)
        for (int x = cx; x < cx + nc; x++)
            t->avail_y[y * t->cw + x] = 1;
    if (x0 > 0)
        for (int y = cy; y < cy + nc; y++)
            t->bs_ver[(int64_t)y * t->Wc + cx] = 2;
    if (y0 > 0)
        for (int x = cx; x < cx + nc; x++)
            t->bs_hor[(int64_t)cy * t->Wc + x] = 2;
}

static void record_chroma_tu(Ctx *t, int xc, int yc, int n, int mode) {
    int cx = xc >> 2, cy = yc >> 2, nc = n >> 2;
    int wc2 = t->Wc >> 1;
    int log2 = 0; while ((1 << log2) < n) log2++;
    fill_cells(t->tu_log2_c, wc2, cx, cy, nc, log2);
    fill_cells(t->mode_c_o, wc2, cx, cy, nc, mode);
    fill_cells(t->zidx_c, wc2, cx, cy, nc, t->zctr++);
}

/* ---- intra CU syntax (mirrors refdec._intra_cu + _transform_tree) ----- */

static void mpm(Ctx *t, int px, int py, int *cands) {
    int cx = px >> 2, cy = py >> 2;
    int a = IP_DC, b = IP_DC;
    if (px > 0 && t->mode_avail[cy * t->cw + cx - 1])
        a = t->mode_y[cy * t->cw + cx - 1];
    if (py > 0 && t->mode_avail[(cy - 1) * t->cw + cx] &&
            (py % (1 << t->log2_ctb)) != 0)
        b = t->mode_y[(cy - 1) * t->cw + cx];
    if (a == b) {
        if (a < 2) {
            cands[0] = IP_PLANAR; cands[1] = IP_DC; cands[2] = IP_VER;
        } else {
            cands[0] = a;
            cands[1] = 2 + ((a + 29) % 32);
            cands[2] = 2 + ((a - 2 + 1) % 32);
        }
        return;
    }
    cands[0] = a;
    cands[1] = b;
    if (a != IP_PLANAR && b != IP_PLANAR) cands[2] = IP_PLANAR;
    else if (a != IP_DC && b != IP_DC)    cands[2] = IP_DC;
    else                                  cands[2] = IP_VER;
}

static inline int scan_for(int mode, int log2size, int cidx) {
    if (log2size == 2 || (log2size == 3 && cidx == 0)) {
        if (mode >= 6 && mode <= 14) return 2;
        if (mode >= 22 && mode <= 30) return 1;
    }
    return 0;
}

static int luma_mode_at(Ctx *t, int x0, int y0) {
    if (!t->cu_part_nxn) return t->cu_modes[0];
    int half = 1 << (t->cu_log2 - 1);
    int j = ((y0 - t->cu_y0) >= half) * 2 + ((x0 - t->cu_x0) >= half);
    return t->cu_modes[j];
}

static void chroma_unit(Ctx *t, int xc, int yc, int log2size,
                        int cbf_cb, int cbf_cr) {
    int mode = t->cu_cmode;
    if (cbf_cb) {
        int scan = scan_for(mode, log2size, 1);
        residual(t, log2size, 1, scan, t->coeff_cb, t->Wp >> 1, xc, yc);
        if (t->err) return;
    }
    if (cbf_cr) {
        int scan = scan_for(mode, log2size, 2);
        residual(t, log2size, 2, scan, t->coeff_cr, t->Wp >> 1, xc, yc);
        if (t->err) return;
    }
    record_chroma_tu(t, xc, yc, 1 << log2size, mode);
}

static void transform_unit(Ctx *t, int x0, int y0, int x_base, int y_base,
                           int log2size, int blk_idx, int cbf_luma,
                           int cbf_cb, int cbf_cr) {
    int mode = luma_mode_at(t, x0, y0);
    if (cbf_luma) {
        int scan = scan_for(mode, log2size, 0);
        residual(t, log2size, 0, scan, t->coeff_y, t->Wp, x0, y0);
        if (t->err) return;
    }
    record_luma_tu(t, x0, y0, 1 << log2size, mode);
    if (log2size > 2)
        chroma_unit(t, x0 >> 1, y0 >> 1, log2size - 1, cbf_cb, cbf_cr);
    else if (blk_idx == 3)
        chroma_unit(t, x_base >> 1, y_base >> 1, 2, cbf_cb, cbf_cr);
}

static void transform_tree(Ctx *t, int x0, int y0, int x_base, int y_base,
                           int log2size, int depth, int blk_idx,
                           int max_depth, int intra_split,
                           int parent_cbf_cb, int parent_cbf_cr) {
    if (t->err) return;
    Cabac &c = t->c;
    int split;
    if (log2size <= t->log2_max_tb && log2size > t->log2_min_tb &&
            depth < max_depth && !(intra_split && depth == 0)) {
        split = c.decode(CTX_SPLIT_TRANSFORM_FLAG + 5 - log2size);
    } else {
        split = (log2size > t->log2_max_tb) || (intra_split && depth == 0);
        if (log2size <= t->log2_min_tb) split = 0;
    }
    int cbf_cb = parent_cbf_cb, cbf_cr = parent_cbf_cr;
    if (log2size > 2) {
        if (depth == 0 || parent_cbf_cb)
            cbf_cb = c.decode(CTX_CBF_CB_CR + depth);
        else
            cbf_cb = 0;
        if (depth == 0 || parent_cbf_cr)
            cbf_cr = c.decode(CTX_CBF_CB_CR + depth);
        else
            cbf_cr = 0;
    }
    if (split) {
        int half = 1 << (log2size - 1);
        static const int DXY[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int i = 0; i < 4; i++)
            transform_tree(t, x0 + DXY[i][0] * half, y0 + DXY[i][1] * half,
                           x0, y0, log2size - 1, depth + 1, i, max_depth,
                           intra_split, cbf_cb, cbf_cr);
        return;
    }
    int cbf_luma = c.decode(CTX_CBF_LUMA + (depth == 0 ? 1 : 0));
    transform_unit(t, x0, y0, x_base, y_base, log2size, blk_idx,
                   cbf_luma, cbf_cb, cbf_cr);
}

static void intra_cu(Ctx *t, int x0, int y0, int log2size) {
    Cabac &c = t->c;
    int n = 1 << log2size;
    int part_nxn = 0;
    if (log2size == t->log2_min_cb)
        if (!c.decode(CTX_PART_MODE)) part_nxn = 1;
    int npu = part_nxn ? 2 : 1;
    int pb = n >> (npu - 1);
    int prev_flags[4];
    for (int j = 0; j < npu * npu; j++)
        prev_flags[j] = c.decode(CTX_PREV_INTRA_LUMA_PRED);
    int modes[4];
    for (int j = 0; j < npu * npu; j++) {
        int px = x0 + (j & 1) * pb;
        int py = y0 + (j >> 1) * pb;
        int cands[3];
        mpm(t, px, py, cands);
        int mode;
        if (prev_flags[j]) {
            mode = cands[c.tr_bypass(2)];
        } else {
            int rem = 0;
            for (int k = 0; k < 5; k++) rem = (rem << 1) | c.bypass();
            mode = rem;
            /* add 1 for each candidate <= mode, in ascending cand order */
            int s0 = cands[0], s1 = cands[1], s2 = cands[2], tmp;
            if (s0 > s1) { tmp = s0; s0 = s1; s1 = tmp; }
            if (s1 > s2) { tmp = s1; s1 = s2; s2 = tmp; }
            if (s0 > s1) { tmp = s0; s0 = s1; s1 = tmp; }
            if (mode >= s0) mode++;
            if (mode >= s1) mode++;
            if (mode >= s2) mode++;
        }
        modes[j] = mode;
        int cx = px >> 2, cy = py >> 2, nc = pb >> 2;
        for (int y = cy; y < cy + nc; y++)
            for (int x = cx; x < cx + nc; x++) {
                t->mode_y[y * t->cw + x] = (uint8_t)mode;
                t->mode_avail[y * t->cw + x] = 1;
            }
    }
    int cmode;
    if (c.decode(CTX_INTRA_CHROMA_PRED_MODE)) {
        int idx = (c.bypass() << 1) | c.bypass();
        static const int CAND[4] = {IP_PLANAR, IP_VER, IP_HOR, IP_DC};
        int cand = CAND[idx];
        cmode = (cand == modes[0]) ? 34 : cand;
    } else {
        cmode = modes[0];
    }
    t->cu_cmode = cmode;
    for (int j = 0; j < npu * npu; j++) t->cu_modes[j] = modes[j];
    t->cu_part_nxn = part_nxn;
    t->cu_x0 = x0; t->cu_y0 = y0; t->cu_log2 = log2size;
    int max_depth = t->max_tdepth_intra + (part_nxn ? 1 : 0);
    transform_tree(t, x0, y0, x0, y0, log2size, 0, 0, max_depth,
                   part_nxn, 1, 1);
}

static void coding_unit(Ctx *t, int x0, int y0, int log2size, int depth) {
    if (t->err) return;
    int n = 1 << log2size;
    int cx = x0 >> 2, cy = y0 >> 2, nc = n >> 2;
    for (int y = cy; y < cy + nc; y++)
        for (int x = cx; x < cx + nc; x++)
            t->ct_depth[y * t->cw + x] = (uint8_t)depth;
    if (t->tqbypass_enabled) {
        if (t->c.decode(CTX_CU_TRANSQUANT_BYPASS)) {
            fail(t, E_TQBYPASS);
            return;
        }
    }
    intra_cu(t, x0, y0, log2size);
}

static void coding_quadtree(Ctx *t, int x0, int y0, int log2size,
                            int depth) {
    if (t->err) return;
    int inside = (x0 + (1 << log2size) <= t->w) &&
                 (y0 + (1 << log2size) <= t->h);
    int split;
    if (inside && log2size > t->log2_min_cb) {
        int ctx = 0;
        int cx = x0 >> 2, cy = y0 >> 2;
        if (x0 > 0 && t->avail_y[cy * t->cw + cx - 1])
            ctx += t->ct_depth[cy * t->cw + cx - 1] > depth;
        if (y0 > 0 && t->avail_y[(cy - 1) * t->cw + cx])
            ctx += t->ct_depth[(cy - 1) * t->cw + cx] > depth;
        split = t->c.decode(CTX_SPLIT_CU_FLAG + ctx);
    } else {
        split = log2size > t->log2_min_cb;
    }
    if (split) {
        int half = 1 << (log2size - 1);
        static const int DXY[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int i = 0; i < 4; i++) {
            int nx = x0 + DXY[i][0] * half, ny = y0 + DXY[i][1] * half;
            if (nx < t->w && ny < t->h)
                coding_quadtree(t, nx, ny, log2size - 1, depth + 1);
        }
    } else {
        coding_unit(t, x0, y0, log2size, depth);
    }
}

/* ---- SAO syntax per CTB (mirrors refdec._sao_syntax) ------------------- */

static void sao_copy(Ctx *t, int dst, int src) {
    for (int ci = 0; ci < 3; ci++) {
        t->sao_type[dst * 3 + ci] = t->sao_type[src * 3 + ci];
        t->sao_band[dst * 3 + ci] = t->sao_band[src * 3 + ci];
        t->sao_eo[dst * 3 + ci] = t->sao_eo[src * 3 + ci];
        for (int k = 0; k < 4; k++)
            t->sao_offsets[(dst * 3 + ci) * 4 + k] =
                t->sao_offsets[(src * 3 + ci) * 4 + k];
    }
}

static void sao_syntax(Ctx *t, int xc, int yc, const uint8_t *done) {
    Cabac &c = t->c;
    int idx = yc * t->ctb_w + xc;
    /* single-slice picture: left/up in-slice iff already processed */
    if (xc > 0 && done[idx - 1]) {
        if (c.decode(CTX_SAO_MERGE_FLAG)) { sao_copy(t, idx, idx - 1); return; }
    }
    if (yc > 0 && done[idx - t->ctb_w]) {
        if (c.decode(CTX_SAO_MERGE_FLAG)) {
            sao_copy(t, idx, idx - t->ctb_w);
            return;
        }
    }
    enum { OFF = 0, BAND = 1, EDGE = 2 };
    int type[3] = {OFF, OFF, OFF};
    for (int ci = 0; ci < 3; ci++) {
        if ((ci == 0 && !t->sao_luma) || (ci > 0 && !t->sao_chroma))
            continue;
        if (ci <= 1) {
            if (!c.decode(CTX_SAO_TYPE_IDX)) type[ci] = OFF;
            else type[ci] = c.bypass() ? EDGE : BAND;
        } else {
            type[2] = type[1];
        }
        t->sao_type[idx * 3 + ci] = type[ci];
        if (type[ci] == OFF) continue;
        int absv[4];
        for (int k = 0; k < 4; k++) absv[k] = c.tr_bypass(7);
        if (type[ci] == BAND) {
            for (int k = 0; k < 4; k++) {
                int v = absv[k];
                if (v && c.bypass()) v = -v;
                t->sao_offsets[(idx * 3 + ci) * 4 + k] = v;
            }
            t->sao_band[idx * 3 + ci] =
                (c.bypass() << 4) | (c.bypass() << 3) | (c.bypass() << 2) |
                (c.bypass() << 1) | c.bypass();
        } else {
            t->sao_offsets[(idx * 3 + ci) * 4 + 0] = absv[0];
            t->sao_offsets[(idx * 3 + ci) * 4 + 1] = absv[1];
            t->sao_offsets[(idx * 3 + ci) * 4 + 2] = -absv[2];
            t->sao_offsets[(idx * 3 + ci) * 4 + 3] = -absv[3];
            if (ci == 0) {
                t->sao_eo[idx * 3 + 0] = (c.bypass() << 1) | c.bypass();
            } else if (ci == 1) {
                int eo = (c.bypass() << 1) | c.bypass();
                t->sao_eo[idx * 3 + 1] = eo;
                t->sao_eo[idx * 3 + 2] = eo;
            }
        }
    }
}

}  /* namespace */

/* ---- entry point ------------------------------------------------------- */

extern "C" {

/* iparams layout (int32):
 *  0 coded width   1 coded height  2 log2_ctb      3 log2_min_cb
 *  4 log2_min_tb   5 log2_max_tb   6 max_transform_hierarchy_depth_intra
 *  7 slice_qp      8 init_type     9 sao_luma     10 sao_chroma
 * 11 wpp          12 sign_data_hiding             13 transform_skip_enabled
 * 14 transquant_bypass_enabled    15 pcm_enabled  16 segment_address
 * 17 n_substreams
 * Returns number of CTBs parsed (>0) or a negative error code. */
int jmx_hevc_parse_i_slice(
        const uint8_t *rbsp, int64_t nbytes, int64_t bit_pos,
        const int32_t *iparams, const int64_t *substream_byte_off,
        int32_t *coeff_y, int32_t *tu_log2_y, int32_t *mode_y,
        int32_t *zidx_y, int32_t *qp_y,
        int32_t *coeff_cb, int32_t *coeff_cr,
        int32_t *tu_log2_c, int32_t *mode_c, int32_t *zidx_c,
        int32_t *bs_ver, int32_t *bs_hor,
        int32_t *sao_type, int32_t *sao_offsets, int32_t *sao_band,
        int32_t *sao_eo,
        uint8_t *scratch /* >= 5 * cw * ch bytes */) {
    Ctx t;
    memset((void *)&t, 0, sizeof(Ctx));
    t.w = iparams[0]; t.h = iparams[1];
    t.log2_ctb = iparams[2]; t.log2_min_cb = iparams[3];
    t.log2_min_tb = iparams[4]; t.log2_max_tb = iparams[5];
    t.max_tdepth_intra = iparams[6];
    t.qp = iparams[7]; t.init_type = iparams[8];
    t.sao_luma = iparams[9]; t.sao_chroma = iparams[10];
    t.wpp = iparams[11]; t.sdh = iparams[12];
    t.tskip_enabled = iparams[13];
    t.tqbypass_enabled = iparams[14];
    int pcm_enabled = iparams[15];
    int seg_addr = iparams[16];
    int n_sub = iparams[17];
    if (pcm_enabled) return E_PCM;
    if (seg_addr != 0) return E_NOTINTRA;  /* single-slice pictures only */
    int ctb = 1 << t.log2_ctb;
    t.ctb_w = (t.w + ctb - 1) >> t.log2_ctb;
    t.ctb_h = (t.h + ctb - 1) >> t.log2_ctb;
    t.Wp = t.ctb_w * ctb; t.Hp = t.ctb_h * ctb;
    t.Wc = t.Wp >> 2; t.Hc = t.Hp >> 2;
    t.cw = (t.w + 3) >> 2; t.ch = (t.h + 3) >> 2;
    t.coeff_y = coeff_y; t.tu_log2_y = tu_log2_y; t.mode_y_o = mode_y;
    t.zidx_y = zidx_y; t.qp_y = qp_y;
    t.coeff_cb = coeff_cb; t.coeff_cr = coeff_cr;
    t.tu_log2_c = tu_log2_c; t.mode_c_o = mode_c; t.zidx_c = zidx_c;
    t.bs_ver = bs_ver; t.bs_hor = bs_hor;
    t.sao_type = sao_type; t.sao_offsets = sao_offsets;
    t.sao_band = sao_band; t.sao_eo = sao_eo;
    t.zctr = 0;
    size_t cells = (size_t)t.cw * t.ch;
    t.avail_y = scratch;
    t.mode_avail = scratch + cells;
    t.mode_y = scratch + 2 * cells;
    t.ct_depth = scratch + 3 * cells;
    uint8_t *ctb_done = scratch + 4 * cells;  /* ctb_w*ctb_h <= cells */
    memset(scratch, 0, 5 * cells);
    memset(t.mode_y, IP_DC, cells);

    t.c.start(rbsp, nbytes, bit_pos, t.qp, t.init_type);
    uint8_t saved_state[HEVC_NCTX], saved_mps[HEVC_NCTX];
    int have_saved = 0;
    int addr = seg_addr;
    int sub_idx = 0;
    int n_ctbs = 0;
    for (;;) {
        int xc = addr % t.ctb_w, yc = addr / t.ctb_w;
        if (t.wpp && xc == 0 && addr != seg_addr) {
            /* row start: sync from storage after top-right CTB (9.3.1) */
            int top_right = (t.ctb_w > 1 ? 1 : 0);
            if (t.ctb_w > 1 &&
                    ctb_done[(yc - 1) * t.ctb_w + top_right] && have_saved)
                t.c.load(saved_state, saved_mps);
            else
                t.c.init_contexts(t.qp, t.init_type);
        }
        if (t.sao_luma || t.sao_chroma)
            sao_syntax(&t, xc, yc, ctb_done);
        coding_quadtree(&t, xc << t.log2_ctb, yc << t.log2_ctb,
                        t.log2_ctb, 0);
        if (t.err) return t.err;
        ctb_done[yc * t.ctb_w + xc] = 1;
        n_ctbs++;
        if (t.wpp && xc == 1) {
            t.c.save(saved_state, saved_mps);
            have_saved = 1;
        }
        int end = t.c.terminate();
        addr++;
        if (end) break;
        if (addr >= t.ctb_w * t.ctb_h) return E_OVERRUN;
        if (t.wpp && addr % t.ctb_w == 0) {
            if (!t.c.terminate()) return E_SUBSET;
            if (sub_idx < n_sub) {
                t.c.reposition(substream_byte_off[sub_idx] * 8);
                sub_idx++;
            } else {
                t.c.align_and_reinit();
            }
        }
    }
    return n_ctbs;
}

}  /* extern "C" */
