/* Fast CAVLC I-slice parser: the host entropy front-end of the TPU decode
 * pipeline (SURVEY §7.2 L1a). Parses slice_data of one H.264 I slice (CAVLC)
 * into dense symbol planes consumed by the device recon kernel.
 *
 * Mirrors jmcodec_tpu/codec/h264/{cavlc,macroblock}.py exactly; tested for
 * byte-for-byte equality of the produced symbol planes. VLC tables are
 * generated from the Python source of truth (gen_tables.py).
 *
 * Built as a shared library, bound via ctypes (no pybind11 in the image).
 */

#include <stdint.h>
#include <string.h>

#include "h264_tables.h"

extern "C" {

/* 64-bit buffered MSB-first bit reader: `cache` is top-aligned (the next
 * unread bit is bit 63); refilled a byte at a time. */
typedef struct {
    const uint8_t *data;
    int64_t nbits;     /* total payload bits */
    int64_t nbytes;
    int64_t bytepos;   /* next byte to load into the cache */
    int64_t pos;       /* absolute consumed-bit position */
    uint64_t cache;
    int cbits;         /* valid bits in cache */
    int error;
} BR;

static inline void br_refill(BR *b) {
    while (b->cbits <= 56) {
        uint64_t d = b->bytepos < b->nbytes ? b->data[b->bytepos] : 0;
        b->bytepos++;
        b->cache |= d << (56 - b->cbits);
        b->cbits += 8;
    }
}

static inline uint32_t br_peek(BR *b, int n) {
    br_refill(b);
    return (uint32_t)(b->cache >> (64 - n));
}

static inline void br_skip(BR *b, int n) {
    b->cache <<= n;
    b->cbits -= n;
    b->pos += n;
}

static inline uint32_t br_read(BR *b, int n) {
    if (n == 0) return 0;
    if (b->pos + n > b->nbits) { b->error = 1; return 0; }
    uint32_t v = br_peek(b, n);
    br_skip(b, n);
    return v;
}

static inline uint32_t br_ue(BR *b) {
    br_refill(b);
    uint64_t c = b->cache;
    if (c == 0) { b->error = 1; return 0; }
    int zeros = __builtin_clzll(c);
    if (zeros > 32 || b->pos + 2 * zeros + 1 > b->nbits) { b->error = 1; return 0; }
    if (zeros == 0) { br_skip(b, 1); return 0; }
    if (2 * zeros + 1 <= 57) {
        uint32_t v = (uint32_t)(c >> (64 - (2 * zeros + 1)));
        br_skip(b, 2 * zeros + 1);
        return v - 1;
    }
    br_skip(b, zeros + 1);
    return ((1u << zeros) - 1) + br_read(b, zeros);
}

static inline int32_t br_se(BR *b) {
    uint32_t k = br_ue(b);
    if (k & 1) return (int32_t)((k + 1) >> 1);
    return -(int32_t)(k >> 1);
}

static inline int br_more_rbsp(BR *b) {
    if (b->pos >= b->nbits) return 0;
    /* find last set bit (rbsp_stop_one_bit) */
    int64_t last = (b->nbits >> 3) - 1;
    while (last >= (b->pos >> 3) && b->data[last] == 0) last--;
    if (last < 0) return 0;
    uint8_t v = b->data[last];
    int low = 0;
    while (!((v >> low) & 1)) low++;
    int64_t stop = last * 8 + (7 - low);
    return b->pos < stop;
}

/* ---- VLC decode helpers ---- */
#define VLC_DECODE(b, PFX)                                            \
    ({                                                                 \
        uint32_t key = br_peek(b, PFX##_BITS);                         \
        uint8_t ln = PFX##_len[key];                                   \
        if (!ln) { (b)->error = 1; }                                   \
        br_skip(b, ln);                                                \
        PFX##_sym[key];                                                \
    })

static int decode_residual(BR *b, int nC, int max_coeff, int32_t *coeffs) {
    /* returns TotalCoeff; coeffs filled in SCAN order, length max_coeff */
    memset(coeffs, 0, sizeof(int32_t) * max_coeff);
    int total_coeff, trailing_ones;
    if (nC >= 8) {
        uint32_t code = br_read(b, 6);
        if (code == 3) { total_coeff = 0; trailing_ones = 0; }
        else { trailing_ones = code & 3; total_coeff = (int)(code >> 2) + 1; }
    } else {
        uint16_t sym;
        if (nC < 0)      sym = VLC_DECODE(b, ct4);
        else if (nC < 2) sym = VLC_DECODE(b, ct0);
        else if (nC < 4) sym = VLC_DECODE(b, ct1);
        else             sym = VLC_DECODE(b, ct2);
        trailing_ones = sym & 3;
        total_coeff = sym >> 2;
    }
    if (b->error || total_coeff == 0) return total_coeff;

    int32_t levels[16];
    for (int i = 0; i < trailing_ones; i++)
        levels[i] = br_read(b, 1) ? -1 : 1;
    int suffix_length = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
    for (int i = trailing_ones; i < total_coeff; i++) {
        br_refill(b);
        if (b->cache == 0) { b->error = 1; return 0; }
        int level_prefix = __builtin_clzll(b->cache);
        if (level_prefix > 32 || b->pos + level_prefix + 1 > b->nbits) {
            b->error = 1;
            return 0;
        }
        br_skip(b, level_prefix + 1);
        int suffix_size;
        if (level_prefix >= 15) suffix_size = level_prefix - 3;
        else if (level_prefix == 14 && suffix_length == 0) suffix_size = 4;
        else suffix_size = suffix_length;
        int64_t level_suffix = suffix_size ? br_read(b, suffix_size) : 0;
        int64_t level_code =
            ((int64_t)(level_prefix < 15 ? level_prefix : 15) << suffix_length)
            + level_suffix;
        if (level_prefix >= 15 && suffix_length == 0) level_code += 15;
        if (level_prefix >= 16) level_code += (1LL << (level_prefix - 3)) - 4096;
        if (i == trailing_ones && trailing_ones < 3) level_code += 2;
        int64_t level = (level_code % 2 == 0) ? (level_code + 2) >> 1
                                              : (-level_code - 1) >> 1;
        levels[i] = (int32_t)level;
        if (suffix_length == 0) suffix_length = 1;
        int64_t al = level < 0 ? -level : level;
        if (al > (3 << (suffix_length - 1)) && suffix_length < 6)
            suffix_length++;
    }

    int total_zeros = 0;
    if (total_coeff < max_coeff) {
        if (nC < 0) {
            switch (total_coeff) {
                case 1: total_zeros = VLC_DECODE(b, tzc1); break;
                case 2: total_zeros = VLC_DECODE(b, tzc2); break;
                case 3: total_zeros = VLC_DECODE(b, tzc3); break;
            }
        } else {
            switch (total_coeff) {
                case 1: total_zeros = VLC_DECODE(b, tz1); break;
                case 2: total_zeros = VLC_DECODE(b, tz2); break;
                case 3: total_zeros = VLC_DECODE(b, tz3); break;
                case 4: total_zeros = VLC_DECODE(b, tz4); break;
                case 5: total_zeros = VLC_DECODE(b, tz5); break;
                case 6: total_zeros = VLC_DECODE(b, tz6); break;
                case 7: total_zeros = VLC_DECODE(b, tz7); break;
                case 8: total_zeros = VLC_DECODE(b, tz8); break;
                case 9: total_zeros = VLC_DECODE(b, tz9); break;
                case 10: total_zeros = VLC_DECODE(b, tz10); break;
                case 11: total_zeros = VLC_DECODE(b, tz11); break;
                case 12: total_zeros = VLC_DECODE(b, tz12); break;
                case 13: total_zeros = VLC_DECODE(b, tz13); break;
                case 14: total_zeros = VLC_DECODE(b, tz14); break;
                case 15: total_zeros = VLC_DECODE(b, tz15); break;
            }
        }
    }

    int zeros_left = total_zeros;
    int pos = total_coeff - 1 + total_zeros;
    for (int i = 0; i < total_coeff; i++) {
        if (pos < 0 || pos >= max_coeff) { b->error = 1; return 0; }
        coeffs[pos] = levels[i];
        if (i < total_coeff - 1) {
            int run = 0;
            if (zeros_left > 0) {
                int zl = zeros_left < 7 ? zeros_left : 7;
                switch (zl) {
                    case 1: run = VLC_DECODE(b, rb1); break;
                    case 2: run = VLC_DECODE(b, rb2); break;
                    case 3: run = VLC_DECODE(b, rb3); break;
                    case 4: run = VLC_DECODE(b, rb4); break;
                    case 5: run = VLC_DECODE(b, rb5); break;
                    case 6: run = VLC_DECODE(b, rb6); break;
                    case 7: run = VLC_DECODE(b, rb7); break;
                }
            }
            zeros_left -= run;
            pos -= 1 + run;
        }
    }
    return total_coeff;
}

/* ---------- slice-level context ---------- */

typedef struct {
    int mbw, mbh;
    int32_t *nz_luma;      /* [mbh*4][mbw*4] */
    int32_t *nz_chroma;    /* [2][mbh*2][mbw*2] */
    int32_t *i4_grid;      /* [mbh*4][mbw*4] mode or -1 */
    int32_t *slice_map;    /* [mbh][mbw]; -1 undecoded */
    /* outputs (FrameSymbols layout) */
    int32_t *mb_class;     /* [mbh][mbw] */
    int32_t *qp;           /* [mbh][mbw] */
    int32_t *i4_modes;     /* [mbh*4][mbw*4] (0 where not I4) */
    int32_t *i16_mode;     /* [mbh][mbw] */
    int32_t *chroma_mode;  /* [mbh][mbw] */
    int32_t *luma_coeffs;  /* [mbh*4][mbw*4][16] raster */
    int32_t *luma_dc;      /* [mbh][mbw][16] raster */
    int32_t *chroma_coeffs;/* [2][mbh*2][mbw*2][16] raster */
    int32_t *chroma_dc;    /* [2][mbh][mbw][4] */
    uint8_t *pcm_y;        /* [mbh*16][mbw*16] or NULL */
    uint8_t *pcm_c;        /* [2][mbh*8][mbw*8] or NULL */
} Ctx;

static inline int blk_nz(const Ctx *c, const int32_t *grid, int by, int bx,
                         int cur_slice, int per_mb, int gw, int gh) {
    if (bx < 0 || by < 0 || bx >= gw || by >= gh) return -1;
    int my = by / per_mb, mx = bx / per_mb;
    if (c->slice_map[my * c->mbw + mx] != cur_slice) return -1;
    return grid[by * gw + bx];
}

static inline int combine_nc(int na, int nb) {
    if (na >= 0 && nb >= 0) return (na + nb + 1) >> 1;
    if (na >= 0) return na;
    if (nb >= 0) return nb;
    return 0;
}

static inline int luma_nc(const Ctx *c, int by, int bx, int cur_slice) {
    int gw = c->mbw * 4, gh = c->mbh * 4;
    return combine_nc(blk_nz(c, c->nz_luma, by, bx - 1, cur_slice, 4, gw, gh),
                      blk_nz(c, c->nz_luma, by - 1, bx, cur_slice, 4, gw, gh));
}

static inline int chroma_nc(const Ctx *c, int comp, int by, int bx,
                            int cur_slice) {
    int gw = c->mbw * 2, gh = c->mbh * 2;
    const int32_t *g = c->nz_chroma + comp * gw * gh;
    return combine_nc(blk_nz(c, g, by, bx - 1, cur_slice, 2, gw, gh),
                      blk_nz(c, g, by - 1, bx, cur_slice, 2, gw, gh));
}

static inline int i4_mode_at(const Ctx *c, int by, int bx, int cur_slice) {
    /* -1 if unavailable; DC(2) if available but not I4x4 */
    int gw = c->mbw * 4, gh = c->mbh * 4;
    if (bx < 0 || by < 0 || bx >= gw || by >= gh) return -1;
    int my = by / 4, mx = bx / 4;
    if (c->slice_map[my * c->mbw + mx] != cur_slice) return -1;
    int m = c->i4_grid[by * gw + bx];
    return m < 0 ? 2 : m;
}

static inline int predict_i4(const Ctx *c, int by, int bx, int cur_slice) {
    int ma = i4_mode_at(c, by, bx - 1, cur_slice);
    int mb = i4_mode_at(c, by - 1, bx, cur_slice);
    if (ma < 0 || mb < 0) return 2;
    return ma < mb ? ma : mb;
}

static void store_raster(int32_t *dst, const int32_t *scan, int n_ac,
                         int skip_dc) {
    /* scan-order -> raster 16; if skip_dc, scan has 15 AC coeffs (pos 1..15) */
    for (int k = 0; k < 16; k++) dst[k] = 0;
    if (skip_dc) {
        for (int k = 0; k < 15; k++) dst[zigzag4x4[k + 1]] = scan[k];
    } else {
        for (int k = 0; k < 16; k++) dst[zigzag4x4[k]] = scan[k];
    }
}

/* Parse slice_data of one I slice. Returns #MBs parsed, or -1 on error. */
int jmx_parse_i_slice(const uint8_t *rbsp, int64_t nbytes, int64_t bit_offset,
                      int mbw, int mbh, int first_mb, int slice_qp,
                      int cur_slice,
                      int32_t *nz_luma, int32_t *nz_chroma, int32_t *i4_grid,
                      int32_t *slice_map, int32_t *mb_class, int32_t *qp_out,
                      int32_t *i4_modes, int32_t *i16_mode,
                      int32_t *chroma_mode, int32_t *luma_coeffs,
                      int32_t *luma_dc, int32_t *chroma_coeffs,
                      int32_t *chroma_dc, uint8_t *pcm_y, uint8_t *pcm_c) {
    Ctx c = {mbw, mbh, nz_luma, nz_chroma, i4_grid, slice_map, mb_class,
             qp_out, i4_modes, i16_mode, chroma_mode, luma_coeffs, luma_dc,
             chroma_coeffs, chroma_dc, pcm_y, pcm_c};
    BR b;
    b.data = rbsp;
    b.nbits = nbytes * 8;
    b.nbytes = nbytes;
    b.bytepos = bit_offset >> 3;
    b.pos = bit_offset & ~7LL;
    b.cache = 0;
    b.cbits = 0;
    b.error = 0;
    if (bit_offset & 7) br_read(&b, (int)(bit_offset & 7));
    int qp = slice_qp;
    int addr = first_mb;
    int n_mbs = 0;
    int gw4 = mbw * 4, gw2 = mbw * 2;

    while (1) {
        int my = addr / mbw, mx = addr % mbw;
        if (my >= mbh) return -2;
        uint32_t mb_type = br_ue(&b);
        if (b.error) return -3;

        if (mb_type == 25) { /* I_PCM */
            while (b.pos & 7) {
                if (br_read(&b, 1)) return -4;
            }
            if (!pcm_y || !pcm_c) return -5;
            for (int y = 0; y < 16; y++)
                for (int x = 0; x < 16; x++)
                    pcm_y[(my * 16 + y) * (mbw * 16) + mx * 16 + x] =
                        (uint8_t)br_read(&b, 8);
            for (int comp = 0; comp < 2; comp++)
                for (int y = 0; y < 8; y++)
                    for (int x = 0; x < 8; x++)
                        pcm_c[comp * mbh * 8 * mbw * 8 +
                              (my * 8 + y) * (mbw * 8) + mx * 8 + x] =
                            (uint8_t)br_read(&b, 8);
            mb_class[my * mbw + mx] = 2;
            slice_map[my * mbw + mx] = cur_slice;
            qp_out[my * mbw + mx] = qp;
            for (int r = 0; r < 4; r++)
                for (int s = 0; s < 4; s++) {
                    nz_luma[(my * 4 + r) * gw4 + mx * 4 + s] = 16;
                    i4_grid[(my * 4 + r) * gw4 + mx * 4 + s] = -1;
                }
            for (int comp = 0; comp < 2; comp++)
                for (int r = 0; r < 2; r++)
                    for (int s = 0; s < 2; s++)
                        nz_chroma[comp * mbh * 2 * gw2 + (my * 2 + r) * gw2 +
                                  mx * 2 + s] = 16;
            if (b.error) return -6;
            addr++;
            n_mbs++;
            if (!br_more_rbsp(&b)) break;
            continue;
        }

        int cls, i16m = 0, cbp_luma = 0, cbp_chroma = 0;
        int modes[16];
        if (mb_type == 0) {
            cls = 0;
            slice_map[my * mbw + mx] = cur_slice;
            mb_class[my * mbw + mx] = 0;
            int rem[16];
            for (int i = 0; i < 16; i++) {
                if (br_read(&b, 1)) rem[i] = -1;
                else rem[i] = (int)br_read(&b, 3);
            }
            uint32_t cm = br_ue(&b);
            if (cm > 3) return -7;
            chroma_mode[my * mbw + mx] = (int32_t)cm;
            uint32_t code = br_ue(&b);
            if (code > 47) return -8;
            int cbp = cbp_intra_from_code[code];
            cbp_luma = cbp & 15;
            cbp_chroma = cbp >> 4;
            if (cbp_chroma == 3) return -9;
            for (int i = 0; i < 16; i++) {
                int by = my * 4 + blk_y[i] / 4;
                int bx = mx * 4 + blk_x[i] / 4;
                int pred = predict_i4(&c, by, bx, cur_slice);
                int mode = rem[i] < 0 ? pred
                          : (rem[i] >= pred ? rem[i] + 1 : rem[i]);
                modes[i] = mode;
                i4_grid[by * gw4 + bx] = mode;
                i4_modes[by * gw4 + bx] = mode;
            }
        } else if (mb_type <= 24) {
            cls = 1;
            slice_map[my * mbw + mx] = cur_slice;
            mb_class[my * mbw + mx] = 1;
            int t = (int)mb_type - 1;
            cbp_luma = t >= 12 ? 15 : 0;
            t %= 12;
            i16m = t % 4;
            cbp_chroma = t / 4;
            i16_mode[my * mbw + mx] = i16m;
            uint32_t cm = br_ue(&b);
            if (cm > 3) return -7;
            chroma_mode[my * mbw + mx] = (int32_t)cm;
            for (int r = 0; r < 4; r++)
                for (int s = 0; s < 4; s++)
                    i4_grid[(my * 4 + r) * gw4 + mx * 4 + s] = -1;
        } else {
            return -10;
        }

        if (cbp_luma || cbp_chroma || cls == 1) {
            int32_t dq = br_se(&b);
            if (dq < -26 || dq > 25) return -11;
            qp = ((qp + dq) % 52 + 52) % 52;
        }
        qp_out[my * mbw + mx] = qp;

        int32_t scan[16];
        /* luma DC (I16) */
        if (cls == 1) {
            int nc = luma_nc(&c, my * 4, mx * 4, cur_slice);
            decode_residual(&b, nc, 16, scan);
            store_raster(luma_dc + (my * mbw + mx) * 16, scan, 0, 0);
        } else {
            for (int k = 0; k < 16; k++)
                luma_dc[(my * mbw + mx) * 16 + k] = 0;
        }
        /* luma blocks */
        int n_ac = cls == 1 ? 15 : 16;
        for (int i = 0; i < 16; i++) {
            int by = my * 4 + blk_y[i] / 4;
            int bx = mx * 4 + blk_x[i] / 4;
            int32_t *dst = luma_coeffs + (by * gw4 + bx) * 16;
            if (cbp_luma & (1 << (i >> 2))) {
                int nc = luma_nc(&c, by, bx, cur_slice);
                int tc = decode_residual(&b, nc, n_ac, scan);
                store_raster(dst, scan, n_ac, cls == 1);
                nz_luma[by * gw4 + bx] = tc;
            } else {
                for (int k = 0; k < 16; k++) dst[k] = 0;
                nz_luma[by * gw4 + bx] = 0;
            }
        }
        /* chroma DC */
        for (int comp = 0; comp < 2; comp++) {
            int32_t *dst = chroma_dc + (comp * mbh * mbw + my * mbw + mx) * 4;
            if (cbp_chroma) {
                int32_t cdc[4];
                decode_residual(&b, -1, 4, cdc);
                for (int k = 0; k < 4; k++) dst[k] = cdc[k];
            } else {
                for (int k = 0; k < 4; k++) dst[k] = 0;
            }
        }
        /* chroma AC */
        static const int cblk_x[4] = {0, 4, 0, 4};
        static const int cblk_y[4] = {0, 0, 4, 4};
        for (int comp = 0; comp < 2; comp++) {
            for (int i = 0; i < 4; i++) {
                int by = my * 2 + cblk_y[i] / 4;
                int bx = mx * 2 + cblk_x[i] / 4;
                int32_t *dst = chroma_coeffs +
                    (comp * mbh * 2 * gw2 + by * gw2 + bx) * 16;
                int32_t *nz = nz_chroma + comp * mbh * 2 * gw2 + by * gw2 + bx;
                if (cbp_chroma == 2) {
                    int nc = chroma_nc(&c, comp, by, bx, cur_slice);
                    int tc = decode_residual(&b, nc, 15, scan);
                    store_raster(dst, scan, 15, 1);
                    *nz = tc;
                } else {
                    for (int k = 0; k < 16; k++) dst[k] = 0;
                    *nz = 0;
                }
            }
        }
        if (b.error) return -12;
        addr++;
        n_mbs++;
        if (!br_more_rbsp(&b)) break;
    }
    return n_mbs;
}

} /* extern "C" */
