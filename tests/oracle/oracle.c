/* Dev-time conformance oracle over libavcodec (test harness only; NOT part of
 * the framework). Mirrors the reference's use of FFmpeg software decode as an
 * implicit reference backend (test_player/test_player.cpp:196-218 dec_type==3).
 *
 * Usage:
 *   oracle decode <in.h264|in.h265> <out.i420>           -> prints "W H N"
 *   oracle encode <in.i420> <W> <H> <qp> <out.es> [codec] [gop] [preset]
 *       codec: libx264 (default) | libx265
 *       gop:   GOP length (default 1 => all-intra)
 */
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
#include <libavutil/motion_vector.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void die(const char *msg) { fprintf(stderr, "oracle: %s\n", msg); exit(1); }

static void write_frame_i420(FILE *f, AVFrame *fr) {
    for (int y = 0; y < fr->height; y++)
        fwrite(fr->data[0] + y * fr->linesize[0], 1, fr->width, f);
    for (int y = 0; y < fr->height / 2; y++)
        fwrite(fr->data[1] + y * fr->linesize[1], 1, fr->width / 2, f);
    for (int y = 0; y < fr->height / 2; y++)
        fwrite(fr->data[2] + y * fr->linesize[2], 1, fr->width / 2, f);
}

/* mvs mode: decode and print one line per exported motion vector:
 *   frame_idx source blk_w blk_h dst_x dst_y motion_x motion_y
 * (AV_FRAME_DATA_MOTION_VECTORS; source<0 = list0/past, >0 = list1/future) */
static int mvs_mode = 0;

static void dump_mvs(AVFrame *fr, int idx, FILE *fo) {
    AVFrameSideData *sd = av_frame_get_side_data(fr, AV_FRAME_DATA_MOTION_VECTORS);
    if (!sd) return;
    const AVMotionVector *mv = (const AVMotionVector *)sd->data;
    for (size_t i = 0; i < sd->size / sizeof(*mv); i++, mv++)
        fprintf(fo, "%d %d %d %d %d %d %d %d\n", idx, mv->source,
                mv->w, mv->h, mv->dst_x, mv->dst_y,
                (int)mv->motion_x, (int)mv->motion_y);
}

static int do_decode(const char *inpath, const char *outpath) {
    FILE *fi = fopen(inpath, "rb");
    if (!fi) die("cannot open input");
    fseek(fi, 0, SEEK_END);
    long sz = ftell(fi);
    fseek(fi, 0, SEEK_SET);
    uint8_t *buf = malloc(sz + AV_INPUT_BUFFER_PADDING_SIZE);
    if (fread(buf, 1, sz, fi) != (size_t)sz) die("short read");
    memset(buf + sz, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    fclose(fi);

    /* pick codec by extension */
    enum AVCodecID cid = AV_CODEC_ID_H264;
    const char *dot = strrchr(inpath, '.');
    if (dot && (!strcmp(dot, ".h265") || !strcmp(dot, ".hevc"))) cid = AV_CODEC_ID_HEVC;

    const AVCodec *codec = avcodec_find_decoder(cid);
    if (!codec) die("no decoder");
    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (mvs_mode)
        ctx->flags2 |= AV_CODEC_FLAG2_EXPORT_MVS;
    if (getenv("ORACLE_DEBUG")) {
        ctx->debug = FF_DEBUG_QP | FF_DEBUG_MB_TYPE;
        av_log_set_level(AV_LOG_DEBUG);
    }
    if (getenv("ORACLE_NOLF"))
        ctx->skip_loop_filter = AVDISCARD_ALL;
    if (avcodec_open2(ctx, codec, NULL) < 0) die("open decoder");

    FILE *fo = fopen(outpath, "wb");
    if (!fo) die("cannot open output");
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    int W = 0, H = 0, N = 0;

    uint8_t *p = buf;
    long left = sz;
    for (;;) {
        /* a parse2 call with in_size 0 flushes the parser's buffered AU;
         * stop only when such a flush call yields nothing */
        int in_size = (int)left;
        int used = av_parser_parse2(parser, ctx, &pkt->data, &pkt->size,
                                    p, in_size, AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
        if (used < 0) die("parse error");
        p += used; left -= used;
        if (pkt->size) {
            if (avcodec_send_packet(ctx, pkt) < 0) die("send_packet");
            while (avcodec_receive_frame(ctx, fr) == 0) {
                W = fr->width; H = fr->height;
                if (mvs_mode) dump_mvs(fr, N, fo);
                else write_frame_i420(fo, fr);
                N++;
            }
        } else if (in_size == 0) {
            break;
        }
    }
    /* flush */
    avcodec_send_packet(ctx, NULL);
    while (avcodec_receive_frame(ctx, fr) == 0) {
        W = fr->width; H = fr->height;
        if (mvs_mode) dump_mvs(fr, N, fo);
        else write_frame_i420(fo, fr);
        N++;
    }
    fclose(fo);
    printf("%d %d %d\n", W, H, N);
    return 0;
}

static int do_encode(int argc, char **argv) {
    const char *inpath = argv[2];
    int W = atoi(argv[3]), H = atoi(argv[4]), qp = atoi(argv[5]);
    const char *outpath = argv[6];
    const char *cname = argc > 7 ? argv[7] : "libx264";
    int gop = argc > 8 ? atoi(argv[8]) : 1;
    const char *preset = argc > 9 ? argv[9] : "medium";
    const char *extra = argc > 10 ? argv[10] : "";
    const char *profile = argc > 11 ? argv[11] : "baseline";

    const AVCodec *codec = avcodec_find_encoder_by_name(cname);
    if (!codec) die("encoder not found");
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->width = W; ctx->height = H;
    ctx->time_base = (AVRational){1, 30};
    ctx->framerate = (AVRational){30, 1};
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->gop_size = gop;
    ctx->max_b_frames = 0;
    av_opt_set(ctx->priv_data, "preset", preset, 0);
    if (!strcmp(cname, "libx264")) {
        char params[256];
        /* CAVLC baseline-ish, no 8x8, deterministic */
        /* defaults are CAVLC baseline-ish; later keys in x264-params win, so
         * `extra` can override any of them (cabac=1, 8x8dct=1, bframes=N...) */
        snprintf(params, sizeof params,
                 "qp=%d:cabac=0:8x8dct=0:threads=1:scenecut=0:keyint=%d:"
                 "min-keyint=%d:bframes=0%s%s", qp, gop, gop,
                 extra[0] ? ":" : "", extra);
        av_opt_set(ctx->priv_data, "x264-params", params, 0);
        av_opt_set(ctx->priv_data, "profile", profile, 0);
    } else {
        char params[512];
        /* deterministic closed-GOP defaults; later keys in x265-params win,
         * so `extra` can override any of them (bframes=N, weightp=1, ...) */
        snprintf(params, sizeof params,
                 "qp=%d:keyint=%d:min-keyint=%d:bframes=0:"
                 "open-gop=0:scenecut=0%s%s", qp, gop, gop,
                 extra[0] ? ":" : "", extra);
        av_opt_set(ctx->priv_data, "x265-params", params, 0);
    }
    if (avcodec_open2(ctx, codec, NULL) < 0) die("open encoder");

    FILE *fi = fopen(inpath, "rb");
    if (!fi) die("cannot open yuv input");
    FILE *fo = fopen(outpath, "wb");
    AVFrame *fr = av_frame_alloc();
    fr->format = ctx->pix_fmt; fr->width = W; fr->height = H;
    av_frame_get_buffer(fr, 0);
    AVPacket *pkt = av_packet_alloc();
    size_t ysz = (size_t)W * H, csz = ysz / 4;
    int n = 0;
    for (;;) {
        av_frame_make_writable(fr);
        size_t got = 0;
        for (int y = 0; y < H; y++)
            got += fread(fr->data[0] + y * fr->linesize[0], 1, W, fi);
        for (int y = 0; y < H / 2; y++)
            got += fread(fr->data[1] + y * fr->linesize[1], 1, W / 2, fi);
        for (int y = 0; y < H / 2; y++)
            got += fread(fr->data[2] + y * fr->linesize[2], 1, W / 2, fi);
        if (got < ysz + 2 * csz) break;
        fr->pts = n++;
        if (avcodec_send_frame(ctx, fr) < 0) die("send_frame");
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            fwrite(pkt->data, 1, pkt->size, fo);
            av_packet_unref(pkt);
        }
    }
    avcodec_send_frame(ctx, NULL);
    while (avcodec_receive_packet(ctx, pkt) == 0) {
        fwrite(pkt->data, 1, pkt->size, fo);
        av_packet_unref(pkt);
    }
    fclose(fo); fclose(fi);
    printf("%d\n", n);
    return 0;
}

int main(int argc, char **argv) {
    av_log_set_level(AV_LOG_ERROR);
    if (argc >= 4 && !strcmp(argv[1], "decode")) return do_decode(argv[2], argv[3]);
    if (argc >= 4 && !strcmp(argv[1], "mvs")) { mvs_mode = 1; return do_decode(argv[2], argv[3]); }
    if (argc >= 7 && !strcmp(argv[1], "encode")) return do_encode(argc, argv);
    fprintf(stderr, "usage: oracle decode <in> <out.i420> | "
                    "oracle encode <in.i420> <W> <H> <qp> <out> [codec] [gop] [preset]\n");
    return 2;
}
