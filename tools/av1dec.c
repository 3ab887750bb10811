/* Conformance oracle: decode an AV1 stream (IVF/OBU) with the system
 * libavcodec (dav1d / libaom-av1) and write raw planar YUV to stdout or file.
 *
 * This plays the role the reference's e2e tests give to libaom
 * (test/e2e_test/RefDecoder.cc:329): an independent decoder must reproduce
 * the encoder's reconstruction bit-exactly.
 *
 * Build: gcc -O2 -o av1dec av1dec.c -lavformat -lavcodec -lavutil
 * Usage: av1dec input.ivf output.yuv [decoder_name]
 */

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <stdio.h>
#include <stdlib.h>
#include <libavutil/log.h>

static int write_frame(AVFrame *fr, FILE *out) {
    int depth_bytes = fr->format == AV_PIX_FMT_YUV420P10LE ||
                      fr->format == AV_PIX_FMT_YUV422P10LE ||
                      fr->format == AV_PIX_FMT_YUV444P10LE ? 2 : 1;
    for (int p = 0; p < 3; p++) {
        int w = p ? (fr->width + 1) / 2 : fr->width;
        int h = p ? (fr->height + 1) / 2 : fr->height;
        if (fr->format == AV_PIX_FMT_YUV444P || fr->format == AV_PIX_FMT_YUV444P10LE) {
            w = fr->width; h = fr->height;
        }
        for (int y = 0; y < h; y++)
            fwrite(fr->data[p] + (size_t)y * fr->linesize[p], depth_bytes, w, out);
    }
    return 0;
}

int main_real(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s in.ivf out.yuv [decoder]\n", argv[0]);
        return 2;
    }
    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, argv[1], NULL, NULL) < 0) {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 1;
    }
    if (avformat_find_stream_info(fmt, NULL) < 0) return 1;
    int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vs < 0) { fprintf(stderr, "no video stream\n"); return 1; }

    const AVCodec *codec = argc > 3 ? avcodec_find_decoder_by_name(argv[3])
                                    : avcodec_find_decoder_by_name("libdav1d");
    if (!codec) codec = avcodec_find_decoder(AV_CODEC_ID_AV1);
    if (!codec) { fprintf(stderr, "no av1 decoder\n"); return 1; }
    fprintf(stderr, "decoder: %s\n", codec->name);

    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, fmt->streams[vs]->codecpar);
    if (avcodec_open2(ctx, codec, NULL) < 0) {
        fprintf(stderr, "cannot open decoder\n");
        return 1;
    }

    FILE *out = fopen(argv[2], "wb");
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    int nframes = 0, err = 0;
    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index != vs) { av_packet_unref(pkt); continue; }
        int r = avcodec_send_packet(ctx, pkt);
        if (r < 0) { fprintf(stderr, "send_packet err %d at frame %d\n", r, nframes); err = 1; break; }
        while ((r = avcodec_receive_frame(ctx, fr)) >= 0) {
            write_frame(fr, out);
            nframes++;
        }
        av_packet_unref(pkt);
    }
    if (!err) {
        avcodec_send_packet(ctx, NULL);
        while (avcodec_receive_frame(ctx, fr) >= 0) { write_frame(fr, out); nframes++; }
    }
    fprintf(stderr, "decoded %d frames %dx%d fmt %d\n", nframes, ctx->width,
            ctx->height, ctx->pix_fmt);
    fclose(out);
    printf("%d\n", nframes);
    return err;
}

int main(int argc, char **argv) {
    if (getenv("AV1DEC_DEBUG")) av_log_set_level(AV_LOG_DEBUG);
    return main_real(argc, argv);
}
