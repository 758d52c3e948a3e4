// streammind-tpu native video ingest.
//
// Replaces the reference's decord (C++ video decoder wheel) + PIL/CLIP
// preprocessing hot path (reference mm_utils.py:377-460, eval stream loops):
// demux/decode via libavformat/libavcodec, letterbox-to-square with the CLIP
// mean fill, bilinear resize via libswscale, and CLIP mean/std normalize —
// one pass from container bytes to model-ready (3, S, S) fp32 tensors.
//
// C ABI only (consumed through ctypes; no pybind11 in the image).
//
// Build: make -C native  (g++ -O3 -shared -fPIC, links av{format,codec,util} + swscale)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  int sws_w = 0, sws_h = 0;  // output geometry the cached context was built for
  int sws_src_w = 0, sws_src_h = 0;  // SOURCE geometry (streams can change
                                     // resolution mid-file; scaling a frame
                                     // with the container dims would overread)
  int stream_idx = -1;
  int64_t next_frame = 0;  // next frame number the decoder will emit
  bool eof_sent = false;   // drain packet already sent to the decoder
  double fps = 0.0;
  int64_t nframes = 0;
  int width = 0, height = 0;
  std::string error;
};

// RGB24 buffer (H, W, 3) → normalized CHW float32 into out.
void normalize_chw(const uint8_t* rgb, int size, float* out) {
  const int hw = size * size;
  for (int c = 0; c < 3; ++c) {
    const float inv = 1.0f / (255.0f * kClipStd[c]);
    const float sub = kClipMean[c] / kClipStd[c];
    float* dst = out + c * hw;
    const uint8_t* src = rgb + c;
    for (int i = 0; i < hw; ++i) {
      dst[i] = static_cast<float>(src[i * 3]) * inv - sub;
    }
  }
}

}  // namespace

extern "C" {

void* sm_open(const char* path) {
  auto* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  r->stream_idx = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (r->stream_idx < 0 || codec == nullptr) {
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_idx];
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = 1;
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  r->width = r->dec->width;
  r->height = r->dec->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  r->fps = fr.den ? av_q2d(fr) : 25.0;
  r->nframes = st->nb_frames;
  if (r->nframes <= 0 && st->duration > 0) {
    r->nframes = static_cast<int64_t>(st->duration * av_q2d(st->time_base) * r->fps);
  }
  if (r->nframes <= 0 && r->fmt->duration > 0) {
    // matroska streams often lack both nb_frames and stream duration;
    // fall back to the container duration (AV_TIME_BASE units)
    r->nframes = static_cast<int64_t>(
        static_cast<double>(r->fmt->duration) / AV_TIME_BASE * r->fps);
  }
  return r;
}

int sm_info(void* h, double* fps, long long* nframes, int* w, int* ht) {
  auto* r = static_cast<Reader*>(h);
  if (!r) return -1;
  *fps = r->fps;
  *nframes = r->nframes;
  *w = r->width;
  *ht = r->height;
  return 0;
}

void sm_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (!r) return;
  if (r->sws) sws_freeContext(r->sws);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// Decode forward; for each decoded frame whose index is in `indices`
// (ascending), letterbox+resize to `size`, normalize, write CHW fp32.
// pad_square: 1 → CLIP-mean letterbox (the 'pad' aspect mode); 0 → stretch.
// Returns number of frames written, or -1 on error.
int sm_read_frames(void* h, const long long* indices, int n, int size,
                   int pad_square, float* out) {
  auto* r = static_cast<Reader*>(h);
  if (!r || n <= 0) return -1;

  // Seek back to start if the first requested frame precedes the cursor or
  // a previous call drained the decoder (EOF).  Sequential forward reads on
  // one handle otherwise continue exactly where the last call stopped —
  // the decoder's in-flight frames are preserved (no flush between calls).
  if (indices[0] < r->next_frame || r->eof_sent) {
    av_seek_frame(r->fmt, r->stream_idx, 0, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(r->dec);
    r->next_frame = 0;
    r->eof_sent = false;
  }

  // Letterbox geometry.
  int dst_w = size, dst_h = size, off_x = 0, off_y = 0;
  if (pad_square && r->width != r->height) {
    if (r->width > r->height) {
      dst_h = static_cast<int>(std::lround(static_cast<double>(size) * r->height / r->width));
      off_y = (size - dst_h) / 2;
    } else {
      dst_w = static_cast<int>(std::lround(static_cast<double>(size) * r->width / r->height));
      off_x = (size - dst_w) / 2;
    }
  }
  if (!r->sws || r->sws_w != dst_w || r->sws_h != dst_h) {
    // geometry changed between calls (different size/pad_square): a stale
    // context would scale to the old row stride and corrupt the buffer
    if (r->sws) sws_freeContext(r->sws);
    r->sws = sws_getContext(r->width, r->height, r->dec->pix_fmt,
                            dst_w, dst_h, AV_PIX_FMT_RGB24,
                            SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!r->sws) return -1;
    r->sws_w = dst_w;
    r->sws_h = dst_h;
    r->sws_src_w = r->width;
    r->sws_src_h = r->height;
  }

  std::vector<uint8_t> canvas(static_cast<size_t>(size) * size * 3);
  uint8_t mean_fill[3];
  for (int c = 0; c < 3; ++c) {
    mean_fill[c] = static_cast<uint8_t>(std::lround(kClipMean[c] * 255.0f));
  }
  std::vector<uint8_t> scaled(static_cast<size_t>(dst_w) * dst_h * 3);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int written = 0;
  int want = 0;  // index into `indices`
  const int hw3 = size * size * 3;
  (void)hw3;

  auto emit = [&](AVFrame* f, int64_t idx) {
    if (f->width != r->sws_src_w || f->height != r->sws_src_h) {
      // mid-stream resolution change (DVB captures, some mkv): rebuild the
      // scaler for the FRAME's dims — scaling with the container header's
      // dims would read past the frame's planes
      SwsContext* ns = sws_getContext(f->width, f->height,
                                      static_cast<AVPixelFormat>(f->format),
                                      dst_w, dst_h, AV_PIX_FMT_RGB24,
                                      SWS_BILINEAR, nullptr, nullptr, nullptr);
      if (!ns) return;  // skip unscalable frame rather than corrupt memory
      sws_freeContext(r->sws);
      r->sws = ns;
      r->sws_src_w = f->width;
      r->sws_src_h = f->height;
    }
    uint8_t* dst_data[1] = {scaled.data()};
    int dst_linesize[1] = {dst_w * 3};
    sws_scale(r->sws, f->data, f->linesize, 0, f->height, dst_data, dst_linesize);
    // paint canvas with mean fill then blit
    for (size_t i = 0; i < canvas.size(); i += 3) {
      canvas[i] = mean_fill[0];
      canvas[i + 1] = mean_fill[1];
      canvas[i + 2] = mean_fill[2];
    }
    for (int y = 0; y < dst_h; ++y) {
      std::memcpy(canvas.data() + ((off_y + y) * size + off_x) * 3,
                  scaled.data() + y * dst_w * 3,
                  static_cast<size_t>(dst_w) * 3);
    }
    // duplicate requested indices each get their own copy
    while (want < n && indices[want] == idx) {
      normalize_chw(canvas.data(), size,
                    out + static_cast<size_t>(written) * 3 * size * size);
      ++written;
      ++want;
    }
  };

  // First, consume any frames still buffered from the previous call's
  // packets (sequential chunked reads share one decode stream).
  while (want < n && avcodec_receive_frame(r->dec, frame) == 0) {
    const int64_t idx = r->next_frame++;
    if (idx == indices[want]) emit(frame, idx);
    av_frame_unref(frame);
  }

  while (want < n && !r->eof_sent && av_read_frame(r->fmt, pkt) >= 0) {
    if (pkt->stream_index != r->stream_idx) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(r->dec, pkt) == 0) {
      while (avcodec_receive_frame(r->dec, frame) == 0) {
        const int64_t idx = r->next_frame++;
        if (want < n && idx == indices[want]) emit(frame, idx);
        av_frame_unref(frame);
      }
    }
    av_packet_unref(pkt);
  }
  if (want < n && !r->eof_sent) {
    // true end of container: drain once; the next read() seeks to 0
    avcodec_send_packet(r->dec, nullptr);
    r->eof_sent = true;
    while (avcodec_receive_frame(r->dec, frame) == 0) {
      const int64_t idx = r->next_frame++;
      if (want < n && idx == indices[want]) emit(frame, idx);
      av_frame_unref(frame);
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return written;
}

// ---------------------------------------------------------------------------
// Test-asset writer: deterministic gradient video (mpeg4), used by the test
// suite so correctness is checkable without shipping binary fixtures.
// ---------------------------------------------------------------------------
int sm_write_test_video(const char* path, int w, int h, int n_frames, int fps) {
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) return -1;
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0) return -2;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->time_base = {1, fps};
  enc->framerate = {fps, 1};
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  enc->bit_rate = 2000000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  }
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame* frame = av_frame_alloc();
  frame->format = enc->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto flush = [&](AVFrame* f) {
    avcodec_send_frame(enc, f);
    while (avcodec_receive_packet(enc, pkt) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < n_frames; ++i) {
    av_frame_make_writable(frame);
    // luma gradient that shifts per frame; flat chroma
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        frame->data[0][y * frame->linesize[0] + x] =
            static_cast<uint8_t>((x + y + i * 16) & 0xFF);
    for (int y = 0; y < h / 2; ++y) {
      std::memset(frame->data[1] + y * frame->linesize[1], 128, w / 2);
      std::memset(frame->data[2] + y * frame->linesize[2], 128, w / 2);
    }
    frame->pts = i;
    flush(frame);
  }
  flush(nullptr);
  av_write_trailer(fmt);

  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&enc);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
