// pawsio — native host-side video I/O for pawsometracker_tpu.
//
// TPU-host-native equivalent of the reference's decode/encode stack (an
// out-of-process `ffmpeg -ss .. -t .. -vf fps=..` pipe decoded by libav to
// GRAY8, reference: src/PawsomeTracker.jl:155-157, and a libav encoder for the
// diagnostic stream, reference: src/diagnose.jl:18,37,40). Implemented
// directly against libavformat/libavcodec/libswscale:
//
//   - demux -> decode -> swscale to GRAY8 (no BGR round trip)
//   - accurate seek: container seek to the keyframe before `start`, then
//     decode-and-discard up to `start`
//   - fps resampling with ffmpeg's fps-filter semantics (round=near: each
//     input frame claims output slot round(t*fps); a frame whose successor
//     claims the same slot is dropped; gaps are filled by duplicating the
//     earlier frame; the final frame is emitted once at EOF)
//   - optional background decode thread with a bounded frame ring so host
//     decode overlaps TPU compute
//   - GRAY8 -> yuv420p -> H.264 (libx264, fallback mpeg4) encoder
//
// C ABI only; Python binds via ctypes (no pybind11 dependency).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <set>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

// silence libav chatter to fatal only, like the reference's `-loglevel 8`
// (reference: src/PawsomeTracker.jl:155)
struct LogSilencer {
  LogSilencer() { av_log_set_level(AV_LOG_FATAL); }
} g_log_silencer;

thread_local std::string g_last_error;

void set_error(const std::string &msg) { g_last_error = msg; }

void set_averror(const std::string &ctx, int err) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(err, buf, sizeof(buf));
  g_last_error = ctx + ": " + buf;
}

struct Decoder {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *dec = nullptr;
  SwsContext *sws = nullptr;
  AVFrame *frame = nullptr;
  AVPacket *pkt = nullptr;
  int stream_idx = -1;
  int width = 0, height = 0;
  double start = 0, duration = 0, fps = 24, native_fps = 24;
  double tb = 0;           // stream time base in seconds
  AVRational tb_q = {0, 1};   // stream time base (exact)
  AVRational out_tb = {0, 1}; // 1/fps (exact rational)
  int64_t start_pts = 0;      // `start` in stream time-base ticks
  // first output slot to emit (multi-segment parallel decode): slot math
  // stays on the GLOBAL grid anchored at `start` — a worker opened at
  // slot0 = a reproduces the single decoder's slots a.. bit-exactly (same
  // integer grid, no per-worker rounding of the start time)
  int64_t slot0 = 0;
  // explicit keep-threshold (seconds past `start`) for hinted keyframe-aligned
  // entries: the target keyframe may claim slot0 from slightly more than half
  // an input interval early, so the generic slot0-derived discard rule could
  // drop it; the planner knows the exact keyframe time and passes it.
  double keep_from = -1e30;
  bool demux_eof = false;
  bool force_sws = false;  // PAWSIO_EXACT_GRAY=1: always use swscale

  // fps resampler state — holds REFS to decoded frames (av_frame_ref of the
  // codec's refcounted DPB buffers: no pixel copies move through the
  // resampler at all). Gray conversion happens at the emission sink: the
  // sync read paths convert directly into the caller's buffer, the prefetch
  // ring stores the frame ref itself and crops read the luma sub-rect
  // straight from the decoder's buffer (see RingSlot / to_gray).
  AVFrame *pending_f = nullptr, *prev_f = nullptr;
  std::vector<uint8_t> roi_scratch;
  int pending_slot = 0;
  bool has_pending = false, has_prev = false, flushed = false;
  int emit_slot = 0;
  // shifted pts (ticks past `start`) of the input frames in pending/prev and
  // of the most recently EMITTED output — the parallel-decode span chain
  // verifies boundary alignment by holder pts (valid for synchronous,
  // ring-less reads; the prefetch thread runs ahead of the consumer)
  int64_t pending_pts = INT64_MIN, prev_pts = INT64_MIN, last_emit_pts = INT64_MIN;
  // global output slot of the most recent emitted frame. Streams whose first
  // kept input claims a slot > slot0 SKIP the leading slots (ffmpeg
  // semantics); the parallel-decode planner probes this to detect delivery-
  // index-vs-slot misalignment (leading VFR gap) and fall back.
  int64_t last_emit_slot = INT64_MIN;

  // background prefetch: fixed ring of in-place slots (no per-frame allocs).
  // Slots [head, head+read) are RETAINED (read but not yet released — the
  // speculative ROI pipeline may recrop them on a mispredict replay); slots
  // [head+read, head+count) are decoded-but-unread. The producer blocks while
  // count == depth, so retention backpressures decode.
  std::thread th;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  // per-slot retained frames: the common formats keep an AVFrame REF (the
  // luma plane IS the gray image — crops read it in place, zero full-frame
  // copies between decode and the retained crop reads); formats that need
  // swscale (force_sws / exotic pix fmts) convert once into the slot's gray
  // vector at insert time, exactly the old behavior
  struct RingSlot {
    AVFrame *fr = nullptr;
    std::vector<uint8_t> gray;
    bool is_frame = false;
  };
  std::vector<RingSlot> ring_slots;
  size_t ring_depth = 0, ring_head = 0, ring_count = 0, ring_read = 0;
  std::atomic<bool> stop_thread{false};
  bool thread_eof = false;
  // a mid-stream decode failure on the prefetch thread must surface as an
  // ERROR to consumers, not as a clean (silently truncating) EOF; the
  // message is captured here because g_last_error is thread_local to the
  // dying prefetch thread
  int thread_err = 0;
  std::string thread_err_msg;

  // ---- fps-downsampling packet skip (exact) ----------------------------
  // When the output fps is below the native rate, the fps filter DROPS the
  // input frames whose output slot is also claimed by their display
  // successor. A dropped frame that is additionally a NON-REFERENCE frame
  // (every VCL NAL has nal_ref_idc == 0) contributes nothing to decoder
  // state, so its packet need not be decoded at all. Exactness guards:
  //   - CFR verified per packet (constant pkt->duration, pts on the grid);
  //   - the display successor (pts + dur) must have been OBSERVED in the
  //     demux stream before the skip decision (reorder-safe via a small
  //     seen-pts set) — a frame whose successor is absent is a HOLDER and
  //     is always sent;
  //   - H.264 AVCC only (mp4/mov); anything irregular disables skipping,
  //     falling back to full decode (bit-exact either way — skipped frames
  //     are exactly those the resampler provably never emits).
  // Kill switch: PAWSIO_NO_SKIP_DROPPED=1.
  bool skip_enabled = false;
  bool skip_cfr_ok = true;
  int skip_nal_len = 0;           // AVCC NAL length-prefix size
  int64_t skip_dur = 0;           // verified constant packet duration (ticks)
  int64_t skip_max_pts = INT64_MIN;
  bool demuxer_done = false;      // av_read_frame returned EOF
  std::deque<AVPacket *> pkt_q;   // reorder-window holding queue
  std::set<int64_t> seen_pts;     // pts observed, pruned as fronts release
  long long skipped_pkts = 0;

  // True when every VCL NAL in the packet has nal_ref_idc == 0 (AVCC).
  bool pkt_is_nonref(const AVPacket *p) const {
    const uint8_t *dta = p->data;
    int sz = p->size, L = skip_nal_len, i = 0;
    bool saw_vcl = false;
    while (i + L <= sz) {
      uint32_t n = 0;
      for (int k = 0; k < L; k++) n = (n << 8) | dta[i + k];
      i += L;
      if (n == 0 || i + (int64_t)n > sz) return false;  // malformed: send it
      uint8_t h = dta[i];
      int type = h & 0x1F, ref = (h >> 5) & 3;
      if (type >= 1 && type <= 5) {
        if (ref) return false;
        saw_vcl = true;
      }
      i += n;
    }
    return saw_vcl;
  }

  size_t frame_bytes() const { return (size_t)width * height; }

  ~Decoder() {
    if (th.joinable()) {
      stop_thread = true;
      cv_pop.notify_all();
      cv_push.notify_all();
      th.join();
    }
    // AFTER the join: the prefetch thread touches pkt_q in feed_with_skip
    for (AVPacket *p : pkt_q) av_packet_free(&p);
    if (sws) sws_freeContext(sws);
    if (frame) av_frame_free(&frame);
    if (pending_f) av_frame_free(&pending_f);
    if (prev_f) av_frame_free(&prev_f);
    for (auto &s : ring_slots)
      if (s.fr) av_frame_free(&s.fr);
    if (pkt) av_packet_free(&pkt);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  // Output slot of a frame at `pts_shifted` stream ticks past `start`, using
  // exact rational arithmetic like ffmpeg's fps filter (round=near: half away
  // from zero).
  int slot_of(int64_t pts_shifted) const {
    return (int)av_rescale_q_rnd(
        pts_shifted, tb_q, out_tb,
        (AVRounding)(AV_ROUND_NEAR_INF | AV_ROUND_PASS_MINMAX));
  }

  // True when `f`'s luma plane IS the gray image (up to an affine range map
  // for limited-range YUV, which the zero-sum DoG filter is invariant to —
  // positions are unchanged vs the swscale path; PAWSIO_EXACT_GRAY=1 forces
  // swscale range expansion everywhere).
  bool fast_gray(const AVFrame *f) const {
    if (force_sws) return false;
    AVPixelFormat pf = (AVPixelFormat)f->format;
    return pf == AV_PIX_FMT_GRAY8 || pf == AV_PIX_FMT_YUV420P ||
           pf == AV_PIX_FMT_YUVJ420P || pf == AV_PIX_FMT_NV12 ||
           pf == AV_PIX_FMT_YUV422P || pf == AV_PIX_FMT_YUV444P;
  }

  // Full-frame gray conversion of a decoded frame into `out` (luma row copy
  // on the fast path, swscale otherwise).
  void to_gray(const AVFrame *f, uint8_t *out) {
    if (fast_gray(f)) {
      for (int r = 0; r < height; r++)
        std::memcpy(out + (size_t)r * width,
                    f->data[0] + (size_t)r * f->linesize[0], width);
    } else {
      uint8_t *dst[1] = {out};
      int dst_stride[1] = {width};
      sws_scale(sws, f->data, f->linesize, 0, height, dst, dst_stride);
    }
  }

  // Next decoded frame (left in `this->frame`, valid until the next call)
  // with shifted time t' = t - start. No pixel copies — the resampler refs
  // the frame; gray conversion happens at the emission sink.
  // Returns 1 ok, 0 eof, <0 error.
  int next_input_frame(double *tprime, int64_t *pts_shifted) {
    while (true) {
      int ret = avcodec_receive_frame(dec, frame);
      if (ret == 0) {
        int64_t pts = frame->best_effort_timestamp;
        if (pts == AV_NOPTS_VALUE) pts = frame->pts;
        double t = (pts == AV_NOPTS_VALUE) ? 0.0 : pts * tb;
        double tp = t - start;
        // NB: no av_frame_make_writable anywhere — frames are only READ
        // (luma copy / sws_scale / in-place crops); making one writable
        // forced a full-frame copy out of the decoder's refcounted DPB pool
        // for nearly every h264 frame (~3 MB at 1080p) in the hot loop
        double keep_thresh =
            keep_from > -1e29 ? keep_from : slot0 / fps - 0.5 / native_fps;
        if (tp < keep_thresh) {
          av_frame_unref(frame);
          continue;  // pre-window: decode-and-discard (accurate -ss)
        }
        if (tp >= duration) {
          av_frame_unref(frame);
          return 0;
        }
        if (getenv("PAWSIO_DEBUG"))
          fprintf(stderr, "[pawsio] pts=%lld tb=%.9f t=%.9f tp=%.9f\n", (long long)pts, tb, t, tp);
        *tprime = tp;
        *pts_shifted = (pts == AV_NOPTS_VALUE) ? 0 : pts - start_pts;
        return 1;
      }
      if (ret == AVERROR_EOF) return 0;
      if (ret != AVERROR(EAGAIN)) {
        set_averror("receive_frame", ret);
        return -1;
      }
      if (demux_eof) return 0;
      // feed more packets
      if (!skip_enabled) {
        while (true) {
          ret = av_read_frame(fmt, pkt);
          if (ret < 0) {
            demux_eof = true;
            avcodec_send_packet(dec, nullptr);  // flush
            break;
          }
          if (pkt->stream_index != stream_idx) {
            av_packet_unref(pkt);
            continue;
          }
          ret = avcodec_send_packet(dec, pkt);
          av_packet_unref(pkt);
          if (ret < 0 && ret != AVERROR(EAGAIN)) {
            set_averror("send_packet", ret);
            return -1;
          }
          break;
        }
      } else if (feed_with_skip() < 0) {
        return -1;
      }
    }
  }

  // Skip-path packet feed: hold packets in a reorder queue until the front
  // is decidable, skip drop-fated nonref packets, send everything else.
  // Returns 0 after feeding one packet / skipping some / reaching EOF
  // (decoder flushed); <0 on error.
  int feed_with_skip() {
    while (true) {
      if (!pkt_q.empty()) {
        AVPacket *front = pkt_q.front();
        bool meta_ok = skip_cfr_ok && skip_dur > 0 &&
                       front->pts != AV_NOPTS_VALUE;
        bool succ_seen = meta_ok && seen_pts.count(front->pts + skip_dur) > 0;
        // decidable once the successor is seen, provably absent (demux ran
        // ~2 reorder windows past it), at demux EOF, or when skipping is off
        bool decidable = !meta_ok || succ_seen || demuxer_done ||
                         skip_max_pts >= front->pts + 33 * skip_dur ||
                         pkt_q.size() > 48;
        if (decidable) {
          pkt_q.pop_front();
          bool skip = false;
          if (meta_ok && succ_seen) {
            int64_t ps = front->pts - start_pts;
            if (slot_of(ps) == slot_of(ps + skip_dur) && pkt_is_nonref(front))
              skip = true;
          }
          if (meta_ok) {
            // prune seen-pts entries no future front can reference
            int64_t low = front->pts - 64 * skip_dur;
            seen_pts.erase(seen_pts.begin(), seen_pts.lower_bound(low));
          }
          if (skip) {
            skipped_pkts++;
            av_packet_free(&front);
            continue;  // nothing fed yet — decide the next front / read more
          }
          int ret = avcodec_send_packet(dec, front);
          av_packet_free(&front);
          if (ret < 0 && ret != AVERROR(EAGAIN)) {
            set_averror("send_packet", ret);
            return -1;
          }
          return 0;  // decoder has a new packet
        }
      }
      if (demuxer_done) {
        // queue drained (fronts are always decidable at demux EOF)
        demux_eof = true;
        avcodec_send_packet(dec, nullptr);  // flush
        return 0;
      }
      int ret = av_read_frame(fmt, pkt);
      if (ret < 0) {
        demuxer_done = true;
        continue;
      }
      if (pkt->stream_index != stream_idx) {
        av_packet_unref(pkt);
        continue;
      }
      if (pkt->pts == AV_NOPTS_VALUE || pkt->duration <= 0) {
        skip_cfr_ok = false;  // grid unverifiable: stop skipping, keep going
      } else {
        if (skip_dur == 0) skip_dur = pkt->duration;
        else if (pkt->duration != skip_dur) skip_cfr_ok = false;
        if (skip_cfr_ok) {
          seen_pts.insert(pkt->pts);
          if (pkt->pts > skip_max_pts) skip_max_pts = pkt->pts;
        }
      }
      AVPacket *cp = av_packet_alloc();
      av_packet_move_ref(cp, pkt);
      pkt_q.push_back(cp);
    }
  }

  // Take a ref of the current input frame into `dst_f` (replacing whatever
  // ref it held). Allocation happens once; refs are O(1).
  int ref_into(AVFrame *&dst_f, const AVFrame *src) {
    if (!dst_f) dst_f = av_frame_alloc();
    if (!dst_f) {
      set_error("av_frame_alloc failed");
      return -1;
    }
    av_frame_unref(dst_f);
    int ret = av_frame_ref(dst_f, src);
    if (ret < 0) {
      set_averror("frame_ref", ret);
      return -1;
    }
    return 0;
  }

  // One fps-resampled frame: `*out` borrows the emitted frame (valid until
  // the next resampler call — sinks must consume or ref it immediately).
  // The slot math is byte-identical to the old buffer-swapping resampler
  // (pinned by the resampler property tests and span-parity verification);
  // only the pixel carrier changed from gray vectors to frame refs, which
  // makes gap DUPLICATES free (another ref) instead of a 2 MB copy each.
  // Returns 1 ok, 0 eof, <0 error.
  int read_resampled_frame(AVFrame **out) {
    while (true) {
      if (has_pending && emit_slot < pending_slot) {
        // duplicate the earlier frame into the gap
        emit_slot++;
        if ((emit_slot - 1) / fps >= duration) return 0;
        *out = has_prev ? prev_f : pending_f;
        last_emit_pts = has_prev ? prev_pts : pending_pts;
        last_emit_slot = emit_slot - 1;
        return 1;
      }
      double tp = 0;
      int64_t ptss = 0;
      int ret = next_input_frame(&tp, &ptss);
      if (ret < 0) return ret;
      if (ret == 0) {
        if (has_pending && !flushed) {
          flushed = true;
          emit_slot = std::max(emit_slot, pending_slot) + 1;
          if ((emit_slot - 1) / fps >= duration) return 0;
          *out = pending_f;  // final frame
          last_emit_pts = pending_pts;
          last_emit_slot = emit_slot - 1;
          return 1;
        }
        return 0;
      }
      int slot = slot_of(ptss);
      if (!has_pending) {
        if (ref_into(pending_f, frame) < 0) return -1;
        pending_pts = ptss;
        pending_slot = std::max(slot, (int)slot0);
        emit_slot = pending_slot;
        has_pending = true;
        has_prev = false;
        continue;
      }
      if (slot <= pending_slot) {
        // zero output slots for the pending frame: the newer one takes over
        if (ref_into(pending_f, frame) < 0) return -1;
        pending_pts = ptss;
        continue;
      }
      // pending frame covers [pending_slot, slot): emit it now, duplicates
      // (if any) flow from the top of the loop via `prev`
      std::swap(prev_f, pending_f);
      prev_pts = pending_pts;
      has_prev = true;
      if (ref_into(pending_f, frame) < 0) return -1;
      pending_pts = ptss;
      int old_slot = pending_slot;
      pending_slot = slot;
      if (emit_slot == old_slot) {
        emit_slot++;
        if ((emit_slot - 1) / fps >= duration) return 0;
        *out = prev_f;
        last_emit_pts = prev_pts;
        last_emit_slot = emit_slot - 1;
        return 1;
      }
    }
  }

  int read_resampled(uint8_t *dst) {
    AVFrame *f = nullptr;
    int ret = read_resampled_frame(&f);
    if (ret != 1) return ret;
    to_gray(f, dst);
    return 1;
  }

  void prefetch_loop() {
    while (!stop_thread) {
      size_t slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_push.wait(lk, [&] { return ring_count < ring_depth || stop_thread; });
        if (stop_thread) return;
        slot = (ring_head + ring_count) % ring_depth;
      }
      // stash the next resampled frame in the free ring slot: a frame REF
      // on the fast-gray path (zero copies — crops read the luma in place),
      // one gray conversion for swscale formats (the old behavior)
      AVFrame *f = nullptr;
      int ret = read_resampled_frame(&f);
      if (ret == 1) {
        RingSlot &s = ring_slots[slot];  // reserved: producer-exclusive
        if (fast_gray(f)) {
          if (ref_into(s.fr, f) < 0) {
            ret = -1;
          } else {
            s.is_frame = true;
          }
        } else {
          if (s.gray.size() != frame_bytes()) s.gray.resize(frame_bytes());
          to_gray(f, s.gray.data());
          s.is_frame = false;
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      if (ret != 1) {
        if (ret < 0) {  // decode error, not clean EOF
          thread_err = ret;
          thread_err_msg = g_last_error;
        }
        thread_eof = true;
        cv_pop.notify_all();
        return;
      }
      ring_count++;
      cv_pop.notify_all();
    }
  }
};

struct Encoder {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *enc = nullptr;
  AVStream *stream = nullptr;
  AVFrame *frame = nullptr;
  AVPacket *pkt = nullptr;
  int width = 0, height = 0;
  int64_t next_pts = 0;
  bool header_written = false;

  ~Encoder() {
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (enc) avcodec_free_context(&enc);
    if (fmt) {
      if (fmt->pb && !(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
      avformat_free_context(fmt);
    }
  }

  int drain() {
    while (true) {
      int ret = avcodec_receive_packet(enc, pkt);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
      if (ret < 0) {
        set_averror("receive_packet", ret);
        return -1;
      }
      av_packet_rescale_ts(pkt, enc->time_base, stream->time_base);
      pkt->stream_index = stream->index;
      ret = av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
      if (ret < 0) {
        set_averror("write_frame", ret);
        return -1;
      }
    }
  }
};

}  // namespace

extern "C" {

struct PawsInfo {
  int32_t width;
  int32_t height;
  double fps;
  int32_t sar_num;
  int32_t sar_den;
  int64_t nframes;
};

const char *pawsio_last_error() { return g_last_error.c_str(); }

// fast-decode override: -1 = follow the PAWSIO_FAST_DECODE env var (default),
// 0/1 = explicit API request. The Python `fast_decode` kwarg sets this around
// each open under a lock instead of mutating the process environment (getenv
// during a concurrent setenv is undefined behavior; an atomic int is not).
std::atomic<int> g_fast_decode{-1};

void pawsio_set_fast_decode(int v) { g_fast_decode.store(v < 0 ? -1 : (v ? 1 : 0)); }

int pawsio_probe(const char *path, PawsInfo *info) {
  AVFormatContext *fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) {
    set_averror("open_input", ret);
    return -1;
  }
  ret = avformat_find_stream_info(fmt, nullptr);
  if (ret < 0) {
    set_averror("find_stream_info", ret);
    avformat_close_input(&fmt);
    return -1;
  }
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (si < 0) {
    set_error("no video stream");
    avformat_close_input(&fmt);
    return -1;
  }
  AVStream *st = fmt->streams[si];
  info->width = st->codecpar->width;
  info->height = st->codecpar->height;
  AVRational fr = av_guess_frame_rate(fmt, st, nullptr);
  info->fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 24.0;
  AVRational sar = av_guess_sample_aspect_ratio(fmt, st, nullptr);
  if (sar.num <= 0 || sar.den <= 0) sar = {1, 1};
  info->sar_num = sar.num;
  info->sar_den = sar.den;
  info->nframes = st->nb_frames;
  if (info->nframes <= 0) {
    // containers without a per-stream frame count in the header (matroska/
    // webm commonly): estimate from duration * rate, matching what cv2's
    // CAP_PROP_FRAME_COUNT reports for the same files — callers (batch
    // progress estimation, duration clamps) treat the count as approximate
    int64_t dur = st->duration;  // stream timebase ticks
    if (dur > 0 && st->time_base.num > 0 && st->time_base.den > 0) {
      double secs = dur * av_q2d(st->time_base);
      info->nframes = (int64_t)(secs * info->fps + 0.5);
    } else if (fmt->duration > 0) {
      double secs = (double)fmt->duration / AV_TIME_BASE;
      info->nframes = (int64_t)(secs * info->fps + 0.5);
    }
  }
  avformat_close_input(&fmt);
  return 0;
}

// Demux-only keyframe index: presentation times (seconds) of key packets on
// the best video stream, no decode. Multi-segment parallel decode uses this
// to place span boundaries exactly at keyframes (zero decode-discard entry).
// Returns the number written to out_sec (at most cap), or <0 on error.
// Shifted pts (stream ticks past `start`) of the input frame behind the most
// recently emitted output — INT64_MIN before any emission. Meaningful for
// synchronous (ring-less) reads; parallel-decode span-chain verification.
long long pawsio_last_pts(void *h) {
  return (long long)static_cast<Decoder *>(h)->last_emit_pts;
}

// Packets never sent to the decoder by the fps-downsampling skip
// (observability: tests + bench A/B).
long long pawsio_skipped_packets(void *h) {
  return static_cast<Decoder *>(h)->skipped_pkts;
}

// Global output slot of the most recent emitted frame; INT64_MIN before any
// emission. Synchronous (ring-less) reads only.
long long pawsio_last_slot(void *h) {
  return (long long)static_cast<Decoder *>(h)->last_emit_slot;
}

long long pawsio_keyframes(const char *path, double *out_sec, long long cap) {
  AVFormatContext *fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) {
    set_averror("open_input", ret);
    return -1;
  }
  ret = avformat_find_stream_info(fmt, nullptr);
  if (ret < 0) {
    set_averror("find_stream_info", ret);
    avformat_close_input(&fmt);
    return -1;
  }
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (si < 0) {
    set_error("no video stream");
    avformat_close_input(&fmt);
    return -1;
  }
  AVStream *st = fmt->streams[si];
  double tb = av_q2d(st->time_base);
  long long n = 0;
#if LIBAVFORMAT_VERSION_INT >= AV_VERSION_INT(59, 0, 100)
  // fast path: the demuxer's own index (built at header open for mp4 et al)
  // — no packet reads. Index timestamps are typically DTS; the span planner
  // adds a decode-delay margin so boundaries stay safe with B-frames.
  int nidx = avformat_index_get_entries_count(st);
  for (int i = 0; i < nidx && n < cap; i++) {
    const AVIndexEntry *e = avformat_index_get_entry(st, i);
    if (e && (e->flags & AVINDEX_KEYFRAME) && e->timestamp != AV_NOPTS_VALUE)
      out_sec[n++] = e->timestamp * tb;
  }
  if (n >= 2) {
    avformat_close_input(&fmt);
    return n;
  }
  n = 0;  // absent/sparse index (e.g. mkv cues): packet walk below
#endif
  AVPacket *pkt = av_packet_alloc();
  while (n < cap && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == si && (pkt->flags & AV_PKT_FLAG_KEY)) {
      int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      if (pts != AV_NOPTS_VALUE) out_sec[n++] = pts * tb;
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  avformat_close_input(&fmt);
  return n;
}

// threads < 0: libav default (PAWSIO_THREADS env or auto-sized pool).
// threads >= 0: explicit codec thread count for THIS decoder — multi-segment
// parallel decode opens one decoder per worker and pins each to 1 thread so
// W workers use W cores instead of W oversubscribed frame-thread pools.
// slot0 > 0: emit output slots [slot0, ..) of the GLOBAL grid anchored at
// `start` (seek lands at the keyframe before start + slot0/fps) — the
// mid-stream entry point for multi-segment parallel decode, bit-exact with a
// slot0=0 decoder's slots slot0.. because the slot grid is shared.
// seek_hint >= 0: explicit demux seek target (seconds) — the keyframe-aligned
// span planner passes the exact keyframe time so BACKWARD seek cannot round
// down past it onto the previous keyframe. < 0: derive from slot0.
// fast_req: per-open fast-decode request (-1 = follow the process-global
// override / env var, 0 = force spec decode, 1 = force fast) — the
// pawsio_open3 entry point passes it explicitly so concurrent opens with
// different fast settings need no global state at all.
static void *open_impl(const char *path, double start, double stop, double fps,
                       long long slot0, int threads, double seek_hint, int fast_req,
                       PawsInfo *info) {
  auto d = new Decoder();
  d->start = start;
  d->duration = stop - start;
  d->fps = fps;
  d->slot0 = slot0;
  int ret = avformat_open_input(&d->fmt, path, nullptr, nullptr);
  if (ret < 0) {
    set_averror("open_input", ret);
    delete d;
    return nullptr;
  }
  if ((ret = avformat_find_stream_info(d->fmt, nullptr)) < 0) {
    set_averror("find_stream_info", ret);
    delete d;
    return nullptr;
  }
  const AVCodec *codec = nullptr;
  d->stream_idx = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (d->stream_idx < 0 || !codec) {
    set_error("no decodable video stream");
    delete d;
    return nullptr;
  }
  AVStream *st = d->fmt->streams[d->stream_idx];
  d->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(d->dec, st->codecpar);
  // frame+slice threading (libav parallel decode). thread_count=0 lets libav
  // size the pool to the host's cores; PAWSIO_THREADS overrides.
  if (threads >= 0) {
    d->dec->thread_count = threads;
  } else {
    const char *thr = getenv("PAWSIO_THREADS");
    d->dec->thread_count = thr ? atoi(thr) : 0;
  }
  d->dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  // fast decode: skip the h264 in-loop deblocking filter — ~10-30% faster on
  // decode-bound hosts at the cost of slightly different pixel values (NOT
  // bit-exact vs a spec decode; the zero-sum DoG argmax is robust to it, but
  // cross-backend parity tests must not set this). Request order: the
  // per-open fast_req (pawsio_open3), else the pawsio_set_fast_decode
  // override (older Python bindings), else the PAWSIO_FAST_DECODE env var.
  int fast = fast_req >= 0 ? fast_req : g_fast_decode.load();
  if (fast < 0) {
    const char *fastd = getenv("PAWSIO_FAST_DECODE");
    fast = (fastd && fastd[0] == '1') ? 1 : 0;
  }
  if (fast) {
    d->dec->skip_loop_filter = AVDISCARD_ALL;
    d->dec->flags2 |= AV_CODEC_FLAG2_FAST;
  }
  if ((ret = avcodec_open2(d->dec, codec, nullptr)) < 0) {
    set_averror("avcodec_open2", ret);
    delete d;
    return nullptr;
  }
  d->width = d->dec->width;
  d->height = d->dec->height;
  d->tb = av_q2d(st->time_base);
  d->tb_q = st->time_base;
  d->out_tb = av_inv_q(av_d2q(fps, 1001000));
  d->start_pts = d->tb > 0 ? (int64_t)llrint(start / d->tb) : 0;
  AVRational fr = av_guess_frame_rate(d->fmt, st, nullptr);
  d->native_fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 24.0;
  // fps-downsampling packet skip (see the Decoder member block): h264 AVCC
  // content tracked below its native rate never decodes the drop-fated
  // nonref frames at all. Bit-exact by construction; PAWSIO_NO_SKIP_DROPPED
  // disables for A/B measurement.
  {
    const AVCodecParameters *par = st->codecpar;
    const char *off = getenv("PAWSIO_NO_SKIP_DROPPED");
    if (!(off && off[0] == '1') && fps < d->native_fps - 1e-6 &&
        par->codec_id == AV_CODEC_ID_H264 && par->extradata_size >= 5 &&
        par->extradata[0] == 1) {
      d->skip_nal_len = (par->extradata[4] & 3) + 1;
      d->skip_enabled = true;
    }
  }
  // same-size pixel-format conversion only: SWS_POINT avoids filter setup
  d->sws = sws_getContext(d->width, d->height, d->dec->pix_fmt, d->width, d->height,
                          AV_PIX_FMT_GRAY8, SWS_POINT, nullptr, nullptr, nullptr);
  if (!d->sws) {
    set_error("sws_getContext failed");
    delete d;
    return nullptr;
  }
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();
  const char *eg = getenv("PAWSIO_EXACT_GRAY");
  d->force_sws = eg && eg[0] == '1';
  double seek_t = seek_hint >= 0 ? seek_hint : start + (slot0 > 0 ? slot0 / fps : 0.0);
  if (seek_hint >= 0) d->keep_from = seek_hint - start - 1e-6;
  bool exact_seek = seek_hint >= 0;
  if (seek_t > 0) {
    // hinted targets are keyframe pts round-tripped through doubles: truncate
    // and a 1-ulp-low value seeks one tick below the keyframe — BACKWARD then
    // lands a whole GOP early. llrint recovers the exact tick.
    int64_t ts = exact_seek ? (int64_t)llrint(seek_t / d->tb) : (int64_t)(seek_t / d->tb);
    if (av_seek_frame(d->fmt, d->stream_idx, ts, AVSEEK_FLAG_BACKWARD) < 0) {
      // fall back to decoding from the beginning (decode-and-discard)
      av_seek_frame(d->fmt, d->stream_idx, 0, AVSEEK_FLAG_BACKWARD);
    }
    avcodec_flush_buffers(d->dec);
  }
  if (info) {
    info->width = d->width;
    info->height = d->height;
    info->fps = d->native_fps;
    AVRational sar = av_guess_sample_aspect_ratio(d->fmt, st, nullptr);
    if (sar.num <= 0 || sar.den <= 0) sar = {1, 1};
    info->sar_num = sar.num;
    info->sar_den = sar.den;
    info->nframes = st->nb_frames;
  }
  return d;
}

void *pawsio_open(const char *path, double start, double stop, double fps, PawsInfo *info) {
  return open_impl(path, start, stop, fps, 0, -1, -1.0, -1, info);
}

void *pawsio_open2(const char *path, double start, double stop, double fps, int threads,
                   PawsInfo *info) {
  return open_impl(path, start, stop, fps, 0, threads, -1.0, -1, info);
}

void *pawsio_open_span(const char *path, double start, double stop, double fps,
                       long long slot0, int threads, PawsInfo *info) {
  return open_impl(path, start, stop, fps, slot0, threads, -1.0, -1, info);
}

void *pawsio_open_span2(const char *path, double start, double stop, double fps,
                        long long slot0, int threads, double seek_sec, PawsInfo *info) {
  return open_impl(path, start, stop, fps, slot0, threads, seek_sec, -1, info);
}

// superset entry point: every open option in one signature, including the
// per-open fast-decode request (-1 env / 0 spec / 1 fast). Preferred by the
// Python bindings when present — no process-global state, no open lock.
void *pawsio_open3(const char *path, double start, double stop, double fps,
                   long long slot0, int threads, double seek_sec, int fast,
                   PawsInfo *info) {
  return open_impl(path, start, stop, fps, slot0, threads, seek_sec, fast, info);
}

int pawsio_start_prefetch(void *h, int depth) {
  auto d = static_cast<Decoder *>(h);
  if (d->th.joinable()) return 0;
  d->ring_depth = depth > 0 ? depth : 8;
  // slots start empty: frame refs / gray vectors materialize on first use
  // (fast-gray streams never allocate the gray vectors at all)
  d->ring_slots.clear();
  d->ring_slots.resize(d->ring_depth);
  d->th = std::thread([d] { d->prefetch_loop(); });
  return 0;
}

// next_unread_slot error sentinel (SIZE_MAX alone means clean EOF)
static const size_t SLOT_ERR = SIZE_MAX - 1;

// Waits for the next UNREAD ring slot; returns its index, SIZE_MAX at EOF,
// or SLOT_ERR (g_last_error set) on decode error / ring misuse.
static size_t next_unread_slot(Decoder *d) {
  std::unique_lock<std::mutex> lk(d->mu);
  if (d->ring_read >= d->ring_depth) {
    // producer (ring full) and consumer (nothing unread) would block each
    // other forever — turn the documented misuse into an error, not a hang
    set_error("retained window fills the whole prefetch ring; release frames "
              "or open with a larger prefetch");
    return SLOT_ERR;
  }
  d->cv_pop.wait(lk, [&] {
    return d->ring_count > d->ring_read || d->thread_eof || d->stop_thread;
  });
  if (d->ring_count <= d->ring_read) {
    if (d->thread_err) {
      set_error(d->thread_err_msg);
      return SLOT_ERR;
    }
    return SIZE_MAX;
  }
  size_t slot = (d->ring_head + d->ring_read) % d->ring_depth;
  d->ring_read++;
  return slot;
}

// Frees the n oldest retained slots (the producer can refill them). Frame
// refs are dropped UNDER the lock, before the slots become visible as free:
// this returns the decoder's DPB buffers promptly (otherwise up to
// ring_depth stale refs would linger until refill, doubling pool memory),
// and the producer cannot touch a slot until it observes the index update.
static void release_slots(Decoder *d, size_t n) {
  {
    std::unique_lock<std::mutex> lk(d->mu);
    if (n > d->ring_read) n = d->ring_read;
    for (size_t j = 0; j < n; j++) {
      auto &s = d->ring_slots[(d->ring_head + j) % d->ring_depth];
      if (s.fr) av_frame_unref(s.fr);
      s.is_frame = false;
    }
    d->ring_head = (d->ring_head + n) % d->ring_depth;
    d->ring_count -= n;
    d->ring_read -= n;
  }
  d->cv_push.notify_all();
}

void pawsio_release(void *h, int n) {
  auto d = static_cast<Decoder *>(h);
  if (d->th.joinable() && n > 0) release_slots(d, (size_t)n);
}

// 1 = frame written, 0 = EOF, <0 = error
int pawsio_read(void *h, uint8_t *dst) {
  auto d = static_cast<Decoder *>(h);
  if (!d->th.joinable()) return d->read_resampled(dst);
  {
    // plain reads must not interleave with a live retained window: popping
    // the OLDEST slot would free a frame a replay may still recrop
    std::unique_lock<std::mutex> lk(d->mu);
    if (d->ring_read > 0) {
      set_error("pawsio_read while frames are retained; release them first");
      return -1;
    }
  }
  size_t slot = next_unread_slot(d);
  if (slot == SLOT_ERR) return -1;
  if (slot == SIZE_MAX) return 0;
  auto &s = d->ring_slots[slot];
  if (s.is_frame)
    d->to_gray(s.fr, dst);  // fast-gray path: one luma row copy
  else
    std::memcpy(dst, s.gray.data(), d->frame_bytes());
  release_slots(d, 1);
  return 1;
}

// Crop (ch x cw) at origin (orr, occ) — possibly out of frame — from a full
// gray image with row stride `stride` (a retained AVFrame's luma plane read
// IN PLACE, or a packed gray buffer), filling out-of-frame cells. Serves the
// ROI streaming path: the consumer never copies the full frame out of the
// decode ring.
static void crop_from(const uint8_t *src, int stride, int H, int W, uint8_t *dst,
                      int ch, int cw, int orr, int occ, uint8_t fill) {
  for (int r = 0; r < ch; r++) {
    int fr = orr + r;
    uint8_t *row = dst + (size_t)r * cw;
    if (fr < 0 || fr >= H) {
      std::memset(row, fill, cw);
      continue;
    }
    int c0 = occ < 0 ? -occ : 0;  // first valid dst col
    if (c0 > cw) c0 = cw;
    int c1 = occ + cw > W ? W - occ : cw;  // one past last valid dst col
    if (c1 < c0) c1 = c0;
    if (c0 > 0) std::memset(row, fill, c0);
    if (c1 > c0) std::memcpy(row + c0, src + (size_t)fr * stride + occ + c0, c1 - c0);
    if (c1 < cw) std::memset(row + c1, fill, cw - c1);
  }
}

// Crop from a ring slot: in place from the retained frame's luma, or from
// the slot's gray buffer (swscale formats).
static void crop_slot(const Decoder::RingSlot &s, int H, int W, uint8_t *dst,
                      int ch, int cw, int orr, int occ, uint8_t fill) {
  if (s.is_frame)
    crop_from(s.fr->data[0], s.fr->linesize[0], H, W, dst, ch, cw, orr, occ, fill);
  else
    crop_from(s.gray.data(), W, H, W, dst, ch, cw, orr, occ, fill);
}

// Reads the next resampled frame and writes only its (ch x cw) crop at
// (orr, occ) into dst. retain=0 frees the frame immediately (pop); retain=1
// keeps it in the ring until pawsio_release (speculative-replay support).
// 1 = ok, 0 = EOF, <0 = error.
static int read_roi_impl(Decoder *d, uint8_t *dst, int ch, int cw, int orr,
                         int occ, uint8_t fill, int retain) {
  const int H = d->height, W = d->width;
  if (!d->th.joinable()) {
    if (retain) {
      set_error("retained ROI reads need the prefetch ring");
      return -1;
    }
    AVFrame *f = nullptr;
    int ret = d->read_resampled_frame(&f);
    if (ret != 1) return ret;
    if (d->fast_gray(f)) {
      // crop the luma in place — no full-frame conversion at all
      crop_from(f->data[0], f->linesize[0], H, W, dst, ch, cw, orr, occ, fill);
    } else {
      if (d->roi_scratch.size() != d->frame_bytes()) d->roi_scratch.resize(d->frame_bytes());
      d->to_gray(f, d->roi_scratch.data());
      crop_from(d->roi_scratch.data(), W, H, W, dst, ch, cw, orr, occ, fill);
    }
    return 1;
  }
  if (!retain) {
    // pop semantics free the OLDEST slot; with a live retained window that
    // would free a frame a replay may still recrop — reject loudly
    std::unique_lock<std::mutex> lk(d->mu);
    if (d->ring_read > 0) {
      set_error("non-retained read while frames are retained; release them first");
      return -1;
    }
  }
  size_t slot = next_unread_slot(d);
  if (slot == SLOT_ERR) return -1;
  if (slot == SIZE_MAX) return 0;
  crop_slot(d->ring_slots[slot], H, W, dst, ch, cw, orr, occ, fill);
  if (!retain) release_slots(d, 1);
  return 1;
}

int pawsio_read_roi(void *h, uint8_t *dst, int ch, int cw, int orr, int occ,
                    uint8_t fill) {
  return read_roi_impl(static_cast<Decoder *>(h), dst, ch, cw, orr, occ, fill, 0);
}

// retain_flag != 0: frames stay retained until pawsio_release
int pawsio_read_roi_batch_retain(void *h, uint8_t *dst, int maxn, int ch, int cw,
                                 int orr, int occ, uint8_t fill, int retain_flag) {
  auto d = static_cast<Decoder *>(h);
  int n = 0;
  for (; n < maxn; n++) {
    int ret = read_roi_impl(d, dst + (size_t)n * ch * cw, ch, cw, orr, occ, fill,
                            retain_flag);
    if (ret < 0) return ret;
    if (ret == 0) break;
  }
  return n;
}

int pawsio_read_roi_batch(void *h, uint8_t *dst, int maxn, int ch, int cw,
                          int orr, int occ, uint8_t fill) {
  return pawsio_read_roi_batch_retain(h, dst, maxn, ch, cw, orr, occ, fill, 0);
}

// Per-frame-origin variant: origins is int64[maxn*2] (row, col) pairs — the
// speculative ROI pipeline crops each frame at its OWN predicted position,
// so the crop margin never has to cover in-chunk motion (bytes/frame set by
// prediction error alone). Same EOF/error contract as the single-origin form.
int pawsio_read_roi_batch2(void *h, uint8_t *dst, int maxn, int ch, int cw,
                           const int64_t *origins, uint8_t fill,
                           int retain_flag) {
  auto d = static_cast<Decoder *>(h);
  int n = 0;
  for (; n < maxn; n++) {
    int ret = read_roi_impl(d, dst + (size_t)n * ch * cw, ch, cw,
                            (int)origins[2 * n], (int)origins[2 * n + 1], fill,
                            retain_flag);
    if (ret < 0) return ret;
    if (ret == 0) break;
  }
  return n;
}

// Advances up to maxn frames into the RETAINED window without cropping
// (multi-target pipelines recrop each target separately). Returns the count.
int pawsio_advance_retain(void *h, int maxn) {
  auto d = static_cast<Decoder *>(h);
  if (!d->th.joinable()) {
    set_error("retained reads need the prefetch ring");
    return -1;
  }
  int n = 0;
  for (; n < maxn; n++) {
    size_t slot = next_unread_slot(d);
    if (slot == SLOT_ERR) return n ? n : -1;  // error surfaces on next call
    if (slot == SIZE_MAX) break;
  }
  return n;
}

// Re-crops k RETAINED frames starting at index `first` of the retained window
// (0 = oldest retained). Returns k, or <0 on a range error.
int pawsio_recrop(void *h, uint8_t *dst, int first, int k, int ch, int cw,
                  int orr, int occ, uint8_t fill) {
  auto d = static_cast<Decoder *>(h);
  size_t head, read;
  {
    std::unique_lock<std::mutex> lk(d->mu);
    head = d->ring_head;
    read = d->ring_read;
  }
  if (first < 0 || k < 0 || (size_t)(first + k) > read) {
    set_error("recrop range outside the retained window");
    return -1;
  }
  const int H = d->height, W = d->width;
  for (int j = 0; j < k; j++) {
    size_t slot = (head + first + j) % d->ring_depth;
    crop_slot(d->ring_slots[slot], H, W, dst + (size_t)j * ch * cw,
              ch, cw, orr, occ, fill);
  }
  return k;
}

// Pointer to the gray pixels of RETAINED frame `idx` (0 = oldest) plus its
// row stride, valid until that frame is released. Zero-copy overlay support:
// the diagnostic writer downscales straight out of the decode ring, so
// enabling diagnostics no longer forces full frames through Python (the
// reference pays a full-frame read either way: src/diagnose.jl:30-38).
// NULL on range error.
const uint8_t *pawsio_retained_ptr(void *h, int idx, int *stride) {
  auto d = static_cast<Decoder *>(h);
  size_t head, read;
  {
    std::unique_lock<std::mutex> lk(d->mu);
    head = d->ring_head;
    read = d->ring_read;
  }
  if (idx < 0 || (size_t)idx >= read) {
    set_error("retained_ptr index outside the retained window");
    return nullptr;
  }
  const Decoder::RingSlot &s = d->ring_slots[(head + idx) % d->ring_depth];
  if (s.is_frame) {
    *stride = s.fr->linesize[0];
    return s.fr->data[0];
  }
  *stride = d->width;
  return s.gray.data();
}

// Per-frame-origin recrop: origins is int64[k*2] (row, col) pairs.
int pawsio_recrop2(void *h, uint8_t *dst, int first, int k, int ch, int cw,
                   const int64_t *origins, uint8_t fill) {
  auto d = static_cast<Decoder *>(h);
  size_t head, read;
  {
    std::unique_lock<std::mutex> lk(d->mu);
    head = d->ring_head;
    read = d->ring_read;
  }
  if (first < 0 || k < 0 || (size_t)(first + k) > read) {
    set_error("recrop range outside the retained window");
    return -1;
  }
  const int H = d->height, W = d->width;
  for (int j = 0; j < k; j++) {
    size_t slot = (head + first + j) % d->ring_depth;
    crop_slot(d->ring_slots[slot], H, W, dst + (size_t)j * ch * cw, ch, cw,
              (int)origins[2 * j], (int)origins[2 * j + 1], fill);
  }
  return k;
}

int pawsio_read_batch(void *h, uint8_t *dst, int maxn) {
  auto d = static_cast<Decoder *>(h);
  size_t nb = d->frame_bytes();
  int n = 0;
  for (; n < maxn; n++) {
    int ret = pawsio_read(h, dst + (size_t)n * nb);
    if (ret < 0) return ret;
    if (ret == 0) break;
  }
  return n;
}

void pawsio_close(void *h) { delete static_cast<Decoder *>(h); }

// ---------------------------------------------------------------------------
// Encoder

// tb_den > 0 selects an explicit fine-grained time base {tb_num, tb_den} for
// variable-frame-rate writing via pawsio_enc_write_pts; tb_den == 0 keeps the
// constant-frame-rate 1/fps time base.
static void *enc_open_impl(const char *path, int w, int h, double fps, int sar_num,
                           int sar_den, int tb_num, int tb_den, int fast = 0) {
  auto e = new Encoder();
  e->width = w;
  e->height = h;
  int ret = avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path);
  if (ret < 0 || !e->fmt) {
    set_averror("alloc_output_context", ret);
    delete e;
    return nullptr;
  }
  const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) {
    set_error("no H.264/MPEG4 encoder available");
    delete e;
    return nullptr;
  }
  e->enc = avcodec_alloc_context3(codec);
  e->enc->width = w;
  e->enc->height = h;
  e->enc->pix_fmt = AV_PIX_FMT_YUV420P;
  AVRational fr = av_d2q(fps, 1 << 24);
  if (tb_den > 0) {
    e->enc->time_base = {tb_num, tb_den};
  } else {
    e->enc->time_base = av_inv_q(fr);
    e->enc->framerate = fr;
  }
  e->enc->gop_size = 12;
  if (sar_num > 0 && sar_den > 0)
    e->enc->sample_aspect_ratio = {sar_num, sar_den};  // anamorphic pixels
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (codec->id == AV_CODEC_ID_H264) {
    // fast != 0: the diagnostic-overlay writer — encode cost sits directly
    // on the tracking critical path (same core as decode), so trade
    // compression for speed; file synthesis keeps veryfast for
    // record-comparable fixtures
    av_opt_set(e->enc->priv_data, "preset", fast ? "ultrafast" : "veryfast", 0);
    if (fast) av_opt_set(e->enc->priv_data, "tune", "zerolatency", 0);
    av_opt_set(e->enc->priv_data, "crf", "23", 0);
    // VFR mode (test-harness fixtures): no B-frames, so decode order ==
    // display order — consumers that key frames off the container pts (e.g.
    // OpenCV) stay consistent — and lossless so frame identity survives
    if (tb_den > 0) {
      av_opt_set(e->enc->priv_data, "bf", "0", 0);
      av_opt_set(e->enc->priv_data, "crf", "0", 0);
    }
  }
  if ((ret = avcodec_open2(e->enc, codec, nullptr)) < 0) {
    set_averror("enc avcodec_open2", ret);
    delete e;
    return nullptr;
  }
  e->stream = avformat_new_stream(e->fmt, nullptr);
  avcodec_parameters_from_context(e->stream->codecpar, e->enc);
  e->stream->time_base = e->enc->time_base;
  if (sar_num > 0 && sar_den > 0)
    e->stream->sample_aspect_ratio = {sar_num, sar_den};
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE)) {
    if ((ret = avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      set_averror("avio_open", ret);
      delete e;
      return nullptr;
    }
  }
  if ((ret = avformat_write_header(e->fmt, nullptr)) < 0) {
    set_averror("write_header", ret);
    delete e;
    return nullptr;
  }
  e->header_written = true;
  e->frame = av_frame_alloc();
  e->frame->format = AV_PIX_FMT_YUV420P;
  e->frame->width = w;
  e->frame->height = h;
  av_frame_get_buffer(e->frame, 0);
  e->pkt = av_packet_alloc();
  return e;
}

void *pawsio_enc_open_sar(const char *path, int w, int h, double fps, int sar_num,
                          int sar_den) {
  return enc_open_impl(path, w, h, fps, sar_num, sar_den, 0, 0);
}

void *pawsio_enc_open(const char *path, int w, int h, double fps) {
  return enc_open_impl(path, w, h, fps, 1, 1, 0, 0);
}

// Latency-tuned encoder (x264 ultrafast + zerolatency) for writers that sit
// on the tracking critical path — the diagnostic overlay.
void *pawsio_enc_open_fast(const char *path, int w, int h, double fps) {
  return enc_open_impl(path, w, h, fps, 1, 1, 0, 0, 1);
}

// Variable-frame-rate encoder: frames carry explicit pts in {tb_num, tb_den}
// ticks (use pawsio_enc_write_pts). Used by the test harness to synthesize
// VFR fixtures that exercise PTS-true decode on both backends.
void *pawsio_enc_open_vfr(const char *path, int w, int h, int tb_num, int tb_den) {
  return enc_open_impl(path, w, h, 30.0, 1, 1, tb_num, tb_den);
}

static int enc_write_impl(Encoder *e, const uint8_t *gray, int64_t pts) {
  av_frame_make_writable(e->frame);
  // GRAY8 -> yuv420p: copy luma, neutral chroma
  for (int r = 0; r < e->height; r++)
    std::memcpy(e->frame->data[0] + (size_t)r * e->frame->linesize[0],
                gray + (size_t)r * e->width, e->width);
  for (int r = 0; r < e->height / 2; r++) {
    std::memset(e->frame->data[1] + (size_t)r * e->frame->linesize[1], 128, e->width / 2);
    std::memset(e->frame->data[2] + (size_t)r * e->frame->linesize[2], 128, e->width / 2);
  }
  e->frame->pts = pts;
  e->next_pts = pts + 1;
  int ret = avcodec_send_frame(e->enc, e->frame);
  if (ret < 0) {
    set_averror("send_frame", ret);
    return -1;
  }
  return e->drain();
}

int pawsio_enc_write(void *h, const uint8_t *gray) {
  auto e = static_cast<Encoder *>(h);
  return enc_write_impl(e, gray, e->next_pts);
}

int pawsio_enc_write_pts(void *h, const uint8_t *gray, int64_t pts) {
  return enc_write_impl(static_cast<Encoder *>(h), gray, pts);
}

int pawsio_enc_close(void *h) {
  auto e = static_cast<Encoder *>(h);
  int rc = 0;
  if (e->enc && e->header_written) {
    avcodec_send_frame(e->enc, nullptr);
    rc = e->drain();
    av_write_trailer(e->fmt);
  }
  delete e;
  return rc;
}

}  // extern "C"
