// Native stereo frame feed: multi-threaded decode into an ordered ring.
//
// TPU-native replacement for the reference's host I/O machinery: the
// vidDebug 150-slot ring buffer with a dedicated writer thread
// (reference vidDebug/buffer.cpp:20-120) and the ROS image-topic
// mutex/condvar queues (reference src/live_stereo.cpp:162-269,
// src/StereoCamera.cpp:43-140).  Where the reference used the ring to
// decouple Firewire capture from disk writes, this feed decouples disk
// reads + image decode from device compute: N decoder threads pull frame
// indices from an atomic counter, decode PGM/PNG/raw stereo pairs into
// pre-allocated ring slots, and the consumer (the Python/JAX side, via
// ctypes) drains the ring strictly in frame order.
//
// Design notes:
//  - MPSC with ordered consumption: producers claim frame index i
//    atomically, block until slot i%cap has been released by the
//    consumer (i - consumed < cap), decode, publish ready[i%cap] = i.
//    The consumer waits for ready[next%cap] == next, so out-of-order
//    decode completions never reorder frames.
//  - Zero-copy acquire/release API so the Python side can wrap the slot
//    in a numpy array and hand it straight to jax.device_put.
//  - Grayscale uint8 frames of a fixed (height, width); PNG inputs of
//    any bit depth / channel count are converted to 8-bit gray.
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

namespace {

struct Frame {
  std::vector<uint8_t> left, right;
  int64_t ready = -1;  // frame index stored here, -1 = empty
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

// ---- decoders ------------------------------------------------------------

bool decode_pgm(FILE* f, uint8_t* out, int h, int w, std::string* err) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) {
    *err = "not a P5 PGM";
    return false;
  }
  int vals[3], got = 0;
  while (got < 3) {
    int c = fgetc(f);
    if (c == '#') {  // comment line
      while (c != '\n' && c != EOF) c = fgetc(f);
      continue;
    }
    if (isspace(c)) continue;
    ungetc(c, f);
    if (fscanf(f, "%d", &vals[got]) != 1) {
      *err = "bad PGM header";
      return false;
    }
    ++got;
  }
  fgetc(f);  // single whitespace after maxval
  if (vals[0] != w || vals[1] != h) {
    *err = "PGM size mismatch";
    return false;
  }
  int maxval = vals[2];
  if (maxval == 255) {
    if (fread(out, 1, (size_t)h * w, f) != (size_t)h * w) {
      *err = "short PGM read";
      return false;
    }
    return true;
  }
  if (maxval < 65536) {  // 16-bit big-endian -> 8-bit
    std::vector<uint8_t> raw((size_t)h * w * 2);
    if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
      *err = "short PGM16 read";
      return false;
    }
    for (size_t i = 0; i < (size_t)h * w; ++i) {
      int v = (raw[2 * i] << 8) | raw[2 * i + 1];
      out[i] = (uint8_t)((v * 255 + maxval / 2) / maxval);
    }
    return true;
  }
  *err = "unsupported PGM maxval";
  return false;
}

bool decode_png(FILE* f, uint8_t* out, int h, int w, std::string* err) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    *err = "png_create_read_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    *err = "png_create_info_struct failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "libpng decode error";
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  if ((int)width != w || (int)height != h) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "PNG size mismatch";
    return false;
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  // normalize everything to 8-bit grayscale
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_strip_16(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);  // BT.709-ish defaults
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + (size_t)y * w;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const std::string& path, uint8_t* out, int h, int w,
                 std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    *err = "cannot open " + path;
    return false;
  }
  bool ok;
  if (ends_with(path, ".pgm") || ends_with(path, ".PGM")) {
    ok = decode_pgm(f, out, h, w, err);
  } else if (ends_with(path, ".png") || ends_with(path, ".PNG")) {
    ok = decode_png(f, out, h, w, err);
  } else {  // raw: exactly h*w bytes
    ok = fread(out, 1, (size_t)h * w, f) == (size_t)h * w;
    if (!ok) *err = "short raw read " + path;
  }
  if (!ok && err->find(path) == std::string::npos) *err += " (" + path + ")";
  fclose(f);
  return ok;
}

// ---- the feed ------------------------------------------------------------

struct Feed {
  std::vector<std::string> left_paths, right_paths;
  int h = 0, w = 0;
  int cap = 0;
  std::vector<Frame> ring;

  std::mutex mu;
  std::condition_variable slot_free;   // producers wait for a free slot
  std::condition_variable slot_ready;  // consumer waits for next frame
  std::atomic<int64_t> next_to_claim{0};
  int64_t consumed = 0;   // frames fully released by the consumer
  int64_t acquired = -1;  // frame currently held by the consumer
  bool stop = false;
  std::string error;
  std::vector<std::thread> workers;

  int64_t n_frames() const { return (int64_t)left_paths.size(); }

  void worker() {
    for (;;) {
      int64_t idx = next_to_claim.fetch_add(1);
      if (idx >= n_frames()) return;
      Frame* slot = &ring[idx % cap];
      {
        std::unique_lock<std::mutex> lk(mu);
        slot_free.wait(lk, [&] { return stop || idx - consumed < cap; });
        if (stop) return;
      }
      std::string err;
      bool ok =
          decode_file(left_paths[idx], slot->left.data(), h, w, &err) &&
          decode_file(right_paths[idx], slot->right.data(), h, w, &err);
      {
        std::lock_guard<std::mutex> lk(mu);
        if (!ok && error.empty()) {
          error = err;
          stop = true;
          slot_free.notify_all();
        }
        slot->ready = idx;
        slot_ready.notify_all();
      }
    }
  }

  // Blocks until frame `consumed` is decoded; returns its slot or null at
  // end-of-stream / error.  The slot stays valid until release().
  Frame* acquire() {
    int64_t idx = consumed;
    if (idx >= n_frames()) return nullptr;
    std::unique_lock<std::mutex> lk(mu);
    slot_ready.wait(lk, [&] {
      return !error.empty() || ring[idx % cap].ready == idx;
    });
    if (!error.empty()) return nullptr;
    acquired = idx;
    return &ring[idx % cap];
  }

  void release() {
    std::lock_guard<std::mutex> lk(mu);
    if (acquired < 0) return;
    ring[acquired % cap].ready = -1;
    consumed = acquired + 1;
    acquired = -1;
    slot_free.notify_all();
  }

  void close() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
      consumed = n_frames() + cap;  // unblock all producers
      slot_free.notify_all();
    }
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

}  // namespace

extern "C" {

void* fe_feed_open(const char* const* left, const char* const* right,
                   long n_frames, int height, int width, int ring_capacity,
                   int n_threads) {
  if (n_frames <= 0 || height <= 0 || width <= 0) return nullptr;
  Feed* fd = new Feed();
  fd->h = height;
  fd->w = width;
  fd->cap = ring_capacity > 0 ? ring_capacity : 8;
  fd->left_paths.assign(left, left + n_frames);
  fd->right_paths.assign(right, right + n_frames);
  fd->ring.resize(fd->cap);
  for (auto& fr : fd->ring) {
    fr.left.resize((size_t)height * width);
    fr.right.resize((size_t)height * width);
  }
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    fd->workers.emplace_back(&Feed::worker, fd);
  return fd;
}

// Zero-copy: pointers valid until fe_feed_release.  Returns frame index,
// or -1 at end-of-stream / error (check fe_feed_error).
long fe_feed_acquire(void* h, const unsigned char** l,
                     const unsigned char** r) {
  Feed* fd = (Feed*)h;
  Frame* fr = fd->acquire();
  if (!fr) return -1;
  *l = fr->left.data();
  *r = fr->right.data();
  return (long)fr->ready;
}

void fe_feed_release(void* h) { ((Feed*)h)->release(); }

// Copying variant: fills caller buffers of h*w bytes each.
long fe_feed_next(void* h, unsigned char* left_out, unsigned char* right_out) {
  Feed* fd = (Feed*)h;
  Frame* fr = fd->acquire();
  if (!fr) return -1;
  long idx = (long)fr->ready;
  memcpy(left_out, fr->left.data(), fr->left.size());
  memcpy(right_out, fr->right.data(), fr->right.size());
  fd->release();
  return idx;
}

const char* fe_feed_error(void* h) {
  Feed* fd = (Feed*)h;
  std::lock_guard<std::mutex> lk(fd->mu);
  return fd->error.empty() ? nullptr : fd->error.c_str();
}

void fe_feed_close(void* h) {
  Feed* fd = (Feed*)h;
  fd->close();
  delete fd;
}

}  // extern "C"
