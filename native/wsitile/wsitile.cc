/* wsitile implementation — see wsitile.h.
 *
 * Two backends behind one Slide interface:
 *  - TiffSlide: libtiff pyramids (SVS = tiled TIFF; levels are the tiled
 *    directories sorted by width). Per-thread TIFF* pool because libtiff
 *    handles are not thread-safe.
 *  - RawSlide: .wsiraw mmap pyramid (header + contiguous RGB planes) —
 *    zero-decode path for tests/benchmarks and pre-decoded caches.
 */

#include "wsitile.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <tiffio.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

/* Global (mutex-guarded), not thread_local: read_tiles workers set errors
 * from pool threads and the caller reads from its own thread. */
std::mutex g_error_mu;
std::string g_error;

void set_error(const std::string &msg) {
  std::lock_guard<std::mutex> lock(g_error_mu);
  g_error = msg;
}

struct LevelInfo {
  int64_t w = 0, h = 0;
  int dir = 0;  // TIFF directory index
};

class Slide {
 public:
  virtual ~Slide() = default;
  virtual int level_count() const = 0;
  virtual LevelInfo level(int k) const = 0;
  /* Read (w × h) RGB at level coordinates (x, y) of level k. */
  virtual int read(int64_t x, int64_t y, int k, int64_t w, int64_t h,
                   uint8_t *out) = 0;
  /* Cumulative count of undecodable tiles/strips seen by this handle. */
  virtual int64_t decode_failures() const { return 0; }
};

/* ------------------------------ RawSlide ------------------------------ */

constexpr uint64_t kRawMagic = 0x77736972617731ULL;  // "wsiraw1"

struct RawHeader {
  uint64_t magic;
  int64_t levels;
  int64_t dims[2 * 16];  // w, h per level (max 16 levels)
};

class RawSlide : public Slide {
 public:
  static RawSlide *Open(const char *path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) {
      set_error("open failed");
      return nullptr;
    }
    struct stat st;
    fstat(fd, &st);
    void *base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (base == MAP_FAILED) {
      set_error("mmap failed");
      return nullptr;
    }
    auto *hdr = static_cast<const RawHeader *>(base);
    if ((size_t)st.st_size < sizeof(RawHeader) || hdr->magic != kRawMagic ||
        hdr->levels < 1 || hdr->levels > 16) {
      munmap(base, st.st_size);
      set_error("bad wsiraw header");
      return nullptr;
    }
    auto *s = new RawSlide();
    s->base_ = base;
    s->size_ = st.st_size;
    /* Header dims are untrusted: validate positivity and accumulate the
     * plane offsets with overflow checks, else a crafted header with
     * negative/huge w*h can pass the truncation check below while read()
     * computes out-of-bounds plane pointers (ADVICE.md round-1). */
    constexpr int64_t kMaxDim = int64_t(1) << 40;
    int64_t offset = sizeof(RawHeader);
    for (int k = 0; k < hdr->levels; ++k) {
      LevelInfo li;
      li.w = hdr->dims[2 * k];
      li.h = hdr->dims[2 * k + 1];
      int64_t plane;
      if (li.w <= 0 || li.h <= 0 || li.w > kMaxDim || li.h > kMaxDim ||
          __builtin_mul_overflow(li.w * 3, li.h, &plane) ||
          __builtin_add_overflow(offset, plane, &offset)) {
        delete s;
        set_error("bad wsiraw level dims");
        return nullptr;
      }
      s->levels_.push_back(li);
      s->offsets_.push_back(offset - plane);
    }
    if (offset > st.st_size) {
      delete s;
      set_error("wsiraw truncated");
      return nullptr;
    }
    return s;
  }

  ~RawSlide() override {
    if (base_) munmap(base_, size_);
  }

  int level_count() const override { return (int)levels_.size(); }
  LevelInfo level(int k) const override { return levels_[k]; }

  int read(int64_t x, int64_t y, int k, int64_t w, int64_t h,
           uint8_t *out) override {
    const LevelInfo &li = levels_[k];
    const uint8_t *plane =
        static_cast<const uint8_t *>(base_) + offsets_[k];
    std::memset(out, 255, (size_t)(w * h * 3));
    int64_t sy0 = std::max<int64_t>(0, y), sy1 = std::min(li.h, y + h);
    int64_t sx0 = std::max<int64_t>(0, x), sx1 = std::min(li.w, x + w);
    for (int64_t yy = sy0; yy < sy1; ++yy) {
      std::memcpy(out + ((yy - y) * w + (sx0 - x)) * 3,
                  plane + (yy * li.w + sx0) * 3, (size_t)((sx1 - sx0) * 3));
    }
    return 0;
  }

 private:
  void *base_ = nullptr;
  size_t size_ = 0;
  std::vector<LevelInfo> levels_;
  std::vector<int64_t> offsets_;
};

/* ------------------------------ TiffSlide ----------------------------- */

class TiffSlide : public Slide {
 public:
  static TiffSlide *Open(const char *path) {
    TIFF *tif = TIFFOpen(path, "r");
    if (!tif) {
      set_error("TIFFOpen failed");
      return nullptr;
    }
    auto *s = new TiffSlide();
    s->path_ = path;
    /* Enumerate directories; pyramid levels = image directories sorted by
     * width descending. Aperio SVS stores label/macro images too — filter
     * to directories whose aspect ratio matches the baseline (±10%). */
    struct Dir {
      int idx;
      int64_t w, h;
    };
    std::vector<Dir> dirs;
    int idx = 0;
    do {
      uint32_t w = 0, h = 0;
      TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
      TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
      if (w > 0 && h > 0) dirs.push_back({idx, (int64_t)w, (int64_t)h});
      ++idx;
    } while (TIFFReadDirectory(tif));
    TIFFClose(tif);
    if (dirs.empty()) {
      delete s;
      set_error("no TIFF directories");
      return nullptr;
    }
    std::stable_sort(dirs.begin(), dirs.end(),
                     [](const Dir &a, const Dir &b) { return a.w > b.w; });
    const double ar0 = (double)dirs[0].w / dirs[0].h;
    for (const Dir &d : dirs) {
      const double ar = (double)d.w / d.h;
      if (ar > ar0 * 1.1 || ar < ar0 / 1.1) continue;  // label/macro
      LevelInfo li;
      li.w = d.w;
      li.h = d.h;
      li.dir = d.idx;
      s->levels_.push_back(li);
    }
    return s;
  }

  ~TiffSlide() override {
    std::lock_guard<std::mutex> lock(pool_mu_);
    for (TIFF *t : pool_) TIFFClose(t);
  }

  int level_count() const override { return (int)levels_.size(); }
  LevelInfo level(int k) const override { return levels_[k]; }

  int read(int64_t x, int64_t y, int k, int64_t w, int64_t h,
           uint8_t *out) override {
    TIFF *tif = acquire();
    if (!tif) return -1;
    const LevelInfo &li = levels_[k];
    TIFFSetDirectory(tif, li.dir);
    std::memset(out, 255, (size_t)(w * h * 3));

    int rc;
    if (TIFFIsTiled(tif)) {
      rc = read_tiled(tif, li, x, y, w, h, out);
    } else {
      rc = read_stripped(tif, li, x, y, w, h, out);
    }
    release(tif);
    return rc;
  }

 private:
  TIFF *acquire() {
    {
      std::lock_guard<std::mutex> lock(pool_mu_);
      if (!pool_.empty()) {
        TIFF *t = pool_.back();
        pool_.pop_back();
        return t;
      }
    }
    TIFF *t = TIFFOpen(path_.c_str(), "r");
    if (!t) set_error("TIFFOpen failed (pool)");
    return t;
  }

  void release(TIFF *t) {
    std::lock_guard<std::mutex> lock(pool_mu_);
    pool_.push_back(t);
  }

  /* Copy the overlap of a decoded RGBA block at (bx, by) with `bw` valid
   * columns × `bh` valid rows (raster row stride `stride`) into the RGB
   * output window at (x, y, w, h). RGBA rows from libtiff's RGBA
   * interface are bottom-up; `raster` is already re-ordered top-down by
   * the callers below. Columns beyond bw (right-edge tile padding) are
   * never copied — the out buffer keeps its white background there. */
  static void blit(const uint32_t *raster, int64_t bx, int64_t by,
                   int64_t stride, int64_t bw, int64_t bh, int64_t x,
                   int64_t y, int64_t w, int64_t h, uint8_t *out) {
    int64_t y0 = std::max(by, y), y1 = std::min(by + bh, y + h);
    int64_t x0 = std::max(bx, x), x1 = std::min(bx + bw, x + w);
    for (int64_t yy = y0; yy < y1; ++yy) {
      const uint32_t *src = raster + (yy - by) * stride + (x0 - bx);
      uint8_t *dst = out + ((yy - y) * w + (x0 - x)) * 3;
      for (int64_t xx = x0; xx < x1; ++xx, ++src, dst += 3) {
        const uint32_t px = *src;
        dst[0] = TIFFGetR(px);
        dst[1] = TIFFGetG(px);
        dst[2] = TIFFGetB(px);
      }
    }
  }

  static void flip_rows(uint32_t *raster, int64_t w, int64_t h) {
    for (int64_t r = 0; r < h / 2; ++r) {
      uint32_t *a = raster + r * w;
      uint32_t *b = raster + (h - 1 - r) * w;
      for (int64_t c = 0; c < w; ++c) std::swap(a[c], b[c]);
    }
  }

  int read_tiled(TIFF *tif, const LevelInfo &li, int64_t x, int64_t y,
                 int64_t w, int64_t h, uint8_t *out) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return -1;
    std::vector<uint32_t> raster((size_t)tw * th);

    int64_t failed = 0;
    int64_t tx0 = std::max<int64_t>(0, x) / tw * tw;
    int64_t ty0 = std::max<int64_t>(0, y) / th * th;
    for (int64_t ty = ty0; ty < std::min(li.h, y + h); ty += th) {
      for (int64_t tx = tx0; tx < std::min(li.w, x + w); tx += tw) {
        /* Ext + stop_on_error=1: plain TIFFReadRGBATile IGNORES decode
         * errors (stoponerr=0) and returns success over garbage. */
        if (!TIFFReadRGBATileExt(tif, (uint32_t)tx, (uint32_t)ty,
                                 raster.data(), 1)) {
          /* Undecodable tile (e.g. Aperio JPEG2000, compression 33003/
           * 33005, which libtiff cannot decode). FAIL LOUDLY — a silent
           * white tile corrupts downstream analysis (VERDICT round-1). */
          ++failed;
          decode_failures_.fetch_add(1);
          continue;
        }
        /* RGBA tile rows are bottom-up; flip to top-down. After the flip
         * the valid rows of a partial bottom-edge tile (bh < th) sit at
         * offset 0 (verified empirically against coordinate-encoded
         * tiles; reading at (th-bh)*tw returned the undefined pad rows
         * instead of image data). */
        flip_rows(raster.data(), tw, th);
        int64_t bh = std::min<int64_t>(th, li.h - ty);
        int64_t bw = std::min<int64_t>(tw, li.w - tx);
        blit(raster.data(), tx, ty, tw, bw, bh, x, y, w, h, out);
      }
    }
    if (failed > 0) {
      set_error("undecodable TIFF tiles: " + std::to_string(failed) +
                " (compression " + std::to_string(compression(tif)) +
                "; Aperio JPEG2000 (33003/33005) is not decodable by "
                "libtiff — convert the slide or use an OpenJPEG build)");
      return -1;
    }
    return 0;
  }

  int read_stripped(TIFF *tif, const LevelInfo &li, int64_t x, int64_t y,
                    int64_t w, int64_t h, uint8_t *out) {
    uint32_t rps = 0;
    TIFFGetFieldDefaulted(tif, TIFFTAG_ROWSPERSTRIP, &rps);
    if (rps == 0) rps = (uint32_t)li.h;
    std::vector<uint32_t> raster((size_t)li.w * rps);

    int64_t failed = 0;
    int64_t sy0 = std::max<int64_t>(0, y) / rps * rps;
    for (int64_t sy = sy0; sy < std::min(li.h, y + h); sy += rps) {
      const int64_t rows = std::min<int64_t>(rps, li.h - sy);
      if (!TIFFReadRGBAStripExt(tif, (uint32_t)sy, raster.data(), 1)) {
        ++failed;
        decode_failures_.fetch_add(1);
        continue;
      }
      /* strip rows are bottom-up within the strip */
      flip_rows(raster.data(), li.w, rows);
      blit(raster.data(), 0, sy, li.w, li.w, rows, x, y, w, h, out);
    }
    if (failed > 0) {
      set_error("undecodable TIFF strips: " + std::to_string(failed) +
                " (compression " + std::to_string(compression(tif)) + ")");
      return -1;
    }
    return 0;
  }

  static uint16_t compression(TIFF *tif) {
    uint16_t c = 0;
    TIFFGetFieldDefaulted(tif, TIFFTAG_COMPRESSION, &c);
    return c;
  }

 public:
  int64_t decode_failures() const override { return decode_failures_.load(); }

 private:
  mutable std::atomic<int64_t> decode_failures_{0};

  std::string path_;
  std::vector<LevelInfo> levels_;
  std::vector<TIFF *> pool_;
  std::mutex pool_mu_;
};

bool has_suffix(const std::string &s, const std::string &suf) {
  return s.size() >= suf.size() &&
         s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

Slide *as_slide(void *h) { return static_cast<Slide *>(h); }

}  // namespace

/* ------------------------------- C API -------------------------------- */

extern "C" {

void *wsitile_open(const char *path) {
  std::string p(path);
  TIFFSetWarningHandler(nullptr);  // SVS private tags spam warnings
  if (has_suffix(p, ".wsiraw")) return RawSlide::Open(path);
  return TiffSlide::Open(path);
}

void wsitile_close(void *handle) { delete as_slide(handle); }

int wsitile_level_count(void *handle) {
  return as_slide(handle)->level_count();
}

int wsitile_level_dimensions(void *handle, int level, int64_t *w,
                             int64_t *h) {
  Slide *s = as_slide(handle);
  if (level < 0 || level >= s->level_count()) return -1;
  LevelInfo li = s->level(level);
  *w = li.w;
  *h = li.h;
  return 0;
}

double wsitile_level_downsample(void *handle, int level) {
  Slide *s = as_slide(handle);
  if (level < 0 || level >= s->level_count()) return -1.0;
  return (double)s->level(0).w / s->level(level).w;
}

int wsitile_read_region(void *handle, int64_t x0, int64_t y0, int level,
                        int64_t w, int64_t h, uint8_t *out) {
  Slide *s = as_slide(handle);
  if (level < 0 || level >= s->level_count()) return -1;
  const double ds = (double)s->level(0).w / s->level(level).w;
  return s->read((int64_t)(x0 / ds), (int64_t)(y0 / ds), level, w, h, out);
}

int wsitile_read_tiles(void *handle, const int64_t *xs, const int64_t *ys,
                       int64_t n, int level, int64_t tw, int64_t th,
                       uint8_t *out, int nthreads) {
  Slide *s = as_slide(handle);
  if (level < 0 || level >= s->level_count()) return -1;
  if (nthreads < 1) nthreads = 1;
  nthreads = std::min<int64_t>(nthreads, std::max<int64_t>(1, n));

  std::atomic<int64_t> next(0);
  std::atomic<int> rc(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      if (s->read(xs[i], ys[i], level, tw, th, out + i * tw * th * 3) != 0)
        rc.store(-1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < nthreads; ++t) threads.emplace_back(worker);
  worker();
  for (auto &t : threads) t.join();
  return rc.load();
}

int wsitile_read_level(void *handle, int level, uint8_t *out, int nthreads) {
  Slide *s = as_slide(handle);
  if (level < 0 || level >= s->level_count()) return -1;
  const LevelInfo li = s->level(level);
  /* chunk by row bands decoded in parallel */
  const int64_t band = 512;
  const int64_t nbands = (li.h + band - 1) / band;
  std::vector<int64_t> xs(nbands, 0), ys(nbands);
  for (int64_t b = 0; b < nbands; ++b) ys[b] = b * band;

  std::atomic<int64_t> nextb(0);
  std::atomic<int> rc(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t b = nextb.fetch_add(1);
      if (b >= nbands) break;
      const int64_t rows = std::min(band, li.h - b * band);
      if (s->read(0, b * band, level, li.w, rows,
                  out + b * band * li.w * 3) != 0)
        rc.store(-1);
    }
  };
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> threads;
  for (int t = 1; t < std::min<int64_t>(nthreads, nbands); ++t)
    threads.emplace_back(worker);
  worker();
  for (auto &t : threads) t.join();
  return rc.load();
}

int wsitile_write_raw(const char *path, int levels, const int64_t *ws,
                      const int64_t *hs, const uint8_t *const *data) {
  if (levels < 1 || levels > 16) {
    set_error("levels out of range");
    return -1;
  }
  FILE *f = fopen(path, "wb");
  if (!f) {
    set_error("fopen failed");
    return -1;
  }
  RawHeader hdr;
  std::memset(&hdr, 0, sizeof(hdr));
  hdr.magic = kRawMagic;
  hdr.levels = levels;
  for (int k = 0; k < levels; ++k) {
    hdr.dims[2 * k] = ws[k];
    hdr.dims[2 * k + 1] = hs[k];
  }
  fwrite(&hdr, sizeof(hdr), 1, f);
  for (int k = 0; k < levels; ++k)
    fwrite(data[k], 1, (size_t)(ws[k] * hs[k] * 3), f);
  fclose(f);
  return 0;
}

int64_t wsitile_decode_failures(void *handle) {
  return as_slide(handle)->decode_failures();
}

int wsitile_write_tiled_compressed(const char *path, int levels,
                                   const int64_t *ws, const int64_t *hs,
                                   const uint8_t *const *data, int tile_size,
                                   int compression, int quality) {
  TIFF *tif = TIFFOpen(path, "w");
  if (!tif) {
    set_error("TIFFOpen(w) failed");
    return -1;
  }
  std::vector<uint8_t> buf((size_t)tile_size * tile_size * 3);
  for (int k = 0; k < levels; ++k) {
    const int64_t w = ws[k], h = hs[k];
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, (uint32_t)w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, (uint32_t)h);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, (uint32_t)tile_size);
    TIFFSetField(tif, TIFFTAG_TILELENGTH, (uint32_t)tile_size);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, (uint16_t)compression);
    if (compression == COMPRESSION_JPEG)
      TIFFSetField(tif, TIFFTAG_JPEGQUALITY, quality);
    for (int64_t ty = 0; ty < h; ty += tile_size) {
      for (int64_t tx = 0; tx < w; tx += tile_size) {
        std::memset(buf.data(), 0, buf.size());
        const int64_t bh = std::min<int64_t>(tile_size, h - ty);
        const int64_t bw = std::min<int64_t>(tile_size, w - tx);
        for (int64_t r = 0; r < bh; ++r)
          std::memcpy(buf.data() + (size_t)(r * tile_size) * 3,
                      data[k] + (size_t)((ty + r) * w + tx) * 3,
                      (size_t)bw * 3);
        if (TIFFWriteTile(tif, buf.data(), (uint32_t)tx, (uint32_t)ty, 0,
                          0) < 0) {
          TIFFClose(tif);
          set_error("TIFFWriteTile failed");
          return -1;
        }
      }
    }
    if (k + 1 < levels && !TIFFWriteDirectory(tif)) {
      TIFFClose(tif);
      set_error("TIFFWriteDirectory failed");
      return -1;
    }
  }
  TIFFClose(tif);
  return 0;
}

int wsitile_write_tiled(const char *path, int levels, const int64_t *ws,
                        const int64_t *hs, const uint8_t *const *data,
                        int tile_size) {
  return wsitile_write_tiled_compressed(path, levels, ws, hs, data,
                                        tile_size, COMPRESSION_NONE, 0);
}

const char *wsitile_last_error(void) {
  std::lock_guard<std::mutex> lock(g_error_mu);
  /* leak-free enough: the buffer lives as long as the string object */
  static thread_local std::string snapshot;
  snapshot = g_error;
  return snapshot.c_str();
}

}  // extern "C"
