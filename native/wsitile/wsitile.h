/* wsitile — first-party pyramidal slide tile decoder.
 *
 * TPU-native equivalent of the reference's OpenSlide dependency
 * (SURVEY.md §2.b): a C++ host library that decodes pyramidal TIFF/SVS
 * slides (libtiff: tiled or stripped, JPEG/LZW/deflate via libtiff codecs)
 * and a raw mmap-able pyramid format (.wsiraw), with a batched,
 * multi-threaded read_tiles() API that fills one contiguous output buffer
 * suitable for zero-copy handoff into the JAX host→device pipeline.
 *
 * API contract mirrors the OpenSlide usage sites in the reference
 * (utils/dataset.py:121,175-178): read_region takes LEVEL-0 coordinates
 * and a level; returned pixels are RGB uint8, out-of-bounds padded white.
 *
 * All functions return 0 on success, negative on error unless noted.
 */

#ifndef WSITILE_H_
#define WSITILE_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Opens a slide (.svs/.tif/.tiff via libtiff, .wsiraw via mmap).
 * Returns NULL on failure. Thread-compatible: one handle may be used from
 * many threads concurrently (internal per-thread TIFF handle pool). */
void *wsitile_open(const char *path);

void wsitile_close(void *handle);

int wsitile_level_count(void *handle);

/* Fills w/h with the dimensions of `level`. */
int wsitile_level_dimensions(void *handle, int level, int64_t *w, int64_t *h);

/* Downsample factor of `level` relative to level 0. */
double wsitile_level_downsample(void *handle, int level);

/* Reads a (w × h) RGB region whose top-left is at LEVEL-0 coordinates
 * (x0, y0), decoded from pyramid `level`. `out` must hold w*h*3 bytes.
 * Out-of-bounds pixels are 255 (slide background). */
int wsitile_read_region(void *handle, int64_t x0, int64_t y0, int level,
                        int64_t w, int64_t h, uint8_t *out);

/* Batched tile read: n tiles of (tw × th) at level-`level` coordinates
 * (xs[i], ys[i]) — NOTE: level coordinates, not level-0 — decoded in
 * parallel by `nthreads` worker threads into out[i*tw*th*3].
 * This is the hot input path for dense inference (SURVEY.md §7d). */
int wsitile_read_tiles(void *handle, const int64_t *xs, const int64_t *ys,
                       int64_t n, int level, int64_t tw, int64_t th,
                       uint8_t *out, int nthreads);

/* Reads an entire level into out (w*h*3 bytes, row-major RGB). */
int wsitile_read_level(void *handle, int level, uint8_t *out, int nthreads);

/* Writes a .wsiraw pyramid: `levels` arrays of (hs[i] × ws[i]) RGB bytes.
 * Level spacing is recorded implicitly by the dimensions. */
int wsitile_write_raw(const char *path, int levels, const int64_t *ws,
                      const int64_t *hs, const uint8_t *const *data);

/* Writes a multi-directory TILED TIFF pyramid (tile_size × tile_size,
 * uncompressed) — the SVS-like layout the reader's tiled path decodes.
 * Also the hermetic test vehicle for edge-tile handling. */
int wsitile_write_tiled(const char *path, int levels, const int64_t *ws,
                        const int64_t *hs, const uint8_t *const *data,
                        int tile_size);

/* Same with an explicit TIFF compression scheme (e.g. 7 = JPEG, quality
 * 1-100) — produces fixtures matching real Aperio JPEG SVS files. */
int wsitile_write_tiled_compressed(const char *path, int levels,
                                   const int64_t *ws, const int64_t *hs,
                                   const uint8_t *const *data, int tile_size,
                                   int compression, int quality);

/* Cumulative count of undecodable tiles/strips seen by this handle.
 * Nonzero means some read returned -1 and data was left white — callers
 * MUST treat that read as failed (silent white tiles corrupt analysis).
 * Aperio JPEG2000 SVS (compression 33003/33005) is not decodable by
 * libtiff; such slides fail loudly here rather than silently. */
int64_t wsitile_decode_failures(void *handle);

/* Last error message (empty string if none). Errors raised by read_tiles
 * worker threads are visible here from any thread. */
const char *wsitile_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* WSITILE_H_ */
