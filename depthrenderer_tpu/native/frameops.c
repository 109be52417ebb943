/* frameops.c — native host-side frame encoding for depthrenderer_tpu.
 *
 * The hot host path of the render farm is frame encoding: at the 500 fps/chip
 * target, 1080p RGBA is ~4 GB/s of egress that must become PNG/AVI bytes without
 * stalling the device queue (the reference offloaded this to Python thread pools
 * over PIL/cv2 — DepthRenderer/utils.py:409-520). This file implements the
 * CPU-bound pieces in C:
 *
 *   - png_encode_*: a complete PNG writer (zlib deflate, Sub filter) — no PIL.
 *   - rgb_bgr_flip / vertical_flip: the per-frame conversions the AVI container
 *     needs (BGR, bottom-up rows).
 *
 * Built as a plain shared library (no pybind11 in this image) and driven through
 * ctypes; see native/__init__.py. Thread-safe and GIL-free by construction: every
 * function is pure C on caller-owned buffers, so Python writer threads overlap
 * fully.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

static void put_u32_be(uint8_t *p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)(v);
}

/* Write one PNG chunk: length, type, data, crc. Returns bytes written. */
static size_t put_chunk(uint8_t *out, const char *type, const uint8_t *data,
                        uint32_t len) {
    put_u32_be(out, len);
    memcpy(out + 4, type, 4);
    if (len) memcpy(out + 8, data, len);
    uint32_t crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, out + 4, len + 4);
    put_u32_be(out + 8 + len, crc);
    return 12 + len;
}

/* Encode an 8-bit image (channels = 3 RGB or 4 RGBA) as a PNG.
 *
 * img:      top-down, tightly packed (h * w * channels bytes).
 * level:    zlib level (1 = fast .. 9 = small).
 * out:      caller buffer; out_cap its size. A safe capacity is
 *           png_encode_bound(w, h, channels).
 * Returns the number of bytes written, or 0 on failure/overflow.
 */
size_t png_encode(const uint8_t *img, int32_t w, int32_t h, int32_t channels,
                  int32_t level, uint8_t *out, size_t out_cap) {
    if (channels != 3 && channels != 4) return 0;
    const size_t row = (size_t)w * (size_t)channels;
    const size_t raw_len = ((size_t)h) * (row + 1);

    uint8_t *raw = (uint8_t *)malloc(raw_len);
    if (!raw) return 0;

    /* Sub filter (type 1): left-delta per channel. Cheap and compresses natural
     * images far better than no filter. */
    for (int32_t y = 0; y < h; y++) {
        uint8_t *dst = raw + (size_t)y * (row + 1);
        const uint8_t *src = img + (size_t)y * row;
        dst[0] = 1; /* filter: Sub */
        for (int32_t c = 0; c < channels; c++) dst[1 + c] = src[c];
        for (size_t x = channels; x < row; x++)
            dst[1 + x] = (uint8_t)(src[x] - src[x - channels]);
    }

    uLongf comp_cap = compressBound(raw_len);
    uint8_t *comp = (uint8_t *)malloc(comp_cap);
    if (!comp) { free(raw); return 0; }
    if (compress2(comp, &comp_cap, raw, raw_len, level) != Z_OK) {
        free(raw); free(comp);
        return 0;
    }
    free(raw);

    const size_t need = 8 + 25 + (12 + comp_cap) + 12;
    if (out_cap < need) { free(comp); return 0; }

    size_t off = 0;
    static const uint8_t sig[8] = {137, 'P', 'N', 'G', '\r', '\n', 26, '\n'};
    memcpy(out, sig, 8);
    off += 8;

    uint8_t ihdr[13];
    put_u32_be(ihdr, (uint32_t)w);
    put_u32_be(ihdr + 4, (uint32_t)h);
    ihdr[8] = 8;                           /* bit depth */
    ihdr[9] = (channels == 4) ? 6 : 2;     /* colour type: RGBA / RGB */
    ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    off += put_chunk(out + off, "IHDR", ihdr, 13);
    off += put_chunk(out + off, "IDAT", comp, (uint32_t)comp_cap);
    off += put_chunk(out + off, "IEND", NULL, 0);
    free(comp);
    return off;
}

/* Worst-case output size for png_encode. */
size_t png_encode_bound(int32_t w, int32_t h, int32_t channels) {
    size_t raw_len = ((size_t)h) * ((size_t)w * channels + 1);
    return 8 + 25 + 12 + compressBound(raw_len) + 12 + 64;
}

/* RGB(A) top-down -> BGR rows, optionally bottom-up, rows padded to `row_pad`
 * bytes (the AVI DIB layout). `in_channels` is 3 or 4. */
void rgb_to_bgr_rows(const uint8_t *in, uint8_t *out, int32_t w, int32_t h,
                     int32_t in_channels, int32_t row_pad, int32_t bottom_up) {
    for (int32_t y = 0; y < h; y++) {
        const uint8_t *src = in + (size_t)y * w * in_channels;
        uint8_t *dst = out + (size_t)(bottom_up ? (h - 1 - y) : y) * row_pad;
        for (int32_t x = 0; x < w; x++) {
            dst[3 * x + 0] = src[in_channels * x + 2];
            dst[3 * x + 1] = src[in_channels * x + 1];
            dst[3 * x + 2] = src[in_channels * x + 0];
        }
        for (int32_t x = 3 * w; x < row_pad; x++) dst[x] = 0;
    }
}

/* In-place-free vertical flip of a packed 8-bit image. */
void vertical_flip(const uint8_t *in, uint8_t *out, int32_t w, int32_t h,
                   int32_t channels) {
    const size_t row = (size_t)w * channels;
    for (int32_t y = 0; y < h; y++)
        memcpy(out + (size_t)(h - 1 - y) * row, in + (size_t)y * row, row);
}
