// Native (C++) decoders for the host input pipeline.
//
// The reference feeds its GPU from 6 torch DataLoader worker PROCESSES
// (lightning_datamodule.py:63) because Python decoding holds the GIL. The
// TPU-native pipeline (data/pipeline.py) uses threads instead; these
// decoders run entirely in C++ (ctypes releases the GIL for the duration of
// the call), so decode parallelism is real without process pools.
//
// Formats:
//   .flo  Middlebury flow (magic 202021.25, flow_utils.py:7-63)
//   .ppm  binary P5/P6, maxval <= 255 (FlyingChairs frames)
//   .png  8-bit gray/RGB/RGBA and 16-bit (KITTI flow pngs), via libpng
//
// All functions return 0 on success, negative error codes otherwise; probe
// functions report dimensions so Python allocates the numpy output and the
// decode writes straight into it (no C-side ownership).

#include <png.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kFloMagic = 202021.25f;

struct MemReader {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) {
    png_error(png, "read past end");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

// Skip PPM whitespace + comments. Returns next non-space position or -1.
int64_t ppm_skip(const uint8_t* buf, int64_t len, int64_t p) {
  while (p < len) {
    if (buf[p] == '#') {
      while (p < len && buf[p] != '\n') p++;
    } else if (buf[p] == ' ' || buf[p] == '\t' || buf[p] == '\r' ||
               buf[p] == '\n') {
      p++;
    } else {
      return p;
    }
  }
  return -1;
}

int64_t ppm_int(const uint8_t* buf, int64_t len, int64_t p, int* out) {
  p = ppm_skip(buf, len, p);
  if (p < 0) return -1;
  int v = 0;
  bool any = false;
  while (p < len && buf[p] >= '0' && buf[p] <= '9') {
    v = v * 10 + (buf[p] - '0');
    p++;
    any = true;
  }
  if (!any) return -1;
  *out = v;
  return p;
}

struct PpmHeader {
  int w, h, maxval, channels;
  int64_t data_off;
};

int ppm_parse(const uint8_t* buf, int64_t len, PpmHeader* hdr) {
  if (len < 2 || buf[0] != 'P' || (buf[1] != '5' && buf[1] != '6')) return -1;
  hdr->channels = buf[1] == '6' ? 3 : 1;
  int64_t p = 2;
  p = ppm_int(buf, len, p, &hdr->w);
  if (p < 0) return -2;
  p = ppm_int(buf, len, p, &hdr->h);
  if (p < 0) return -2;
  p = ppm_int(buf, len, p, &hdr->maxval);
  if (p < 0 || hdr->maxval > 255) return -3;
  // exactly one whitespace char after maxval; a non-whitespace delimiter
  // (e.g. a \r\n-terminated header) would silently shift all pixel data by
  // one byte, so fail loudly instead
  if (p >= len || !(buf[p] == ' ' || buf[p] == '\t' || buf[p] == '\n' ||
                    buf[p] == '\r' || buf[p] == '\v' || buf[p] == '\f'))
    return -5;
  hdr->data_off = p + 1;
  int64_t need = (int64_t)hdr->w * hdr->h * hdr->channels;
  if (hdr->data_off + need > len) return -4;
  return 0;
}

struct PngCtx {
  png_structp png = nullptr;
  png_infop info = nullptr;
  ~PngCtx() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
  }
};

int png_open(const uint8_t* buf, int64_t len, MemReader* reader, PngCtx* ctx,
             uint32_t* w, uint32_t* h, int* channels, int* bit_depth) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return -1;
  ctx->png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!ctx->png) return -2;
  ctx->info = png_create_info_struct(ctx->png);
  if (!ctx->info) return -2;
  if (setjmp(png_jmpbuf(ctx->png))) return -3;
  reader->data = buf;
  reader->len = (size_t)len;
  reader->pos = 0;
  png_set_read_fn(ctx->png, reader, png_mem_read);
  png_read_info(ctx->png, ctx->info);
  *w = png_get_image_width(ctx->png, ctx->info);
  *h = png_get_image_height(ctx->png, ctx->info);
  *bit_depth = png_get_bit_depth(ctx->png, ctx->info);
  int color = png_get_color_type(ctx->png, ctx->info);
  // normalize: palette -> rgb, gray<8 -> 8
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(ctx->png);
  if (color == PNG_COLOR_TYPE_GRAY && *bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(ctx->png);
  if (png_get_valid(ctx->png, ctx->info, PNG_INFO_tRNS))
    png_set_tRNS_to_alpha(ctx->png);
  png_read_update_info(ctx->png, ctx->info);
  *channels = png_get_channels(ctx->png, ctx->info);
  *bit_depth = png_get_bit_depth(ctx->png, ctx->info);
  return 0;
}

}  // namespace

extern "C" {

// ---- .flo ----------------------------------------------------------------

int flo_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h) {
  if (len < 12) return -1;
  float magic;
  std::memcpy(&magic, buf, 4);
  if (magic != kFloMagic) return -2;
  std::memcpy(w, buf + 4, 4);
  std::memcpy(h, buf + 8, 4);
  if (*w <= 0 || *h <= 0 || 12 + (int64_t)*w * *h * 8 > len) return -3;
  return 0;
}

int flo_decode(const uint8_t* buf, int64_t len, float* out) {
  int32_t w, h;
  int rc = flo_probe(buf, len, &w, &h);
  if (rc) return rc;
  std::memcpy(out, buf + 12, (size_t)w * h * 8);
  return 0;
}

// ---- .ppm / .pgm ----------------------------------------------------------

int ppm_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h,
              int32_t* channels) {
  PpmHeader hdr;
  int rc = ppm_parse(buf, len, &hdr);
  if (rc) return rc;
  *w = hdr.w;
  *h = hdr.h;
  *channels = hdr.channels;
  return 0;
}

int ppm_decode(const uint8_t* buf, int64_t len, uint8_t* out) {
  PpmHeader hdr;
  int rc = ppm_parse(buf, len, &hdr);
  if (rc) return rc;
  std::memcpy(out, buf + hdr.data_off,
              (size_t)hdr.w * hdr.h * hdr.channels);
  return 0;
}

// ---- .png ------------------------------------------------------------------

int png_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h,
              int32_t* channels, int32_t* bit_depth) {
  MemReader reader;
  PngCtx ctx;
  uint32_t uw, uh;
  int ch, bd;
  int rc = png_open(buf, len, &reader, &ctx, &uw, &uh, &ch, &bd);
  if (rc) return rc;
  *w = (int32_t)uw;
  *h = (int32_t)uh;
  *channels = ch;
  *bit_depth = bd;
  return 0;
}

// out must hold h*w*channels elements of uint8 (bit_depth 8) or uint16
// (bit_depth 16, host-endian).
int png_decode(const uint8_t* buf, int64_t len, uint8_t* out) {
  MemReader reader;
  PngCtx ctx;
  uint32_t w, h;
  int ch, bd;
  int rc = png_open(buf, len, &reader, &ctx, &w, &h, &ch, &bd);
  if (rc) return rc;
  if (setjmp(png_jmpbuf(ctx.png))) return -3;
  if (bd == 16) {
    png_set_swap(ctx.png);  // big-endian file -> little-endian host
  }
  size_t stride = (size_t)w * ch * (bd == 16 ? 2 : 1);
  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; y++) rows[y] = out + y * stride;
  png_read_image(ctx.png, rows.data());
  png_read_end(ctx.png, nullptr);
  return 0;
}

// ---- fused decode + crop + normalize ---------------------------------------
//
// The per-sample host cost at 448x1024 is ~24 ms of (GIL-free) PNG decode
// plus ~17 ms of GIL-BOUND numpy (normalize_image + np.concatenate), which
// caps the threaded loader at ~23 pairs/s regardless of worker count. This
// entry point does decode -> center-crop -> (x*scale+offset) float32 -> write
// into a channel-strided destination (the [H, W, 6] pair buffer) in one
// GIL-free pass, so the Python side does zero per-pixel work.
//
// dst[(y*tw + x) * pix_stride + c] = src[y0+y, x0+x, c] * scale + offset
// with y0 = (h-th)/2, x0 = (w-tw)/2 (center_crop semantics, datasets.py:36).
//
// Handles 8-bit RGB PNG (incl. palette-expanded) and P6 PPM; returns 0 on
// success, -10 for formats the caller should route to the generic path,
// -11 if the crop exceeds the image.

int image_decode_norm_f32(const uint8_t* buf, int64_t len, float* dst,
                          int64_t pix_stride, int32_t th, int32_t tw,
                          float scale, float offset) {
  // PPM P6 path
  if (len >= 2 && buf[0] == 'P' && buf[1] == '6') {
    PpmHeader hdr;
    int rc = ppm_parse(buf, len, &hdr);
    if (rc) return rc;
    if (th > hdr.h || tw > hdr.w) return -11;
    int64_t y0 = (hdr.h - th) / 2, x0 = (hdr.w - tw) / 2;
    for (int64_t y = 0; y < th; y++) {
      const uint8_t* src =
          buf + hdr.data_off + ((y0 + y) * hdr.w + x0) * 3;
      float* drow = dst + y * tw * pix_stride;
      for (int64_t x = 0; x < tw; x++) {
        drow[x * pix_stride + 0] = src[x * 3 + 0] * scale + offset;
        drow[x * pix_stride + 1] = src[x * 3 + 1] * scale + offset;
        drow[x * pix_stride + 2] = src[x * 3 + 2] * scale + offset;
      }
    }
    return 0;
  }

  // PNG path
  MemReader reader;
  PngCtx ctx;
  uint32_t w, h;
  int ch, bd;
  int rc = png_open(buf, len, &reader, &ctx, &w, &h, &ch, &bd);
  if (rc) return rc;
  if (bd != 8 || ch < 3) return -10;  // generic path handles these
  if (th > (int32_t)h || tw > (int32_t)w) return -11;
  if (setjmp(png_jmpbuf(ctx.png))) return -3;
  if (png_get_interlace_type(ctx.png, ctx.info) != PNG_INTERLACE_NONE)
    return -10;  // interlaced needs full-image reads; rare, generic path
  int64_t y0 = (h - th) / 2, x0 = (w - tw) / 2;
  std::vector<uint8_t> row((size_t)w * ch);
  // rows above the crop must still be decoded (PNG is sequential) but rows
  // below it are simply never read
  for (uint32_t y = 0; (int64_t)y < y0 + th; y++) {
    png_read_row(ctx.png, row.data(), nullptr);
    if ((int64_t)y < y0) continue;
    const uint8_t* src = row.data() + x0 * ch;
    float* drow = dst + (y - y0) * tw * pix_stride;
    for (int64_t x = 0; x < tw; x++) {
      drow[x * pix_stride + 0] = src[x * ch + 0] * scale + offset;
      drow[x * pix_stride + 1] = src[x * ch + 1] * scale + offset;
      drow[x * pix_stride + 2] = src[x * ch + 2] * scale + offset;
    }
  }
  return 0;
}

}  // extern "C"
