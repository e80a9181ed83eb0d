// imgpipe: parallel JPEG/PNG decode + Lanczos resize for the extraction host
// path.
//
// Role: the reference's only native component is a batch Caffe feature tool
// (reference: cufacesearch/featurizer/data/extract_nfeatures.cpp) — in the
// TPU-native framework the device does the CNN, and the host bottleneck is
// decoding and resizing thousands of images per second to feed it. This
// library decodes JPEG (libjpeg) and PNG (libpng simplified API) and resizes
// to the 256x256 RGB staging size with a PIL-compatible Lanczos-3 resampler,
// across a std::thread pool, entirely outside the GIL.
//
// C ABI only; Python binds via ctypes (columbiaimagesearch_tpu/native).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ------------------------------------------------------------------ decode

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// min_dim > 0 enables DCT-scaled decode: libjpeg reconstructs at the
// smallest M/8 scale whose short side still covers min_dim, so the IDCT
// works on fewer coefficients (2-4x faster for typical 640x480 -> 256
// pipelines) and the Lanczos pass below finishes the resize. min_dim = 0
// keeps the full-resolution decode (exact-parity mode: bit-identical to
// the reference's full decode + resize,
// reference: cufacesearch/featurizer/sbpycaffe_img_featurizer.py:113-134).
bool decode_jpeg(const uint8_t* buf, size_t len, Image* out,
                 int min_dim = 0) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  if (min_dim > 0) {
    const long base = std::min(cinfo.image_width, cinfo.image_height);
    // Pick the smallest M/8 whose short side covers min_dim, then verify
    // with jpeg_calc_output_dimensions that the library honors it:
    // classic (non-turbo) libjpeg rounds unsupported ratios (only
    // 1/1, 1/2, 1/4, 1/8), which could silently land BELOW the target
    // and force a Lanczos upscale. Bump until the realized output
    // covers min_dim (num = 8 always does).
    for (int num = 1; num <= 8; num++) {
      if (base * num < long(min_dim) * 8 && num < 8) continue;
      cinfo.scale_num = num;
      cinfo.scale_denom = 8;
      jpeg_calc_output_dimensions(&cinfo);
      if (std::min(cinfo.output_width, cinfo.output_height) >=
              JDIMENSION(std::min<long>(min_dim, base)) ||
          num == 8) {
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, len)) return false;
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, Image* out,
                int min_dim = 0) {
  if (len > 3 && buf[0] == 0xFF && buf[1] == 0xD8) {
    return decode_jpeg(buf, len, out, min_dim);
  }
  if (len > 8 && buf[0] == 0x89 && buf[1] == 'P' && buf[2] == 'N' &&
      buf[3] == 'G') {
    return decode_png(buf, len, out);
  }
  // Try both as a fallback.
  return decode_jpeg(buf, len, out, min_dim) || decode_png(buf, len, out);
}

// ------------------------------------------------------------------ resize

// PIL-compatible Lanczos-3: when minifying, the kernel is stretched by the
// scale factor (area-style antialiasing), weights normalized per output
// pixel (Pillow src/libImaging/Resample.c semantics).
inline double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  double pix = M_PI * x;
  return 3.0 * std::sin(pix) * std::sin(pix / 3.0) / (pix * pix);
}

struct Weights {
  int n;                       // max taps per output pixel
  std::vector<int> start;      // first input index per output pixel
  std::vector<int> count;      // live taps per output pixel
  std::vector<float> w;        // [out_size, n] weights
};

// Weights are computed in double (PIL does the kernel math in double
// before quantizing to its int16 fixed point) then stored as float: the
// hot accumulation loops run in float, which auto-vectorizes 2x wider
// than the former double version and stays far inside the PIL-rounding
// tolerance (weights are exact to ~1e-7; pixel error << 1 LSB).
Weights precompute_weights(int in_size, int out_size) {
  Weights ws;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 3.0 * filterscale;
  ws.n = int(std::ceil(support)) * 2 + 1;
  ws.start.resize(out_size);
  ws.count.resize(out_size);
  ws.w.assign(size_t(out_size) * ws.n, 0.0f);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    ws.start[xx] = xmin;
    ws.count[xx] = xmax - xmin;
    double sum = 0.0;
    std::vector<double> tap(xmax - xmin);
    for (int x = xmin; x < xmax; x++) {
      tap[x - xmin] = lanczos3((x - center + 0.5) / filterscale);
      sum += tap[x - xmin];
    }
    for (int k = 0; k < xmax - xmin; k++) {
      ws.w[size_t(xx) * ws.n + k] =
          float(sum != 0.0 ? tap[k] / sum : tap[k]);
    }
  }
  return ws;
}

inline uint8_t clamp8(float v) {
  return uint8_t(std::min(255.0f, std::max(0.0f, v + 0.5f)));
}

// Separable resize to target x target RGB. Horizontal pass writes float
// rows [in.h, target*3]; the vertical pass is a contiguous row-AXPY over
// those rows (unit stride across the full 3*target floats -> the
// compiler vectorizes it), finishing with one clamp/store sweep.
void resize_lanczos(const Image& in, int target, uint8_t* out) {
  Weights wx = precompute_weights(in.w, target);
  Weights wy = precompute_weights(in.h, target);
  const int row_f = target * 3;
  std::vector<float> tmp(size_t(in.h) * row_f);
  for (int y = 0; y < in.h; y++) {
    const uint8_t* row = in.rgb.data() + size_t(y) * in.w * 3;
    float* trow = tmp.data() + size_t(y) * row_f;
    for (int xx = 0; xx < target; xx++) {
      float a0 = 0.f, a1 = 0.f, a2 = 0.f;
      const int x0 = wx.start[xx], cnt = wx.count[xx];
      const float* wrow = wx.w.data() + size_t(xx) * wx.n;
      const uint8_t* p = row + size_t(x0) * 3;
      for (int k = 0; k < cnt; k++, p += 3) {
        const float wv = wrow[k];
        a0 += wv * p[0];
        a1 += wv * p[1];
        a2 += wv * p[2];
      }
      trow[size_t(xx) * 3 + 0] = a0;
      trow[size_t(xx) * 3 + 1] = a1;
      trow[size_t(xx) * 3 + 2] = a2;
    }
  }
  // Vertical pass: acc[0:3*target] += w_k * tmp_row(y0+k) — contiguous.
  std::vector<float> acc(row_f);
  for (int yy = 0; yy < target; yy++) {
    const int y0 = wy.start[yy], cnt = wy.count[yy];
    const float* wcol = wy.w.data() + size_t(yy) * wy.n;
    std::fill(acc.begin(), acc.end(), 0.f);
    for (int k = 0; k < cnt; k++) {
      const float wv = wcol[k];
      const float* p = tmp.data() + size_t(y0 + k) * row_f;
      for (int j = 0; j < row_f; j++) acc[j] += wv * p[j];
    }
    uint8_t* orow = out + size_t(yy) * row_f;
    for (int j = 0; j < row_f; j++) orow[j] = clamp8(acc[j]);
  }
}

}  // namespace

extern "C" {

// Decode + resize a batch. out must hold n*target*target*3 bytes.
// status[i]: 0 ok, -1 decode failed, -2 empty input.
// dct_min_dim > 0 decodes JPEGs DCT-scaled to a short side >= dct_min_dim
// before the Lanczos pass (2-4x faster per core); 0 = full-res decode
// (exact parity with the reference preprocess).
int imgpipe_process_batch_v2(const uint8_t* const* bufs, const int64_t* lens,
                             int n, int target, uint8_t* out,
                             int32_t* status, int n_threads,
                             int dct_min_dim) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (lens[i] <= 0) {
        status[i] = -2;
        continue;
      }
      Image img;
      if (!decode_any(bufs[i], size_t(lens[i]), &img, dct_min_dim)) {
        status[i] = -1;
        continue;
      }
      resize_lanczos(img, target, out + size_t(i) * target * target * 3);
      status[i] = 0;
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  int ok = 0;
  for (int i = 0; i < n; i++) ok += (status[i] == 0);
  return ok;
}

int imgpipe_process_batch(const uint8_t* const* bufs, const int64_t* lens,
                          int n, int target, uint8_t* out, int32_t* status,
                          int n_threads) {
  return imgpipe_process_batch_v2(bufs, lens, n, target, out, status,
                                  n_threads, /*dct_min_dim=*/0);
}

// ------------------------------------------------- coefficient extraction
//
// Host half of the DEVICE-SIDE decode path: entropy (Huffman) decode only —
// the serial, unparallelizable part of JPEG — emitting quantized DCT
// coefficients; dequant + IDCT + chroma upsample + color conversion +
// resize all run on the TPU as batched matmuls
// (columbiaimagesearch_tpu/models/jpeg_device.py). This attacks the
// extraction-e2e bottleneck: the full host decode costs ~3x the entropy
// decode alone per core, and everything after the entropy stage is
// MXU-shaped work.
//
// Only baseline/progressive YCbCr 4:2:0 (and 4:4:4, upgraded to one
// block-grid by flagging) 3-component JPEGs are handled; anything else
// returns status -3 and the caller routes that image through the pixel
// path (decode_resize_batch).
//
// Per image, the low-frequency msub x msub corner of every 8x8 block is
// emitted in natural (row-major) order — the only part the device IDCT
// uses when reconstructing at msub/8 scale (same spectral truncation as
// libjpeg scale_num/scale_denom) — padded into a fixed [max_bh, max_bw]
// luma block grid so the batch is one static-shape device upload.
//
// Layouts (C-contiguous):
//   ycoef  int16  [n, max_bh, max_bw, msub*msub]
//   ccoef  int16  [n, 2, max_bh/2, max_bw/2, msub*msub]  (4:2:0 grid)
//   qtab   uint16 [n, 2, msub*msub]   (luma table, chroma table)
//   dims   int32  [n, 6]  h, w, bh, bw, cbh, cbw  (actual, pre-padding)
//   status int32  [n]     0 ok; -1 decode fail; -2 empty; -3 unsupported;
//                         -4 grid exceeds bucket

extern "C" int imgpipe_read_coeffs_batch(
    const uint8_t* const* bufs, const int64_t* lens, int n, int msub,
    int max_bh, int max_bw, int16_t* ycoef, int16_t* ccoef, uint16_t* qtab,
    int32_t* dims, int32_t* status, int n_threads) {
  if (n <= 0) return 0;
  if (msub < 1) msub = 1;
  if (msub > 8) msub = 8;
  const int m2 = msub * msub;
  const int cbh_max = max_bh / 2, cbw_max = max_bw / 2;
  const size_t ystride = size_t(max_bh) * max_bw * m2;
  const size_t cstride = size_t(2) * cbh_max * cbw_max * m2;
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int16_t* yout = ycoef + size_t(i) * ystride;
      int16_t* cout_ = ccoef + size_t(i) * cstride;
      memset(yout, 0, ystride * sizeof(int16_t));
      memset(cout_, 0, cstride * sizeof(int16_t));
      memset(qtab + size_t(i) * 2 * m2, 0, 2 * m2 * sizeof(uint16_t));
      memset(dims + size_t(i) * 6, 0, 6 * sizeof(int32_t));
      if (lens[i] <= 0) {
        status[i] = -2;
        continue;
      }
      if (!(lens[i] > 3 && bufs[i][0] == 0xFF && bufs[i][1] == 0xD8)) {
        status[i] = -3;  // not a JPEG (PNG etc. -> pixel path)
        continue;
      }
      jpeg_decompress_struct cinfo;
      JpegErr jerr;
      cinfo.err = jpeg_std_error(&jerr.mgr);
      jerr.mgr.error_exit = jpeg_err_exit;
      if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        status[i] = -1;
        continue;
      }
      jpeg_create_decompress(&cinfo);
      jpeg_mem_src(&cinfo, const_cast<uint8_t*>(bufs[i]),
                   static_cast<unsigned long>(lens[i]));
      if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        status[i] = -1;
        continue;
      }
      const bool ycc420 =
          cinfo.num_components == 3 &&
          cinfo.jpeg_color_space == JCS_YCbCr &&
          cinfo.comp_info[0].h_samp_factor == 2 &&
          cinfo.comp_info[0].v_samp_factor == 2 &&
          cinfo.comp_info[1].h_samp_factor == 1 &&
          cinfo.comp_info[1].v_samp_factor == 1 &&
          cinfo.comp_info[2].h_samp_factor == 1 &&
          cinfo.comp_info[2].v_samp_factor == 1;
      if (!ycc420) {
        jpeg_destroy_decompress(&cinfo);
        status[i] = -3;
        continue;
      }
      jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);
      if (coefs == nullptr) {
        jpeg_destroy_decompress(&cinfo);
        status[i] = -1;
        continue;
      }
      const int bh = cinfo.comp_info[0].height_in_blocks;
      const int bw = cinfo.comp_info[0].width_in_blocks;
      const int cbh = cinfo.comp_info[1].height_in_blocks;
      const int cbw = cinfo.comp_info[1].width_in_blocks;
      if (bh > max_bh || bw > max_bw || cbh > cbh_max || cbw > cbw_max) {
        jpeg_finish_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        status[i] = -4;
        continue;
      }
      // Quant tables (natural order in libjpeg's JQUANT_TBL): emit the
      // msub x msub corner. Cb/Cr share one output slot — 4:2:0 JPEGs in
      // the wild always share a chroma table; if they differ we bail to
      // the pixel path rather than decode wrong colors.
      const JQUANT_TBL* qt0 =
          cinfo.quant_tbl_ptrs[cinfo.comp_info[0].quant_tbl_no];
      const JQUANT_TBL* qt1 =
          cinfo.quant_tbl_ptrs[cinfo.comp_info[1].quant_tbl_no];
      const JQUANT_TBL* qt2 =
          cinfo.quant_tbl_ptrs[cinfo.comp_info[2].quant_tbl_no];
      if (qt0 == nullptr || qt1 == nullptr || qt2 == nullptr ||
          memcmp(qt1->quantval, qt2->quantval, sizeof(qt1->quantval)) != 0) {
        jpeg_finish_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        status[i] = -3;
        continue;
      }
      uint16_t* qout = qtab + size_t(i) * 2 * m2;
      for (int u = 0; u < msub; u++) {
        for (int v = 0; v < msub; v++) {
          qout[u * msub + v] = qt0->quantval[u * 8 + v];
          qout[m2 + u * msub + v] = qt1->quantval[u * 8 + v];
        }
      }
      int32_t* dout = dims + size_t(i) * 6;
      dout[0] = cinfo.image_height;
      dout[1] = cinfo.image_width;
      dout[2] = bh;
      dout[3] = bw;
      dout[4] = cbh;
      dout[5] = cbw;
      // Copy the msub x msub corner of every block (blocks are natural
      // row-major order after entropy decode, jdhuff.c writes through
      // jpeg_natural_order).
      for (int ci = 0; ci < 3; ci++) {
        const int nbh = ci == 0 ? bh : cbh;
        const int nbw = ci == 0 ? bw : cbw;
        const int gw = ci == 0 ? max_bw : cbw_max;
        int16_t* base =
            ci == 0 ? yout
                    : cout_ + size_t(ci - 1) * cbh_max * cbw_max * m2;
        for (int by = 0; by < nbh; by++) {
          JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
              reinterpret_cast<j_common_ptr>(&cinfo), coefs[ci], by, 1,
              FALSE);
          for (int bx = 0; bx < nbw; bx++) {
            const JCOEF* blk = rows[0][bx];
            int16_t* dst = base + (size_t(by) * gw + bx) * m2;
            for (int u = 0; u < msub; u++) {
              for (int v = 0; v < msub; v++) {
                dst[u * msub + v] = blk[u * 8 + v];
              }
            }
          }
        }
      }
      jpeg_finish_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      status[i] = 0;
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  int ok = 0;
  for (int i = 0; i < n; i++) ok += (status[i] == 0);
  return ok;
}

// Version/self-test hook.
int imgpipe_version() { return 3; }

}  // extern "C"
