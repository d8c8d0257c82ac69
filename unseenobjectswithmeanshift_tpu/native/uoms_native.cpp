// Native host-side runtime for the TPU framework.
//
// The reference's native layer is a CUDA attention kernel (which lives on the
// TPU as a Pallas kernel here); the HOST-side hot loops - image preprocessing
// feeding the device and the evaluation inner loops that score whole datasets -
// are implemented natively here (this box drives the TPU from a single CPU
// core, so interpreter overhead on these paths directly costs benchmark time).
//
// Exposed via a C ABI for ctypes (no pybind11 in the image):
//   preprocess_rgbd: fused BGR u8 -> normalized float + depth(mm u16) -> XYZ
//   seg2bmap:        1-px boundary map (ref: lib/utils/evaluation.py:15-72)
//   boundary_overlap_counts: dilated-boundary true positives (ref :75-106)
//   pairwise_mask_stats: per gt/pred label-pair intersections + sizes
//
// Build: see build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// Fused preprocessing: BGR uint8 [H,W,3] -> float32 (x/255 - mean/255),
// depth uint16 (mm) -> float32 XYZ via intrinsics. Either output may be null.
void preprocess_rgbd(const uint8_t* bgr, const uint16_t* depth_mm,
                     int h, int w,
                     float fx, float fy, float px, float py,
                     const float* pixel_means_bgr,
                     float* out_img, float* out_xyz) {
  const float inv255 = 1.0f / 255.0f;
  float m0 = 0, m1 = 0, m2 = 0;
  if (pixel_means_bgr) {
    m0 = pixel_means_bgr[0] * inv255;
    m1 = pixel_means_bgr[1] * inv255;
    m2 = pixel_means_bgr[2] * inv255;
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      if (out_img && bgr) {
        out_img[3 * i + 0] = bgr[3 * i + 0] * inv255 - m0;
        out_img[3 * i + 1] = bgr[3 * i + 1] * inv255 - m1;
        out_img[3 * i + 2] = bgr[3 * i + 2] * inv255 - m2;
      }
      if (out_xyz && depth_mm) {
        const float z = depth_mm[i] * 1e-3f;
        out_xyz[3 * i + 0] = (x - px) * z / fx;
        out_xyz[3 * i + 1] = (y - py) * z / fy;
        out_xyz[3 * i + 2] = z;
      }
    }
  }
}

// 1-pixel boundary map, boundaries offset 1/2 px toward the origin
// (David Martin's bmap; matches lib/utils/evaluation.py seg2bmap).
void seg2bmap(const uint8_t* seg, int h, int w, uint8_t* bmap) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      const uint8_t s = seg[i] ? 1 : 0;
      const uint8_t e = (x + 1 < w) ? (seg[i + 1] ? 1 : 0) : 0;
      const uint8_t so = (y + 1 < h) ? (seg[i + w] ? 1 : 0) : 0;
      const uint8_t se = (x + 1 < w && y + 1 < h) ? (seg[i + w + 1] ? 1 : 0) : 0;
      uint8_t b;
      if (y == h - 1 && x == w - 1) {
        b = 0;
      } else if (y == h - 1) {
        b = s ^ e;
      } else if (x == w - 1) {
        b = s ^ so;
      } else {
        b = (s ^ e) | (s ^ so) | (s ^ se);
      }
      bmap[i] = b;
    }
  }
}

static void dilate_disk(const uint8_t* src, int h, int w, int r, uint8_t* dst) {
  // binary dilation with a disk structuring element (x^2 + y^2 <= r^2)
  std::vector<std::pair<int, int>> offs;
  for (int dy = -r; dy <= r; ++dy)
    for (int dx = -r; dx <= r; ++dx)
      if (dx * dx + dy * dy <= r * r) offs.emplace_back(dy, dx);
  std::memset(dst, 0, (size_t)h * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      if (!src[y * w + x]) continue;
      for (auto& o : offs) {
        const int yy = y + o.first, xx = x + o.second;
        if (yy >= 0 && yy < h && xx >= 0 && xx < w) dst[yy * w + xx] = 1;
      }
    }
  }
}

// Dilated-boundary true positives (ref: boundary_overlap,
// lib/utils/evaluation.py:75-106). Returns via out2: [precision_tp, recall_tp].
void boundary_overlap_counts(const uint8_t* pred, const uint8_t* gt,
                             int h, int w, int bound_pix, int64_t* out2) {
  std::vector<uint8_t> fgb((size_t)h * w), gtb((size_t)h * w);
  std::vector<uint8_t> fgd((size_t)h * w), gtd((size_t)h * w);
  seg2bmap(pred, h, w, fgb.data());
  seg2bmap(gt, h, w, gtb.data());
  dilate_disk(gtb.data(), h, w, bound_pix, gtd.data());
  dilate_disk(fgb.data(), h, w, bound_pix, fgd.data());
  int64_t ptp = 0, rtp = 0;
  for (int i = 0; i < h * w; ++i) {
    if (fgb[i] && gtd[i]) ++ptp;
    if (gtb[i] && fgd[i]) ++rtp;
  }
  out2[0] = ptp;
  out2[1] = rtp;
}

// Pairwise intersections + label sizes in ONE pass over the images.
// pred/gt: int32 [H*W] label images; ng/np_: number of gt/pred labels;
// gt_ids/pred_ids: sorted label values. Outputs:
//   inter [ng*np_] int64, gt_sizes [ng], pred_sizes [np_].
void pairwise_mask_stats(const int32_t* pred, const int32_t* gt, int n,
                         const int32_t* gt_ids, int ng,
                         const int32_t* pred_ids, int np_,
                         int64_t* inter, int64_t* gt_sizes, int64_t* pred_sizes) {
  const int32_t max_id = 4096;
  std::vector<int16_t> gmap(max_id + 1, -1), pmap(max_id + 1, -1);
  for (int i = 0; i < ng; ++i)
    if (gt_ids[i] >= 0 && gt_ids[i] <= max_id) gmap[gt_ids[i]] = (int16_t)i;
  for (int i = 0; i < np_; ++i)
    if (pred_ids[i] >= 0 && pred_ids[i] <= max_id) pmap[pred_ids[i]] = (int16_t)i;
  std::memset(inter, 0, sizeof(int64_t) * (size_t)ng * np_);
  std::memset(gt_sizes, 0, sizeof(int64_t) * ng);
  std::memset(pred_sizes, 0, sizeof(int64_t) * np_);
  for (int i = 0; i < n; ++i) {
    const int32_t g = gt[i], p = pred[i];
    const int gi = (g >= 0 && g <= max_id) ? gmap[g] : -1;
    const int pi = (p >= 0 && p <= max_id) ? pmap[p] : -1;
    if (gi >= 0) ++gt_sizes[gi];
    if (pi >= 0) ++pred_sizes[pi];
    if (gi >= 0 && pi >= 0) ++inter[(size_t)gi * np_ + pi];
  }
}

// LZF decompression (the PCL binary_compressed PCD codec; semantics identical
// to data/pcd.py _lzf_decompress, the Python fallback/oracle). Returns bytes
// written, or -1 on a malformed stream (out-of-range back reference /
// truncated input). Stops once out_len bytes are produced.
int64_t lzf_decompress(const uint8_t* in, int64_t in_len,
                       uint8_t* out, int64_t out_len) {
  int64_t i = 0, o = 0;
  while (i < in_len && o < out_len) {
    const uint32_t ctrl = in[i++];
    if (ctrl < 32) {               // literal run of ctrl+1 bytes
      int64_t cnt = (int64_t)ctrl + 1;
      if (i + cnt > in_len) cnt = in_len - i;          // truncated tail
      if (o + cnt > out_len) cnt = out_len - o;
      std::memcpy(out + o, in + i, (size_t)cnt);
      i += cnt; o += cnt;
    } else {                       // back reference
      int64_t len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return -1;
        len += in[i++];
      }
      if (i >= in_len) return -1;
      int64_t ref = o - (((int64_t)(ctrl & 0x1F)) << 8) - in[i++] - 1;
      if (ref < 0) return -1;
      for (int64_t k = 0; k < len + 2 && o < out_len; ++k)
        out[o++] = out[ref++];     // may overlap the output tail (RLE)
    }
  }
  return o;
}

}  // extern "C"
