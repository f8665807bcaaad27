// Host-side greedy NMS / soft-NMS kernels (C ABI, loaded via ctypes).
//
// TPU-native replacement for the reference's torch extension
// (`lfd/model/utils/build/nms/src/cpu/nms_cpu.cpp`): the device hot path is
// the jnp/Pallas NMS; this library accelerates the numpy `nms()` public API
// used by host-side tooling (evaluation post-processing, packing checks).
// Same greedy semantics: sort by score desc, suppress IoU > thr,
// exclusive-area IoU.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// dets: (k, 5) float32 rows [x1, y1, x2, y2, score], row-major.
// keep_out: preallocated int64[k]; returns number of kept rows.
int lfd_nms(const float* dets, int k, float iou_thr, int64_t* keep_out) {
  if (k <= 0) return 0;
  std::vector<int> order(k);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });
  std::vector<float> area(k);
  for (int i = 0; i < k; ++i) {
    area[i] = (dets[i * 5 + 2] - dets[i * 5 + 0]) *
              (dets[i * 5 + 3] - dets[i * 5 + 1]);
  }
  std::vector<char> suppressed(k, 0);
  int n_keep = 0;
  for (int oi = 0; oi < k; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float ix1 = dets[i * 5 + 0], iy1 = dets[i * 5 + 1];
    const float ix2 = dets[i * 5 + 2], iy2 = dets[i * 5 + 3];
    for (int oj = oi + 1; oj < k; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float xx1 = std::max(ix1, dets[j * 5 + 0]);
      const float yy1 = std::max(iy1, dets[j * 5 + 1]);
      const float xx2 = std::min(ix2, dets[j * 5 + 2]);
      const float yy2 = std::min(iy2, dets[j * 5 + 3]);
      const float w = std::max(0.0f, xx2 - xx1);
      const float h = std::max(0.0f, yy2 - yy1);
      const float inter = w * h;
      const float iou = inter / (area[i] + area[j] - inter);
      if (iou > iou_thr) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Soft-NMS (linear=1 / gaussian=2). dets modified in place: surviving rows
// are compacted to the front with decayed scores; keep_out receives their
// original indices. Returns the survivor count.
int lfd_soft_nms(float* dets, int k, float iou_thr, int method, float sigma,
                 float min_score, int64_t* keep_out) {
  if (k <= 0) return 0;
  std::vector<float> box(static_cast<size_t>(k) * 4);
  std::vector<float> score(k);
  std::vector<int64_t> idx(k);
  for (int i = 0; i < k; ++i) {
    for (int c = 0; c < 4; ++c) box[i * 4 + c] = dets[i * 5 + c];
    score[i] = dets[i * 5 + 4];
    idx[i] = i;
  }
  std::vector<char> active(k, 1);
  int n_keep = 0;
  int remaining = k;
  while (remaining > 0) {
    int best = -1;
    float best_s = -1.0f;
    for (int i = 0; i < k; ++i) {
      if (active[i] && score[i] > best_s) {
        best_s = score[i];
        best = i;
      }
    }
    if (best < 0) break;
    for (int c = 0; c < 4; ++c) dets[n_keep * 5 + c] = box[best * 4 + c];
    dets[n_keep * 5 + 4] = score[best];
    keep_out[n_keep++] = idx[best];
    active[best] = 0;
    --remaining;
    const float bx1 = box[best * 4 + 0], by1 = box[best * 4 + 1];
    const float bx2 = box[best * 4 + 2], by2 = box[best * 4 + 3];
    const float barea = (bx2 - bx1) * (by2 - by1);
    for (int i = 0; i < k; ++i) {
      if (!active[i]) continue;
      const float xx1 = std::max(bx1, box[i * 4 + 0]);
      const float yy1 = std::max(by1, box[i * 4 + 1]);
      const float xx2 = std::min(bx2, box[i * 4 + 2]);
      const float yy2 = std::min(by2, box[i * 4 + 3]);
      const float w = std::max(0.0f, xx2 - xx1);
      const float h = std::max(0.0f, yy2 - yy1);
      const float inter = w * h;
      const float iarea =
          (box[i * 4 + 2] - box[i * 4 + 0]) * (box[i * 4 + 3] - box[i * 4 + 1]);
      const float denom = barea + iarea - inter;
      const float iou = denom > 0.0f ? inter / denom : 0.0f;
      float decay = 1.0f;
      if (method == 1) {
        if (iou > iou_thr) decay = 1.0f - iou;
      } else if (method == 2) {
        decay = std::exp(-(iou * iou) / sigma);
      }
      score[i] *= decay;
      if (score[i] < min_score) {
        active[i] = 0;
        --remaining;
      }
    }
  }
  return n_keep;
}

}  // extern "C"
