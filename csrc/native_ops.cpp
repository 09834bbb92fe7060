// Native runtime ops for simpleaicv_tpu.
//
// The reference ships one native component — the CUDA multi-scale deformable
// attention extension (~1.7k LoC im2col kernels) plus torchvision's native
// NMS. On TPU the hot implementations are Pallas/XLA (ops/msda.py, ops/nms.py);
// this C++ library provides the host-side counterparts:
//   * greedy_nms       — the reference's sequential greedy NMS
//                        (simpleAICV/detection/decode.py:44-106), used as an
//                        independent oracle for the on-device kernel and as a
//                        fast host path for tiny eval batches;
//   * ms_deform_attn   — the bilinear-sampling core with grid_sample
//                        zero-padding/align_corners=False semantics
//                        (mirrors src/cuda/ms_deform_im2col_cuda.cuh's
//                        ms_deform_attn_im2col_bilinear), an oracle for the
//                        XLA core that is independent of both torch and JAX.
//
// Built with `make -C csrc`; loaded through ctypes (simpleaicv_tpu/ops/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// boxes: [n,4] xyxy sorted by score desc; keep_out: [n] int32 (1 keep/0 drop)
void greedy_nms(const float* boxes, int n, float iou_threshold,
                int* keep_out) {
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    areas[i] = std::max(0.f, (b[2] - b[0])) * std::max(0.f, (b[3] - b[1]));
    keep_out[i] = 1;
  }
  for (int i = 0; i < n; ++i) {
    if (!keep_out[i]) continue;
    const float* bi = boxes + 4 * i;
    for (int j = i + 1; j < n; ++j) {
      if (!keep_out[j]) continue;
      const float* bj = boxes + 4 * j;
      float x1 = std::max(bi[0], bj[0]);
      float y1 = std::max(bi[1], bj[1]);
      float x2 = std::min(bi[2], bj[2]);
      float y2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
      float uni = std::max(areas[i] + areas[j] - inter, 1e-4f);
      if (inter / uni >= iou_threshold) keep_out[j] = 0;
    }
  }
}

// value: [S, H, D] for one batch; spatial_shapes: [L,2] (h,w);
// locations: [Lq, H, L, P, 2] normalized [0,1];
// weights: [Lq, H, L, P]; out: [Lq, H*D]
void ms_deform_attn(const float* value, const int* spatial_shapes,
                    const float* locations, const float* weights, int S,
                    int heads, int dim, int Lq, int L, int P, float* out) {
  std::vector<int> level_start(L, 0);
  for (int l = 1; l < L; ++l) {
    level_start[l] = level_start[l - 1] +
                     spatial_shapes[2 * (l - 1)] * spatial_shapes[2 * l - 1];
  }
  for (int q = 0; q < Lq; ++q) {
    for (int h = 0; h < heads; ++h) {
      float* acc = out + (q * heads + h) * dim;
      for (int d = 0; d < dim; ++d) acc[d] = 0.f;
      for (int l = 0; l < L; ++l) {
        const int fh = spatial_shapes[2 * l];
        const int fw = spatial_shapes[2 * l + 1];
        const int start = level_start[l];
        for (int p = 0; p < P; ++p) {
          const int base = (((q * heads + h) * L + l) * P + p);
          const float w = weights[base];
          const float lx = locations[base * 2 + 0] * fw - 0.5f;
          const float ly = locations[base * 2 + 1] * fh - 0.5f;
          const int x0 = static_cast<int>(std::floor(lx));
          const int y0 = static_cast<int>(std::floor(ly));
          const float wx = lx - x0;
          const float wy = ly - y0;
          for (int dy = 0; dy <= 1; ++dy) {
            for (int dx = 0; dx <= 1; ++dx) {
              const int xx = x0 + dx;
              const int yy = y0 + dy;
              if (xx < 0 || xx >= fw || yy < 0 || yy >= fh) continue;
              const float bw = (dx ? wx : 1.f - wx) * (dy ? wy : 1.f - wy);
              const float* v =
                  value + ((start + yy * fw + xx) * heads + h) * dim;
              const float coef = w * bw;
              for (int d = 0; d < dim; ++d) acc[d] += coef * v[d];
            }
          }
        }
      }
    }
  }
}

}  // extern "C"
