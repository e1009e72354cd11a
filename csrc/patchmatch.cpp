// PatchMatch inpainting (Barnes et al., SIGGRAPH'09) — self-contained
// C++ implementation of the reference's external PyPatchMatch library
// (loaded via ctypes in animeinsseg/inpainting/patch_match.py; build
// recipe readme.md:91-105). No OpenCV dependency: pyramid resampling,
// NN-field propagation/random-search and patch voting are implemented
// directly.
//
// exported C API:
//   pm_inpaint(image u8 HxWxC, mask u8 HxW (>0 = hole), h, w, c,
//              patch_size, iterations, out u8 HxWxC)
//
// Multi-scale: coarse-to-fine pyramid (min side ~32); at each level
// the hole is initialized from the coarser solution, then PatchMatch
// alternates propagation and exponential random search, and holes are
// re-synthesized by weighted patch voting.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<float> data;    // h*w*c
  std::vector<uint8_t> hole;  // h*w
  // optional regularity guide (h*w*gc) with metric weight gw
  // (PyPatchMatch inpaint_regularity: ijmap distance joins the patch
  // metric so matches prefer structurally similar grid positions)
  int gc = 0;
  float gw = 0.f;
  std::vector<float> guide;

  float* px(int y, int x) { return &data[(y * w + x) * c]; }
  const float* px(int y, int x) const { return &data[(y * w + x) * c]; }
  const float* gpx(int y, int x) const {
    return &guide[(y * w + x) * gc];
  }
};

Image downsample2(const Image& src) {
  Image dst;
  dst.h = (src.h + 1) / 2;
  dst.w = (src.w + 1) / 2;
  dst.c = src.c;
  dst.data.assign((size_t)dst.h * dst.w * dst.c, 0.f);
  dst.hole.assign((size_t)dst.h * dst.w, 0);
  dst.gc = src.gc;
  dst.gw = src.gw;
  if (src.gc) {
    // guide downsampled by plain 2x2 average (no hole gating — the
    // guide is defined everywhere)
    dst.guide.assign((size_t)dst.h * dst.w * dst.gc, 0.f);
    for (int y = 0; y < dst.h; ++y)
      for (int x = 0; x < dst.w; ++x)
        for (int k = 0; k < dst.gc; ++k) {
          float acc = 0.f;
          int cnt = 0;
          for (int dy = 0; dy < 2; ++dy)
            for (int dx = 0; dx < 2; ++dx) {
              int sy = std::min(2 * y + dy, src.h - 1);
              int sx = std::min(2 * x + dx, src.w - 1);
              acc += src.gpx(sy, sx)[k];
              ++cnt;
            }
          dst.guide[((size_t)y * dst.w + x) * dst.gc + k] = acc / cnt;
        }
  }
  for (int y = 0; y < dst.h; ++y) {
    for (int x = 0; x < dst.w; ++x) {
      float acc[8] = {0};
      float wsum = 0.f;
      int holes = 0, total = 0;
      for (int dy = 0; dy < 2; ++dy) {
        for (int dx = 0; dx < 2; ++dx) {
          int sy = std::min(2 * y + dy, src.h - 1);
          int sx = std::min(2 * x + dx, src.w - 1);
          ++total;
          if (src.hole[sy * src.w + sx]) {
            ++holes;
            continue;
          }
          const float* p = src.px(sy, sx);
          for (int k = 0; k < src.c; ++k) acc[k] += p[k];
          wsum += 1.f;
        }
      }
      if (wsum > 0.f) {
        for (int k = 0; k < dst.c; ++k) dst.px(y, x)[k] = acc[k] / wsum;
      }
      // a coarse pixel is a hole only if all contributors are holes
      dst.hole[y * dst.w + x] = (holes == total) ? 1 : 0;
    }
  }
  return dst;
}

// bilinear upsample of the *hole regions only* from coarse solution
void upsample_into_holes(const Image& coarse, Image& fine) {
  for (int y = 0; y < fine.h; ++y) {
    for (int x = 0; x < fine.w; ++x) {
      if (!fine.hole[y * fine.w + x]) continue;
      float fy = std::min((float)y / 2.f, (float)coarse.h - 1.001f);
      float fx = std::min((float)x / 2.f, (float)coarse.w - 1.001f);
      int y0 = (int)fy, x0 = (int)fx;
      float ay = fy - y0, ax = fx - x0;
      int y1 = std::min(y0 + 1, coarse.h - 1);
      int x1 = std::min(x0 + 1, coarse.w - 1);
      for (int k = 0; k < fine.c; ++k) {
        float v00 = coarse.px(y0, x0)[k], v01 = coarse.px(y0, x1)[k];
        float v10 = coarse.px(y1, x0)[k], v11 = coarse.px(y1, x1)[k];
        fine.px(y, x)[k] = (1 - ay) * ((1 - ax) * v00 + ax * v01) +
                           ay * ((1 - ax) * v10 + ax * v11);
      }
    }
  }
}

struct NNField {
  std::vector<int> ny, nx;
  std::vector<float> cost;
};

float patch_dist(const Image& im, int ay, int ax, int by, int bx, int r,
                 float early_out) {
  float acc = 0.f;
  for (int dy = -r; dy <= r; ++dy) {
    int ay2 = std::clamp(ay + dy, 0, im.h - 1);
    int by2 = std::clamp(by + dy, 0, im.h - 1);
    for (int dx = -r; dx <= r; ++dx) {
      int ax2 = std::clamp(ax + dx, 0, im.w - 1);
      int bx2 = std::clamp(bx + dx, 0, im.w - 1);
      const float* pa = im.px(ay2, ax2);
      const float* pb = im.px(by2, bx2);
      for (int k = 0; k < im.c; ++k) {
        float d = pa[k] - pb[k];
        acc += d * d;
      }
      if (im.gc) {
        const float* ga = im.gpx(ay2, ax2);
        const float* gb = im.gpx(by2, bx2);
        for (int k = 0; k < im.gc; ++k) {
          float d = ga[k] - gb[k];
          acc += im.gw * d * d;
        }
      }
    }
    if (acc > early_out) return acc;
  }
  return acc;
}

void pm_level(Image& im, int patch, int iters, std::mt19937& rng) {
  const int r = patch / 2;
  const int n = im.h * im.w;
  std::vector<int> hole_idx;
  for (int i = 0; i < n; ++i)
    if (im.hole[i]) hole_idx.push_back(i);
  if (hole_idx.empty()) return;

  // collect valid source pixels (patch centers fully outside holes
  // is ideal; accept any non-hole center for robustness)
  std::vector<int> src_idx;
  for (int i = 0; i < n; ++i)
    if (!im.hole[i]) src_idx.push_back(i);
  if (src_idx.empty()) return;

  NNField f;
  f.ny.assign(n, 0);
  f.nx.assign(n, 0);
  f.cost.assign(n, 1e30f);
  std::uniform_int_distribution<int> pick(0, (int)src_idx.size() - 1);
  for (int i : hole_idx) {
    int s = src_idx[pick(rng)];
    f.ny[i] = s / im.w;
    f.nx[i] = s % im.w;
    f.cost[i] = patch_dist(im, i / im.w, i % im.w, f.ny[i], f.nx[i], r,
                           1e30f);
  }

  auto try_improve = [&](int i, int cy, int cx) {
    if (cy < 0 || cy >= im.h || cx < 0 || cx >= im.w) return;
    if (im.hole[cy * im.w + cx]) return;
    float c = patch_dist(im, i / im.w, i % im.w, cy, cx, r, f.cost[i]);
    if (c < f.cost[i]) {
      f.cost[i] = c;
      f.ny[i] = cy;
      f.nx[i] = cx;
    }
  };

  int max_dim = std::max(im.h, im.w);
  for (int it = 0; it < iters; ++it) {
    bool fwd = (it % 2 == 0);
    for (size_t t = 0; t < hole_idx.size(); ++t) {
      int i = hole_idx[fwd ? t : hole_idx.size() - 1 - t];
      int y = i / im.w, x = i % im.w;
      // propagation from scan-order neighbors
      int step = fwd ? -1 : 1;
      for (int axis = 0; axis < 2; ++axis) {
        int py = y + (axis == 0 ? step : 0);
        int px = x + (axis == 1 ? step : 0);
        if (py < 0 || py >= im.h || px < 0 || px >= im.w) continue;
        int j = py * im.w + px;
        if (f.cost[j] < 1e29f) {
          try_improve(i, f.ny[j] - (axis == 0 ? step : 0),
                      f.nx[j] - (axis == 1 ? step : 0));
        }
      }
      // exponential random search around the current match
      for (int radius = max_dim; radius >= 1; radius /= 2) {
        std::uniform_int_distribution<int> d(-radius, radius);
        try_improve(i, f.ny[i] + d(rng), f.nx[i] + d(rng));
      }
    }
    // re-synthesize hole colors by patch voting
    std::vector<float> num((size_t)n * im.c, 0.f);
    std::vector<float> den(n, 0.f);
    for (int i : hole_idx) {
      int y = i / im.w, x = i % im.w;
      int sy = f.ny[i], sx = f.nx[i];
      float wgt = 1.f / (1.f + f.cost[i]);
      for (int dy = -r; dy <= r; ++dy) {
        int ty = y + dy;
        if (ty < 0 || ty >= im.h) continue;
        int qy = std::clamp(sy + dy, 0, im.h - 1);
        for (int dx = -r; dx <= r; ++dx) {
          int tx = x + dx;
          if (tx < 0 || tx >= im.w) continue;
          int j = ty * im.w + tx;
          if (!im.hole[j]) continue;
          int qx = std::clamp(sx + dx, 0, im.w - 1);
          const float* p = im.px(qy, qx);
          for (int k = 0; k < im.c; ++k) num[(size_t)j * im.c + k] += wgt * p[k];
          den[j] += wgt;
        }
      }
    }
    for (int i : hole_idx) {
      if (den[i] > 0.f) {
        for (int k = 0; k < im.c; ++k)
          im.data[(size_t)i * im.c + k] = num[(size_t)i * im.c + k] / den[i];
      }
    }
  }
}

}  // namespace

namespace {

void pm_run(Image& im, int patch_size, int iterations, uint64_t seed,
            uint8_t* out);

}  // namespace

extern "C" {

void pm_inpaint(const uint8_t* image, const uint8_t* mask, int h, int w,
                int c, int patch_size, int iterations, uint64_t seed,
                uint8_t* out) {
  Image im;
  im.h = h;
  im.w = w;
  im.c = c;
  im.data.resize((size_t)h * w * c);
  im.hole.resize((size_t)h * w);
  for (size_t i = 0; i < im.hole.size(); ++i) im.hole[i] = mask[i] > 0;
  for (size_t i = 0; i < im.data.size(); ++i) im.data[i] = image[i];
  for (size_t i = 0; i < im.hole.size(); ++i)
    if (im.hole[i])
      for (int k = 0; k < c; ++k) im.data[i * c + k] = 0.f;
  pm_run(im, patch_size, iterations, seed, out);
}

// PyPatchMatch-compatible regularity variant: an (h, w, gc) float32
// guide map (e.g. the normalized-ij map) joins the patch metric with
// weight guide_weight * 255^2 (the image channels are 0-255 here
// while callers pass a [0,1] ijmap like the reference).
void pm_inpaint_regularity(const uint8_t* image, const uint8_t* mask,
                           const float* ijmap, int h, int w, int c,
                           int gc, int patch_size, int iterations,
                           float guide_weight, uint64_t seed,
                           uint8_t* out) {
  Image im;
  im.h = h;
  im.w = w;
  im.c = c;
  im.data.resize((size_t)h * w * c);
  im.hole.resize((size_t)h * w);
  for (size_t i = 0; i < im.hole.size(); ++i) im.hole[i] = mask[i] > 0;
  for (size_t i = 0; i < im.data.size(); ++i) im.data[i] = image[i];
  for (size_t i = 0; i < im.hole.size(); ++i)
    if (im.hole[i])
      for (int k = 0; k < c; ++k) im.data[i * c + k] = 0.f;
  im.gc = gc;
  im.gw = guide_weight * 255.f * 255.f;
  im.guide.assign(ijmap, ijmap + (size_t)h * w * gc);
  pm_run(im, patch_size, iterations, seed, out);
}

}  // extern "C"

namespace {

void pm_run(Image& im, int patch_size, int iterations, uint64_t seed,
            uint8_t* out) {
  int c = im.c;
  // build pyramid
  std::vector<Image> pyr{im};
  while (std::min(pyr.back().h, pyr.back().w) > 32) {
    pyr.push_back(downsample2(pyr.back()));
  }

  std::mt19937 rng((uint32_t)seed);
  // coarsest: fill holes with mean of valid pixels
  {
    Image& top = pyr.back();
    std::vector<float> mean(c, 0.f);
    int cnt = 0;
    for (int i = 0; i < top.h * top.w; ++i) {
      if (top.hole[i]) continue;
      for (int k = 0; k < c; ++k) mean[k] += top.data[(size_t)i * c + k];
      ++cnt;
    }
    if (cnt) {
      for (int k = 0; k < c; ++k) mean[k] /= cnt;
      for (int i = 0; i < top.h * top.w; ++i)
        if (top.hole[i])
          for (int k = 0; k < c; ++k) top.data[(size_t)i * c + k] = mean[k];
    }
    pm_level(top, patch_size, iterations, rng);
  }
  for (int lv = (int)pyr.size() - 2; lv >= 0; --lv) {
    upsample_into_holes(pyr[lv + 1], pyr[lv]);
    pm_level(pyr[lv], patch_size, iterations, rng);
  }

  const Image& fin = pyr.front();
  for (size_t i = 0; i < fin.data.size(); ++i) {
    float v = fin.data[i];
    out[i] = (uint8_t)std::clamp((int)std::lround(v), 0, 255);
  }
}

}  // namespace
