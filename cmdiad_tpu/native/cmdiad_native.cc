// Native host-side runtime for cmdiad_tpu.
//
// The reference delegates its host-side hot loops to external native code
// (Open3D's C++ RANSAC/DBSCAN, PIL/torch C kernels, CUDA extensions).  This
// library provides the TPU build's native equivalents for the data/preprocess
// path — the device compute path is JAX/XLA/Pallas:
//
//   tiff_decode_f32    uncompressed little-endian float32 stripped TIFF
//                      (the MVTec 3D-AD organized-pc format) -> HWC buffer
//   nearest_resize_f32 torch-'nearest' HWC resize (loader hot path)
//   ransac_plane       batched-sample RANSAC plane fit (preprocess)
//   dbscan             grid-hashed DBSCAN for 3-D points (preprocess);
//                      O(N) neighbour candidates via 27-cell voxel hash
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: see build.sh / the loader in cmdiad_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdio>
#include <algorithm>
#include <random>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// TIFF decode (uncompressed fast path)
// ---------------------------------------------------------------------------

// Parses the first IFD of a little-endian classic TIFF.  Returns 0 on
// success; fills height/width/channels and copies float32 pixel data into
// `out` (caller allocates h*w*c floats after a probe call with out=nullptr).
int tiff_probe_f32(const uint8_t* data, int64_t size,
                   int64_t* height, int64_t* width, int64_t* channels) {
  if (size < 8 || data[0] != 'I' || data[1] != 'I') return -1;
  uint16_t magic;
  std::memcpy(&magic, data + 2, 2);
  if (magic != 42) return -2;
  uint32_t ifd_off;
  std::memcpy(&ifd_off, data + 4, 4);
  if (ifd_off + 2 > size) return -3;
  uint16_t n_tags;
  std::memcpy(&n_tags, data + ifd_off, 2);
  int64_t h = 0, w = 0, c = 1;
  uint16_t bits = 0, comp = 1, fmt = 1, planar = 1, predictor = 1;
  for (int i = 0; i < n_tags; ++i) {
    const uint8_t* e = data + ifd_off + 2 + i * 12;
    uint16_t tag, typ;
    uint32_t count, val;
    std::memcpy(&tag, e, 2);
    std::memcpy(&typ, e + 2, 2);
    std::memcpy(&count, e + 4, 4);
    std::memcpy(&val, e + 8, 4);
    uint32_t v = (typ == 3) ? (val & 0xffff) : val;
    switch (tag) {
      case 256: w = v; break;
      case 257: h = v; break;
      case 258: bits = (count == 1) ? v : 0; break;  // multi -> offset, read below
      case 259: comp = v; break;
      case 277: c = v; break;
      case 284: planar = v; break;
      case 317: predictor = v; break;
      case 339: fmt = (count == 1) ? v : 0; break;
    }
  }
  if (comp != 1) return -4;      // compressed: python fallback handles it
  if (planar != 1) return -9;    // planar layout: python fallback rejects too
  if (predictor != 1) return -10;  // differenced data: python fallback decodes
  if (h <= 0 || w <= 0) return -5;
  *height = h; *width = w; *channels = c;
  return 0;
}

int tiff_decode_f32(const uint8_t* data, int64_t size, float* out,
                    int64_t out_count) {
  int64_t h, w, c;
  int rc = tiff_probe_f32(data, size, &h, &w, &c);
  if (rc != 0) return rc;
  uint32_t ifd_off;
  std::memcpy(&ifd_off, data + 4, 4);
  uint16_t n_tags;
  std::memcpy(&n_tags, data + ifd_off, 2);

  std::vector<uint64_t> offsets, counts;
  uint16_t bits = 32, fmt = 3;
  for (int i = 0; i < n_tags; ++i) {
    const uint8_t* e = data + ifd_off + 2 + i * 12;
    uint16_t tag, typ;
    uint32_t count, val;
    std::memcpy(&tag, e, 2);
    std::memcpy(&typ, e + 2, 2);
    std::memcpy(&count, e + 4, 4);
    std::memcpy(&val, e + 8, 4);
    auto read_array = [&](std::vector<uint64_t>* vec) {
      vec->resize(count);
      int elem = (typ == 3) ? 2 : 4;
      const uint8_t* src = (count * elem <= 4) ? e + 8 : data + val;
      for (uint32_t k = 0; k < count; ++k) {
        if (typ == 3) {
          uint16_t x; std::memcpy(&x, src + 2 * k, 2); (*vec)[k] = x;
        } else {
          uint32_t x; std::memcpy(&x, src + 4 * k, 4); (*vec)[k] = x;
        }
      }
    };
    if (tag == 273) read_array(&offsets);
    if (tag == 279) read_array(&counts);
    if (tag == 258) {
      if (count == 1) bits = (typ == 3) ? (val & 0xffff) : val;
      else { std::vector<uint64_t> tmp; read_array(&tmp); bits = tmp[0]; }
    }
    if (tag == 339) {
      if (count == 1) fmt = (typ == 3) ? (val & 0xffff) : val;
      else { std::vector<uint64_t> tmp; read_array(&tmp); fmt = tmp[0]; }
    }
  }
  int64_t total = h * w * c;
  if (out_count < total) return -6;

  int64_t written = 0;
  for (size_t s = 0; s < offsets.size(); ++s) {
    const uint8_t* strip = data + offsets[s];
    int64_t bytes = counts[s];
    if (fmt == 3 && bits == 32) {
      int64_t vals = bytes / 4;
      vals = std::min(vals, total - written);
      std::memcpy(out + written, strip, vals * 4);
      written += vals;
    } else if (fmt == 1 && bits == 8) {
      int64_t vals = std::min<int64_t>(bytes, total - written);
      for (int64_t k = 0; k < vals; ++k) out[written + k] = strip[k];
      written += vals;
    } else if (fmt == 1 && bits == 16) {
      int64_t vals = std::min<int64_t>(bytes / 2, total - written);
      for (int64_t k = 0; k < vals; ++k) {
        uint16_t x; std::memcpy(&x, strip + 2 * k, 2);
        out[written + k] = x;
      }
      written += vals;
    } else {
      return -7;
    }
  }
  return written == total ? 0 : -8;
}

// ---------------------------------------------------------------------------
// torch-'nearest' HWC resize
// ---------------------------------------------------------------------------

void nearest_resize_f32(const float* src, int64_t ih, int64_t iw, int64_t c,
                        float* dst, int64_t oh, int64_t ow) {
  std::vector<int64_t> ridx(oh), cidx(ow);
  for (int64_t i = 0; i < oh; ++i)
    ridx[i] = std::min<int64_t>((int64_t)(i * (double)ih / oh), ih - 1);
  for (int64_t j = 0; j < ow; ++j)
    cidx[j] = std::min<int64_t>((int64_t)(j * (double)iw / ow), iw - 1);
  for (int64_t i = 0; i < oh; ++i) {
    const float* row = src + ridx[i] * iw * c;
    float* drow = dst + i * ow * c;
    for (int64_t j = 0; j < ow; ++j)
      std::memcpy(drow + j * c, row + cidx[j] * c, c * sizeof(float));
  }
}

// ---------------------------------------------------------------------------
// RANSAC plane fit (preprocess)
// ---------------------------------------------------------------------------

static void plane_from_points(const float* pts, const int64_t* idx, int64_t k,
                              double* normal, double* d) {
  double cx = 0, cy = 0, cz = 0;
  for (int64_t i = 0; i < k; ++i) {
    const float* p = pts + 3 * idx[i];
    cx += p[0]; cy += p[1]; cz += p[2];
  }
  cx /= k; cy /= k; cz /= k;
  double xx = 0, xy = 0, xz = 0, yy = 0, yz = 0, zz = 0;
  for (int64_t i = 0; i < k; ++i) {
    const float* p = pts + 3 * idx[i];
    double a = p[0] - cx, b = p[1] - cy, c2 = p[2] - cz;
    xx += a * a; xy += a * b; xz += a * c2;
    yy += b * b; yz += b * c2; zz += c2 * c2;
  }
  // smallest-eigenvector of the 3x3 covariance via cross-product heuristic
  double det_x = yy * zz - yz * yz;
  double det_y = xx * zz - xz * xz;
  double det_z = xx * yy - xy * xy;
  double nx, ny, nz;
  if (det_x >= det_y && det_x >= det_z) {
    nx = det_x; ny = xz * yz - xy * zz; nz = xy * yz - xz * yy;
  } else if (det_y >= det_z) {
    nx = xz * yz - xy * zz; ny = det_y; nz = xy * xz - yz * xx;
  } else {
    nx = xy * yz - xz * yy; ny = xy * xz - yz * xx; nz = det_z;
  }
  double norm = std::sqrt(nx * nx + ny * ny + nz * nz);
  if (norm < 1e-20) { nx = 0; ny = 0; nz = 1; norm = 1; }
  normal[0] = nx / norm; normal[1] = ny / norm; normal[2] = nz / norm;
  *d = -(normal[0] * cx + normal[1] * cy + normal[2] * cz);
}

// points (n,3) float32 -> plane (a,b,c,d) float64
void ransac_plane(const float* pts, int64_t n, double dist_threshold,
                  int64_t ransac_n, int64_t iterations, uint64_t seed,
                  double* plane_out) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int64_t> uni(0, n - 1);
  int64_t k = std::min<int64_t>(ransac_n, n);
  std::vector<int64_t> idx(k);
  double best_plane[4] = {0, 0, 1, 0};
  int64_t best_inliers = -1;
  for (int64_t it = 0; it < iterations; ++it) {
    for (int64_t i = 0; i < k; ++i) idx[i] = uni(rng);
    double nrm[3], d;
    plane_from_points(pts, idx.data(), k, nrm, &d);
    int64_t inl = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float* p = pts + 3 * i;
      double dist = std::fabs(nrm[0] * p[0] + nrm[1] * p[1] + nrm[2] * p[2] + d);
      inl += dist < dist_threshold;
    }
    if (inl > best_inliers) {
      best_inliers = inl;
      best_plane[0] = nrm[0]; best_plane[1] = nrm[1];
      best_plane[2] = nrm[2]; best_plane[3] = d;
    }
  }
  // refit on inliers
  std::vector<int64_t> inl_idx;
  inl_idx.reserve(best_inliers);
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    double dist = std::fabs(best_plane[0] * p[0] + best_plane[1] * p[1] +
                            best_plane[2] * p[2] + best_plane[3]);
    if (dist < dist_threshold) inl_idx.push_back(i);
  }
  if ((int64_t)inl_idx.size() >= 3) {
    double nrm[3], d;
    plane_from_points(pts, inl_idx.data(), inl_idx.size(), nrm, &d);
    plane_out[0] = nrm[0]; plane_out[1] = nrm[1]; plane_out[2] = nrm[2];
    plane_out[3] = d;
  } else {
    std::memcpy(plane_out, best_plane, 4 * sizeof(double));
  }
}

// ---------------------------------------------------------------------------
// grid-hashed DBSCAN (preprocess)
// ---------------------------------------------------------------------------

struct CellKey {
  int64_t x, y, z;
  bool operator==(const CellKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct CellHash {
  size_t operator()(const CellKey& k) const {
    return (size_t)(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
  }
};

// labels out: cluster id per point, -1 = noise
void dbscan(const float* pts, int64_t n, double eps, int64_t min_points,
            int32_t* labels) {
  const double inv = 1.0 / eps;
  std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
  grid.reserve(n / 4 + 1);
  auto cell_of = [&](int64_t i) {
    const float* p = pts + 3 * i;
    return CellKey{(int64_t)std::floor(p[0] * inv),
                   (int64_t)std::floor(p[1] * inv),
                   (int64_t)std::floor(p[2] * inv)};
  };
  for (int64_t i = 0; i < n; ++i) grid[cell_of(i)].push_back((int32_t)i);

  const double eps2 = eps * eps;
  auto neighbors_of = [&](int64_t i, std::vector<int32_t>* out) {
    out->clear();
    const float* p = pts + 3 * i;
    CellKey c = cell_of(i);
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          auto it = grid.find(CellKey{c.x + dx, c.y + dy, c.z + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            const float* q = pts + 3 * j;
            double a = p[0] - q[0], b = p[1] - q[1], cc = p[2] - q[2];
            if (a * a + b * b + cc * cc <= eps2) out->push_back(j);
          }
        }
  };

  std::vector<uint8_t> visited(n, 0);
  std::fill(labels, labels + n, -1);
  std::vector<int32_t> nb, nb2, stack;
  int32_t cluster = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (visited[i]) continue;
    visited[i] = 1;
    neighbors_of(i, &nb);
    if ((int64_t)nb.size() < min_points) continue;  // noise (may be claimed)
    labels[i] = cluster;
    stack.assign(nb.begin(), nb.end());
    while (!stack.empty()) {
      int32_t j = stack.back();
      stack.pop_back();
      if (labels[j] == -1) labels[j] = cluster;  // border point claim
      if (visited[j]) continue;
      visited[j] = 1;
      labels[j] = cluster;
      neighbors_of(j, &nb2);
      if ((int64_t)nb2.size() >= min_points)
        stack.insert(stack.end(), nb2.begin(), nb2.end());
    }
    ++cluster;
  }
}

}  // extern "C"
