// Native geometry kernels for the evaluation layer.
//
// Replaces the role of open3d's C++ core in the reference evaluation stack
// (TSDF fusion / meshing / point metrics — reference
// evaluation/evaluation_utils.py:160-227,447-512 use open3d, which is not
// available in this environment). Exposed through a plain C ABI consumed via
// ctypes (nerf_vo_tpu/native/__init__.py); the Python numpy/jax versions in
// evaluation/tsdf.py remain as fallback when the library is not built.
//
// Build: nerf_vo_tpu/native/build.sh  (g++ -O3 -shared, std::thread pool).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned int workers = std::max(1u, std::thread::hardware_concurrency());
  if (n < 1024 || workers == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + workers - 1) / workers;
  for (unsigned int t = 0; t < workers; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Fuse one depth frame into a TSDF grid (voxel-major loop, multithreaded).
// tsdf/weight: [X*Y*Z]; color: [X*Y*Z*3] or null; depth: [H*W];
// color_img: [H*W*3] or null; c2w: [16] row-major OpenCV cam2world.
void tsdf_integrate_frame(float* tsdf, float* weight, float* color,
                          int64_t X, int64_t Y, int64_t Z,
                          const float* origin, float voxel, float trunc,
                          const float* depth, const float* color_img,
                          int64_t H, int64_t W, const float* intr,
                          const float* c2w, float depth_max) {
  // world-to-camera from cam2world
  float R[9], t[3];
  // R = c2w[:3,:3]^T ; t = -R * c2w[:3,3]
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) R[r * 3 + c] = c2w[c * 4 + r];
  for (int r = 0; r < 3; ++r) {
    t[r] = 0.f;
    for (int c = 0; c < 3; ++c) t[r] -= R[r * 3 + c] * c2w[c * 4 + 3];
  }
  const float fx = intr[0], fy = intr[1], cx = intr[2], cy = intr[3];
  const int64_t n = X * Y * Z;

  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t idx = lo; idx < hi; ++idx) {
      int64_t iz = idx % Z;
      int64_t iy = (idx / Z) % Y;
      int64_t ix = idx / (Z * Y);
      float wx = origin[0] + ix * voxel;
      float wy = origin[1] + iy * voxel;
      float wz = origin[2] + iz * voxel;
      float px = R[0] * wx + R[1] * wy + R[2] * wz + t[0];
      float py = R[3] * wx + R[4] * wy + R[5] * wz + t[1];
      float pz = R[6] * wx + R[7] * wy + R[8] * wz + t[2];
      if (pz < 0.05f) continue;
      int64_t u = (int64_t)std::lround(fx * px / pz + cx);
      int64_t v = (int64_t)std::lround(fy * py / pz + cy);
      if (u < 0 || u >= W || v < 0 || v >= H) continue;
      float d = depth[v * W + u];
      if (d <= 0.f || d >= depth_max) continue;
      float sdf = d - pz;
      if (sdf <= -trunc) continue;
      float tn = std::min(1.f, std::max(-1.f, sdf / trunc));
      float w0 = weight[idx];
      float w1 = w0 + 1.f;
      tsdf[idx] = (tsdf[idx] * w0 + tn) / w1;
      if (color && color_img) {
        for (int c = 0; c < 3; ++c) {
          color[idx * 3 + c] =
              (color[idx * 3 + c] * w0 + color_img[(v * W + u) * 3 + c]) / w1;
        }
      }
      weight[idx] = w1;
    }
  });
}

// Brute-force-free nearest-neighbor distances via a uniform voxel hash grid.
// For each query point, the distance to the nearest reference point
// (searching outward ring by ring). Points: [n*3] float.
void nn_distances(const float* ref, int64_t n_ref, const float* query,
                  int64_t n_query, float cell, float* out) {
  // bounding box of ref
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n_ref; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], ref[i * 3 + d]);
      hi[d] = std::max(hi[d], ref[i * 3 + d]);
    }
  int64_t dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = std::max<int64_t>(
        1, (int64_t)std::floor((hi[d] - lo[d]) / cell) + 1);
  auto cell_of = [&](const float* p, int64_t* c) {
    for (int d = 0; d < 3; ++d) {
      int64_t v = (int64_t)std::floor((p[d] - lo[d]) / cell);
      c[d] = std::min(std::max<int64_t>(v, 0), dims[d] - 1);
    }
  };
  // bucket sort refs by cell (counting sort)
  int64_t n_cells = dims[0] * dims[1] * dims[2];
  std::vector<int32_t> count(n_cells + 1, 0);
  std::vector<int32_t> cell_idx(n_ref);
  for (int64_t i = 0; i < n_ref; ++i) {
    int64_t c[3];
    cell_of(ref + i * 3, c);
    cell_idx[i] = (int32_t)((c[0] * dims[1] + c[1]) * dims[2] + c[2]);
    count[cell_idx[i] + 1]++;
  }
  for (int64_t i = 0; i < n_cells; ++i) count[i + 1] += count[i];
  std::vector<int32_t> order(n_ref);
  {
    std::vector<int32_t> cursor(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < n_ref; ++i) order[cursor[cell_idx[i]]++] = (int32_t)i;
  }

  parallel_for(n_query, [&](int64_t qlo, int64_t qhi) {
    for (int64_t q = qlo; q < qhi; ++q) {
      const float* p = query + q * 3;
      int64_t c[3];
      cell_of(p, c);
      float best = 1e30f;  // squared distance
      int64_t max_ring = dims[0] + dims[1] + dims[2];
      for (int64_t ring = 0; ring <= max_ring; ++ring) {
        // if the best found is closer than the ring's inner boundary, stop
        if (ring > 1) {
          float bound = (ring - 1) * cell;
          if (best < bound * bound) break;
        }
        for (int64_t dx = -ring; dx <= ring; ++dx)
          for (int64_t dy = -ring; dy <= ring; ++dy)
            for (int64_t dz = -ring; dz <= ring; ++dz) {
              if (std::max({std::llabs(dx), std::llabs(dy), std::llabs(dz)}) !=
                  ring)
                continue;  // shell only
              int64_t xx = c[0] + dx, yy = c[1] + dy, zz = c[2] + dz;
              if (xx < 0 || xx >= dims[0] || yy < 0 || yy >= dims[1] ||
                  zz < 0 || zz >= dims[2])
                continue;
              int64_t cid = (xx * dims[1] + yy) * dims[2] + zz;
              for (int32_t k = count[cid]; k < count[cid + 1]; ++k) {
                const float* r = ref + order[k] * 3;
                float dx2 = p[0] - r[0], dy2 = p[1] - r[1], dz2 = p[2] - r[2];
                float d2 = dx2 * dx2 + dy2 * dy2 + dz2 * dz2;
                if (d2 < best) best = d2;
              }
            }
      }
      out[q] = std::sqrt(best);
    }
  });
}

}  // extern "C"
