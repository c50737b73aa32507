// Native host-side kernels for the text2loc_tpu data plane.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-side hot loops that the reference delegated to compiled third-party
// extensions or ran as slow Python:
//   * voxel_downsample    — open3d voxel_down_sample_and_trace equivalent
//                           (reference datapreparation/kitti360pose/
//                           prepare.py:70-83; first-index representative).
//   * fine_object_order   — matched-first object-slot ordering for fine
//                           batches (reference dataloading/kitti360pose/
//                           poses.py:90-121), batched.
//   * pmc_rematch         — the PMC label+closest-offset re-matching scan
//                           (reference poses.py:414-437,458-479) for one
//                           (pose, candidate cell) pair over full clouds.
//
// Pure C ABI for ctypes; no Python.h dependency. Build: `make` in this dir.

#include <cstdint>
#include <cmath>
#include <algorithm>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Voxel-grid downsample: write indices of one representative (lowest original
// index) point per occupied voxel into out_idx; returns the count.
// pts: [n, 3] float64 row-major.
int64_t voxel_downsample(const double* pts, int64_t n, double voxel_size,
                         int64_t* out_idx) {
  if (n <= 0 || voxel_size <= 0) return 0;
  double mn[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 1; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      double v = pts[i * 3 + d];
      if (v < mn[d]) mn[d] = v;
    }
  }
  std::unordered_map<uint64_t, int64_t> first;  // voxel key -> lowest index
  first.reserve(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    uint64_t kx = static_cast<uint64_t>(std::floor((pts[i * 3 + 0] - mn[0]) / voxel_size));
    uint64_t ky = static_cast<uint64_t>(std::floor((pts[i * 3 + 1] - mn[1]) / voxel_size));
    uint64_t kz = static_cast<uint64_t>(std::floor((pts[i * 3 + 2] - mn[2]) / voxel_size));
    // 21 bits per axis (2M voxels/axis) packed into one key.
    uint64_t key = (kx & 0x1FFFFF) | ((ky & 0x1FFFFF) << 21) | ((kz & 0x1FFFFF) << 42);
    auto it = first.find(key);
    if (it == first.end()) {
      first.emplace(key, i);
    }
    // insertion order == original order, so the stored index is the first.
  }
  int64_t m = 0;
  for (auto& kv : first) out_idx[m++] = kv.second;
  // Sort ascending for deterministic output (matches the numpy oracle).
  std::vector<int64_t> tmp(out_idx, out_idx + m);
  std::sort(tmp.begin(), tmp.end());
  std::memcpy(out_idx, tmp.data(), sizeof(int64_t) * m);
  return m;
}

// Matched-first slot ordering, batched.
// hint_obj_idx: [b, s] int32 (slot in the cell, -1 unmatched).
// out: [b, pad] int32.
void fine_object_order(const int32_t* hint_obj_idx, int64_t b, int64_t s,
                       int64_t o, int64_t pad, int32_t* out) {
  std::vector<uint8_t> seen(static_cast<size_t>(o));
  for (int64_t i = 0; i < b; ++i) {
    std::fill(seen.begin(), seen.end(), 0);
    int64_t w = 0;
    for (int64_t j = 0; j < s && w < pad; ++j) {
      int32_t m = hint_obj_idx[i * s + j];
      if (m >= 0 && m < o && !seen[m]) {
        out[i * pad + w++] = m;
        seen[m] = 1;
      }
    }
    for (int64_t j = 0; j < o && w < pad; ++j) {
      if (!seen[j]) out[i * pad + w++] = static_cast<int32_t>(j);
    }
    while (w < pad) out[i * pad + w++] = static_cast<int32_t>(o - 1);
  }
}

// PMC re-match of one pose's descriptions against one candidate cell.
// Greedy in description order: first object (storage order) with equal label
// whose closest-point offset to the normalized pose agrees within atol; no
// object reuse (reference poses.py:458-479).
//
// obj_pts: concatenated [total_pts, 3] float64 (normalized cell coords);
// obj_start: [n_obj + 1] int64 prefix offsets; obj_label: [n_obj] int32;
// descr_label: [n_descr] int32; descr_offset: [n_descr, 2] float64 —
// offsets are pose-cell (pose - closest_point)[0:2];
// pose: [3] float64 normalized in the candidate cell.
// out_match: [n_descr] int32 (slot or -1). Returns unmatched count.
int32_t pmc_rematch(const double* obj_pts, const int64_t* obj_start,
                    const int32_t* obj_label, int64_t n_obj,
                    const int32_t* descr_label, const double* descr_offset,
                    int64_t n_descr, const double* pose, double atol,
                    int32_t* out_match) {
  std::vector<uint8_t> used(static_cast<size_t>(n_obj), 0);
  int32_t unmatched = 0;
  for (int64_t d = 0; d < n_descr; ++d) {
    out_match[d] = -1;
    for (int64_t j = 0; j < n_obj; ++j) {
      if (used[j] || obj_label[j] != descr_label[d]) continue;
      // Empty object: best_i would point at the NEXT object's first point
      // (or one past the end for the last object) — skip it. The Python
      // fallback raises on such objects.
      if (obj_start[j] == obj_start[j + 1]) continue;
      // Closest point of object j to the pose.
      double best = 1e300;
      int64_t best_i = obj_start[j];
      for (int64_t i = obj_start[j]; i < obj_start[j + 1]; ++i) {
        double dx = obj_pts[i * 3 + 0] - pose[0];
        double dy = obj_pts[i * 3 + 1] - pose[1];
        double dz = obj_pts[i * 3 + 2] - pose[2];
        double dist = dx * dx + dy * dy + dz * dz;
        if (dist < best) { best = dist; best_i = i; }
      }
      double offx = pose[0] - obj_pts[best_i * 3 + 0];
      double offy = pose[1] - obj_pts[best_i * 3 + 1];
      double ex = descr_offset[d * 2 + 0] - offx;
      double ey = descr_offset[d * 2 + 1] - offy;
      if (std::sqrt(ex * ex + ey * ey) < atol) {
        out_match[d] = static_cast<int32_t>(j);
        used[j] = 1;
        break;
      }
    }
    if (out_match[d] < 0) ++unmatched;
  }
  return unmatched;
}

}  // extern "C"
