// sfmcore: native host-side SfM runtime ops for pi3_slam_tpu.
//
// The reference leans on PyTheia (C++ Theia/Ceres) for its reconstruction
// containers and fast track bookkeeping; the TPU build solves BA on-device
// (JAX) but keeps the scatter/hash-heavy host bookkeeping native:
//
//   * sfm_match_tracks        — cross-chunk common-track matching by
//                               quantized keypoint position in shared frames
//                               (alignment.find_common_tracks hot path)
//   * sfm_build_observations  — project per-frame keypoint world points into
//                               candidate frames and emit the padded
//                               track-major observation arrays consumed by
//                               the batched bundle adjuster
//
// Plain C ABI (ctypes); no external dependencies.

#include <cstdint>
#include <cmath>
#include <unordered_map>

extern "C" {

// Match tracks between reconstruction A and B through shared frames.
// frame_map_b_to_a[fb] = corresponding frame index in A, or -1.
// Tracks match when owner frames correspond and quantized keypoint uv agree.
// Returns number of matches written (capped at max_out).
int64_t sfm_match_tracks(
    const int32_t* track_frame_a, const float* track_uv_a, const float* track_valid_a,
    int64_t n_a,
    const int32_t* track_frame_b, const float* track_uv_b, const float* track_valid_b,
    int64_t n_b,
    const int32_t* frame_map_b_to_a, int64_t n_frames_b,
    double quantize,
    int32_t* out_a, int32_t* out_b, int64_t max_out) {
  // key: (frame_a, qu, qv) packed into 64 bits
  auto pack = [quantize](int64_t frame, float u, float v) -> uint64_t {
    const int64_t qu = llround(static_cast<double>(u) / quantize);
    const int64_t qv = llround(static_cast<double>(v) / quantize);
    uint64_t h = static_cast<uint64_t>(frame) * 1000003ull;
    h = (h ^ static_cast<uint64_t>(qu + (1 << 20))) * 9176266021ull;
    h = (h ^ static_cast<uint64_t>(qv + (1 << 20))) * 2654435761ull;
    return h;
  };

  std::unordered_map<uint64_t, int32_t> index;
  index.reserve(static_cast<size_t>(n_a));
  for (int64_t t = 0; t < n_a; ++t) {
    if (track_valid_a[t] <= 0.f) continue;
    index.emplace(pack(track_frame_a[t], track_uv_a[2 * t], track_uv_a[2 * t + 1]),
                  static_cast<int32_t>(t));
  }

  int64_t n_out = 0;
  for (int64_t t = 0; t < n_b && n_out < max_out; ++t) {
    if (track_valid_b[t] <= 0.f) continue;
    const int32_t fb = track_frame_b[t];
    if (fb < 0 || fb >= n_frames_b) continue;
    const int32_t fa = frame_map_b_to_a[fb];
    if (fa < 0) continue;
    auto it = index.find(pack(fa, track_uv_b[2 * t], track_uv_b[2 * t + 1]));
    if (it == index.end()) continue;
    out_a[n_out] = it->second;
    out_b[n_out] = static_cast<int32_t>(t);
    ++n_out;
  }
  return n_out;
}

// Project each frame's keypoint world points into its candidate frames and
// fill padded observation arrays. Slot 0 (the detected keypoint itself) must
// be prefilled by the caller; this fills slots 1..C per track.
void sfm_build_observations(
    const double* points,    // (N*K, 3) world points, track-major (frame-major rows)
    const double* r_cw,      // (N, 9) row-major world->camera rotations
    const double* centers,   // (N, 3)
    const double* intr,      // (N, 4) fx fy cx cy
    const int32_t* cand,     // (N, C) candidate frame ids, -1 = none
    int64_t n_frames, int64_t n_kp, int64_t n_cand,
    double width, double height,
    int32_t* obs_frame,      // (N*K, M) with M = n_cand + 1
    float* obs_uv,           // (N*K, M, 2)
    float* obs_valid) {      // (N*K, M)
  const int64_t m = n_cand + 1;
  for (int64_t f = 0; f < n_frames; ++f) {
    for (int64_t c = 0; c < n_cand; ++c) {
      const int32_t g = cand[f * n_cand + c];
      if (g < 0) continue;
      const double* R = r_cw + 9 * g;
      const double* cen = centers + 3 * g;
      const double fx = intr[4 * g], fy = intr[4 * g + 1];
      const double cx = intr[4 * g + 2], cy = intr[4 * g + 3];
      for (int64_t kp = 0; kp < n_kp; ++kp) {
        const int64_t t = f * n_kp + kp;
        const double* X = points + 3 * t;
        const double dx = X[0] - cen[0], dy = X[1] - cen[1], dz = X[2] - cen[2];
        const double xc = R[0] * dx + R[1] * dy + R[2] * dz;
        const double yc = R[3] * dx + R[4] * dy + R[5] * dz;
        const double zc = R[6] * dx + R[7] * dy + R[8] * dz;
        const int64_t slot = t * m + (c + 1);
        obs_frame[slot] = g;
        if (zc <= 1e-12) { obs_valid[slot] = 0.f; continue; }
        const double u = fx * xc / zc + cx;
        const double v = fy * yc / zc + cy;
        obs_uv[2 * slot] = static_cast<float>(u);
        obs_uv[2 * slot + 1] = static_cast<float>(v);
        obs_valid[slot] =
            (u >= 0.0 && u < width && v >= 0.0 && v < height) ? 1.f : 0.f;
      }
    }
  }
}

}  // extern "C"
