// Native mesh-surface sampler for rigid colliders (C ABI, used via ctypes).
//
// Equivalent of the reference's Rust CPU sampler
// (/root/reference/src/solver/particle3d.rs:214-428): cover every triangle
// face and every unique edge with samples spaced `spacing` apart, recording
// the source primitive per sample.  The numpy fallback
// (wgsparkl_tpu/rigid/sampling.py) is the behavioral oracle; this version
// exists because heightfield scenes produce 10^5 triangles and Python
// per-triangle loops dominate scene-build time.
//
// Build: make -C native   (produces libwgsampler.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 mul(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double norm(V3 a) { return std::sqrt(a.x * a.x + a.y * a.y + a.z * a.z); }

struct Out {
  std::vector<float> pts;     // [S*3]
  std::vector<int32_t> prim;  // [S*3]
  void push(V3 p, const int32_t tri[3]) {
    pts.push_back((float)p.x);
    pts.push_back((float)p.y);
    pts.push_back((float)p.z);
    prim.push_back(tri[0]);
    prim.push_back(tri[1]);
    prim.push_back(tri[2]);
  }
};

void sample_segment(V3 a, V3 b, double spacing, const int32_t tri[3], Out& o) {
  double len = norm(sub(b, a));
  int n = (int)std::ceil(len / spacing);
  if (n < 1) n = 1;
  for (int i = 0; i <= n; ++i) {
    double t = (double)i / n;
    o.push(add(mul(a, 1.0 - t), mul(b, t)), tri);
  }
}

void sample_face(V3 a, V3 b, V3 c, double spacing, const int32_t tri[3],
                 Out& o) {
  V3 e1 = sub(b, a), e2 = sub(c, a);
  int n1 = (int)std::ceil(norm(e1) / spacing);
  int n2 = (int)std::ceil(norm(e2) / spacing);
  if (n1 < 1) n1 = 1;
  if (n2 < 1) n2 = 1;
  for (int i = 0; i <= n1; ++i) {
    double u = (double)i / n1;
    int m = (int)std::ceil((1.0 - u) * n2);
    if (m == 0) {
      o.push(add(a, mul(e1, u)), tri);
      continue;
    }
    for (int j = 0; j <= m; ++j) {
      double v = (double)j / n2;
      if (v > 1.0 - u + 1e-9) break;
      o.push(add(add(a, mul(e1, u)), mul(e2, v)), tri);
    }
  }
}

}  // namespace

extern "C" {

// Two-call protocol: first call with pts_out == nullptr returns the sample
// count; second call fills pts_out [S*3] f32 and prim_out [S*3] i32.
int64_t wgs_sample_trimesh(const float* vertices, int64_t n_verts,
                           const int32_t* tris, int64_t n_tris,
                           double spacing, float* pts_out,
                           int32_t* prim_out) {
  Out o;
  auto vert = [&](int32_t i) -> V3 {
    return {vertices[3 * i], vertices[3 * i + 1], vertices[3 * i + 2]};
  };
  // Faces.
  for (int64_t t = 0; t < n_tris; ++t) {
    const int32_t* tri = &tris[3 * t];
    sample_face(vert(tri[0]), vert(tri[1]), vert(tri[2]), spacing, tri, o);
  }
  // Unique edges (keyed by sorted vertex pair); crack-free crease coverage.
  std::unordered_map<uint64_t, int64_t> edge_tri;
  edge_tri.reserve((size_t)n_tris * 3);
  for (int64_t t = 0; t < n_tris; ++t) {
    const int32_t* tri = &tris[3 * t];
    for (int k = 0; k < 3; ++k) {
      int32_t u = tri[k], v = tri[(k + 1) % 3];
      if (u == v) continue;
      uint64_t key = ((uint64_t)(uint32_t)std::min(u, v) << 32) |
                     (uint32_t)std::max(u, v);
      edge_tri.emplace(key, t);
    }
  }
  for (const auto& kv : edge_tri) {
    int32_t u = (int32_t)(kv.first >> 32);
    int32_t v = (int32_t)(kv.first & 0xffffffffu);
    sample_segment(vert(u), vert(v), spacing, &tris[3 * kv.second], o);
  }

  int64_t count = (int64_t)(o.pts.size() / 3);
  if (pts_out != nullptr) {
    std::memcpy(pts_out, o.pts.data(), o.pts.size() * sizeof(float));
    std::memcpy(prim_out, o.prim.data(), o.prim.size() * sizeof(int32_t));
  }
  return count;
}

}  // extern "C"
