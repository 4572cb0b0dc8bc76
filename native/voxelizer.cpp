// Native data-prep kernels: triangle-mesh solid voxelizer + surface sampler.
//
// Reference parity: the only native executable in the reference pipeline is
// the third-party `binvox` voxelizer invoked as a subprocess from
// data_prep.py (SURVEY.md §2.2).  This library replaces it with an
// in-process implementation: conservative triangle-box surface rasterization
// (separating-axis test) followed by an outside flood fill, so interior
// cells are solid — the same contract binvox provides.  Also provides an
// area-weighted surface sampler used to accelerate GT point-cloud
// generation at data-prep time.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Hot paths are OpenMP-free (single-core VM) but cache-conscious.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// Akenine-Möller triangle-box overlap (separating axis theorem), with the
// box centered at `c` with half-extent `h` (uniform).
bool tri_box_overlap(V3 c, float h, V3 v0, V3 v1, V3 v2) {
  v0 = sub(v0, c);
  v1 = sub(v1, c);
  v2 = sub(v2, c);
  V3 e0 = sub(v1, v0), e1 = sub(v2, v1), e2 = sub(v0, v2);

  auto axis_test = [&](float a, float b, float fa, float fb, float p0,
                       float p1) {
    float mn = std::min(p0, p1), mx = std::max(p0, p1);
    float rad = fa * h + fb * h;
    return !(mn > rad || mx < -rad);
  };

  // 9 cross-product axes
  float fex = std::fabs(e0.x), fey = std::fabs(e0.y), fez = std::fabs(e0.z);
  if (!axis_test(e0.z, e0.y, fez, fey, e0.z * v0.y - e0.y * v0.z,
                 e0.z * v2.y - e0.y * v2.z))
    return false;
  if (!axis_test(e0.z, e0.x, fez, fex, -(e0.z * v0.x - e0.x * v0.z),
                 -(e0.z * v2.x - e0.x * v2.z)))
    return false;
  if (!axis_test(e0.y, e0.x, fey, fex, e0.y * v1.x - e0.x * v1.y,
                 e0.y * v2.x - e0.x * v2.y))
    return false;

  fex = std::fabs(e1.x); fey = std::fabs(e1.y); fez = std::fabs(e1.z);
  if (!axis_test(e1.z, e1.y, fez, fey, e1.z * v0.y - e1.y * v0.z,
                 e1.z * v2.y - e1.y * v2.z))
    return false;
  if (!axis_test(e1.z, e1.x, fez, fex, -(e1.z * v0.x - e1.x * v0.z),
                 -(e1.z * v2.x - e1.x * v2.z)))
    return false;
  if (!axis_test(e1.y, e1.x, fey, fex, e1.y * v0.x - e1.x * v0.y,
                 e1.y * v1.x - e1.x * v1.y))
    return false;

  fex = std::fabs(e2.x); fey = std::fabs(e2.y); fez = std::fabs(e2.z);
  if (!axis_test(e2.z, e2.y, fez, fey, e2.z * v0.y - e2.y * v0.z,
                 e2.z * v1.y - e2.y * v1.z))
    return false;
  if (!axis_test(e2.z, e2.x, fez, fex, -(e2.z * v0.x - e2.x * v0.z),
                 -(e2.z * v1.x - e2.x * v1.z)))
    return false;
  if (!axis_test(e2.y, e2.x, fey, fex, e2.y * v1.x - e2.x * v1.y,
                 e2.y * v2.x - e2.x * v2.y))
    return false;

  // 3 box axes
  auto minmax3 = [](float a, float b, float c, float& mn, float& mx) {
    mn = std::min(a, std::min(b, c));
    mx = std::max(a, std::max(b, c));
  };
  float mn, mx;
  minmax3(v0.x, v1.x, v2.x, mn, mx);
  if (mn > h || mx < -h) return false;
  minmax3(v0.y, v1.y, v2.y, mn, mx);
  if (mn > h || mx < -h) return false;
  minmax3(v0.z, v1.z, v2.z, mn, mx);
  if (mn > h || mx < -h) return false;

  // triangle plane vs box
  V3 n = cross(e0, e1);
  float d = -dot(n, v0);
  V3 vmin, vmax;
  vmin.x = (n.x > 0 ? -h : h); vmax.x = -vmin.x;
  vmin.y = (n.y > 0 ? -h : h); vmax.y = -vmin.y;
  vmin.z = (n.z > 0 ? -h : h); vmax.z = -vmin.z;
  if (dot(n, vmin) + d > 0) return false;
  if (dot(n, vmax) + d < 0) return false;
  return true;
}

}  // namespace

extern "C" {

// Solid-voxelize a triangle mesh into a res^3 uint8 grid spanning
// [lo,hi]^3.  out must hold res*res*res bytes; 1 = solid.
void gx_voxelize_solid(const float* verts, int32_t n_verts,
                       const int32_t* faces, int32_t n_faces, int32_t res,
                       float lo, float hi, uint8_t* out) {
  const float cell = (hi - lo) / res;
  const float half = 0.5f * cell;
  const int64_t n3 = int64_t(res) * res * res;
  std::memset(out, 0, n3);
  auto idx = [&](int x, int y, int z) {
    return (int64_t(x) * res + y) * res + z;
  };

  // 1) conservative surface rasterization
  for (int32_t f = 0; f < n_faces; ++f) {
    V3 v0 = {verts[3 * faces[3 * f] + 0], verts[3 * faces[3 * f] + 1],
             verts[3 * faces[3 * f] + 2]};
    V3 v1 = {verts[3 * faces[3 * f + 1] + 0], verts[3 * faces[3 * f + 1] + 1],
             verts[3 * faces[3 * f + 1] + 2]};
    V3 v2 = {verts[3 * faces[3 * f + 2] + 0], verts[3 * faces[3 * f + 2] + 1],
             verts[3 * faces[3 * f + 2] + 2]};
    float bx0 = std::min(v0.x, std::min(v1.x, v2.x));
    float bx1 = std::max(v0.x, std::max(v1.x, v2.x));
    float by0 = std::min(v0.y, std::min(v1.y, v2.y));
    float by1 = std::max(v0.y, std::max(v1.y, v2.y));
    float bz0 = std::min(v0.z, std::min(v1.z, v2.z));
    float bz1 = std::max(v0.z, std::max(v1.z, v2.z));
    int x0 = std::max(0, int((bx0 - lo) / cell));
    int x1 = std::min(res - 1, int((bx1 - lo) / cell));
    int y0 = std::max(0, int((by0 - lo) / cell));
    int y1 = std::min(res - 1, int((by1 - lo) / cell));
    int z0 = std::max(0, int((bz0 - lo) / cell));
    int z1 = std::min(res - 1, int((bz1 - lo) / cell));
    for (int x = x0; x <= x1; ++x)
      for (int y = y0; y <= y1; ++y)
        for (int z = z0; z <= z1; ++z) {
          if (out[idx(x, y, z)]) continue;
          V3 c = {lo + (x + 0.5f) * cell, lo + (y + 0.5f) * cell,
                  lo + (z + 0.5f) * cell};
          if (tri_box_overlap(c, half, v0, v1, v2)) out[idx(x, y, z)] = 1;
        }
  }

  // 2) flood fill "outside" from the boundary through empty cells
  std::vector<uint8_t> outside(n3, 0);
  std::vector<int64_t> stack;
  stack.reserve(res * res * 6);
  auto push = [&](int x, int y, int z) {
    int64_t i = idx(x, y, z);
    if (!out[i] && !outside[i]) {
      outside[i] = 1;
      stack.push_back(i);
    }
  };
  for (int a = 0; a < res; ++a)
    for (int b = 0; b < res; ++b) {
      push(0, a, b); push(res - 1, a, b);
      push(a, 0, b); push(a, res - 1, b);
      push(a, b, 0); push(a, b, res - 1);
    }
  while (!stack.empty()) {
    int64_t i = stack.back();
    stack.pop_back();
    int z = int(i % res), y = int((i / res) % res), x = int(i / (res * res));
    if (x > 0) push(x - 1, y, z);
    if (x < res - 1) push(x + 1, y, z);
    if (y > 0) push(x, y - 1, z);
    if (y < res - 1) push(x, y + 1, z);
    if (z > 0) push(x, y, z - 1);
    if (z < res - 1) push(x, y, z + 1);
  }

  // 3) solid = not outside
  for (int64_t i = 0; i < n3; ++i) out[i] = outside[i] ? 0 : 1;
}

// Area-weighted surface sampling: n points + unit normals from a triangle
// mesh (inverse-CDF over face areas; barycentric (1-√r1, √r1(1-r2), √r1 r2)).
void gx_sample_surface(const float* verts, int32_t n_verts,
                       const int32_t* faces, int32_t n_faces, int32_t n,
                       uint64_t seed, float* out_pts, float* out_normals) {
  std::vector<double> cdf(n_faces);
  std::vector<V3> nrm(n_faces);
  double acc = 0.0;
  for (int32_t f = 0; f < n_faces; ++f) {
    V3 v0 = {verts[3 * faces[3 * f] + 0], verts[3 * faces[3 * f] + 1],
             verts[3 * faces[3 * f] + 2]};
    V3 v1 = {verts[3 * faces[3 * f + 1] + 0], verts[3 * faces[3 * f + 1] + 1],
             verts[3 * faces[3 * f + 1] + 2]};
    V3 v2 = {verts[3 * faces[3 * f + 2] + 0], verts[3 * faces[3 * f + 2] + 1],
             verts[3 * faces[3 * f + 2] + 2]};
    V3 c = cross(sub(v1, v0), sub(v2, v0));
    double a = 0.5 * std::sqrt(double(dot(c, c)));
    float inv = 1.0f / std::max(1e-12f, float(std::sqrt(dot(c, c))));
    nrm[f] = {c.x * inv, c.y * inv, c.z * inv};
    acc += a;
    cdf[f] = acc;
  }
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int32_t i = 0; i < n; ++i) {
    double u = uni(rng) * acc;
    int32_t f = int32_t(std::lower_bound(cdf.begin(), cdf.end(), u) -
                        cdf.begin());
    if (f >= n_faces) f = n_faces - 1;
    const int32_t* fv = faces + 3 * f;
    V3 v0 = {verts[3 * fv[0]], verts[3 * fv[0] + 1], verts[3 * fv[0] + 2]};
    V3 v1 = {verts[3 * fv[1]], verts[3 * fv[1] + 1], verts[3 * fv[1] + 2]};
    V3 v2 = {verts[3 * fv[2]], verts[3 * fv[2] + 1], verts[3 * fv[2] + 2]};
    float r1 = float(uni(rng)), r2 = float(uni(rng));
    float s = std::sqrt(r1);
    float w0 = 1.0f - s, w1 = s * (1.0f - r2), w2 = s * r2;
    out_pts[3 * i + 0] = w0 * v0.x + w1 * v1.x + w2 * v2.x;
    out_pts[3 * i + 1] = w0 * v0.y + w1 * v1.y + w2 * v2.y;
    out_pts[3 * i + 2] = w0 * v0.z + w1 * v1.z + w2 * v2.z;
    if (out_normals) {
      out_normals[3 * i + 0] = nrm[f].x;
      out_normals[3 * i + 1] = nrm[f].y;
      out_normals[3 * i + 2] = nrm[f].z;
    }
  }
}

}  // extern "C"
