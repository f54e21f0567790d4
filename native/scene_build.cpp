// elaina_tpu native scene builder.
//
// C++ runtime counterpart of the snch-lbvh host/build machinery the
// reference links as a native library (SURVEY.md §2.1 "snch-lbvh"): fast
// OBJ parsing, primitive bounds/centroids, longest-axis median-split BVH
// construction, and silhouette-adjacency extraction.  Exposed as a plain C
// ABI consumed from Python via ctypes (elaina_tpu/geometry/native.py); the
// NumPy implementation in geometry/bvh.py remains as a portable fallback
// and as the correctness oracle in tests.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ loading (vertices + line segments or triangle fans)
// ---------------------------------------------------------------------------

struct ObjData {
  float* verts;    // V * 3
  int32_t* segs;   // S * 2
  int32_t* tris;   // T * 3
  int64_t n_verts;
  int64_t n_segs;
  int64_t n_tris;
};

static int64_t parse_index(const char* tok, int64_t n_verts) {
  long i = strtol(tok, nullptr, 10);
  return i > 0 ? i - 1 : n_verts + i;
}

ObjData* obj_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  std::vector<float> verts;
  std::vector<int32_t> segs, tris;
  char line[8192];
  std::vector<int64_t> poly;
  while (fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      sscanf(line + 2, "%f %f %f", &x, &y, &z);
      verts.push_back(x);
      verts.push_back(y);
      verts.push_back(z);
    } else if ((line[0] == 'l' || line[0] == 'f') &&
               (line[1] == ' ' || line[1] == '\t')) {
      poly.clear();
      int64_t nv = (int64_t)verts.size() / 3;
      for (char* tok = strtok(line + 2, " \t\r\n"); tok;
           tok = strtok(nullptr, " \t\r\n")) {
        poly.push_back(parse_index(tok, nv));
      }
      if (line[0] == 'l' || poly.size() == 2) {
        for (size_t k = 0; k + 1 < poly.size(); ++k) {
          segs.push_back((int32_t)poly[k]);
          segs.push_back((int32_t)poly[k + 1]);
        }
      } else {
        for (size_t k = 1; k + 1 < poly.size(); ++k) {  // fan triangulation
          tris.push_back((int32_t)poly[0]);
          tris.push_back((int32_t)poly[k]);
          tris.push_back((int32_t)poly[k + 1]);
        }
      }
    }
  }
  fclose(f);
  ObjData* out = new ObjData();
  out->n_verts = (int64_t)verts.size() / 3;
  out->n_segs = (int64_t)segs.size() / 2;
  out->n_tris = (int64_t)tris.size() / 3;
  out->verts = (float*)malloc(verts.size() * sizeof(float));
  memcpy(out->verts, verts.data(), verts.size() * sizeof(float));
  out->segs = (int32_t*)malloc(segs.size() * sizeof(int32_t));
  memcpy(out->segs, segs.data(), segs.size() * sizeof(int32_t));
  out->tris = (int32_t*)malloc(tris.size() * sizeof(int32_t));
  memcpy(out->tris, tris.data(), tris.size() * sizeof(int32_t));
  return out;
}

void obj_free(ObjData* d) {
  if (!d) return;
  free(d->verts);
  free(d->segs);
  free(d->tris);
  delete d;
}

// ---------------------------------------------------------------------------
// BVH build: longest-axis median split over primitive centroids.
// Output layout matches geometry/bvh.py BVHArrays.
// ---------------------------------------------------------------------------

struct BvhOut {
  float* bb_min;      // M * dim
  float* bb_max;      // M * dim
  int32_t* left;      // M
  int32_t* right;     // M
  int32_t* start;     // M
  int32_t* count;     // M
  int32_t* order;     // P
  int64_t n_nodes;
  int32_t depth;
};

BvhOut* bvh_build(const float* verts, int64_t /*n_verts*/,
                  const int32_t* indices, int64_t n_prims, int32_t prim_arity,
                  int32_t dim, int32_t leaf_size) {
  std::vector<float> pmin((size_t)n_prims * dim), pmax((size_t)n_prims * dim),
      cent((size_t)n_prims * dim);
  for (int64_t p = 0; p < n_prims; ++p) {
    for (int d = 0; d < dim; ++d) {
      float lo = 1e30f, hi = -1e30f;
      for (int k = 0; k < prim_arity; ++k) {
        float v = verts[(int64_t)indices[p * prim_arity + k] * dim + d];
        lo = std::min(lo, v);
        hi = std::max(hi, v);
      }
      pmin[p * dim + d] = lo;
      pmax[p * dim + d] = hi;
      cent[p * dim + d] = 0.5f * (lo + hi);
    }
  }

  std::vector<int32_t> order(n_prims);
  for (int64_t i = 0; i < n_prims; ++i) order[i] = (int32_t)i;

  std::vector<float> bb_min, bb_max;
  std::vector<int32_t> left, right, start, count;
  struct Item {
    int64_t lo, hi;
    int64_t parent;
    bool is_left;
    int32_t depth;
  };
  std::vector<Item> stack{{0, n_prims, -1, false, 0}};
  int32_t max_depth = 0;

  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    max_depth = std::max(max_depth, it.depth);
    int64_t nid = (int64_t)left.size();
    if (it.parent >= 0) {
      (it.is_left ? left : right)[it.parent] = (int32_t)nid;
    }
    float nb_min[3] = {1e30f, 1e30f, 1e30f},
          nb_max[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = it.lo; i < it.hi; ++i) {
      int32_t p = order[i];
      for (int d = 0; d < dim; ++d) {
        nb_min[d] = std::min(nb_min[d], pmin[(int64_t)p * dim + d]);
        nb_max[d] = std::max(nb_max[d], pmax[(int64_t)p * dim + d]);
      }
    }
    for (int d = 0; d < dim; ++d) {
      bb_min.push_back(nb_min[d]);
      bb_max.push_back(nb_max[d]);
    }
    if (it.hi - it.lo <= leaf_size) {
      left.push_back(-1);
      right.push_back(-1);
      start.push_back((int32_t)it.lo);
      count.push_back((int32_t)(it.hi - it.lo));
      continue;
    }
    left.push_back(-1);
    right.push_back(-1);
    start.push_back(0);
    count.push_back(0);
    // longest centroid axis
    float clo[3] = {1e30f, 1e30f, 1e30f}, chi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = it.lo; i < it.hi; ++i) {
      int32_t p = order[i];
      for (int d = 0; d < dim; ++d) {
        clo[d] = std::min(clo[d], cent[(int64_t)p * dim + d]);
        chi[d] = std::max(chi[d], cent[(int64_t)p * dim + d]);
      }
    }
    int axis = 0;
    for (int d = 1; d < dim; ++d)
      if (chi[d] - clo[d] > chi[axis] - clo[axis]) axis = d;
    int64_t mid = it.lo + (it.hi - it.lo) / 2;
    std::nth_element(order.begin() + it.lo, order.begin() + mid,
                     order.begin() + it.hi, [&](int32_t a, int32_t b) {
                       return cent[(int64_t)a * dim + axis] <
                              cent[(int64_t)b * dim + axis];
                     });
    stack.push_back({mid, it.hi, nid, false, it.depth + 1});
    stack.push_back({it.lo, mid, nid, true, it.depth + 1});
  }

  BvhOut* out = new BvhOut();
  int64_t M = (int64_t)left.size();
  out->n_nodes = M;
  out->depth = max_depth;
  out->bb_min = (float*)malloc((size_t)M * dim * sizeof(float));
  out->bb_max = (float*)malloc((size_t)M * dim * sizeof(float));
  out->left = (int32_t*)malloc((size_t)M * sizeof(int32_t));
  out->right = (int32_t*)malloc((size_t)M * sizeof(int32_t));
  out->start = (int32_t*)malloc((size_t)M * sizeof(int32_t));
  out->count = (int32_t*)malloc((size_t)M * sizeof(int32_t));
  out->order = (int32_t*)malloc((size_t)n_prims * sizeof(int32_t));
  memcpy(out->bb_min, bb_min.data(), (size_t)M * dim * sizeof(float));
  memcpy(out->bb_max, bb_max.data(), (size_t)M * dim * sizeof(float));
  memcpy(out->left, left.data(), (size_t)M * sizeof(int32_t));
  memcpy(out->right, right.data(), (size_t)M * sizeof(int32_t));
  memcpy(out->start, start.data(), (size_t)M * sizeof(int32_t));
  memcpy(out->count, count.data(), (size_t)M * sizeof(int32_t));
  memcpy(out->order, order.data(), (size_t)n_prims * sizeof(int32_t));
  return out;
}

void bvh_free(BvhOut* b) {
  if (!b) return;
  free(b->bb_min);
  free(b->bb_max);
  free(b->left);
  free(b->right);
  free(b->start);
  free(b->count);
  free(b->order);
  delete b;
}

// ---------------------------------------------------------------------------
// Silhouette adjacency (compute_silhouettes equivalent):
// 2D -> per-vertex adjacent segment normals; 3D -> per-edge triangle normals.
// ---------------------------------------------------------------------------

struct SilOut {
  float* p0;      // E * dim
  float* p1;      // E * dim
  float* n1;      // E * dim
  float* n2;      // E * dim
  uint8_t* always;  // E
  int64_t n_entities;
};

SilOut* silhouettes_build(const float* verts, int64_t /*n_verts*/,
                          const int32_t* indices, int64_t n_prims,
                          int32_t dim) {
  std::vector<float> p0, p1, n1v, n2v;
  std::vector<uint8_t> always;

  if (dim == 2) {
    std::vector<float> normals((size_t)n_prims * 2);
    for (int64_t p = 0; p < n_prims; ++p) {
      const float* a = verts + (int64_t)indices[p * 2] * 2;
      const float* b = verts + (int64_t)indices[p * 2 + 1] * 2;
      float ex = b[0] - a[0], ey = b[1] - a[1];
      float len = std::sqrt(ex * ex + ey * ey);
      len = std::max(len, 1e-20f);
      normals[p * 2] = -ey / len;
      normals[p * 2 + 1] = ex / len;
    }
    std::map<int32_t, std::vector<int64_t>> adj;
    for (int64_t p = 0; p < n_prims; ++p) {
      adj[indices[p * 2]].push_back(p);
      adj[indices[p * 2 + 1]].push_back(p);
    }
    for (auto& kv : adj) {
      const float* v = verts + (int64_t)kv.first * 2;
      p0.insert(p0.end(), {v[0], v[1]});
      p1.insert(p1.end(), {v[0], v[1]});
      int64_t a = kv.second[0];
      int64_t b = kv.second.size() == 2 ? kv.second[1] : a;
      n1v.insert(n1v.end(), {normals[a * 2], normals[a * 2 + 1]});
      n2v.insert(n2v.end(), {normals[b * 2], normals[b * 2 + 1]});
      always.push_back(kv.second.size() != 2);
    }
  } else {
    std::vector<float> normals((size_t)n_prims * 3);
    for (int64_t p = 0; p < n_prims; ++p) {
      const float* a = verts + (int64_t)indices[p * 3] * 3;
      const float* b = verts + (int64_t)indices[p * 3 + 1] * 3;
      const float* c = verts + (int64_t)indices[p * 3 + 2] * 3;
      float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
      float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
      float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                    e1[2] * e2[0] - e1[0] * e2[2],
                    e1[0] * e2[1] - e1[1] * e2[0]};
      float len = std::max(
          std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]), 1e-20f);
      for (int d = 0; d < 3; ++d) normals[p * 3 + d] = n[d] / len;
    }
    std::map<std::pair<int32_t, int32_t>, std::vector<int64_t>> edges;
    for (int64_t p = 0; p < n_prims; ++p) {
      for (int k = 0; k < 3; ++k) {
        int32_t i = indices[p * 3 + k];
        int32_t j = indices[p * 3 + (k + 1) % 3];
        edges[{std::min(i, j), std::max(i, j)}].push_back(p);
      }
    }
    for (auto& kv : edges) {
      const float* vi = verts + (int64_t)kv.first.first * 3;
      const float* vj = verts + (int64_t)kv.first.second * 3;
      p0.insert(p0.end(), {vi[0], vi[1], vi[2]});
      p1.insert(p1.end(), {vj[0], vj[1], vj[2]});
      int64_t a = kv.second[0];
      int64_t b = kv.second.size() == 2 ? kv.second[1] : a;
      n1v.insert(n1v.end(), {normals[a * 3], normals[a * 3 + 1], normals[a * 3 + 2]});
      n2v.insert(n2v.end(), {normals[b * 3], normals[b * 3 + 1], normals[b * 3 + 2]});
      always.push_back(kv.second.size() != 2);
    }
  }

  SilOut* out = new SilOut();
  out->n_entities = (int64_t)always.size();
  size_t fb = p0.size() * sizeof(float);
  out->p0 = (float*)malloc(fb);
  memcpy(out->p0, p0.data(), fb);
  out->p1 = (float*)malloc(fb);
  memcpy(out->p1, p1.data(), fb);
  out->n1 = (float*)malloc(fb);
  memcpy(out->n1, n1v.data(), fb);
  out->n2 = (float*)malloc(fb);
  memcpy(out->n2, n2v.data(), fb);
  out->always = (uint8_t*)malloc(always.size());
  memcpy(out->always, always.data(), always.size());
  return out;
}

void silhouettes_free(SilOut* s) {
  if (!s) return;
  free(s->p0);
  free(s->p1);
  free(s->n1);
  free(s->n2);
  free(s->always);
  delete s;
}

// ---------------------------------------------------------------------------
// Candidate-grid band passes (geometry/grid.py _count_pass/_band_pass
// equivalents).  The device passes are O(cells x prims) per refinement
// level — 192 s of the fille cold start; here a per-level BVH prunes each
// cell's work to O(log P + band), mirroring how the reference builds its
// LBVH natively in seconds (core/problem.cu:29-54).
//
// Bound semantics match _cell_prim_bounds exactly:
//   2D: lower = exact box-segment distance (0 when overlapping; otherwise
//       the min over cell corners vs segment / segment endpoints vs box);
//       upper = max over the 4 cell corners of corner->segment distance.
//   3D: d = point(center)->triangle distance; lower = max(d - h, 0),
//       upper = d + h with h = |hcell|.
// A prim is in-band iff lower <= M * (1 + 1e-6) + 1e-9 with
// M = min over prims of upper; rows keep the first K band prims in
// ascending prim order (-1 padded).
// ---------------------------------------------------------------------------

namespace {

struct BandBvh {
  std::vector<float> bmin, bmax;   // M * dim (node boxes)
  std::vector<int32_t> left, right, start, count, order;
  int dim;
};

inline float clampf(float x, float lo, float hi) {
  return x < lo ? lo : (x > hi ? hi : x);
}

inline float pt_seg_d2_2d(float qx, float qy, const float* a,
                          const float* b) {
  float ex = b[0] - a[0], ey = b[1] - a[1];
  float wx = qx - a[0], wy = qy - a[1];
  float den = ex * ex + ey * ey;
  float t = den > 1e-30f ? clampf((wx * ex + wy * ey) / den, 0.f, 1.f) : 0.f;
  float dx = wx - t * ex, dy = wy - t * ey;
  return dx * dx + dy * dy;
}

inline float pt_box_dist(const float* q, const float* lo, const float* hi,
                         int dim) {
  float d2 = 0.f;
  for (int d = 0; d < dim; ++d) {
    float v = q[d] < lo[d] ? lo[d] - q[d] : (q[d] > hi[d] ? q[d] - hi[d] : 0.f);
    d2 += v * v;
  }
  return std::sqrt(d2);
}

inline float box_box_dist(const float* alo, const float* ahi,
                          const float* blo, const float* bhi, int dim) {
  float d2 = 0.f;
  for (int d = 0; d < dim; ++d) {
    float v = blo[d] > ahi[d] ? blo[d] - ahi[d]
                              : (alo[d] > bhi[d] ? alo[d] - bhi[d] : 0.f);
    d2 += v * v;
  }
  return std::sqrt(d2);
}

inline bool seg_box_overlap_2d(const float* a, const float* b,
                               const float* lo, const float* hi) {
  // either endpoint inside, or the segment crosses a box edge (slab clip)
  auto inside = [&](const float* p) {
    return p[0] >= lo[0] && p[0] <= hi[0] && p[1] >= lo[1] && p[1] <= hi[1];
  };
  if (inside(a) || inside(b)) return true;
  float t0 = 0.f, t1 = 1.f;
  float d[2] = {b[0] - a[0], b[1] - a[1]};
  for (int k = 0; k < 2; ++k) {
    if (std::fabs(d[k]) < 1e-30f) {
      if (a[k] < lo[k] || a[k] > hi[k]) return false;
    } else {
      float u0 = (lo[k] - a[k]) / d[k], u1 = (hi[k] - a[k]) / d[k];
      if (u0 > u1) std::swap(u0, u1);
      t0 = std::max(t0, u0);
      t1 = std::min(t1, u1);
      if (t0 > t1) return false;
    }
  }
  return true;
}

inline float pt_tri_dist_3d(const float* q, const float* a, const float* b,
                            const float* c) {
  float e1[3], e2[3], w[3];
  for (int d = 0; d < 3; ++d) {
    e1[d] = b[d] - a[d];
    e2[d] = c[d] - a[d];
    w[d] = q[d] - a[d];
  }
  auto dot = [](const float* u, const float* v) {
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2];
  };
  float d11 = dot(e1, e1), d12 = dot(e1, e2), d22 = dot(e2, e2);
  float w1 = dot(w, e1), w2 = dot(w, e2);
  float den = std::max(d11 * d22 - d12 * d12, 1e-30f);
  float u = (d22 * w1 - d12 * w2) / den;
  float v = (d11 * w2 - d12 * w1) / den;
  if (u >= 0.f && v >= 0.f && u + v <= 1.f) {
    float diff[3] = {w[0] - u * e1[0] - v * e2[0],
                     w[1] - u * e1[1] - v * e2[1],
                     w[2] - u * e1[2] - v * e2[2]};
    return std::sqrt(dot(diff, diff));
  }
  auto edge_d2 = [&](const float* p0, const float* p1) {
    float e[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    float wp[3] = {q[0] - p0[0], q[1] - p0[1], q[2] - p0[2]};
    float dd = dot(e, e);
    float t = dd > 1e-30f ? clampf(dot(wp, e) / dd, 0.f, 1.f) : 0.f;
    float r[3] = {wp[0] - t * e[0], wp[1] - t * e[1], wp[2] - t * e[2]};
    return dot(r, r);
  };
  float m = std::min(edge_d2(a, b), std::min(edge_d2(b, c), edge_d2(c, a)));
  return std::sqrt(m);
}

struct BandCtx {
  const float* verts;
  const int32_t* indices;
  int arity;
  int dim;
  const BandBvh* bvh;
  float hnorm;                       // |hcell| (3D lower-bound slack)
};

// exact per-prim bounds for one cell.  3D uppers use the 8 cell corners
// (max over a box of a convex distance is attained at a corner) — the
// center+|h| form made level-0 bands an O(h)-thick annulus over the whole
// surface and blew the bumpy3d build to ~30 min.
inline void prim_bounds(const BandCtx& ctx, int32_t p, const float* c,
                        const float* h, float* lower, float* upper) {
  if (ctx.dim == 2) {
    const float* a = ctx.verts + (int64_t)ctx.indices[p * 2] * 2;
    const float* b = ctx.verts + (int64_t)ctx.indices[p * 2 + 1] * 2;
    float lo[2] = {c[0] - h[0], c[1] - h[1]};
    float hi[2] = {c[0] + h[0], c[1] + h[1]};
    float d2a = pt_seg_d2_2d(lo[0], lo[1], a, b);
    float d2b = pt_seg_d2_2d(lo[0], hi[1], a, b);
    float d2c = pt_seg_d2_2d(hi[0], lo[1], a, b);
    float d2d = pt_seg_d2_2d(hi[0], hi[1], a, b);
    *upper = std::sqrt(std::max(std::max(d2a, d2b), std::max(d2c, d2d)));
    float corner_min =
        std::sqrt(std::min(std::min(d2a, d2b), std::min(d2c, d2d)));
    float d_end = std::min(pt_box_dist(a, lo, hi, 2), pt_box_dist(b, lo, hi, 2));
    *lower = seg_box_overlap_2d(a, b, lo, hi) ? 0.f
                                              : std::min(corner_min, d_end);
  } else {
    const float* a = ctx.verts + (int64_t)ctx.indices[p * 3] * 3;
    const float* b = ctx.verts + (int64_t)ctx.indices[p * 3 + 1] * 3;
    const float* cc = ctx.verts + (int64_t)ctx.indices[p * 3 + 2] * 3;
    float d = pt_tri_dist_3d(c, a, b, cc);
    *lower = std::max(d - ctx.hnorm, 0.f);
    float up = 0.f;
    for (int k = 0; k < 8; ++k) {
      float q[3] = {k & 1 ? c[0] + h[0] : c[0] - h[0],
                    k & 2 ? c[1] + h[1] : c[1] - h[1],
                    k & 4 ? c[2] + h[2] : c[2] - h[2]};
      up = std::max(up, pt_tri_dist_3d(q, a, b, cc));
    }
    *upper = up;
  }
}

// lower bound, over any prim inside a node box, of the corner-exact upper
inline float node_lb_upper(int dim, const float* c, const float* h,
                           const float* blo, const float* bhi) {
  float lb = 0.f;
  int nc = dim == 2 ? 4 : 8;
  for (int k = 0; k < nc; ++k) {
    float q[3];
    for (int d = 0; d < dim; ++d)
      q[d] = (k >> d) & 1 ? c[d] + h[d] : c[d] - h[d];
    lb = std::max(lb, pt_box_dist(q, blo, bhi, dim));
  }
  return lb;
}

// lower bound, over any prim inside a node box, of the per-prim lower
inline float node_lb_lower(const BandCtx& ctx, const float* c,
                           const float* h, const float* blo,
                           const float* bhi) {
  float clo[3], chi[3];
  for (int d = 0; d < ctx.dim; ++d) {
    clo[d] = c[d] - h[d];
    chi[d] = c[d] + h[d];
  }
  float bb = box_box_dist(clo, chi, blo, bhi, ctx.dim);
  if (ctx.dim == 2) return bb;
  // 3D per-prim lower is d(center)-h: take the tighter of both valid forms
  return std::max(bb, pt_box_dist(c, blo, bhi, 3) - ctx.hnorm);
}

// per-prim UPPER bound, early-skipped against the current best: the
// upper is a max over the cell box, so it is >= the center distance —
// when even the center distance cannot beat ``best``, the 8 corner
// evaluations are skipped and 1e30 (a no-op for min(best, .)) returned.
inline float prim_upper(const BandCtx& ctx, int32_t p, const float* c,
                        const float* h, float best) {
  float lo_p, up_p;
  if (ctx.dim == 2) {
    prim_bounds(ctx, p, c, h, &lo_p, &up_p);
    return up_p;
  }
  const float* a = ctx.verts + (int64_t)ctx.indices[p * 3] * 3;
  const float* b = ctx.verts + (int64_t)ctx.indices[p * 3 + 1] * 3;
  const float* cc = ctx.verts + (int64_t)ctx.indices[p * 3 + 2] * 3;
  if (pt_tri_dist_3d(c, a, b, cc) >= best) return 1e30f;
  float up = 0.f;
  for (int k = 0; k < 8; ++k) {
    float q[3] = {k & 1 ? c[0] + h[0] : c[0] - h[0],
                  k & 2 ? c[1] + h[1] : c[1] - h[1],
                  k & 4 ? c[2] + h[2] : c[2] - h[2]};
    up = std::max(up, pt_tri_dist_3d(q, a, b, cc));
  }
  return up;
}

// exact M = min over prims of upper(p), BVH-pruned (best-first)
float min_upper(const BandCtx& ctx, const float* c, const float* h) {
  const BandBvh& bvh = *ctx.bvh;
  int dim = ctx.dim;
  float best = 1e30f;
  int32_t stack[128];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    int32_t nid = stack[--sp];
    const float* blo = bvh.bmin.data() + (int64_t)nid * dim;
    const float* bhi = bvh.bmax.data() + (int64_t)nid * dim;
    float lb = node_lb_upper(dim, c, h, blo, bhi);
    if (lb >= best) continue;
    if (bvh.left[nid] < 0) {
      for (int32_t i = 0; i < bvh.count[nid]; ++i) {
        int32_t p = bvh.order[bvh.start[nid] + i];
        best = std::min(best, prim_upper(ctx, p, c, h, best));
      }
    } else {
      if (sp + 2 <= 128) {
        stack[sp++] = bvh.left[nid];
        stack[sp++] = bvh.right[nid];
      }
    }
  }
  return best;
}

// per-prim LOWER bound only — the collect pass never needs the upper,
// and the 3D upper costs 8 corner point-triangle distances per prim
// (the bumpy3d level passes ground 20+ minutes of single-core wall
// before this split; exactness is untouched)
inline float prim_lower(const BandCtx& ctx, int32_t p, const float* c,
                        const float* h) {
  if (ctx.dim == 2) {
    float lo_p, up_p;
    prim_bounds(ctx, p, c, h, &lo_p, &up_p);
    return lo_p;
  }
  const float* a = ctx.verts + (int64_t)ctx.indices[p * 3] * 3;
  const float* b = ctx.verts + (int64_t)ctx.indices[p * 3 + 1] * 3;
  const float* cc = ctx.verts + (int64_t)ctx.indices[p * 3 + 2] * 3;
  return std::max(pt_tri_dist_3d(c, a, b, cc) - ctx.hnorm, 0.f);
}

// collect in-band prims (lower <= thresh); returns count, fills band
// (ascending order applied by caller), tracks min lower.  ``lowers``
// (optional) receives each collected prim's lower bound so over-K rows
// can keep the K NEAREST prims instead of the first K by index.
int64_t collect_band(const BandCtx& ctx, const float* c, const float* h,
                     float thresh, std::vector<int32_t>* band,
                     float* min_lower,
                     std::vector<float>* lowers = nullptr) {
  const BandBvh& bvh = *ctx.bvh;
  int dim = ctx.dim;
  int64_t cnt = 0;
  float ml = 1e30f;
  int32_t stack[128];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    int32_t nid = stack[--sp];
    const float* blo = bvh.bmin.data() + (int64_t)nid * dim;
    const float* bhi = bvh.bmax.data() + (int64_t)nid * dim;
    float lb = node_lb_lower(ctx, c, h, blo, bhi);
    if (lb > thresh) continue;
    if (bvh.left[nid] < 0) {
      for (int32_t i = 0; i < bvh.count[nid]; ++i) {
        int32_t p = bvh.order[bvh.start[nid] + i];
        float lo_p = prim_lower(ctx, p, c, h);
        if (lo_p <= thresh) {
          ++cnt;
          ml = std::min(ml, lo_p);
          if (band) band->push_back(p);
          if (lowers) lowers->push_back(lo_p);
        }
      }
    } else {
      if (sp + 2 <= 128) {
        stack[sp++] = bvh.left[nid];
        stack[sp++] = bvh.right[nid];
      }
    }
  }
  *min_lower = ml;
  return cnt;
}

BandBvh* band_bvh_build(const float* verts, const int32_t* indices,
                        int64_t n_prims, int arity, int dim) {
  BvhOut* raw = bvh_build(verts, 0, indices, n_prims, arity, dim, 4);
  BandBvh* b = new BandBvh();
  b->dim = dim;
  b->bmin.assign(raw->bb_min, raw->bb_min + raw->n_nodes * dim);
  b->bmax.assign(raw->bb_max, raw->bb_max + raw->n_nodes * dim);
  b->left.assign(raw->left, raw->left + raw->n_nodes);
  b->right.assign(raw->right, raw->right + raw->n_nodes);
  b->start.assign(raw->start, raw->start + raw->n_nodes);
  b->count.assign(raw->count, raw->count + raw->n_nodes);
  b->order.assign(raw->order, raw->order + n_prims);
  bvh_free(raw);
  return b;
}

}  // namespace

// Fused count + rows + lcell in ONE pass per cell (best-first min-upper,
// threshold-pruned collect): build_candidate_grid calls this once per
// refinement level instead of a counts pass plus a rows pass — each of
// which repeated the full traversal.
void grid_band_full(const float* verts, int64_t n_verts,
                    const int32_t* indices, int64_t n_prims, int32_t arity,
                    int32_t dim, const float* centers, int64_t n_cells,
                    const float* hcell, int32_t K, int32_t* counts_out,
                    int32_t* rows_out, float* lcell_out) {
  (void)n_verts;
  BandBvh* bvh = band_bvh_build(verts, indices, n_prims, arity, dim);
  float hn = 0.f;
  for (int d = 0; d < dim; ++d) hn += hcell[d] * hcell[d];
  BandCtx ctx{verts, indices, arity, dim, bvh, std::sqrt(hn)};

  std::vector<std::pair<float, int32_t>> pq;  // min-heap by node bound
  auto pq_cmp = [](const std::pair<float, int32_t>& a,
                   const std::pair<float, int32_t>& b) {
    return a.first > b.first;
  };
  std::vector<int32_t> band;
  std::vector<float> lows;

  for (int64_t i = 0; i < n_cells; ++i) {
    const float* c = centers + i * dim;
    auto lb_upper = [&](int32_t nid) {
      return node_lb_upper(dim, c, hcell,
                           bvh->bmin.data() + (int64_t)nid * dim,
                           bvh->bmax.data() + (int64_t)nid * dim);
    };

    // best-first min upper bound M
    float best = 1e30f;
    pq.clear();
    pq.emplace_back(lb_upper(0), 0);
    while (!pq.empty()) {
      auto [lb, nid] = pq.front();
      std::pop_heap(pq.begin(), pq.end(), pq_cmp);
      pq.pop_back();
      if (lb >= best) break;
      if (bvh->left[nid] < 0) {
        for (int32_t k = 0; k < bvh->count[nid]; ++k) {
          int32_t p = bvh->order[bvh->start[nid] + k];
          best = std::min(best, prim_upper(ctx, p, c, hcell, best));
        }
      } else {
        for (int32_t ch : {bvh->left[nid], bvh->right[nid]}) {
          float lbc = lb_upper(ch);
          if (lbc < best) {
            pq.emplace_back(lbc, ch);
            std::push_heap(pq.begin(), pq.end(), pq_cmp);
          }
        }
      }
    }
    float thresh = best * (1.f + 1e-6f) + 1e-9f;

    band.clear();
    lows.clear();
    float ml;
    int64_t cnt = collect_band(ctx, c, hcell, thresh, &band, &ml, &lows);
    counts_out[i] = (int32_t)std::min<int64_t>(cnt, 0x7FFFFFFF);
    lcell_out[i] = ml;
    int32_t* row = rows_out + i * K;
    if ((int64_t)band.size() > K) {
      // over-K: keep the K NEAREST prims (smallest lower bound) — an
      // index-truncated row could drop the true closest entirely, while
      // the nearest-K row's error is bounded by the kept lowers' spread
      // (equidistant interior cells: a tiny fraction of the cell size)
      std::vector<int32_t> ord(band.size());
      for (size_t k = 0; k < ord.size(); ++k) ord[k] = (int32_t)k;
      std::nth_element(ord.begin(), ord.begin() + K, ord.end(),
                       [&](int32_t x, int32_t y) {
                         return lows[x] < lows[y];
                       });
      for (int64_t k = 0; k < K; ++k) row[k] = band[ord[k]];
      std::sort(row, row + K);
    } else {
      std::sort(band.begin(), band.end());
      int64_t n = (int64_t)band.size();
      for (int64_t k = 0; k < n; ++k) row[k] = band[k];
      for (int64_t k = n; k < K; ++k) row[k] = -1;
    }
  }
  delete bvh;
}

// counts (n_cells) + cell-min lower bound (n_cells): _count_pass parity
void grid_band_counts(const float* verts, int64_t n_verts,
                      const int32_t* indices, int64_t n_prims,
                      int32_t arity, int32_t dim, const float* centers,
                      int64_t n_cells, const float* hcell,
                      int32_t* counts_out, float* lcell_out) {
  (void)n_verts;
  BandBvh* bvh = band_bvh_build(verts, indices, n_prims, arity, dim);
  float hn = 0.f;
  for (int d = 0; d < dim; ++d) hn += hcell[d] * hcell[d];
  BandCtx ctx{verts, indices, arity, dim, bvh, std::sqrt(hn)};
  for (int64_t i = 0; i < n_cells; ++i) {
    const float* c = centers + i * dim;
    float M = min_upper(ctx, c, hcell);
    float thresh = M * (1.f + 1e-6f) + 1e-9f;
    float ml;
    int64_t cnt = collect_band(ctx, c, hcell, thresh, nullptr, &ml);
    counts_out[i] = (int32_t)std::min<int64_t>(cnt, 0x7FFFFFFF);
    lcell_out[i] = ml;
  }
  delete bvh;
}

// rows (n_cells * K, -1 pad, first K band prims ascending) + min lower:
// _band_pass parity (callers pass the FIT subset of cells)
void grid_band_rows(const float* verts, int64_t n_verts,
                    const int32_t* indices, int64_t n_prims, int32_t arity,
                    int32_t dim, const float* centers, int64_t n_cells,
                    const float* hcell, int32_t K, int32_t* rows_out,
                    float* lcell_out) {
  (void)n_verts;
  BandBvh* bvh = band_bvh_build(verts, indices, n_prims, arity, dim);
  float hn = 0.f;
  for (int d = 0; d < dim; ++d) hn += hcell[d] * hcell[d];
  BandCtx ctx{verts, indices, arity, dim, bvh, std::sqrt(hn)};
  std::vector<int32_t> band;
  for (int64_t i = 0; i < n_cells; ++i) {
    const float* c = centers + i * dim;
    float M = min_upper(ctx, c, hcell);
    float thresh = M * (1.f + 1e-6f) + 1e-9f;
    band.clear();
    float ml;
    collect_band(ctx, c, hcell, thresh, &band, &ml);
    std::sort(band.begin(), band.end());
    int32_t* row = rows_out + i * K;
    int64_t n = std::min<int64_t>((int64_t)band.size(), K);
    for (int64_t k = 0; k < n; ++k) row[k] = band[k];
    for (int64_t k = n; k < K; ++k) row[k] = -1;
    lcell_out[i] = ml;
  }
  delete bvh;
}

// ---------------------------------------------------------------------------
// Silhouette candidate grid (geometry/queries.grid_closest_silhouette's
// build pass).  Unlike the Dirichlet band, silhouette-ness is
// view-dependent, so per cell we compute:
//   Mcert  = min upper-distance over entities CERTIFIED silhouette from
//            every q in the cell (interval arithmetic on the two
//            adjacent-normal dot products);
//   rows   = the K nearest (by lower bound) entities not certified
//            NON-silhouette over the cell;
//   r_cap  = min(Mcert-threshold, smallest lower bound among excluded
//            entities) — the query returns min(found, r_cap), which is
//            exact when the true silhouette distance < r_cap and a valid
//            LOWER bound otherwise (star radii only need lower bounds, so
//            K-truncation costs step size, never correctness);
//   lbound = min lower bound over kept entities (lazy-skip hint).
// ---------------------------------------------------------------------------

namespace {

struct SilEnt {
  const float* p0;
  const float* p1;
  const float* n1;
  const float* n2;
  const uint8_t* always;
  int dim;
};

inline float pt_seg_dist(const float* q, const float* a, const float* b,
                         int dim) {
  float e[3], w[3];
  float den = 0.f, dot = 0.f;
  for (int d = 0; d < dim; ++d) {
    e[d] = b[d] - a[d];
    w[d] = q[d] - a[d];
    den += e[d] * e[d];
    dot += w[d] * e[d];
  }
  float t = den > 1e-30f ? clampf(dot / den, 0.f, 1.f) : 0.f;
  float d2 = 0.f;
  for (int d = 0; d < dim; ++d) {
    float r = w[d] - t * e[d];
    d2 += r * r;
  }
  return std::sqrt(d2);
}

// interval of dot(q - p0 - t*(p1-p0), n) over q in box(c, h), t in [0, 1]
inline void sil_dot_interval(const SilEnt& E, int64_t e, const float* n,
                             const float* c, const float* h, float* lo,
                             float* hi) {
  int dim = E.dim;
  const float* p0 = E.p0 + e * dim;
  const float* p1 = E.p1 + e * dim;
  float m = 0.f, rq = 0.f, de = 0.f;
  for (int d = 0; d < dim; ++d) {
    m += (c[d] - p0[d]) * n[d];
    rq += std::fabs(n[d]) * h[d];
    de += (p1[d] - p0[d]) * n[d];
  }
  *lo = m - rq - std::max(de, 0.f);
  *hi = m + rq - std::min(de, 0.f);
}

inline void sil_certify(const SilEnt& E, int64_t e, const float* c,
                        const float* h, bool* cert_sil, bool* cert_nonsil) {
  if (E.always[e]) {
    *cert_sil = true;
    *cert_nonsil = false;
    return;
  }
  float lo1, hi1, lo2, hi2;
  sil_dot_interval(E, e, E.n1 + e * E.dim, c, h, &lo1, &hi1);
  sil_dot_interval(E, e, E.n2 + e * E.dim, c, h, &lo2, &hi2);
  *cert_sil = (hi1 <= 0.f && lo2 >= 0.f) || (lo1 >= 0.f && hi2 <= 0.f);
  *cert_nonsil = (lo1 > 0.f && lo2 > 0.f) || (hi1 < 0.f && hi2 < 0.f);
}

// exact bounds of d(q, entity-segment) over the cell box
inline void sil_ent_bounds(const SilEnt& E, int64_t e, const float* c,
                           const float* h, float hnorm, float* lower,
                           float* upper) {
  int dim = E.dim;
  const float* a = E.p0 + e * dim;
  const float* b = E.p1 + e * dim;
  if (dim == 2) {
    float lo[2] = {c[0] - h[0], c[1] - h[1]};
    float hi[2] = {c[0] + h[0], c[1] + h[1]};
    float up = 0.f;
    for (int k = 0; k < 4; ++k) {
      float corner[2] = {k & 1 ? hi[0] : lo[0], k & 2 ? hi[1] : lo[1]};
      up = std::max(up, pt_seg_dist(corner, a, b, 2));
    }
    *upper = up;
    float cm = 1e30f;
    for (int k = 0; k < 4; ++k) {
      float corner[2] = {k & 1 ? hi[0] : lo[0], k & 2 ? hi[1] : lo[1]};
      cm = std::min(cm, pt_seg_dist(corner, a, b, 2));
    }
    float d_end = std::min(pt_box_dist(a, lo, hi, 2),
                           pt_box_dist(b, lo, hi, 2));
    *lower = seg_box_overlap_2d(a, b, lo, hi) ? 0.f : std::min(cm, d_end);
  } else {
    float d = pt_seg_dist(c, a, b, 3);
    *lower = std::max(d - hnorm, 0.f);
    float up = 0.f;
    for (int k = 0; k < 8; ++k) {
      float q[3] = {k & 1 ? c[0] + h[0] : c[0] - h[0],
                    k & 2 ? c[1] + h[1] : c[1] - h[1],
                    k & 4 ? c[2] + h[2] : c[2] - h[2]};
      up = std::max(up, pt_seg_dist(q, a, b, 3));
    }
    *upper = up;
  }
}

}  // namespace

// Single-level silhouette band grid.  rows_out: n_cells * K (-1 pad);
// rcap_out / lbound_out: n_cells.
void sil_band_rows(const float* p0, const float* p1, const float* n1,
                   const float* n2, const uint8_t* always, int64_t n_ent,
                   int32_t dim, const float* centers, int64_t n_cells,
                   const float* hcell, int32_t K, int32_t* rows_out,
                   float* rcap_out, float* lbound_out) {
  SilEnt E{p0, p1, n1, n2, always, dim};
  // BVH over entity segments (synthesize a 2-corner vertex/index layout)
  std::vector<float> bverts((size_t)2 * n_ent * dim);
  std::vector<int32_t> bidx((size_t)2 * n_ent);
  for (int64_t e = 0; e < n_ent; ++e) {
    for (int d = 0; d < dim; ++d) {
      bverts[(2 * e) * dim + d] = p0[e * dim + d];
      bverts[(2 * e + 1) * dim + d] = p1[e * dim + d];
    }
    bidx[2 * e] = (int32_t)(2 * e);
    bidx[2 * e + 1] = (int32_t)(2 * e + 1);
  }
  BandBvh* bvh = band_bvh_build(bverts.data(), bidx.data(), n_ent, 2, dim);
  float hn = 0.f;
  for (int d = 0; d < dim; ++d) hn += hcell[d] * hcell[d];
  hn = std::sqrt(hn);

  std::vector<std::pair<float, int32_t>> heap;  // max-heap by lower
  heap.reserve((size_t)K + 1);
  auto cmp = [](const std::pair<float, int32_t>& a,
                const std::pair<float, int32_t>& b) {
    return a.first < b.first;
  };
  // best-first frontier (min-heap by node bound): certified-silhouette
  // entities cluster on the silhouette ring — a DFS establishes its first
  // bound only after scanning ~half the tree from far cells, where
  // best-first reaches the ring in O(log E) pops
  std::vector<std::pair<float, int32_t>> pq;
  auto pq_cmp = [](const std::pair<float, int32_t>& a,
                   const std::pair<float, int32_t>& b) {
    return a.first > b.first;
  };

  for (int64_t i = 0; i < n_cells; ++i) {
    const float* c = centers + i * dim;
    BandCtx nctx{nullptr, nullptr, 0, dim, nullptr, hn};
    auto lb_upper = [&](int32_t nid) {
      return node_lb_upper(dim, c, hcell,
                           bvh->bmin.data() + (int64_t)nid * dim,
                           bvh->bmax.data() + (int64_t)nid * dim);
    };
    auto lb_lower = [&](int32_t nid) {
      return node_lb_lower(nctx, c, hcell,
                           bvh->bmin.data() + (int64_t)nid * dim,
                           bvh->bmax.data() + (int64_t)nid * dim);
    };

    // pass A (best-first): Mcert over certified-silhouette entities
    float best = 1e30f;
    pq.clear();
    pq.emplace_back(lb_upper(0), 0);
    while (!pq.empty()) {
      auto [lb, nid] = pq.front();
      std::pop_heap(pq.begin(), pq.end(), pq_cmp);
      pq.pop_back();
      if (lb >= best) break;                   // frontier is sorted: done
      if (bvh->left[nid] < 0) {
        for (int32_t k = 0; k < bvh->count[nid]; ++k) {
          int32_t e = bvh->order[bvh->start[nid] + k];
          bool cs, cn;
          sil_certify(E, e, c, hcell, &cs, &cn);
          if (!cs) continue;
          float lo_e, up_e;
          sil_ent_bounds(E, e, c, hcell, hn, &lo_e, &up_e);
          best = std::min(best, up_e);
        }
      } else {
        for (int32_t ch : {bvh->left[nid], bvh->right[nid]}) {
          float lbc = lb_upper(ch);
          if (lbc < best) {
            pq.emplace_back(lbc, ch);
            std::push_heap(pq.begin(), pq.end(), pq_cmp);
          }
        }
      }
    }
    float T = best < 1e29f ? best * (1.f + 1e-6f) + 1e-9f : 1e30f;

    // pass B (best-first): K nearest (by lower) possibly-sil entities —
    // nearest nodes fill the heap first, so ``worst`` tightens in O(K)
    heap.clear();
    float excl_min = 1e30f;
    auto worst = [&]() {
      return (int32_t)heap.size() >= K ? std::min(T, heap.front().first) : T;
    };
    pq.clear();
    pq.emplace_back(lb_lower(0), 0);
    while (!pq.empty()) {
      auto [lb, nid] = pq.front();
      std::pop_heap(pq.begin(), pq.end(), pq_cmp);
      pq.pop_back();
      float w = worst();
      if (lb > w) {
        excl_min = std::min(excl_min, lb);
        break;                                 // all remaining are farther
      }
      if (bvh->left[nid] < 0) {
        for (int32_t k = 0; k < bvh->count[nid]; ++k) {
          int32_t e = bvh->order[bvh->start[nid] + k];
          bool cs, cn;
          sil_certify(E, e, c, hcell, &cs, &cn);
          if (cn) continue;                    // can't win from this cell
          float lo_e, up_e;
          sil_ent_bounds(E, e, c, hcell, hn, &lo_e, &up_e);
          float w2 = worst();
          if (lo_e > w2) {
            excl_min = std::min(excl_min, lo_e);
            continue;
          }
          heap.emplace_back(lo_e, e);
          std::push_heap(heap.begin(), heap.end(), cmp);
          if ((int32_t)heap.size() > K) {
            std::pop_heap(heap.begin(), heap.end(), cmp);
            excl_min = std::min(excl_min, heap.back().first);
            heap.pop_back();
          }
        }
      } else {
        for (int32_t ch : {bvh->left[nid], bvh->right[nid]}) {
          float lbc = lb_lower(ch);
          float w3 = worst();
          if (lbc > w3) {
            excl_min = std::min(excl_min, lbc);
          } else {
            pq.emplace_back(lbc, ch);
            std::push_heap(pq.begin(), pq.end(), pq_cmp);
          }
        }
      }
    }

    int32_t* row = rows_out + i * K;
    float lb_min = 1e30f;
    int64_t n = (int64_t)heap.size();
    for (int64_t k = 0; k < n; ++k) {
      row[k] = heap[k].second;
      lb_min = std::min(lb_min, heap[k].first);
    }
    for (int64_t k = n; k < K; ++k) row[k] = -1;
    rcap_out[i] = std::min(T, excl_min);
    lbound_out[i] = lb_min;
  }
  delete bvh;
}

// Radius-complete K-nearest prim bands (the Neumann query grid).
//
// Per cell: the K prims with the smallest distance LOWER bound over the
// cell, plus r_cap = min over every exclusion event of the bound that
// excluded it (a heap-evicted prim's own lower, or a pruned NODE's
// cell-box-to-node-box bound, which lower-bounds the exact cell-to-prim
// distance of everything in the subtree).  Guarantee (the one the
// solver relies on; verified in tests/test_neumann_band.py): for any
// query point q inside the cell and any radius R <= r_cap, every prim
// intersecting the ball B(q, R) (and hence any ray segment of length
// <= R from q) is in the row — each excluded prim's exact distance from
// every cell point is >= r_cap.  WoSt clamps the star radius to r_cap,
// which is always valid (smaller star radii only cost extra steps),
// making the row a COMPLETE candidate set for the in-ball /
// ray-intersect / visibility queries of one walk step.
// Structure: sil_band_rows' pass B without the silhouette certification.
void prim_band_rows(const float* verts, int64_t n_verts,
                    const int32_t* indices, int64_t n_prims, int32_t arity,
                    int32_t dim, const float* centers, int64_t n_cells,
                    const float* hcell, int32_t K, int32_t* rows_out,
                    float* rcap_out, float* lbound_out) {
  (void)n_verts;
  BandBvh* bvh = band_bvh_build(verts, indices, n_prims, arity, dim);
  float hn = 0.f;
  for (int d = 0; d < dim; ++d) hn += hcell[d] * hcell[d];
  BandCtx ctx{verts, indices, arity, dim, bvh, std::sqrt(hn)};

  std::vector<std::pair<float, int32_t>> heap;  // max-heap by lower
  heap.reserve((size_t)K + 1);
  auto cmp = [](const std::pair<float, int32_t>& a,
                const std::pair<float, int32_t>& b) {
    return a.first < b.first;
  };
  std::vector<std::pair<float, int32_t>> pq;    // min-heap by node bound
  auto pq_cmp = [](const std::pair<float, int32_t>& a,
                   const std::pair<float, int32_t>& b) {
    return a.first > b.first;
  };

  for (int64_t i = 0; i < n_cells; ++i) {
    const float* c = centers + i * dim;
    auto lb_lower = [&](int32_t nid) {
      return node_lb_lower(ctx, c, hcell,
                           bvh->bmin.data() + (int64_t)nid * dim,
                           bvh->bmax.data() + (int64_t)nid * dim);
    };

    heap.clear();
    float excl_min = 1e30f;
    auto worst = [&]() {
      return (int32_t)heap.size() >= K ? heap.front().first : 1e30f;
    };
    pq.clear();
    pq.emplace_back(lb_lower(0), 0);
    while (!pq.empty()) {
      auto [lb, nid] = pq.front();
      std::pop_heap(pq.begin(), pq.end(), pq_cmp);
      pq.pop_back();
      float w = worst();
      if (lb > w) {
        excl_min = std::min(excl_min, lb);
        break;                                 // frontier sorted: done
      }
      if (bvh->left[nid] < 0) {
        for (int32_t k = 0; k < bvh->count[nid]; ++k) {
          int32_t p = bvh->order[bvh->start[nid] + k];
          float lo_p = prim_lower(ctx, p, c, hcell);
          float w2 = worst();
          if (lo_p > w2) {
            excl_min = std::min(excl_min, lo_p);
            continue;
          }
          heap.emplace_back(lo_p, p);
          std::push_heap(heap.begin(), heap.end(), cmp);
          if ((int32_t)heap.size() > K) {
            std::pop_heap(heap.begin(), heap.end(), cmp);
            excl_min = std::min(excl_min, heap.back().first);
            heap.pop_back();
          }
        }
      } else {
        for (int32_t ch : {bvh->left[nid], bvh->right[nid]}) {
          float lbc = lb_lower(ch);
          float w3 = worst();
          if (lbc > w3) {
            excl_min = std::min(excl_min, lbc);
          } else {
            pq.emplace_back(lbc, ch);
            std::push_heap(pq.begin(), pq.end(), pq_cmp);
          }
        }
      }
    }

    int32_t* row = rows_out + i * K;
    float lb_min = 1e30f;
    int64_t n = (int64_t)heap.size();
    for (int64_t k = 0; k < n; ++k) {
      row[k] = heap[k].second;
      lb_min = std::min(lb_min, heap[k].first);
    }
    for (int64_t k = n; k < K; ++k) row[k] = -1;
    rcap_out[i] = excl_min;
    lbound_out[i] = lb_min;
  }
  delete bvh;
}

}  // extern "C"
