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

}  // extern "C"
