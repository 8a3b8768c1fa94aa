// tpurt native runtime: fast OBJ loading + binned-SAH CPU BVH builder.
//
// TPU-native counterpart of the reference's native layer: the reference does
// all of this in C++ too (tiny_obj_loader parsing + BVHBuilder::build's
// recursive SAH split and depth-first flatten with skip links
// [Source/BVHBuilder.cpp, RECALL — written from behavior, not copied]).
// Here the hot render path is JAX/Pallas on the TPU; this library covers the
// host-side runtime where native code actually pays off:
//   * OBJ parsing (Python parsing is ~50x slower on Sponza-sized files)
//   * the CPU golden-oracle BVH used by the test pyramid
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libtpurt_native.so)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ loading
// ---------------------------------------------------------------------------

struct ObjMesh {
  std::vector<float> positions;   // 3 * num_positions
  std::vector<float> normals;     // 3 * num_normals (file order)
  std::vector<int32_t> tri_pos;   // 3 * num_tris position indices
  std::vector<int32_t> tri_nrm;   // 3 * num_tris normal indices (-1 if none)
  std::vector<int32_t> tri_mtl;   // num_tris material index (-1 if none)
  std::vector<std::string> mtl_names;  // usemtl names, first-use order
  std::string mtllibs;            // '\n'-separated mtllib filenames
};

static const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Parses one face corner token "v", "v/t", "v//n", "v/t/n".
static void parse_corner(const char*& p, const char* end, long np, long nn,
                         int32_t* pos_idx, int32_t* nrm_idx) {
  char* q;
  long v = strtol(p, &q, 10);
  p = q;
  *pos_idx = (int32_t)(v > 0 ? v - 1 : np + v);
  *nrm_idx = -1;
  if (p < end && *p == '/') {
    ++p;
    if (p < end && *p != '/') {
      strtol(p, &q, 10);  // texcoord index, ignored
      p = q;
    }
    if (p < end && *p == '/') {
      ++p;
      long n = strtol(p, &q, 10);
      p = q;
      *nrm_idx = (int32_t)(n > 0 ? n - 1 : nn + n);
    }
  }
}

ObjMesh* obj_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf((size_t)size + 1);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);
  buf[(size_t)size] = '\n';

  ObjMesh* m = new ObjMesh();
  int32_t cur_mtl = -1;
  const char* p = buf.data();
  const char* end = buf.data() + size;
  while (p < end) {
    const char* line_end = (const char*)memchr(p, '\n', (size_t)(end - p));
    if (!line_end) line_end = end;
    const char* c = skip_ws(p, line_end);
    if (c + 6 < line_end && memcmp(c, "usemtl", 6) == 0 &&
        (c[6] == ' ' || c[6] == '\t')) {
      const char* n0 = skip_ws(c + 7, line_end);
      const char* n1 = line_end;
      while (n1 > n0 && (n1[-1] == ' ' || n1[-1] == '\t' || n1[-1] == '\r'))
        --n1;
      std::string name(n0, (size_t)(n1 - n0));
      cur_mtl = -1;
      for (size_t k = 0; k < m->mtl_names.size(); ++k)
        if (m->mtl_names[k] == name) { cur_mtl = (int32_t)k; break; }
      if (cur_mtl < 0) {
        cur_mtl = (int32_t)m->mtl_names.size();
        m->mtl_names.push_back(name);
      }
    } else if (c + 6 < line_end && memcmp(c, "mtllib", 6) == 0 &&
               (c[6] == ' ' || c[6] == '\t')) {
      const char* n0 = skip_ws(c + 7, line_end);
      const char* n1 = line_end;
      while (n1 > n0 && (n1[-1] == ' ' || n1[-1] == '\t' || n1[-1] == '\r'))
        --n1;
      if (n1 > n0) {
        if (!m->mtllibs.empty()) m->mtllibs += '\n';
        m->mtllibs.append(n0, (size_t)(n1 - n0));
      }
    } else if (c + 1 < line_end && c[0] == 'v' &&
        (c[1] == ' ' || c[1] == '\t')) {
      char* q;
      float x = strtof(c + 2, &q);
      float y = strtof(q, &q);
      float z = strtof(q, &q);
      m->positions.push_back(x);
      m->positions.push_back(y);
      m->positions.push_back(z);
    } else if (c + 2 < line_end && c[0] == 'v' && c[1] == 'n' &&
               (c[2] == ' ' || c[2] == '\t')) {
      char* q;
      float x = strtof(c + 3, &q);
      float y = strtof(q, &q);
      float z = strtof(q, &q);
      m->normals.push_back(x);
      m->normals.push_back(y);
      m->normals.push_back(z);
    } else if (c + 1 < line_end && c[0] == 'f' &&
               (c[1] == ' ' || c[1] == '\t')) {
      long np = (long)m->positions.size() / 3;
      long nn = (long)m->normals.size() / 3;
      int32_t pidx[64], nidx[64];
      int count = 0;
      const char* t = c + 2;
      while (count < 64) {
        t = skip_ws(t, line_end);
        if (t >= line_end || !(isdigit(*t) || *t == '-')) break;
        parse_corner(t, line_end, np, nn, &pidx[count], &nidx[count]);
        ++count;
      }
      for (int k = 1; k + 1 < count; ++k) {  // fan triangulation
        m->tri_pos.push_back(pidx[0]);
        m->tri_pos.push_back(pidx[k]);
        m->tri_pos.push_back(pidx[k + 1]);
        m->tri_nrm.push_back(nidx[0]);
        m->tri_nrm.push_back(nidx[k]);
        m->tri_nrm.push_back(nidx[k + 1]);
        m->tri_mtl.push_back(cur_mtl);
      }
    }
    p = line_end + 1;
  }
  return m;
}

int64_t obj_num_positions(ObjMesh* m) { return (int64_t)m->positions.size() / 3; }
int64_t obj_num_normals(ObjMesh* m) { return (int64_t)m->normals.size() / 3; }
int64_t obj_num_tris(ObjMesh* m) { return (int64_t)m->tri_pos.size() / 3; }
void obj_copy_positions(ObjMesh* m, float* out) {
  memcpy(out, m->positions.data(), m->positions.size() * sizeof(float));
}
void obj_copy_normals(ObjMesh* m, float* out) {
  memcpy(out, m->normals.data(), m->normals.size() * sizeof(float));
}
void obj_copy_tris(ObjMesh* m, int32_t* pos_out, int32_t* nrm_out) {
  memcpy(pos_out, m->tri_pos.data(), m->tri_pos.size() * sizeof(int32_t));
  memcpy(nrm_out, m->tri_nrm.data(), m->tri_nrm.size() * sizeof(int32_t));
}
void obj_copy_tri_mtl(ObjMesh* m, int32_t* out) {
  memcpy(out, m->tri_mtl.data(), m->tri_mtl.size() * sizeof(int32_t));
}
// Material / mtllib names as one '\n'-separated buffer each.
static std::string join_names(const std::vector<std::string>& v) {
  std::string s;
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) s += '\n';
    s += v[i];
  }
  return s;
}
int64_t obj_mtl_names_len(ObjMesh* m) {
  return (int64_t)join_names(m->mtl_names).size();
}
void obj_copy_mtl_names(ObjMesh* m, char* out) {
  std::string s = join_names(m->mtl_names);
  memcpy(out, s.data(), s.size());
}
int64_t obj_mtllibs_len(ObjMesh* m) { return (int64_t)m->mtllibs.size(); }
void obj_copy_mtllibs(ObjMesh* m, char* out) {
  memcpy(out, m->mtllibs.data(), m->mtllibs.size());
}
void obj_free(ObjMesh* m) { delete m; }

// ---------------------------------------------------------------------------
// Binned-SAH BVH (flattened depth-first with skip links)
// ---------------------------------------------------------------------------

struct BvhBuilder {
  // outputs (see tpurt/bvh/reference.py CpuBVH for the matching layout)
  std::vector<float> bb_min, bb_max;     // 3 * num_nodes
  std::vector<int32_t> prim_start, prim_count, skip;
  std::vector<int32_t> order;            // triangle permutation
  // scratch
  std::vector<float> tmin, tmax, cent;   // 3 * num_tris
  int leaf_size = 4;
};

static void emit(BvhBuilder* b, int32_t lo, int32_t hi) {
  const int NB = 16;
  size_t my = b->bb_min.size() / 3;
  float bmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
  float bmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
  float cmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
  float cmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
  for (int32_t i = lo; i < hi; ++i) {
    int32_t t = b->order[(size_t)i];
    for (int a = 0; a < 3; ++a) {
      bmin[a] = std::min(bmin[a], b->tmin[3 * (size_t)t + a]);
      bmax[a] = std::max(bmax[a], b->tmax[3 * (size_t)t + a]);
      cmin[a] = std::min(cmin[a], b->cent[3 * (size_t)t + a]);
      cmax[a] = std::max(cmax[a], b->cent[3 * (size_t)t + a]);
    }
  }
  for (int a = 0; a < 3; ++a) {
    b->bb_min.push_back(bmin[a]);
    b->bb_max.push_back(bmax[a]);
  }
  b->prim_start.push_back(-1);
  b->prim_count.push_back(0);
  b->skip.push_back(-1);

  float ext[3] = {cmax[0] - cmin[0], cmax[1] - cmin[1], cmax[2] - cmin[2]};
  int axis = ext[1] > ext[0] ? 1 : 0;
  if (ext[2] > ext[axis]) axis = 2;
  if (hi - lo <= b->leaf_size || ext[axis] <= 1e-12f) {
    b->prim_start[my] = lo;
    b->prim_count[my] = hi - lo;
    b->skip[my] = (int32_t)my + 1;
    return;
  }

  // Binned SAH along the longest centroid axis.
  float inv = (float)NB / ext[axis];
  int32_t counts[NB] = {0};
  float bmins[NB][3], bmaxs[NB][3];
  for (int k = 0; k < NB; ++k)
    for (int a = 0; a < 3; ++a) {
      bmins[k][a] = 3.4e38f;
      bmaxs[k][a] = -3.4e38f;
    }
  for (int32_t i = lo; i < hi; ++i) {
    int32_t t = b->order[(size_t)i];
    int k = (int)((b->cent[3 * (size_t)t + axis] - cmin[axis]) * inv);
    k = std::min(std::max(k, 0), NB - 1);
    ++counts[k];
    for (int a = 0; a < 3; ++a) {
      bmins[k][a] = std::min(bmins[k][a], b->tmin[3 * (size_t)t + a]);
      bmaxs[k][a] = std::max(bmaxs[k][a], b->tmax[3 * (size_t)t + a]);
    }
  }
  auto area = [](const float lo3[3], const float hi3[3]) {
    float d0 = std::max(hi3[0] - lo3[0], 0.f);
    float d1 = std::max(hi3[1] - lo3[1], 0.f);
    float d2 = std::max(hi3[2] - lo3[2], 0.f);
    return d0 * d1 + d1 * d2 + d2 * d0;
  };
  float best = 3.4e38f;
  int best_k = -1;
  for (int k = 1; k < NB; ++k) {
    float lmin[3] = {3.4e38f, 3.4e38f, 3.4e38f},
          lmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    float rmin[3] = {3.4e38f, 3.4e38f, 3.4e38f},
          rmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    int32_t nl = 0, nr = 0;
    for (int j = 0; j < k; ++j) {
      nl += counts[j];
      for (int a = 0; a < 3; ++a) {
        lmin[a] = std::min(lmin[a], bmins[j][a]);
        lmax[a] = std::max(lmax[a], bmaxs[j][a]);
      }
    }
    for (int j = k; j < NB; ++j) {
      nr += counts[j];
      for (int a = 0; a < 3; ++a) {
        rmin[a] = std::min(rmin[a], bmins[j][a]);
        rmax[a] = std::max(rmax[a], bmaxs[j][a]);
      }
    }
    if (!nl || !nr) continue;
    float cost = nl * area(lmin, lmax) + nr * area(rmin, rmax);
    if (cost < best) {
      best = cost;
      best_k = k;
    }
  }
  int32_t mid;
  if (best_k < 0) {
    mid = lo + (hi - lo) / 2;
    std::nth_element(
        b->order.begin() + lo, b->order.begin() + mid, b->order.begin() + hi,
        [&](int32_t x, int32_t y) {
          return b->cent[3 * (size_t)x + axis] < b->cent[3 * (size_t)y + axis];
        });
  } else {
    float split = cmin[axis] + (float)best_k / inv;
    auto it = std::partition(
        b->order.begin() + lo, b->order.begin() + hi, [&](int32_t t) {
          return b->cent[3 * (size_t)t + axis] < split;
        });
    mid = (int32_t)(it - b->order.begin());
    if (mid == lo || mid == hi) mid = lo + (hi - lo) / 2;
  }
  emit(b, lo, mid);
  emit(b, mid, hi);
  b->skip[my] = (int32_t)(b->bb_min.size() / 3);
}

BvhBuilder* bvh_build(const float* vertices, int64_t /*num_vertices*/,
                      const int32_t* indices, int64_t num_tris,
                      int32_t leaf_size) {
  BvhBuilder* b = new BvhBuilder();
  b->leaf_size = leaf_size;
  b->tmin.resize(3 * (size_t)num_tris);
  b->tmax.resize(3 * (size_t)num_tris);
  b->cent.resize(3 * (size_t)num_tris);
  b->order.resize((size_t)num_tris);
  for (int64_t t = 0; t < num_tris; ++t) {
    b->order[(size_t)t] = (int32_t)t;
    for (int a = 0; a < 3; ++a) {
      float v0 = vertices[3 * (size_t)indices[3 * t] + a];
      float v1 = vertices[3 * (size_t)indices[3 * t + 1] + a];
      float v2 = vertices[3 * (size_t)indices[3 * t + 2] + a];
      float lo3 = std::min(v0, std::min(v1, v2));
      float hi3 = std::max(v0, std::max(v1, v2));
      b->tmin[3 * (size_t)t + a] = lo3;
      b->tmax[3 * (size_t)t + a] = hi3;
      b->cent[3 * (size_t)t + a] = 0.5f * (lo3 + hi3);
    }
  }
  emit(b, 0, (int32_t)num_tris);
  return b;
}

int64_t bvh_num_nodes(BvhBuilder* b) { return (int64_t)b->prim_count.size(); }
void bvh_copy(BvhBuilder* b, float* bb_min, float* bb_max,
              int32_t* prim_start, int32_t* prim_count, int32_t* skip,
              int32_t* order) {
  memcpy(bb_min, b->bb_min.data(), b->bb_min.size() * sizeof(float));
  memcpy(bb_max, b->bb_max.data(), b->bb_max.size() * sizeof(float));
  memcpy(prim_start, b->prim_start.data(),
         b->prim_start.size() * sizeof(int32_t));
  memcpy(prim_count, b->prim_count.data(),
         b->prim_count.size() * sizeof(int32_t));
  memcpy(skip, b->skip.data(), b->skip.size() * sizeof(int32_t));
  memcpy(order, b->order.data(), b->order.size() * sizeof(int32_t));
}
void bvh_free(BvhBuilder* b) { delete b; }

}  // extern "C"
