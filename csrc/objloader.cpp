// Native OBJ loader — the C++ fast path behind models/obj.py.
//
// Re-implements the reference's TriangleMeshLoad.cpp:114-311 semantics
// (NOT its code): CTM applied to vertices at load, normals transformed
// by the inverse-transpose and normalized, faces read as triangles from
// the first three vertex tokens, missing normals generated from the
// face cross product and then averaged over each vertex's neighbor
// list (written back only to generated entries). Exposed as a plain C
// ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C csrc   (or g++ -O3 -shared -fPIC objloader.cpp -o libminiro.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>

namespace {

struct Vec3 { double x, y, z; };

struct MeshOut {
  std::vector<float> vertices;   // V*3
  std::vector<float> normals;    // N*3
  std::vector<float> texcoords;  // TC*2
  std::vector<int>   tri_v;      // T*3
  std::vector<int>   tri_n;      // T*3
  std::vector<int>   tri_t;      // T*3 (-1 when absent)
};

// column-vector 4x4 transform of a point / direction
static Vec3 xform_point(const double m[16], double x, double y, double z) {
  return {m[0] * x + m[1] * y + m[2] * z + m[3],
          m[4] * x + m[5] * y + m[6] * z + m[7],
          m[8] * x + m[9] * y + m[10] * z + m[11]};
}
static Vec3 xform_dir(const double m[16], double x, double y, double z) {
  return {m[0] * x + m[1] * y + m[2] * z,
          m[4] * x + m[5] * y + m[6] * z,
          m[8] * x + m[9] * y + m[10] * z};
}
static Vec3 normalize(Vec3 v) {
  double l = std::sqrt(v.x * v.x + v.y * v.y + v.z * v.z);
  if (l > 0) { v.x /= l; v.y /= l; v.z /= l; }
  return v;
}

// 'v/t/n' -> (v, t, n); 0 where missing (atoi semantics,
// TriangleMeshLoad.cpp:82-111)
static void parse_face_token(const char* tok, int* v, int* t, int* n) {
  *v = std::atoi(tok);
  *t = 0; *n = 0;
  const char* s = std::strchr(tok, '/');
  if (!s) return;
  ++s;
  if (*s != '/') *t = std::atoi(s);
  s = std::strchr(s, '/');
  if (!s) return;
  *n = std::atoi(s + 1);
}

}  // namespace

extern "C" {

// Opaque handle API: parse once, query sizes, copy out, free.
void* obj_parse(const char* path, const double* ctm /* 16, row-major */,
                const double* nctm /* 16, inverse-transpose */) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;

  auto* out = new MeshOut();
  std::vector<double> vx, vy, vz;        // raw transformed vertices
  std::vector<double> nrm;               // transformed normals (x,y,z)*
  std::vector<char> fix;                 // generated-normal flags
  std::unordered_map<int, std::vector<int>> neighbor;

  char line[4096];
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && line[1] == 'n') {
      double x, y, z;
      if (std::sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
        Vec3 n = normalize(xform_dir(nctm, x, y, z));
        nrm.push_back(n.x); nrm.push_back(n.y); nrm.push_back(n.z);
        fix.push_back(0);
      }
    } else if (line[0] == 'v' && line[1] == 't') {
      double u, v;
      if (std::sscanf(line + 2, "%lf %lf", &u, &v) == 2) {
        out->texcoords.push_back((float)u);
        out->texcoords.push_back((float)v);
      }
    } else if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      double x, y, z;
      if (std::sscanf(line + 1, "%lf %lf %lf", &x, &y, &z) == 3) {
        Vec3 p = xform_point(ctm, x, y, z);
        vx.push_back(p.x); vy.push_back(p.y); vz.push_back(p.z);
      }
    } else if (line[0] == 'f') {
      char t0[512], t1[512], t2[512];
      if (std::sscanf(line + 1, "%511s %511s %511s", t0, t1, t2) != 3)
        continue;
      int v[3], t[3], n[3];
      parse_face_token(t0, &v[0], &t[0], &n[0]);
      parse_face_token(t1, &v[1], &t[1], &n[1]);
      parse_face_token(t2, &v[2], &t[2], &n[2]);
      int vi[3] = {v[0] - 1, v[1] - 1, v[2] - 1};
      out->tri_v.insert(out->tri_v.end(), vi, vi + 3);
      if (t[0]) {
        out->tri_t.push_back(t[0] - 1);
        out->tri_t.push_back(t[1] - 1);
        out->tri_t.push_back(t[2] - 1);
      } else {
        out->tri_t.insert(out->tri_t.end(), {-1, -1, -1});
      }
      if (n[2]) {  // reference checks the LAST token's normal index
        out->tri_n.push_back(n[0] - 1);
        out->tri_n.push_back(n[1] - 1);
        out->tri_n.push_back(n[2] - 1);
        for (int c = 0; c < 3; ++c)
          neighbor[vi[c]].push_back(n[c] - 1);
      } else {
        // generate the face normal, replicated per corner
        double e1x = vx[vi[1]] - vx[vi[0]], e1y = vy[vi[1]] - vy[vi[0]],
               e1z = vz[vi[1]] - vz[vi[0]];
        double e2x = vx[vi[2]] - vx[vi[0]], e2y = vy[vi[2]] - vy[vi[0]],
               e2z = vz[vi[2]] - vz[vi[0]];
        Vec3 fn = normalize({e1y * e2z - e1z * e2y,
                             e1z * e2x - e1x * e2z,
                             e1x * e2y - e1y * e2x});
        int base = (int)(nrm.size() / 3);
        for (int c = 0; c < 3; ++c) {
          nrm.push_back(fn.x); nrm.push_back(fn.y); nrm.push_back(fn.z);
          fix.push_back(1);
          neighbor[vi[c]].push_back(base + c);
        }
        out->tri_n.push_back(base);
        out->tri_n.push_back(base + 1);
        out->tri_n.push_back(base + 2);
      }
    }
  }
  std::fclose(f);

  // averaging pass (TriangleMeshLoad.cpp:287-308): vertex average over
  // ALL neighbor normals, written back only to generated entries.
  // Reference quirk: the accumulator is a default Vector3, which the
  // reference initializes to (0, 1, 2) (Vector3.h:26-27) — the sum
  // starts there, visibly tilting generated normals of low-valence
  // vertices. The /=count before normalize() cancels; the offset stays.
  for (auto& kv : neighbor) {
    const std::vector<int>& lst = kv.second;
    double ax = 0, ay = 1, az = 2;
    for (int ni : lst) {
      ax += nrm[3 * ni]; ay += nrm[3 * ni + 1]; az += nrm[3 * ni + 2];
    }
    Vec3 avg = normalize({ax, ay, az});
    for (int ni : lst) {
      if (fix[ni]) {
        nrm[3 * ni] = avg.x; nrm[3 * ni + 1] = avg.y; nrm[3 * ni + 2] = avg.z;
      }
    }
  }

  out->vertices.resize(vx.size() * 3);
  for (size_t i = 0; i < vx.size(); ++i) {
    out->vertices[3 * i] = (float)vx[i];
    out->vertices[3 * i + 1] = (float)vy[i];
    out->vertices[3 * i + 2] = (float)vz[i];
  }
  out->normals.resize(nrm.size());
  for (size_t i = 0; i < nrm.size(); ++i) out->normals[i] = (float)nrm[i];
  return out;
}

int obj_num_vertices(void* h) { return (int)(((MeshOut*)h)->vertices.size() / 3); }
int obj_num_normals(void* h) { return (int)(((MeshOut*)h)->normals.size() / 3); }
int obj_num_texcoords(void* h) { return (int)(((MeshOut*)h)->texcoords.size() / 2); }
int obj_num_tris(void* h) { return (int)(((MeshOut*)h)->tri_v.size() / 3); }

void obj_copy(void* h, float* vertices, float* normals, float* texcoords,
              int* tri_v, int* tri_n, int* tri_t) {
  MeshOut* m = (MeshOut*)h;
  std::memcpy(vertices, m->vertices.data(), m->vertices.size() * 4);
  std::memcpy(normals, m->normals.data(), m->normals.size() * 4);
  if (!m->texcoords.empty())
    std::memcpy(texcoords, m->texcoords.data(), m->texcoords.size() * 4);
  std::memcpy(tri_v, m->tri_v.data(), m->tri_v.size() * 4);
  std::memcpy(tri_n, m->tri_n.data(), m->tri_n.size() * 4);
  std::memcpy(tri_t, m->tri_t.data(), m->tri_t.size() * 4);
}

void obj_free(void* h) { delete (MeshOut*)h; }

}  // extern "C"
