// Reference-semantics CPU line-triangulation engine (baseline harness).
//
// The upstream LIMAP engine (C++/OpenMP, per-object loops) cannot be
// built in this environment (its COLMAP/PoseLib/Ceres dependencies are
// CMake FetchContent = network).  This standalone binary re-implements
// the reference triangulator's hot path with the reference's own
// architecture — per-image incremental loop, per-line-node proposal
// generation, O(tris^2) scoring, greedy union-find clustering — so
// bench.py can measure the TPU pipeline against a real native CPU
// engine on identical inputs.
//
// Semantics mirror limap_tpu/testing/reference_oracle.py, which is the
// f64 transcription of (reference paths):
//   proposals:  triangulation/base_line_triangulator.cc:160-337
//   functions:  triangulation/functions.cc:77-233
//   scoring:    triangulation/global_line_triangulator.cc:71-161
//   clustering: global_line_triangulator.cc:234-351, merging/merging.cc:18-104
//   aggregation: merging/aggregator.cc:53-103
// OpenMP parallelism matches the reference's granularity
// (base_line_triangulator.cc:172: parallel over a node's candidates;
// here: parallel over an image's line nodes, which is the same work
// partitioned at least as favorably).
//
// Input: binary scene file (see read_scene below; written by bench.py).
// Output: one JSON line with stage timings and track stats.
//
// Build: g++ -O3 -march=native -fopenmp -std=c++17 ref_engine.cpp -o ref_engine

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <numeric>
#include <set>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

static const double EPS = 1e-12;

struct V3 {
  double x = 0, y = 0, z = 0;
  V3() = default;
  V3(double a, double b, double c) : x(a), y(b), z(c) {}
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
static inline double dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }
static inline V3 normalized(const V3& a) {
  double n = norm(a);
  return n > EPS ? a * (1.0 / n) : a;
}

struct M3 {
  double m[3][3] = {};
  V3 mul(const V3& v) const {
    return {m[0][0] * v.x + m[0][1] * v.y + m[0][2] * v.z,
            m[1][0] * v.x + m[1][1] * v.y + m[1][2] * v.z,
            m[2][0] * v.x + m[2][1] * v.y + m[2][2] * v.z};
  }
  V3 tmul(const V3& v) const {  // transpose * v
    return {m[0][0] * v.x + m[1][0] * v.y + m[2][0] * v.z,
            m[0][1] * v.x + m[1][1] * v.y + m[2][1] * v.z,
            m[0][2] * v.x + m[1][2] * v.y + m[2][2] * v.z};
  }
  M3 mulm(const M3& o) const {
    M3 r;
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        double s = 0;
        for (int k = 0; k < 3; k++) s += m[i][k] * o.m[k][j];
        r.m[i][j] = s;
      }
    return r;
  }
  M3 tmulm(const M3& o) const {  // transpose(this) * o
    M3 r;
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        double s = 0;
        for (int k = 0; k < 3; k++) s += m[k][i] * o.m[k][j];
        r.m[i][j] = s;
      }
    return r;
  }
};

// Solve 3x3 linear system A x = b (partial-pivot Gaussian elimination).
static bool solve3(double A[3][3], const double b[3], double x[3]) {
  double M[3][4];
  for (int i = 0; i < 3; i++) {
    for (int j = 0; j < 3; j++) M[i][j] = A[i][j];
    M[i][3] = b[i];
  }
  for (int c = 0; c < 3; c++) {
    int p = c;
    for (int r = c + 1; r < 3; r++)
      if (std::fabs(M[r][c]) > std::fabs(M[p][c])) p = r;
    if (std::fabs(M[p][c]) < 1e-15) return false;
    if (p != c)
      for (int j = 0; j < 4; j++) std::swap(M[p][j], M[c][j]);
    for (int r = 0; r < 3; r++) {
      if (r == c) continue;
      double f = M[r][c] / M[c][c];
      for (int j = c; j < 4; j++) M[r][j] -= f * M[c][j];
    }
  }
  for (int i = 0; i < 3; i++) x[i] = M[i][3] / M[i][i];
  return true;
}

struct Seg2 {
  double sx, sy, ex, ey;
  double length() const {
    return std::hypot(ex - sx, ey - sy);
  }
};

struct Seg3 {
  V3 s, e;
  V3 direction() const { return normalized(e - s); }
  double length() const { return norm(e - s); }
  V3 midpoint() const { return (s + e) * 0.5; }
};

struct View {
  M3 K, Kinv, R;
  V3 t;
  V3 center() const { return R.tmul(t) * -1.0; }
  V3 ray_direction(double u, double v) const {
    return normalized(R.tmul(Kinv.mul({u, v, 1.0})));
  }
  double projdepth(const V3& p) const { return (R.mul(p) + t).z; }
  void project(const V3& p, double* u, double* v) const {
    V3 q = K.mul(R.mul(p) + t);
    *u = q.x / q.z;
    *v = q.y / q.z;
  }
  double focal() const { return 0.5 * (K.m[0][0] + K.m[1][1]); }
};

// ------------------------------------------------------------- geometry

static V3 normal_direction(const Seg2& l, const View& v) {
  V3 cs = v.R.tmul(v.Kinv.mul({l.sx, l.sy, 1.0}));
  V3 ce = v.R.tmul(v.Kinv.mul({l.ex, l.ey, 1.0}));
  return normalized(cross(cs, ce));
}

static void coords2d(const Seg2& l, double c[3]) {
  // cross([sx,sy,1],[ex,ey,1]) normalized by ||c[:2]||
  double cx = l.sy - l.ey, cy = l.ex - l.sx,
         cz = l.sx * l.ey - l.sy * l.ex;
  double n = std::max(std::hypot(cx, cy), EPS);
  c[0] = cx / n;
  c[1] = cy / n;
  c[2] = cz / n;
}

static double epipolar_iou(const Seg2& l1, const View& v1, const Seg2& l2,
                           const View& v2) {
  // F = K2^-T (tskew relR) K1^-1, relR = R2 * R1^T
  M3 relR;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += v2.R.m[i][k] * v1.R.m[j][k];
      relR.m[i][j] = s;
    }
  V3 relT = v2.t - relR.mul(v1.t);
  M3 tsk;
  tsk.m[0][1] = -relT.z; tsk.m[0][2] = relT.y;
  tsk.m[1][0] = relT.z;  tsk.m[1][2] = -relT.x;
  tsk.m[2][0] = -relT.y; tsk.m[2][1] = relT.x;
  M3 E = tsk.mulm(relR);
  // F = Kinv2^T * E * Kinv1
  M3 F = M3(v2.Kinv).tmulm(E).mulm(v1.Kinv);

  double coor_l2[3];
  coords2d(l2, coor_l2);
  auto intersect = [&](double px, double py, double* qx, double* qy) {
    V3 ep = F.mul({px, py, 1.0});
    double n = std::sqrt(dot(ep, ep));
    ep = ep * (1.0 / n);
    // h = cross(coor_l2, ep)
    double hx = coor_l2[1] * ep.z - coor_l2[2] * ep.y;
    double hy = coor_l2[2] * ep.x - coor_l2[0] * ep.z;
    double hz = coor_l2[0] * ep.y - coor_l2[1] * ep.x;
    *qx = hx / hz;
    *qy = hy / hz;
  };
  double c1x, c1y, c2x, c2y;
  intersect(l1.sx, l1.sy, &c1x, &c1y);
  intersect(l1.ex, l1.ey, &c2x, &c2y);
  double len = l2.length();
  double dx = (l2.ex - l2.sx) / std::max(len, EPS),
         dy = (l2.ey - l2.sy) / std::max(len, EPS);
  double c1 = ((c1x - l2.sx) * dx + (c1y - l2.sy) * dy) / len;
  double c2 = ((c2x - l2.sx) * dx + (c2y - l2.sy) * dy) / len;
  if (c1 > c2) std::swap(c1, c2);
  return (std::min(c2, 1.0) - std::max(c1, 0.0)) /
         (std::max(c2, 1.0) - std::min(c1, 0.0));
}

static bool algebraic_triangulation(const Seg2& l1, const View& v1,
                                    const Seg2& l2, const View& v2,
                                    Seg3* out, double* z1s, double* z1e) {
  V3 c1s = v1.ray_direction(l1.sx, l1.sy);
  V3 c1e = v1.ray_direction(l1.ex, l1.ey);
  V3 c2s = v2.ray_direction(l2.sx, l2.sy);
  V3 c2e = v2.ray_direction(l2.ex, l2.ey);
  V3 C1 = v1.center();
  V3 B = v2.center() - C1;
  auto solve_one = [&](const V3& c1, V3* p) {
    double A[3][3] = {{c1.x, -c2s.x, -c2e.x},
                      {c1.y, -c2s.y, -c2e.y},
                      {c1.z, -c2s.z, -c2e.z}};
    double b[3] = {B.x, B.y, B.z}, x[3];
    if (!solve3(A, b, x)) return false;
    *p = c1 * x[0] + C1;
    return std::isfinite(p->x) && std::isfinite(p->y) && std::isfinite(p->z);
  };
  V3 ps, pe;
  if (!solve_one(c1s, &ps) || !solve_one(c1e, &pe)) return false;
  *z1s = v1.projdepth(ps);
  *z1e = v1.projdepth(pe);
  if (*z1s < EPS || *z1e < EPS) return false;
  if (v2.projdepth(ps) < EPS || v2.projdepth(pe) < EPS) return false;
  out->s = ps;
  out->e = pe;
  return true;
}

static double sensitivity(const Seg3& l, const View& v) {
  double us, vs, ue, ve;
  v.project(l.s, &us, &vs);
  v.project(l.e, &ue, &ve);
  V3 ray = v.ray_direction(0.5 * (us + ue), 0.5 * (vs + ve));
  double c = std::min(std::fabs(dot(l.direction(), ray)), 1.0);
  return 90.0 - std::acos(c) * 180.0 / M_PI;
}

static double line3d_uncertainty(const Seg3& l, const View& v, double var2d) {
  double d = 0.5 * (v.projdepth(l.s) + v.projdepth(l.e));
  return var2d * d / v.focal();
}

// -------------------------------------------------- 2D/3D distances

template <class SEG>
static double angle_deg(const SEG& a, const SEG& b);

static double angle_deg2(const Seg2& a, const Seg2& b) {
  double ax = a.ex - a.sx, ay = a.ey - a.sy;
  double bx = b.ex - b.sx, by = b.ey - b.sy;
  double na = std::max(std::hypot(ax, ay), EPS),
         nb = std::max(std::hypot(bx, by), EPS);
  double c = std::min(std::fabs((ax * bx + ay * by) / (na * nb)), 1.0);
  return std::acos(c) * 180.0 / M_PI;
}
static double angle_deg3(const Seg3& a, const Seg3& b) {
  double c = std::min(std::fabs(dot(a.direction(), b.direction())), 1.0);
  return std::acos(c) * 180.0 / M_PI;
}

static double overlap2(const Seg2& l1, const Seg2& l2) {
  double len = l2.length();
  double vx = (l2.ex - l2.sx) / std::max(len, EPS),
         vy = (l2.ey - l2.sy) / std::max(len, EPS);
  double p1 = ((l1.sx - l2.sx) * vx + (l1.sy - l2.sy) * vy) / len;
  double p2 = ((l1.ex - l2.sx) * vx + (l1.ey - l2.sy) * vy) / len;
  if (p1 > p2) std::swap(p1, p2);
  return std::min(p2, 1.0) - std::max(p1, 0.0);
}
static double bioverlap2(const Seg2& a, const Seg2& b) {
  return std::max(overlap2(a, b), overlap2(b, a));
}
static double overlap3(const Seg3& l1, const Seg3& l2) {
  double len = l2.length();
  V3 v = l2.direction();
  double p1 = dot(l1.s - l2.s, v) / len;
  double p2 = dot(l1.e - l2.s, v) / len;
  if (p1 > p2) std::swap(p1, p2);
  return std::min(p2, 1.0) - std::max(p1, 0.0);
}
static double bioverlap3(const Seg3& a, const Seg3& b) {
  return std::max(overlap3(a, b), overlap3(b, a));
}

static void perp_oneway2(const Seg2& l1, const Seg2& l2, double out[2]) {
  double len = std::max(l2.length(), EPS);
  double vx = (l2.ex - l2.sx) / len, vy = (l2.ey - l2.sy) / len;
  double px[2] = {l1.sx, l1.ex}, py[2] = {l1.sy, l1.ey};
  for (int i = 0; i < 2; i++) {
    double dxp = px[i] - l2.sx, dyp = py[i] - l2.sy;
    double d2 = dxp * dxp + dyp * dyp;
    double t = dxp * vx + dyp * vy;
    out[i] = std::sqrt(std::max(d2 - t * t, 0.0));
  }
}
static double perp2(const Seg2& a, const Seg2& b) {
  double o1[2], o2[2];
  perp_oneway2(a, b, o1);
  perp_oneway2(b, a, o2);
  return std::max(std::max(o1[0], o1[1]), std::max(o2[0], o2[1]));
}
static void perp_oneway3(const Seg3& l1, const Seg3& l2, double out[2]) {
  V3 v = l2.direction();
  const V3* ps[2] = {&l1.s, &l1.e};
  for (int i = 0; i < 2; i++) {
    V3 disp = *ps[i] - l2.s;
    double d2 = dot(disp, disp);
    double t = dot(disp, v);
    out[i] = std::sqrt(std::max(d2 - t * t, 0.0));
  }
}
static double perp3(const Seg3& a, const Seg3& b) {
  double o1[2], o2[2];
  perp_oneway3(a, b, o1);
  perp_oneway3(b, a, o2);
  return std::max(std::max(o1[0], o1[1]), std::max(o2[0], o2[1]));
}

static bool innerseg3(const Seg3& l1, const Seg3& l2, Seg3* out) {
  V3 dir1 = l1.direction();
  double denom = dot(l2.e - l2.s, dir1) + EPS;
  double t1 = dot(l1.s - l2.s, dir1) / denom;
  double t2 = dot(l1.e - l2.s, dir1) / denom;
  if (t1 > t2) std::swap(t1, t2);
  if (t1 >= 1.0 || t2 <= 0.0) return false;
  out->s = l2.s + (l2.e - l2.s) * std::max(t1, 0.0);
  out->e = l2.s + (l2.e - l2.s) * std::min(t2, 1.0);
  return true;
}
static double dist_innerseg3(const Seg3& l1, const Seg3& l2, bool* ok) {
  Seg3 a, b;
  *ok = innerseg3(l2, l1, &a) && innerseg3(l1, l2, &b);
  if (!*ok) return 1e30;
  return perp3(a, b);
}

static double scaleinv_oneway3(const Seg3& l1, const Seg3& l2, double z1s,
                               double z1e) {
  double ds = norm(l1.s - l2.s), de = norm(l1.e - l2.e);
  return std::max(ds / (z1s + EPS), de / (z1e + EPS));
}

// ----------------------------------------------------------------- linker

static inline double expscore(double v, double sigma) {
  double r = v / sigma;
  return std::exp(-r * r / 2.0);
}
static inline double multiplier(double score_th) {
  return 1.0 / std::sqrt(-std::log(score_th) * 2.0);
}
static inline double gate(double s, double th) { return s >= th ? s : 0.0; }

struct Linker2dCfg {
  double score_th = 0.5, th_angle = 8.0, th_overlap = 0.1,
         th_smartoverlap = 0.2, th_smartangle = 1.0, th_perp = 5.0;
  bool use_angle = true, use_overlap = true, use_smartangle = true,
       use_perp = true, use_innerseg = false;
};

struct Linker3dCfg {
  double score_th = 0.5, th_angle = 10.0, th_overlap = 0.01,
         th_smartoverlap = 0.1, th_smartangle = 1.0, th_perp = 0.02,
         th_innerseg = 0.02, th_scaleinv = 0.01;
  bool use_angle = true, use_overlap = true, use_smartangle = true,
       use_perp = false, use_innerseg = true, use_scaleinv = false;
  Linker3dCfg shared_parent_scoring() const {
    Linker3dCfg c = *this;
    c.use_angle = true; c.use_overlap = false; c.use_perp = false;
    c.use_innerseg = false; c.use_scaleinv = true;
    return c;
  }
  Linker3dCfg spatial_merging() const {
    Linker3dCfg c = *this;
    c.use_angle = true; c.use_overlap = true; c.use_perp = false;
    c.use_innerseg = true; c.use_scaleinv = false;
    return c;
  }
};

static double linker2d_score(const Seg2& l1, const Seg2& l2,
                             const Linker2dCfg& cfg) {
  double m = multiplier(cfg.score_th);
  double score = 1.0;
  if (cfg.use_angle)
    score = std::min(score, gate(expscore(angle_deg2(l1, l2),
                                          cfg.th_angle * m), cfg.score_th));
  if (score < cfg.score_th) return score;
  if (cfg.use_overlap)
    score = std::min(score,
                     bioverlap2(l1, l2) > cfg.th_overlap ? 1.0 : 0.0);
  if (score < cfg.score_th) return score;
  if (cfg.use_angle && cfg.use_overlap && cfg.use_smartangle) {
    double angle = angle_deg2(l1, l2), th_angle = cfg.th_angle;
    double ov = bioverlap2(l1, l2);
    if (ov < cfg.th_smartoverlap) {
      double ratio = std::min((cfg.th_smartoverlap - ov) /
                                  (cfg.th_smartoverlap - cfg.th_overlap),
                              1.0);
      th_angle = cfg.th_angle - ratio * (cfg.th_angle - cfg.th_smartangle);
    }
    score = std::min(score, gate(expscore(angle, th_angle * m), cfg.score_th));
  }
  if (score < cfg.score_th) return score;
  if (cfg.use_perp)
    score = std::min(score, gate(expscore(perp2(l1, l2), cfg.th_perp * m),
                                 cfg.score_th));
  return score;
}

static double linker3d_score(const Seg3& l1, const Seg3& l2,
                             const Linker3dCfg& cfg, double unc1, double unc2,
                             double z1s, double z1e) {
  double m = multiplier(cfg.score_th);
  double score = 1.0;
  if (cfg.use_angle)
    score = std::min(score, gate(expscore(angle_deg3(l1, l2),
                                          cfg.th_angle * m), cfg.score_th));
  if (score < cfg.score_th) return score;
  if (cfg.use_overlap)
    score = std::min(score,
                     bioverlap3(l1, l2) > cfg.th_overlap ? 1.0 : 0.0);
  if (score < cfg.score_th) return score;
  if (cfg.use_angle && cfg.use_overlap && cfg.use_smartangle) {
    double angle = angle_deg3(l1, l2), th_angle = cfg.th_angle;
    double ov = bioverlap3(l1, l2);
    if (ov < cfg.th_smartoverlap) {
      double ratio = std::min((cfg.th_smartoverlap - ov) /
                                  (cfg.th_smartoverlap - cfg.th_overlap),
                              1.0);
      th_angle = cfg.th_angle - ratio * (cfg.th_angle - cfg.th_smartangle);
    }
    score = std::min(score, gate(expscore(angle, th_angle * m), cfg.score_th));
  }
  if (score < cfg.score_th) return score;
  double unc = std::min(unc1, unc2);
  if (cfg.use_perp)
    score = std::min(score, gate(expscore(perp3(l1, l2),
                                          cfg.th_perp * unc * m),
                                 cfg.score_th));
  if (score < cfg.score_th) return score;
  if (cfg.use_innerseg) {
    bool ok;
    double d = dist_innerseg3(l1, l2, &ok);
    score = std::min(score, gate(ok ? expscore(d, cfg.th_innerseg * unc * m)
                                    : 0.0, cfg.score_th));
  }
  if (score < cfg.score_th) return score;
  if (cfg.use_scaleinv)
    score = std::min(score, gate(expscore(scaleinv_oneway3(l1, l2, z1s, z1e),
                                          cfg.th_scaleinv * m),
                                 cfg.score_th));
  return score;
}

// ------------------------------------------------------------ triangulator

struct Config {
  double min_length_2d = 20.0;
  double line_tri_angle_threshold = 5.0;
  double IoU_threshold = 0.1;
  double sensitivity_threshold = 70.0;
  double var2d = 2.0;
  double fullscore_th = 1.0;
  int max_valid_conns = 1000;
  int min_num_outer_edges = 1;
  int num_outliers_aggregator = 2;
  Linker2dCfg linker2d;
  Linker3dCfg linker3d;
};

struct Tri {
  Seg3 line;
  double z1s, z1e, unc;
  int ng_img, ng_line;
};

struct BestTri {
  Seg3 line;
  double z1s = 0, z1e = 0, unc = 0, score = -1;
  bool valid = false;
};

struct Engine {
  Config cfg;
  std::vector<View> views;                 // indexed by image id
  std::vector<std::vector<Seg2>> lines2d;  // [img][line]
  std::vector<std::vector<BestTri>> best;
  std::vector<std::vector<std::vector<std::pair<int, int>>>> valid_edges;

  void init() {
    size_t n = lines2d.size();
    best.resize(n);
    valid_edges.resize(n);
    for (size_t i = 0; i < n; i++) {
      best[i].assign(lines2d[i].size(), BestTri());
      valid_edges[i].assign(lines2d[i].size(), {});
    }
  }

  bool propose(int img, int line, int ng_img, int ng_line, Tri* out) const {
    const Seg2& l1 = lines2d[img][line];
    const Seg2& l2 = lines2d[ng_img][ng_line];
    if (l2.length() <= cfg.min_length_2d) return false;
    const View& v1 = views[img];
    const View& v2 = views[ng_img];
    V3 n2 = normal_direction(l2, v2);
    double pts[2][2] = {{l1.sx, l1.sy}, {l1.ex, l1.ey}};
    for (int k = 0; k < 2; k++) {
      V3 ray = v1.ray_direction(pts[k][0], pts[k][1]);
      double ang = 90.0 - std::acos(std::min(std::fabs(dot(n2, ray)), 1.0)) *
                              180.0 / M_PI;
      if (ang < cfg.line_tri_angle_threshold) return false;
    }
    if (epipolar_iou(l1, v1, l2, v2) < cfg.IoU_threshold) return false;
    Seg3 s3;
    double z1s, z1e;
    if (!algebraic_triangulation(l1, v1, l2, v2, &s3, &z1s, &z1e))
      return false;
    if (sensitivity(s3, v1) > cfg.sensitivity_threshold &&
        sensitivity(s3, v2) > cfg.sensitivity_threshold)
      return false;
    out->line = s3;
    out->z1s = z1s;
    out->z1e = z1e;
    out->unc = std::min(line3d_uncertainty(s3, v1, cfg.var2d),
                        line3d_uncertainty(s3, v2, cfg.var2d));
    out->ng_img = ng_img;
    out->ng_line = ng_line;
    return true;
  }

  // matches per neighbor: flat (line_id, ng_line_id) pairs
  void triangulate_image(
      int img,
      const std::vector<std::pair<int, std::vector<std::pair<int, int>>>>&
          matches) {
    int n_lines = (int)lines2d[img].size();
    std::vector<std::vector<Tri>> tris(n_lines);
    // group candidate matches per line node
    std::vector<std::vector<std::pair<int, int>>> conns(n_lines);
    for (const auto& [ng_img, pairs] : matches)
      for (const auto& [line_id, ng_line] : pairs)
        conns[line_id].push_back({ng_img, ng_line});

#pragma omp parallel for schedule(dynamic, 8)
    for (int line = 0; line < n_lines; line++) {
      if (lines2d[img][line].length() <= cfg.min_length_2d) continue;
      for (const auto& [ng_img, ng_line] : conns[line]) {
        Tri t;
        if (propose(img, line, ng_img, ng_line, &t))
          tris[line].push_back(t);
      }
    }
    score_image(img, tris);
  }

  void score_image(int img, std::vector<std::vector<Tri>>& tris) {
    Linker3dCfg l3cfg = cfg.linker3d.shared_parent_scoring();
    int n_lines = (int)lines2d[img].size();
#pragma omp parallel for schedule(dynamic, 4)
    for (int line = 0; line < n_lines; line++) {
      auto& T = tris[line];
      int n = (int)T.size();
      std::vector<double> scores(n, 0.0);
      for (int i = 0; i < n; i++) {
        std::map<int, double> score_table;  // ng_img -> max score
        for (int j = 0; j < n; j++) {
          if (i == j) continue;
          if (T[j].ng_img == T[i].ng_img) continue;
          double s3d = linker3d_score(T[i].line, T[j].line, l3cfg, T[i].unc,
                                      T[j].unc, T[i].z1s, T[i].z1e);
          if (s3d == 0) continue;
          const View& v2 = views[T[j].ng_img];
          Seg2 proj;
          v2.project(T[i].line.s, &proj.sx, &proj.sy);
          v2.project(T[i].line.e, &proj.ex, &proj.ey);
          double s2d = linker2d_score(proj, lines2d[T[j].ng_img][T[j].ng_line],
                                      cfg.linker2d);
          if (s2d == 0) continue;
          double s = std::min(s3d, s2d);
          auto it = score_table.find(T[j].ng_img);
          if (it == score_table.end())
            score_table[T[j].ng_img] = s;
          else
            it->second = std::max(it->second, s);
        }
        for (auto& kv : score_table) scores[i] += kv.second;
      }
      std::vector<int> order(n);
      std::iota(order.begin(), order.end(), 0);
      std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        if (scores[a] != scores[b]) return scores[a] > scores[b];
        return a > b;  // tie-break matches oracle: key=(score, idx) desc
      });
      for (int rank = 0; rank < std::min(n, cfg.max_valid_conns); rank++) {
        int i = order[rank];
        if (scores[i] < cfg.fullscore_th) continue;
        valid_edges[img][line].push_back({T[i].ng_img, T[i].ng_line});
      }
      BestTri b;
      for (int i = 0; i < n; i++)
        if (scores[i] > b.score) {
          b.valid = true;
          b.line = T[i].line;
          b.z1s = T[i].z1s;
          b.z1e = T[i].z1e;
          b.unc = T[i].unc;
          b.score = scores[i];
        }
      best[img][line] = b;
    }
  }

  // filled by compute_line_tracks: per track, list of (img, line) supports
  std::vector<std::vector<std::pair<int, int>>> track_supports;

  // degree filter + clustering + greedy union-find + aggregation
  int compute_line_tracks(std::vector<int>* track_sizes) {
    // -- degree filter --
    size_t n_imgs = lines2d.size();
    std::vector<std::vector<char>> flags(n_imgs);
    std::vector<std::vector<int>> counters(n_imgs);
    std::map<std::pair<int, int>, std::vector<std::pair<int, int>>> parents;
    for (size_t i = 0; i < n_imgs; i++) {
      flags[i].assign(lines2d[i].size(), 1);
      counters[i].resize(lines2d[i].size());
      for (size_t l = 0; l < lines2d[i].size(); l++) {
        counters[i][l] = (int)valid_edges[i][l].size();
        for (auto& node : valid_edges[i][l])
          parents[node].push_back({(int)i, (int)l});
      }
    }
    std::deque<std::pair<int, int>> queue;
    for (size_t i = 0; i < n_imgs; i++)
      for (size_t l = 0; l < lines2d[i].size(); l++)
        if (counters[i][l] < cfg.min_num_outer_edges) {
          flags[i][l] = 0;
          queue.push_back({(int)i, (int)l});
        }
    while (!queue.empty()) {
      auto node = queue.front();
      queue.pop_front();
      auto it = parents.find(node);
      if (it == parents.end()) continue;
      for (auto& [pi, pl] : it->second) {
        if (!flags[pi][pl]) continue;
        if (--counters[pi][pl] < cfg.min_num_outer_edges) {
          flags[pi][pl] = 0;
          queue.push_back({pi, pl});
        }
      }
    }

    // -- undirected edges over surviving nodes --
    std::set<std::pair<std::pair<int, int>, std::pair<int, int>>> edges;
    for (size_t i = 0; i < n_imgs; i++)
      for (size_t l = 0; l < lines2d[i].size(); l++) {
        if (!flags[i][l]) continue;
        for (auto& node2 : valid_edges[i][l]) {
          if (!flags[node2.first][node2.second]) continue;
          std::pair<int, int> a = {(int)i, (int)l}, b = node2;
          if (a > b) std::swap(a, b);
          edges.insert({a, b});
        }
      }

    Linker3dCfg l3cfg = cfg.linker3d.spatial_merging();
    std::map<std::pair<int, int>, int> node_index;
    std::vector<std::pair<int, int>> nodes;
    auto get_node = [&](const std::pair<int, int>& n) {
      auto it = node_index.find(n);
      if (it != node_index.end()) return it->second;
      int idx = (int)nodes.size();
      node_index[n] = idx;
      nodes.push_back(n);
      return idx;
    };
    struct GEdge {
      double score;
      int i1, i2;
    };
    std::vector<GEdge> gedges;
    for (auto& [n1, n2] : edges) {
      const BestTri& b1 = best[n1.first][n1.second];
      const BestTri& b2 = best[n2.first][n2.second];
      if (!b1.valid || !b2.valid) continue;
      double s3d = linker3d_score(b1.line, b2.line, l3cfg, b1.unc, b2.unc,
                                  b1.z1s, b1.z1e);
      if (s3d == 0) continue;
      gedges.push_back({s3d, get_node(n1), get_node(n2)});
    }

    // -- greedy union-find (merging.cc:18-104) --
    int n_nodes = (int)nodes.size();
    std::stable_sort(gedges.begin(), gedges.end(),
                     [](const GEdge& a, const GEdge& b) {
                       if (a.score != b.score) return a.score > b.score;
                       if (a.i1 != b.i1) return a.i1 > b.i1;
                       return a.i2 > b.i2;
                     });
    std::vector<int> parent(n_nodes, -1);
    std::vector<std::set<int>> images_in_track(n_nodes);
    for (int i = 0; i < n_nodes; i++)
      images_in_track[i].insert(nodes[i].first);
    auto root = [&](int i) {
      while (parent[i] != -1) i = parent[i];
      return i;
    };
    for (auto& e : gedges) {
      int r1 = root(e.i1), r2 = root(e.i2);
      if (r1 == r2) continue;
      if (images_in_track[r1].size() < images_in_track[r2].size())
        std::swap(r1, r2);
      parent[r2] = r1;
      images_in_track[r1].insert(images_in_track[r2].begin(),
                                 images_in_track[r2].end());
      images_in_track[r2].clear();
    }
    std::vector<int> labels(n_nodes, -1);
    int n_tracks = 0;
    for (int i = 0; i < n_nodes; i++) {
      if (parent[i] == -1) continue;
      int p = parent[i];
      if (parent[p] == -1 && labels[p] == -1) labels[p] = n_tracks++;
    }
    for (int i = 0; i < n_nodes; i++)
      if (parent[i] != -1) labels[i] = labels[root(i)];

    // -- aggregation (endpoint SVD via power iteration on 3x3 scatter) --
    std::vector<std::vector<int>> members(n_tracks);
    for (int i = 0; i < n_nodes; i++)
      if (labels[i] >= 0) members[labels[i]].push_back(i);
    track_supports.assign(n_tracks, {});
    for (int t = 0; t < n_tracks; t++)
      for (int idx : members[t]) track_supports[t].push_back(nodes[idx]);
    track_sizes->clear();
    for (int t = 0; t < n_tracks; t++) {
      track_sizes->push_back((int)members[t].size());
      // aggregate (kept for timing fidelity; endpoints unused downstream)
      int m = (int)members[t].size();
      if (m >= 4) {
        V3 center{0, 0, 0};
        for (int idx : members[t]) {
          const BestTri& b = best[nodes[idx].first][nodes[idx].second];
          center = center + b.line.s + b.line.e;
        }
        center = center * (1.0 / (2 * m));
        double S[3][3] = {};
        for (int idx : members[t]) {
          const BestTri& b = best[nodes[idx].first][nodes[idx].second];
          for (const V3* p : {&b.line.s, &b.line.e}) {
            V3 c = *p - center;
            double v[3] = {c.x, c.y, c.z};
            for (int a = 0; a < 3; a++)
              for (int bb = 0; bb < 3; bb++) S[a][bb] += v[a] * v[bb];
          }
        }
        V3 d{1, 0, 0};
        for (int it = 0; it < 30; it++) {
          V3 nd{S[0][0] * d.x + S[0][1] * d.y + S[0][2] * d.z,
                S[1][0] * d.x + S[1][1] * d.y + S[1][2] * d.z,
                S[2][0] * d.x + S[2][1] * d.y + S[2][2] * d.z};
          d = normalized(nd);
        }
        std::vector<double> proj;
        proj.reserve(2 * m);
        for (int idx : members[t]) {
          const BestTri& b = best[nodes[idx].first][nodes[idx].second];
          proj.push_back(dot(b.line.s - center, d));
          proj.push_back(dot(b.line.e - center, d));
        }
        std::sort(proj.begin(), proj.end());
        volatile double sink = proj[cfg.num_outliers_aggregator] +
                               proj[2 * m - 1 - cfg.num_outliers_aggregator];
        (void)sink;
      }
    }
    return n_tracks;
  }
};

// ------------------------------------------------------------------- io

static bool read_scene(const char* path, Engine* eng,
                       std::vector<std::pair<
                           int, std::vector<std::pair<
                                    int, std::vector<std::pair<int, int>>>>>>*
                           all_matches) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto rd_i32 = [&]() {
    int32_t v;
    if (std::fread(&v, 4, 1, f) != 1) v = -1;
    return (int)v;
  };
  auto rd_f64 = [&](double* dst, size_t n) {
    return std::fread(dst, 8, n, f) == n;
  };
  int n_views = rd_i32();
  if (n_views == -2) {  // optional config block (format v2)
    double d[20];
    if (!rd_f64(d, 20)) return false;
    Config& c = eng->cfg;
    c.min_length_2d = d[0];
    c.line_tri_angle_threshold = d[1];
    c.IoU_threshold = d[2];
    c.sensitivity_threshold = d[3];
    c.var2d = d[4];
    c.fullscore_th = d[5];
    c.max_valid_conns = (int)d[6];
    c.min_num_outer_edges = (int)d[7];
    c.num_outliers_aggregator = (int)d[8];
    c.linker2d.th_angle = d[9];
    c.linker2d.th_overlap = d[10];
    c.linker2d.th_smartoverlap = d[11];
    c.linker2d.th_smartangle = d[12];
    c.linker2d.th_perp = d[13];
    c.linker3d.th_angle = d[14];
    c.linker3d.th_overlap = d[15];
    c.linker3d.th_smartoverlap = d[16];
    c.linker3d.th_smartangle = d[17];
    c.linker3d.th_perp = d[18];
    c.linker3d.th_innerseg = d[19];
    double scaleinv;
    if (!rd_f64(&scaleinv, 1)) return false;
    c.linker3d.th_scaleinv = scaleinv;
    n_views = rd_i32();
  }
  if (n_views <= 0) return false;
  int max_id = 0;
  std::vector<int> ids(n_views);
  std::vector<View> vs(n_views);
  std::vector<std::vector<Seg2>> ls(n_views);
  for (int i = 0; i < n_views; i++) {
    ids[i] = rd_i32();
    max_id = std::max(max_id, ids[i]);
    double K[9], R[9], t[3];
    if (!rd_f64(K, 9) || !rd_f64(R, 9) || !rd_f64(t, 3)) return false;
    View v;
    std::memcpy(v.K.m, K, sizeof(K));
    std::memcpy(v.R.m, R, sizeof(R));
    v.t = {t[0], t[1], t[2]};
    // Kinv for pinhole-style K (fx, 0, cx; 0, fy, cy; 0 0 1)
    double fx = K[0], sk = K[1], cx = K[2], fy = K[4], cy = K[5];
    v.Kinv.m[0][0] = 1.0 / fx;
    v.Kinv.m[0][1] = -sk / (fx * fy);
    v.Kinv.m[0][2] = (sk * cy - cx * fy) / (fx * fy);
    v.Kinv.m[1][1] = 1.0 / fy;
    v.Kinv.m[1][2] = -cy / fy;
    v.Kinv.m[2][2] = 1.0;
    vs[i] = v;
    int n_lines = rd_i32();
    ls[i].resize(n_lines);
    for (int l = 0; l < n_lines; l++) {
      double buf[4];
      if (!rd_f64(buf, 4)) return false;
      ls[i][l] = {buf[0], buf[1], buf[2], buf[3]};
    }
  }
  eng->views.resize(max_id + 1);
  eng->lines2d.resize(max_id + 1);
  for (int i = 0; i < n_views; i++) {
    eng->views[ids[i]] = vs[i];
    eng->lines2d[ids[i]] = std::move(ls[i]);
  }
  int n_blocks = rd_i32();
  std::map<int, std::vector<std::pair<int, std::vector<std::pair<int, int>>>>>
      per_img;
  for (int b = 0; b < n_blocks; b++) {
    int img = rd_i32(), ng = rd_i32(), n = rd_i32();
    std::vector<std::pair<int, int>> pairs(n);
    for (int k = 0; k < n; k++) {
      int32_t ij[2];
      if (std::fread(ij, 4, 2, f) != 2) return false;
      pairs[k] = {ij[0], ij[1]};
    }
    per_img[img].push_back({ng, std::move(pairs)});
  }
  std::fclose(f);
  for (auto& kv : per_img) all_matches->push_back({kv.first, kv.second});
  return true;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: ref_engine scene.bin [repeats]\n");
    return 1;
  }
  int repeats = argc > 2 ? std::atoi(argv[2]) : 1;
  Engine eng;
  std::vector<std::pair<
      int, std::vector<std::pair<int, std::vector<std::pair<int, int>>>>>>
      matches;
  if (!read_scene(argv[1], &eng, &matches)) {
    std::fprintf(stderr, "failed to read %s\n", argv[1]);
    return 1;
  }
  double best_map = 1e30, best_tracks = 1e30;
  int n_tracks = 0;
  std::vector<int> sizes;
  for (int r = 0; r < repeats; r++) {
    eng.best.clear();
    eng.valid_edges.clear();
    eng.init();
    auto t0 = std::chrono::steady_clock::now();
    for (auto& [img, m] : matches) eng.triangulate_image(img, m);
    auto t1 = std::chrono::steady_clock::now();
    n_tracks = eng.compute_line_tracks(&sizes);
    auto t2 = std::chrono::steady_clock::now();
    best_map = std::min(best_map,
                        std::chrono::duration<double>(t1 - t0).count());
    best_tracks = std::min(best_tracks,
                           std::chrono::duration<double>(t2 - t1).count());
  }
  if (argc > 3) {  // dump track supports for parity tests
    FILE* f = std::fopen(argv[3], "w");
    if (f) {
      for (size_t t = 0; t < eng.track_supports.size(); t++)
        for (auto& [img, line] : eng.track_supports[t])
          std::fprintf(f, "%zu %d %d\n", t, img, line);
      std::fclose(f);
    }
  }
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  long total_support = 0;
  for (int s : sizes) total_support += s;
  std::printf(
      "{\"triangulate_s\": %.6f, \"tracks_s\": %.6f, \"n_tracks\": %d, "
      "\"total_supports\": %ld, \"threads\": %d}\n",
      best_map, best_tracks, n_tracks, total_support, threads);
  return 0;
}
