// Native host-side preprocessing for pynngp_tpu — the C++ components of the
// framework (TPU-native analog of the reference's src/utils.cpp tree builder
// mkNNIndxTree0, reverse index mkUIndx — SURVEY.md section 2 rows
// "Neighbor-index builder").  The device compute path is JAX/XLA/Pallas; this
// file owns the one-time O(n log n) host preprocessing that feeds it:
//
//   1. kd-tree m-nearest-PRECEDING-neighbor search over ordered sites,
//   2. the children (reverse) index used by the latent Gibbs machinery,
//   3. balanced greedy moral-graph coloring for the chromatic sampler.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC -o libnngp_native.so nngp_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct KDNode {
  int32_t left = -1, right = -1;
  int32_t start = 0, end = 0;  // range into point-index array (leaves)
  int16_t axis = 0;
  bool leaf = false;
  double split = 0.0;
  double lo[8], hi[8];  // bounding box (supports d <= 8)
};

// kd-tree over n points in d dims (row-major coords), leaf size ~16.
struct KDTree {
  const double* pts;
  int n, d;
  std::vector<int32_t> idx;     // point indices, permuted by build
  std::vector<KDNode> nodes;

  KDTree(const double* pts_, int n_, int d_) : pts(pts_), n(n_), d(d_) {
    idx.resize(n);
    for (int i = 0; i < n; ++i) idx[i] = i;
    nodes.reserve(2 * n / 8 + 64);
    build(0, n);
  }

  int32_t build(int start, int end) {
    int32_t me = (int32_t)nodes.size();
    nodes.emplace_back();
    KDNode& node = nodes.back();
    node.start = start;
    node.end = end;
    for (int a = 0; a < d; ++a) {
      double lo = 1e300, hi = -1e300;
      for (int i = start; i < end; ++i) {
        double v = pts[(size_t)idx[i] * d + a];
        lo = std::min(lo, v);
        hi = std::max(hi, v);
      }
      node.lo[a] = lo;
      node.hi[a] = hi;
    }
    if (end - start <= 16) {
      node.leaf = true;
      return me;
    }
    // split on widest axis at median
    int axis = 0;
    double width = -1.0;
    for (int a = 0; a < d; ++a) {
      double w = node.hi[a] - node.lo[a];
      if (w > width) { width = w; axis = a; }
    }
    int mid = (start + end) / 2;
    std::nth_element(
        idx.begin() + start, idx.begin() + mid, idx.begin() + end,
        [&](int32_t a, int32_t b) {
          return pts[(size_t)a * d + axis] < pts[(size_t)b * d + axis];
        });
    double split = pts[(size_t)idx[mid] * d + axis];
    int16_t ax = (int16_t)axis;
    int32_t l = build(start, mid);
    int32_t r = build(mid, end);
    KDNode& node2 = nodes[me];  // vector may have reallocated
    node2.axis = ax;
    node2.split = split;
    node2.left = l;
    node2.right = r;
    return me;
  }

  double box_dist2(const KDNode& node, const double* q) const {
    double acc = 0.0;
    for (int a = 0; a < d; ++a) {
      double v = q[a];
      double e = (v < node.lo[a]) ? node.lo[a] - v
                                  : (v > node.hi[a] ? v - node.hi[a] : 0.0);
      acc += e * e;
    }
    return acc;
  }

  // k nearest among point-indices < limit (the "preceding" predicate).
  void query_preceding(const double* q, int32_t limit, int k,
                       std::priority_queue<std::pair<double, int32_t>>& heap)
      const {
    search(0, q, limit, k, heap);
  }

  void search(int32_t ni, const double* q, int32_t limit, int k,
              std::priority_queue<std::pair<double, int32_t>>& heap) const {
    const KDNode& node = nodes[ni];
    double bd = box_dist2(node, q);
    if ((int)heap.size() == k && bd >= heap.top().first) return;
    if (node.leaf) {
      for (int i = node.start; i < node.end; ++i) {
        int32_t p = idx[i];
        if (p >= limit) continue;
        double acc = 0.0;
        const double* pp = pts + (size_t)p * d;
        for (int a = 0; a < d; ++a) {
          double diff = q[a] - pp[a];
          acc += diff * diff;
        }
        if ((int)heap.size() < k) {
          heap.emplace(acc, p);
        } else if (acc < heap.top().first) {
          heap.pop();
          heap.emplace(acc, p);
        }
      }
      return;
    }
    // visit nearer child first
    double dl = box_dist2(nodes[node.left], q);
    double dr = box_dist2(nodes[node.right], q);
    if (dl < dr) {
      search(node.left, q, limit, k, heap);
      search(node.right, q, limit, k, heap);
    } else {
      search(node.right, q, limit, k, heap);
      search(node.left, q, limit, k, heap);
    }
  }
};

}  // namespace

extern "C" {

// m nearest preceding neighbors for each of n ordered sites.
// coords: (n, d) float64 row-major (ordered), nn_idx/nn_mask out: (n, m).
void nngp_neighbor_table(const double* coords, int32_t n, int32_t d,
                         int32_t m, int32_t* nn_idx, uint8_t* nn_mask) {
  if (d > 8) return;  // caller falls back to python for exotic dims
  KDTree tree(coords, n, d);
  std::vector<std::pair<double, int32_t>> buf;
#pragma omp parallel for schedule(dynamic, 256) private(buf)
  for (int32_t i = 0; i < n; ++i) {
    int k = std::min(m, i);
    int32_t* row_idx = nn_idx + (size_t)i * m;
    uint8_t* row_mask = nn_mask + (size_t)i * m;
    std::memset(row_idx, 0, sizeof(int32_t) * m);
    std::memset(row_mask, 0, sizeof(uint8_t) * m);
    if (k == 0) continue;
    std::priority_queue<std::pair<double, int32_t>> heap;
    tree.query_preceding(coords + (size_t)i * d, i, k, heap);
    buf.clear();
    while (!heap.empty()) {
      buf.push_back(heap.top());
      heap.pop();
    }
    std::sort(buf.begin(), buf.end());  // ascending distance (determinism)
    for (int j = 0; j < (int)buf.size() && j < m; ++j) {
      row_idx[j] = buf[j].second;
      row_mask[j] = 1;
    }
  }
}

// children (reverse) index: for each parent p, the sites j with p in N(j)
// and the slot of p within N(j).  Returns needed max_children via counts
// pass when out arrays are null (call twice).
int32_t nngp_children_table(const int32_t* nn_idx, const uint8_t* nn_mask,
                            int32_t n, int32_t m, int32_t max_c,
                            int32_t* child_idx, int32_t* child_slot,
                            uint8_t* child_mask) {
  std::vector<int32_t> counts(n, 0);
  for (int32_t j = 0; j < n; ++j)
    for (int32_t s = 0; s < m; ++s)
      if (nn_mask[(size_t)j * m + s]) counts[nn_idx[(size_t)j * m + s]]++;
  int32_t need = 1;
  for (int32_t p = 0; p < n; ++p) need = std::max(need, counts[p]);
  if (child_idx == nullptr) return need;
  std::memset(child_mask, 0, (size_t)n * max_c);
  std::vector<int32_t> fill(n, 0);
  for (int32_t j = 0; j < n; ++j) {
    for (int32_t s = 0; s < m; ++s) {
      if (!nn_mask[(size_t)j * m + s]) continue;
      int32_t p = nn_idx[(size_t)j * m + s];
      int32_t k = fill[p]++;
      child_idx[(size_t)p * max_c + k] = j;
      child_slot[(size_t)p * max_c + k] = s;
      child_mask[(size_t)p * max_c + k] = 1;
    }
  }
  return need;
}

// Balanced greedy coloring of the moral graph.  Neighborhood of v =
// parents(v) + children(v) + co-parents (parents of each child), enumerated
// on the fly from the forward and reverse indices (no materialized edges).
// Returns the number of colors.
int32_t nngp_color_moral(const int32_t* nn_idx, const uint8_t* nn_mask,
                         const int32_t* child_idx, const int32_t* child_slot,
                         const uint8_t* child_mask, int32_t n, int32_t m,
                         int32_t max_c, int32_t* colors) {
  (void)child_slot;
  // degree-descending order (approximate degree = parents + children)
  std::vector<int32_t> deg(n, 0), order(n);
  for (int32_t v = 0; v < n; ++v) {
    int32_t dv = 0;
    for (int32_t s = 0; s < m; ++s) dv += nn_mask[(size_t)v * m + s];
    for (int32_t c = 0; c < max_c; ++c) dv += child_mask[(size_t)v * max_c + c];
    deg[v] = dv;
    order[v] = v;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return deg[a] > deg[b]; });
  std::fill(colors, colors + n, -1);
  std::vector<int64_t> class_size;
  std::vector<int32_t> forbidden;  // stamp array: forbidden[c] == stamp
  std::vector<int32_t> stamp_of;
  int32_t stamp = 0;
  auto forbid = [&](int32_t u) {
    if (u < 0) return;
    int32_t cu = colors[u];
    if (cu >= 0) stamp_of[cu] = stamp;
  };
  for (int32_t vi = 0; vi < n; ++vi) {
    int32_t v = order[vi];
    ++stamp;
    stamp_of.resize(class_size.size(), -1);
    // parents of v
    for (int32_t s = 0; s < m; ++s)
      if (nn_mask[(size_t)v * m + s]) forbid(nn_idx[(size_t)v * m + s]);
    // children of v and co-parents through each child
    for (int32_t c = 0; c < max_c; ++c) {
      if (!child_mask[(size_t)v * max_c + c]) continue;
      int32_t j = child_idx[(size_t)v * max_c + c];
      forbid(j);
      for (int32_t s = 0; s < m; ++s)
        if (nn_mask[(size_t)j * m + s]) forbid(nn_idx[(size_t)j * m + s]);
    }
    // least-loaded legal color
    int32_t best = -1;
    int64_t best_sz = INT64_MAX;
    for (int32_t c = 0; c < (int32_t)class_size.size(); ++c) {
      if (stamp_of[c] == stamp) continue;
      if (class_size[c] < best_sz) { best_sz = class_size[c]; best = c; }
    }
    if (best < 0) {
      best = (int32_t)class_size.size();
      class_size.push_back(0);
      stamp_of.push_back(-1);
    }
    colors[v] = best;
    class_size[best]++;
  }
  return (int32_t)class_size.size();
}

// EXACT max-min (farthest-point) ordering, the better-mixing Vecchia DAG
// ordering (SURVEY.md section 7 step 2).  Lazy max-heap of stale upper
// bounds + a uniform grid over the selected set: max-min selections are a
// separation-~d_cur design, so a grid with cell size ~d_cur holds O(1)
// selected points per cell and nearest-selected queries are a ring scan.
// The grid rebins on a geometric schedule as d_cur shrinks => O(n log n)
// total.  d <= 3 only (grids curse in higher dims; caller falls back to
// the python lazy-kd-tree path).  Returns 0 on success, -1 when d > 3.
int32_t nngp_order_maxmin(const double* coords, int32_t n, int32_t d,
                          int64_t* order) {
  if (d > 3 || n <= 0) return n <= 0 ? 0 : -1;
  // bounding box
  double lo[3] = {0, 0, 0}, hi[3] = {0, 0, 0};
  for (int a = 0; a < d; ++a) { lo[a] = 1e300; hi[a] = -1e300; }
  for (int32_t i = 0; i < n; ++i)
    for (int a = 0; a < d; ++a) {
      double v = coords[(size_t)i * d + a];
      lo[a] = std::min(lo[a], v);
      hi[a] = std::max(hi[a], v);
    }
  double span = 1e-300;
  for (int a = 0; a < d; ++a) span = std::max(span, hi[a] - lo[a]);

  // first site: nearest the centroid
  double cen[3] = {0, 0, 0};
  for (int32_t i = 0; i < n; ++i)
    for (int a = 0; a < d; ++a) cen[a] += coords[(size_t)i * d + a];
  for (int a = 0; a < d; ++a) cen[a] /= n;
  int32_t first = 0;
  double bestd = 1e300;
  for (int32_t i = 0; i < n; ++i) {
    double acc = 0;
    for (int a = 0; a < d; ++a) {
      double diff = coords[(size_t)i * d + a] - cen[a];
      acc += diff * diff;
    }
    if (acc < bestd) { bestd = acc; first = i; }
  }

  // lazy max-heap of (upper-bound dist^2, site)
  std::vector<std::pair<double, int32_t>> heap;
  heap.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    if (i == first) continue;
    double acc = 0;
    for (int a = 0; a < d; ++a) {
      double diff = coords[(size_t)i * d + a] - coords[(size_t)first * d + a];
      acc += diff * diff;
    }
    heap.emplace_back(acc, i);
  }
  std::make_heap(heap.begin(), heap.end());

  // selected-set grid (rebinned when the working scale halves)
  std::vector<int32_t> selected;
  selected.reserve(n);
  selected.push_back(first);
  double cell = span;  // current cell edge
  int32_t nx[3] = {1, 1, 1};
  std::vector<std::vector<int32_t>> cells(1);
  cells[0].push_back(first);
  auto cell_of = [&](const double* p) {
    int64_t c = 0;
    for (int a = 0; a < d; ++a) {
      int64_t k = (int64_t)((p[a] - lo[a]) / cell);
      if (k < 0) k = 0;
      if (k >= nx[a]) k = nx[a] - 1;
      c = c * nx[a] + k;
    }
    return (size_t)c;
  };
  auto rebuild_grid = [&](double new_cell) {
    // compute candidate dims first; commit only if within the memory cap
    double c2 = std::max(new_cell, span * 1e-9);
    int32_t nx2[3] = {1, 1, 1};
    size_t total = 1;
    for (int a = 0; a < d; ++a) {
      double w = hi[a] - lo[a];
      int64_t k = (int64_t)(w / c2) + 1;
      if (k < 1) k = 1;
      if (k > 4 * (int64_t)n) k = 4 * (int64_t)n;  // cap per-axis
      nx2[a] = (int32_t)k;
      total *= (size_t)k;
      if (total > (size_t)64 * n) return false;  // keep the old grid
    }
    cell = c2;
    for (int a = 0; a < d; ++a) nx[a] = nx2[a];
    cells.assign(total, {});
    for (int32_t s : selected) cells[cell_of(coords + (size_t)s * d)].push_back(s);
    return true;
  };
  // nearest selected distance^2 via expanding ring scan
  auto nearest2 = [&](const double* p) {
    int64_t base[3] = {0, 0, 0};
    for (int a = 0; a < d; ++a) {
      int64_t k = (int64_t)((p[a] - lo[a]) / cell);
      if (k < 0) k = 0;
      if (k >= nx[a]) k = nx[a] - 1;
      base[a] = k;
    }
    double best = 1e300;
    int32_t maxn = 0;
    for (int a = 0; a < d; ++a) maxn = std::max(maxn, nx[a]);
    for (int32_t r = 0;; ++r) {
      // any cell at Chebyshev ring r is at least (r-1)*cell away
      if (r > 0 && best <= (double)(r - 1) * (r - 1) * cell * cell) break;
      bool any_cell = false;
      int64_t i0[3] = {0, 0, 0}, i1[3] = {0, 0, 0};
      for (int a = 0; a < d; ++a) {
        i0[a] = std::max<int64_t>(0, base[a] - r);
        i1[a] = std::min<int64_t>(nx[a] - 1, base[a] + r);
      }
      // iterate cells in the box, keep only the ring shell (Chebyshev == r)
      for (int64_t x = i0[0]; x <= i1[0]; ++x) {
        bool xe = (x == base[0] - r || x == base[0] + r);
        int64_t y0 = (d > 1) ? i0[1] : 0, y1 = (d > 1) ? i1[1] : 0;
        for (int64_t y = y0; y <= y1; ++y) {
          bool ye = (d > 1) && (y == base[1] - r || y == base[1] + r);
          int64_t z0 = (d > 2) ? i0[2] : 0, z1 = (d > 2) ? i1[2] : 0;
          for (int64_t z = z0; z <= z1; ++z) {
            bool ze = (d > 2) && (z == base[2] - r || z == base[2] + r);
            if (r > 0 && !(xe || ye || ze)) continue;  // interior: done earlier
            any_cell = true;
            size_t c = (size_t)x;
            if (d > 1) c = c * nx[1] + (size_t)y;
            if (d > 2) c = c * nx[2] + (size_t)z;
            for (int32_t s : cells[c]) {
              double acc = 0;
              const double* sp = coords + (size_t)s * d;
              for (int a = 0; a < d; ++a) {
                double diff = p[a] - sp[a];
                acc += diff * diff;
              }
              best = std::min(best, acc);
            }
          }
        }
      }
      if (!any_cell && r > maxn) break;  // scanned everything
    }
    return best;
  };

  order[0] = first;
  int32_t count = 1;
  while (count < n) {
    std::pop_heap(heap.begin(), heap.end());
    auto top = heap.back();
    heap.pop_back();
    double ub2 = top.first;
    int32_t i = top.second;
    double d2 = nearest2(coords + (size_t)i * d);
    if (d2 > ub2) d2 = ub2;  // bound can only tighten
    double next_ub = heap.empty() ? -1.0 : heap.front().first;
    if (d2 >= next_ub) {
      order[count++] = i;
      // insert into grid; rebin when the working scale has halved
      double dcur = std::sqrt(d2);
      if (dcur > 0 && dcur < 0.5 * cell) {
        if (!rebuild_grid(dcur)) {
          cells[cell_of(coords + (size_t)i * d)].push_back(i);
          selected.push_back(i);
          continue;
        }
      }
      selected.push_back(i);
      cells[cell_of(coords + (size_t)i * d)].push_back(i);
    } else {
      heap.emplace_back(d2, i);
      std::push_heap(heap.begin(), heap.end());
    }
  }
  return 0;
}

}  // extern "C"
