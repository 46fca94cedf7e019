// Native host-side kernels for uwcv-tpu (SURVEY.md N10-N12 host path).
//
// The measurement/export layers run per-image on the host while the TPU works
// on the next batch; their hot loops — run-length encoding, connected-
// component labeling, Moore boundary tracing — are pure pointer-chasing that
// Python/numpy handle poorly.  This translation unit exposes them through a
// plain C ABI consumed via ctypes (uwcv_tpu/utils/native.py); every entry has
// a numpy fallback, so the extension is an accelerator, not a dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC uwcv_native.cpp -o libuwcv_native.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE: Fortran-order (column-major) 1-indexed (start, length) pairs — the
// reference's CSV export format (nn_inference.py:253-263).
// mask: H*W uint8 C-order.  out: capacity max_pairs*2 int64.
// Returns number of pairs written, or -1 if capacity exceeded.
// ---------------------------------------------------------------------------
int64_t rle_encode_f(const uint8_t* mask, int64_t h, int64_t w,
                     int64_t* out, int64_t max_pairs) {
  int64_t n_pairs = 0;
  int64_t run_start = -1;
  int64_t pos = 0;  // fortran linear index
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y, ++pos) {
      const bool v = mask[y * w + x] != 0;
      if (v && run_start < 0) {
        run_start = pos;
      } else if (!v && run_start >= 0) {
        if (n_pairs == max_pairs) return -1;
        out[n_pairs * 2] = run_start + 1;
        out[n_pairs * 2 + 1] = pos - run_start;
        ++n_pairs;
        run_start = -1;
      }
    }
  }
  if (run_start >= 0) {
    if (n_pairs == max_pairs) return -1;
    out[n_pairs * 2] = run_start + 1;
    out[n_pairs * 2 + 1] = pos - run_start;
    ++n_pairs;
  }
  return n_pairs;
}

// ---------------------------------------------------------------------------
// 8-connected component labeling via union-find (two-pass).
// labels: H*W int32 output, 0 = background, components numbered 1..n.
// Returns n.
// ---------------------------------------------------------------------------
namespace {
struct UnionFind {
  std::vector<int32_t> parent;
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b < a ? a : b] = (b < a ? b : a);
  }
};
}  // namespace

int32_t label_components(const uint8_t* mask, int64_t h, int64_t w,
                         int32_t* labels) {
  UnionFind uf;
  uf.parent.push_back(0);  // background sentinel
  std::memset(labels, 0, sizeof(int32_t) * h * w);
  int32_t next = 1;
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      if (!mask[y * w + x]) continue;
      int32_t best = 0;
      int32_t neigh[4];
      int n_neigh = 0;
      if (y > 0) {
        if (x > 0 && labels[(y - 1) * w + x - 1]) neigh[n_neigh++] = labels[(y - 1) * w + x - 1];
        if (labels[(y - 1) * w + x]) neigh[n_neigh++] = labels[(y - 1) * w + x];
        if (x + 1 < w && labels[(y - 1) * w + x + 1]) neigh[n_neigh++] = labels[(y - 1) * w + x + 1];
      }
      if (x > 0 && labels[y * w + x - 1]) neigh[n_neigh++] = labels[y * w + x - 1];
      if (n_neigh == 0) {
        uf.parent.push_back(next);
        labels[y * w + x] = next++;
      } else {
        best = neigh[0];
        for (int i = 1; i < n_neigh; ++i)
          if (neigh[i] < best) best = neigh[i];
        labels[y * w + x] = best;
        for (int i = 0; i < n_neigh; ++i) uf.unite(best, neigh[i]);
      }
    }
  }
  // flatten + renumber densely
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t n_out = 0;
  for (int64_t i = 0; i < h * w; ++i) {
    if (!labels[i]) continue;
    int32_t root = uf.find(labels[i]);
    if (!remap[root]) remap[root] = ++n_out;
    labels[i] = remap[root];
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// Moore-neighbor boundary trace, clockwise, starting at the first boundary
// pixel in scan order of the given component id within `labels`.
// out_xy: capacity max_pts*2 int32 (x, y) pairs.  Returns point count, or
// -1 if capacity exceeded.
// ---------------------------------------------------------------------------
int64_t moore_trace(const int32_t* labels, int64_t h, int64_t w,
                    int32_t comp, int32_t* out_xy, int64_t max_pts) {
  static const int dx[8] = {1, 1, 0, -1, -1, -1, 0, 1};
  static const int dy[8] = {0, 1, 1, 1, 0, -1, -1, -1};
  int64_t sx = -1, sy = -1;
  for (int64_t y = 0; y < h && sx < 0; ++y)
    for (int64_t x = 0; x < w; ++x)
      if (labels[y * w + x] == comp) { sx = x; sy = y; break; }
  if (sx < 0) return 0;

  auto at = [&](int64_t x, int64_t y) -> bool {
    return x >= 0 && y >= 0 && x < w && y < h && labels[y * w + x] == comp;
  };

  int64_t n = 0;
  int64_t cx = sx, cy = sy;
  int prev_dir = 4;  // West: we entered scanning left-to-right
  if (max_pts < 1) return -1;
  out_xy[0] = (int32_t)cx;
  out_xy[1] = (int32_t)cy;
  n = 1;
  // Termination: stop when the (pixel, backtrack) STATE repeats — the walk
  // is deterministic, so the first repeated state closes the full boundary
  // cycle.  Stop-at-start-pixel loses whole lobes of components pinched
  // diagonally at the raster-first pixel (e.g. [[0,1,0],[1,0,1]]); the
  // Python twin in measure/contours.py uses the same rule.
  std::vector<uint8_t> seen((size_t)(h * w), 0);  // bit per direction
  seen[(size_t)(cy * w + cx)] = (uint8_t)(1u << prev_dir);
  const int64_t hard_cap = 8 * h * w;
  for (int64_t guard = 0; guard < hard_cap; ++guard) {
    int found = -1;
    for (int i = 0; i < 8; ++i) {
      const int d = (prev_dir + 1 + i) % 8;
      if (at(cx + dx[d], cy + dy[d])) { found = d; break; }
    }
    if (found < 0) break;  // isolated pixel
    prev_dir = (found + 4) % 8;
    cx += dx[found];
    cy += dy[found];
    uint8_t &bits = seen[(size_t)(cy * w + cx)];
    const uint8_t bit = (uint8_t)(1u << prev_dir);
    if (bits & bit) break;  // full cycle
    bits |= bit;
    if (n == max_pts) return -1;
    out_xy[n * 2] = (int32_t)cx;
    out_xy[n * 2 + 1] = (int32_t)cy;
    ++n;
  }
  return n;
}

}  // extern "C"
