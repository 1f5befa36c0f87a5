// Clos-route planning: edge coloring of regular bipartite multigraphs by
// Euler splitting (Konig's theorem, constructive).
//
// Used by core/engine/permute.py to decompose an arbitrary STATIC
// permutation of L = T*16384 elements into TPU-friendly stages
// (within-tile lane gathers + transposes + block exchanges), replacing the
// global lax.sorts the lanepipe engine used through round 4.  This is the
// TPU-native replacement for the data movement the reference delegates to
// SuiteSparse kernel internals (reference graphblas/core/ss/descriptor.py
// axb_method); the reference has no analogous in-tree code.
//
// clos_color: given E edges (u[i], v[i]) of a bipartite multigraph where
// every left node u and right node v has degree exactly d (a power of two),
// assign colors[i] in [0, d) such that within every left node and every
// right node all colors are distinct.  Supports many independent graphs in
// one call (offs partitions the edge arrays); nodes are numbered per-graph.
//
// Algorithm: recursively Euler-split the edge set into halves.  All
// degrees are even at every level, so the edges decompose into closed
// circuits; walking each circuit and assigning alternate edges to the two
// halves keeps degrees exactly halved on both sides.  Bipartiteness makes
// every circuit even-length, so the alternation is consistent.
// O(E log d) time, O(E) scratch.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Scratch {
  // incidence: for each node, the list of edge-slots; cursors skip used
  std::vector<int64_t> inc;      // 2*ne entries (each edge in two lists)
  std::vector<int64_t> node_off; // 2*m+1
  std::vector<int64_t> cursor;   // 2*m
  std::vector<uint8_t> side;     // ne
  std::vector<int64_t> half0, half1;
};

// Split edges eids[0:ne] (indices into u/v) into two halves by Euler
// circuits; returns count in half0 (== ne/2).
void euler_split(const int32_t* u, const int32_t* v, const int64_t* eids,
                 int64_t ne, int32_t m, Scratch& s) {
  const int64_t nn = 2 * (int64_t)m;
  s.node_off.assign(nn + 1, 0);
  s.inc.resize(2 * ne);
  s.cursor.assign(nn, 0);
  s.side.assign(ne, 2);  // 2 = unassigned
  // counting sort incidences
  for (int64_t i = 0; i < ne; ++i) {
    int64_t e = eids[i];
    s.node_off[u[e] + 1]++;
    s.node_off[(int64_t)m + v[e] + 1]++;
  }
  for (int64_t k = 0; k < nn; ++k) s.node_off[k + 1] += s.node_off[k];
  {
    std::vector<int64_t>& fill = s.cursor;  // reuse as fill cursor
    for (int64_t i = 0; i < ne; ++i) {
      int64_t e = eids[i];
      s.inc[s.node_off[u[e]] + fill[u[e]]++] = i;
      s.inc[s.node_off[m + v[e]] + fill[m + v[e]]++] = i;
    }
    fill.assign(nn, 0);  // back to walk cursors
  }
  // walk circuits
  for (int64_t start = 0; start < ne; ++start) {
    if (s.side[start] != 2) continue;
    int64_t i = start;
    // we enter edge i from its LEFT node; circuit alternates sides
    uint8_t sd = 0;
    bool at_left = true;  // the side we entered edge i from
    for (;;) {
      s.side[i] = sd;
      sd ^= 1;
      // cross edge i to the opposite endpoint
      int64_t e = eids[i];
      int64_t node = at_left ? (int64_t)m + v[e] : (int64_t)u[e];
      // next unused edge at `node`
      int64_t off = s.node_off[node], end = s.node_off[node + 1];
      int64_t j = -1;
      while (off + s.cursor[node] < end) {
        int64_t cand = s.inc[off + s.cursor[node]];
        s.cursor[node]++;
        if (s.side[cand] == 2) { j = cand; break; }
      }
      if (j < 0) break;  // circuit closed (all even degrees guarantee)
      i = j;
      // we enter edge j from `node`: at_left = (node < m)
      at_left = node < (int64_t)m;
    }
  }
  // partition
  s.half0.clear();
  s.half1.clear();
  s.half0.reserve(ne / 2);
  s.half1.reserve(ne / 2);
  for (int64_t i = 0; i < ne; ++i) {
    (s.side[i] == 0 ? s.half0 : s.half1).push_back(eids[i]);
  }
}

void color_rec(const int32_t* u, const int32_t* v, std::vector<int64_t>& eids,
               int32_t m, int32_t d, int32_t c0, int32_t* colors,
               Scratch& s) {
  if (d == 1) {
    for (int64_t e : eids) colors[e] = c0;
    return;
  }
  euler_split(u, v, eids.data(), (int64_t)eids.size(), m, s);
  std::vector<int64_t> h0;
  h0.swap(s.half0);
  std::vector<int64_t> h1;
  h1.swap(s.half1);
  eids.clear();
  eids.shrink_to_fit();
  color_rec(u, v, h0, m, d / 2, c0, colors, s);
  h0.clear();
  h0.shrink_to_fit();
  color_rec(u, v, h1, m, d / 2, c0 + d / 2, colors, s);
}

}  // namespace

extern "C" {

// u, v: int32[ntotal] per-graph node ids; offs: int64[ngraphs+1] edge
// partition; m: nodes per side per graph; d: colors (= uniform degree,
// power of two).  colors: int32[ntotal] out.  Returns 0 on success.
int clos_color(const int32_t* u, const int32_t* v, const int64_t* offs,
               int64_t ngraphs, int32_t m, int32_t d, int32_t* colors) {
  if (d <= 0 || (d & (d - 1)) != 0) return 1;
  Scratch s;
  for (int64_t g = 0; g < ngraphs; ++g) {
    int64_t lo = offs[g], hi = offs[g + 1];
    std::vector<int64_t> eids(hi - lo);
    for (int64_t i = lo; i < hi; ++i) eids[i - lo] = i;
    color_rec(u, v, eids, m, d, 0, colors, s);
  }
  return 0;
}

}  // extern "C"
