// Native host-side graph kernels for glnn_tpu.
//
// The reference delegates its graph surgery to DGL's C++ backend
// (to_bidirected / subgraph / largest-CC / CSR materialization —
// SURVEY.md §2.3 rows 4-7). These are the TPU-framework equivalents:
// they run once at ingest time on the host, so the goal is
// single-pass O(E) algorithms with no allocation surprises at the
// 100M+ edge scale of ogbn-products.
//
// ABI: plain C functions over caller-allocated int64 buffers
// (ctypes-friendly; see glnn_tpu/native/__init__.py). Every function
// returns 0 on success.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Counting-sort COO edges by `key` (stable); writes the permutation.
// key: e values in [0, n); order_out: e slots.
int64_t sort_edges(int64_t e, const int64_t* key, int64_t n,
                   int64_t* order_out) {
  std::vector<int64_t> count(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) count[key[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) count[v + 1] += count[v];
  for (int64_t i = 0; i < e; ++i) order_out[count[key[i]]++] = i;
  return 0;
}

// CSR from COO: indptr_out has n+1 slots, indices_out e slots
// (dst values permuted into row order).
int64_t coo_to_csr(int64_t n, int64_t e, const int64_t* src,
                   const int64_t* dst, int64_t* indptr_out,
                   int64_t* indices_out) {
  std::memset(indptr_out, 0, sizeof(int64_t) * (n + 1));
  for (int64_t i = 0; i < e; ++i) indptr_out[src[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) indptr_out[v + 1] += indptr_out[v];
  std::vector<int64_t> cursor(indptr_out, indptr_out + n);
  for (int64_t i = 0; i < e; ++i) indices_out[cursor[src[i]]++] = dst[i];
  return 0;
}

// Symmetrize + dedup. src_out/dst_out must hold 2e slots; returns the
// number of unique edges written (or -1 on overflow, impossible here).
int64_t to_bidirected(int64_t n, int64_t e, const int64_t* src,
                      const int64_t* dst, int64_t* src_out,
                      int64_t* dst_out) {
  std::vector<uint64_t> keys(2 * (size_t)e);
  const uint64_t un = (uint64_t)n;
  for (int64_t i = 0; i < e; ++i) {
    keys[2 * i] = (uint64_t)src[i] * un + (uint64_t)dst[i];
    keys[2 * i + 1] = (uint64_t)dst[i] * un + (uint64_t)src[i];
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  int64_t m = (int64_t)keys.size();
  for (int64_t i = 0; i < m; ++i) {
    src_out[i] = (int64_t)(keys[i] / un);
    dst_out[i] = (int64_t)(keys[i] % un);
  }
  return m;
}

// Weakly-connected components via union-find with path halving.
// comp_out: n slots, filled with component roots relabeled 0..k-1;
// returns the number of components.
int64_t connected_components(int64_t n, int64_t e, const int64_t* src,
                             const int64_t* dst, int64_t* comp_out) {
  std::vector<int64_t> parent(n);
  std::iota(parent.begin(), parent.end(), 0);
  auto find = [&](int64_t v) {
    while (parent[v] != v) {
      parent[v] = parent[parent[v]];
      v = parent[v];
    }
    return v;
  };
  for (int64_t i = 0; i < e; ++i) {
    int64_t a = find(src[i]), b = find(dst[i]);
    if (a != b) parent[a] = b;
  }
  std::vector<int64_t> label(n, -1);
  int64_t k = 0;
  for (int64_t v = 0; v < n; ++v) {
    int64_t r = find(v);
    if (label[r] < 0) label[r] = k++;
    comp_out[v] = label[r];
  }
  return k;
}

// Node-induced subgraph relabeled in idx order. new_id: n scratch
// slots (filled by this function); src_out/dst_out: e slots; returns
// the number of kept edges.
int64_t induced_subgraph(int64_t n, int64_t e, const int64_t* src,
                         const int64_t* dst, int64_t k, const int64_t* idx,
                         int64_t* new_id, int64_t* src_out,
                         int64_t* dst_out) {
  for (int64_t v = 0; v < n; ++v) new_id[v] = -1;
  for (int64_t i = 0; i < k; ++i) new_id[idx[i]] = i;
  int64_t m = 0;
  for (int64_t i = 0; i < e; ++i) {
    int64_t a = new_id[src[i]], b = new_id[dst[i]];
    if (a >= 0 && b >= 0) {
      src_out[m] = a;
      dst_out[m] = b;
      ++m;
    }
  }
  return m;
}

// Degree histogram (in or out) for degree-bucketed planning.
int64_t degrees(int64_t n, int64_t e, const int64_t* nodes,
                int64_t* deg_out) {
  std::memset(deg_out, 0, sizeof(int64_t) * n);
  for (int64_t i = 0; i < e; ++i) deg_out[nodes[i]]++;
  return 0;
}

// Synchronous label propagation over the symmetrized edge set
// (distributed/partition.py label_propagation_labels contract): each
// sweep every node adopts the most frequent label among its neighbors
// (ties -> smallest label); stops early when < 0.1% of nodes change.
// Labels start as node ids. labels_out: n slots. Returns the number
// of sweeps executed. O(E log deg) per sweep via per-node sort of
// neighbor labels — ~O(seconds) at ogbn-products scale, where the
// numpy unique-based tier takes minutes.
int64_t label_propagation(int64_t n, int64_t e, const int64_t* src,
                          const int64_t* dst, int64_t iters,
                          int64_t* labels_out) {
  // symmetrized CSR (both directions)
  std::vector<int64_t> indptr(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) {
    indptr[src[i] + 1]++;
    indptr[dst[i] + 1]++;
  }
  for (int64_t v = 0; v < n; ++v) indptr[v + 1] += indptr[v];
  std::vector<int64_t> indices(2 * (size_t)e);
  std::vector<int64_t> cursor(indptr.begin(), indptr.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    indices[cursor[src[i]]++] = dst[i];
    indices[cursor[dst[i]]++] = src[i];
  }

  std::vector<int64_t> prev(n), scratch;
  for (int64_t v = 0; v < n; ++v) labels_out[v] = v;
  int64_t sweep = 0;
  for (; sweep < iters; ++sweep) {
    std::copy(labels_out, labels_out + n, prev.begin());
    int64_t changed = 0;
    for (int64_t v = 0; v < n; ++v) {
      int64_t lo = indptr[v], hi = indptr[v + 1];
      if (hi == lo) continue;
      scratch.resize(hi - lo);
      for (int64_t j = lo; j < hi; ++j) scratch[j - lo] = prev[indices[j]];
      std::sort(scratch.begin(), scratch.end());
      int64_t best = scratch[0], best_cnt = 0, cnt = 1;
      for (size_t j = 1; j <= scratch.size(); ++j) {
        if (j < scratch.size() && scratch[j] == scratch[j - 1]) {
          ++cnt;
        } else {
          if (cnt > best_cnt) {
            best_cnt = cnt;
            best = scratch[j - 1];
          }
          cnt = 1;
        }
      }
      if (best != labels_out[v]) ++changed;
      labels_out[v] = best;
    }
    if (changed * 1000 < n) {
      ++sweep;
      break;
    }
  }
  return sweep;
}

// ------------------------------------------------------------------
// SpMM execution-plan builder (ops/spmm_plan.py contract): tile the
// dst-sorted edge list into fixed-size tiles, each owned by one
// destination block of `block_rows` rows; pad tiles with ghost slots
// (src = n_src, rec_local = block_rows, edge_perm = e); sort slots
// within each tile by source row so the message gather walks HBM in
// ascending address order. Single O(E log tile) pass — replaces the
// numpy builder at ogbn-products scale (SURVEY.md §2.3 row 1).
// ------------------------------------------------------------------

// Number of tiles for a dst-sorted edge list (every block gets >= 1).
int64_t spmm_plan_num_tiles(int64_t e, const int64_t* rec, int64_t n_nodes,
                            int64_t tile, int64_t block_rows) {
  int64_t num_blocks = (n_nodes + block_rows - 1) / block_rows;
  if (num_blocks < 1) num_blocks = 1;
  std::vector<int64_t> counts(num_blocks, 0);
  for (int64_t i = 0; i < e; ++i) counts[rec[i] / block_rows]++;
  int64_t t = 0;
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t tb = (counts[b] + tile - 1) / tile;
    t += tb > 0 ? tb : 1;
  }
  return t;
}

// Fill the plan arrays. rec must be dst-sorted; outputs are int32:
//   src_idx   [num_tiles*tile], edge_perm [num_tiles*tile],
//   rec_local [num_tiles*tile], block_id  [num_tiles].
// Returns num_tiles (== spmm_plan_num_tiles) or -1 on unsorted input.
int64_t spmm_plan_fill(int64_t e, const int64_t* rec, const int64_t* snd,
                       int64_t n_nodes, int64_t n_src, int64_t tile,
                       int64_t block_rows, int32_t* src_idx,
                       int32_t* edge_perm, int32_t* rec_local,
                       int32_t* block_id) {
  int64_t num_blocks = (n_nodes + block_rows - 1) / block_rows;
  if (num_blocks < 1) num_blocks = 1;
  for (int64_t i = 1; i < e; ++i)
    if (rec[i] < rec[i - 1]) return -1;

  // per-tile scratch: (src, edge, rec_local) triples sorted by src
  std::vector<int64_t> order(tile);
  int64_t t = 0;     // tile cursor
  int64_t i = 0;     // edge cursor
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t end = i;
    while (end < e && rec[end] / block_rows == b) ++end;
    int64_t cnt = end - i;
    int64_t tiles_b = (cnt + tile - 1) / tile;
    if (tiles_b < 1) tiles_b = 1;
    for (int64_t k = 0; k < tiles_b; ++k, ++t) {
      int64_t lo = i + k * tile;
      int64_t hi = lo + tile;
      if (hi > end) hi = end;
      int64_t m = hi > lo ? hi - lo : 0;
      // sort slots by src (stable, ghosts last)
      std::iota(order.begin(), order.begin() + m, lo);
      std::stable_sort(order.begin(), order.begin() + m,
                       [&](int64_t a, int64_t c) { return snd[a] < snd[c]; });
      int64_t base = t * tile;
      for (int64_t s = 0; s < m; ++s) {
        int64_t eid = order[s];
        src_idx[base + s] = (int32_t)snd[eid];
        edge_perm[base + s] = (int32_t)eid;
        rec_local[base + s] = (int32_t)(rec[eid] - b * block_rows);
      }
      for (int64_t s = m; s < tile; ++s) {
        src_idx[base + s] = (int32_t)n_src;
        edge_perm[base + s] = (int32_t)e;
        rec_local[base + s] = (int32_t)block_rows;
      }
      block_id[t] = (int32_t)b;
    }
    i = end;
  }
  return t;
}

// ------------------------------------------------------------------
// Block-mode SpMM plan (ops/spmm_plan.py build_block_plan contract):
// every dst block owns exactly t_max consecutive tiles; slots sorted
// by source across the whole block (ghosts last). The numpy builder's
// axis-1 argsort over the [B, t_max*tile] matrix costs ~40s at
// ogbn-products scale; this is a per-block std::stable_sort pass.
// ------------------------------------------------------------------

// Max tiles any block needs (>= 1 per block); -1 if rec unsorted.
int64_t spmm_block_plan_tmax(int64_t e, const int64_t* rec,
                             int64_t n_nodes, int64_t tile,
                             int64_t block_rows) {
  int64_t num_blocks = (n_nodes + block_rows - 1) / block_rows;
  if (num_blocks < 1) num_blocks = 1;
  for (int64_t i = 1; i < e; ++i)
    if (rec[i] < rec[i - 1]) return -1;
  std::vector<int64_t> counts(num_blocks, 0);
  for (int64_t i = 0; i < e; ++i) counts[rec[i] / block_rows]++;
  int64_t t_max = 1;
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t t = (counts[b] + tile - 1) / tile;
    if (t > t_max) t_max = t;
  }
  return t_max;
}

// Fill block-mode plan arrays, each sized num_blocks * t_max * tile
// (int32): src_idx, edge_perm, rec_local. Returns num_blocks.
int64_t spmm_block_plan_fill(int64_t e, const int64_t* rec,
                             const int64_t* snd, int64_t n_nodes,
                             int64_t n_src, int64_t tile,
                             int64_t block_rows, int64_t t_max,
                             int32_t* src_idx, int32_t* edge_perm,
                             int32_t* rec_local) {
  int64_t num_blocks = (n_nodes + block_rows - 1) / block_rows;
  if (num_blocks < 1) num_blocks = 1;
  int64_t x = t_max * tile;
  std::vector<int64_t> order;
  int64_t i = 0;
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t end = i;
    while (end < e && rec[end] / block_rows == b) ++end;
    int64_t m = end - i;
    order.resize(m);
    std::iota(order.begin(), order.end(), i);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t c) { return snd[a] < snd[c]; });
    int64_t base = b * x;
    for (int64_t s = 0; s < m; ++s) {
      int64_t eid = order[s];
      src_idx[base + s] = (int32_t)snd[eid];
      edge_perm[base + s] = (int32_t)eid;
      rec_local[base + s] = (int32_t)(rec[eid] - b * block_rows);
    }
    for (int64_t s = m; s < x; ++s) {
      src_idx[base + s] = (int32_t)n_src;
      edge_perm[base + s] = (int32_t)e;
      rec_local[base + s] = (int32_t)block_rows;
    }
    i = end;
  }
  return num_blocks;
}

// Attention-plan fill (ops/attention_plan.py): dst-sorted edges, each
// dst block of `block_rows` rows owns exactly `x` consecutive slots in
// NATURAL edge order. One pass; ghosts pre-filled. Returns num_blocks,
// or -1 if any block's edge count exceeds x (caller declined earlier).
int64_t att_plan_fill(int64_t e, const int64_t* rec, const int64_t* snd,
                      int64_t n_nodes, int64_t n_src, int64_t block_rows,
                      int64_t x, int32_t* src_idx, int32_t* slot_edge,
                      int32_t* rec_local, int32_t* edge_slot) {
  int64_t nb = (n_nodes + block_rows - 1) / block_rows;
  if (nb < 1) nb = 1;
  const int64_t slots = nb * x;
  for (int64_t i = 0; i < slots; ++i) {
    src_idx[i] = (int32_t)n_src;
    slot_edge[i] = (int32_t)e;
    rec_local[i] = (int32_t)block_rows;
  }
  std::vector<int64_t> start(nb + 1, 0);
  for (int64_t i = 0; i < e; ++i) start[rec[i] / block_rows + 1]++;
  for (int64_t b = 0; b < nb; ++b) {
    if (start[b + 1] > x) return -1;
    start[b + 1] += start[b];
  }
  for (int64_t i = 0; i < e; ++i) {
    const int64_t b = rec[i] / block_rows;
    const int64_t slot = b * x + (i - start[b]);
    src_idx[slot] = (int32_t)snd[i];
    slot_edge[slot] = (int32_t)i;
    rec_local[slot] = (int32_t)(rec[i] - b * block_rows);
    edge_slot[i] = (int32_t)slot;
  }
  return nb;
}

}  // extern "C"
