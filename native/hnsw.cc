// hnsw: a compact HNSW approximate-nearest-neighbor index (L2 metric).
//
// Native replacement for faiss::IndexHNSWFlat as used by the reference's
// DenseHNSWFlatIndexer (dvl/indexer/faiss_indexers.py:90-155): L2-only, so
// the Python wrapper applies the same dot-product -> L2 aux-dimension
// transform the reference uses. Parameters mirror the reference defaults
// (M="store_n", efSearch, efConstruction).
//
// Algorithm: Malkov & Yashunin (2016). Geometric level assignment
// (mL = 1/ln(M)), greedy descent on upper layers, ef-bounded best-first
// search on the insertion/search layer, simple closest-M neighbor selection
// with bidirectional links and pruning.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <exception>
#include <mutex>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Pair {
  float dist;
  int32_t id;
};
struct Nearer {  // min-heap on dist
  bool operator()(const Pair& a, const Pair& b) const {
    return a.dist > b.dist;
  }
};
struct Farther {  // max-heap on dist
  bool operator()(const Pair& a, const Pair& b) const {
    return a.dist < b.dist;
  }
};

// Per-thread visited-set scratch for search_layer: an epoch-tagged array
// (fill only on the rare tag wraparound) instead of a per-call clear.
struct Scratch {
  std::vector<uint32_t> visited;
  uint32_t tag = 0;
};

class HNSW {
 public:
  HNSW(int dim, int M, int ef_construction)
      : dim_(dim),
        M_(M),
        maxM_(M),
        maxM0_(2 * M),
        efc_(ef_construction),
        mult_(1.0 / std::log(std::max(2, M))),
        rng_(42) {}

  int dim_;
  int M_, maxM_, maxM0_, efc_;
  double mult_;
  std::mt19937_64 rng_;
  int entry_ = -1;
  int max_level_ = -1;
  std::vector<float> data_;                         // n * dim
  std::vector<int> levels_;                         // per node
  // links_[l][node] = neighbor vector; level 0 stored in links0_
  std::vector<std::vector<std::vector<int32_t>>> upper_links_;
  std::vector<std::vector<int32_t>> links0_;
  Scratch scratch_;  // serial-path visited scratch (mt build uses its own)
  // guards the graph during adds/searches and the serial-path scratch_:
  // ctypes releases the GIL, so Python threads can call search/add
  // concurrently on one index
  std::mutex mu_;

  int size() const { return static_cast<int>(levels_.size()); }

  float dist(const float* a, const float* b) const {
    float s = 0.f;
    for (int i = 0; i < dim_; ++i) {
      const float d = a[i] - b[i];
      s += d * d;
    }
    return s;
  }
  const float* vec(int id) const { return data_.data() + (size_t)id * dim_; }

  std::vector<int32_t>& neighbors(int node, int level) {
    if (level == 0) return links0_[node];
    return upper_links_[level - 1][node];
  }

  int random_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng_);
    if (r < 1e-12) r = 1e-12;
    return static_cast<int>(-std::log(r) * mult_);
  }

  // greedy single-step descent on one level
  int greedy(const float* q, int start, int level) {
    int cur = start;
    float cur_d = dist(q, vec(cur));
    bool improved = true;
    while (improved) {
      improved = false;
      for (int32_t nb : neighbors(cur, level)) {
        const float d = dist(q, vec(nb));
        if (d < cur_d) {
          cur_d = d;
          cur = nb;
          improved = true;
        }
      }
    }
    return cur;
  }

  // ef-bounded best-first search on `level`; returns up to ef closest
  std::vector<Pair> search_layer(const float* q, int start, int ef,
                                 int level) {
    return search_layer(q, start, ef, level, scratch_);
  }

  std::vector<Pair> search_layer(const float* q, int start, int ef,
                                 int level, Scratch& s) {
    if (++s.tag == 0) {
      std::fill(s.visited.begin(), s.visited.end(), 0);
      s.tag = 1;
    }
    s.visited.resize(size(), 0);

    std::priority_queue<Pair, std::vector<Pair>, Nearer> candidates;
    std::priority_queue<Pair, std::vector<Pair>, Farther> results;
    const float d0 = dist(q, vec(start));
    candidates.push({d0, start});
    results.push({d0, start});
    s.visited[start] = s.tag;

    while (!candidates.empty()) {
      Pair c = candidates.top();
      if (c.dist > results.top().dist && (int)results.size() >= ef) break;
      candidates.pop();
      for (int32_t nb : neighbors(c.id, level)) {
        if (s.visited[nb] == s.tag) continue;
        s.visited[nb] = s.tag;
        const float d = dist(q, vec(nb));
        if ((int)results.size() < ef || d < results.top().dist) {
          candidates.push({d, nb});
          results.push({d, nb});
          if ((int)results.size() > ef) results.pop();
        }
      }
    }
    std::vector<Pair> out;
    out.reserve(results.size());
    while (!results.empty()) {
      out.push_back(results.top());
      results.pop();
    }
    std::reverse(out.begin(), out.end());  // nearest first
    return out;
  }

  void connect(int node, std::vector<Pair>& cands, int level) {
    const int maxm = level == 0 ? maxM0_ : maxM_;
    // closest-M selection
    const int m = std::min<int>(M_, cands.size());
    auto& nbrs = neighbors(node, level);
    nbrs.clear();
    for (int i = 0; i < m; ++i) nbrs.push_back(cands[i].id);
    // back links with amortized pruning: once a list reaches maxm, a
    // prune-per-append costs O(maxm) distance evals per insertion (at the
    // DPR parameters maxM0=1024 this alone capped builds at ~35 vec/s).
    // Instead let the list overflow by `slack` entries and prune back to
    // maxm in one pass — cost per append drops by ~slack x. Search-time
    // hop cost grows by at most slack/maxm (12.5%), and the final kept
    // set is the same closest-maxm selection.
    for (int i = 0; i < m; ++i) {
      auto& back = neighbors(cands[i].id, level);
      back.push_back(node);
      const int slack = std::max(1, maxm / 8);
      if ((int)back.size() > maxm + slack) {
        // keep the maxm closest to cands[i]. Distances are computed ONCE
        // per neighbor before sorting — a comparator that recomputes the
        // 768-d distance per comparison did ~6x the evals.
        const float* base = vec(cands[i].id);
        std::vector<Pair> scored;
        scored.reserve(back.size());
        for (int32_t b : back) scored.push_back({dist(base, vec(b)), b});
        std::partial_sort(scored.begin(), scored.begin() + maxm,
                          scored.end(),
                          [](const Pair& a, const Pair& b) {
                            return a.dist < b.dist;
                          });
        back.clear();
        for (int j = 0; j < maxm; ++j) back.push_back(scored[j].id);
      }
    }
  }

  void add(const float* v) {
    const int id = size();
    data_.insert(data_.end(), v, v + dim_);
    const int level = random_level();
    levels_.push_back(level);
    links0_.emplace_back();
    for (int l = (int)upper_links_.size(); l < level; ++l)
      upper_links_.emplace_back(std::vector<std::vector<int32_t>>());
    for (auto& layer : upper_links_) layer.resize(size());

    if (entry_ < 0) {
      entry_ = id;
      max_level_ = level;
      return;
    }
    int cur = entry_;
    for (int l = max_level_; l > level; --l) cur = greedy(v, cur, l);
    for (int l = std::min(level, max_level_); l >= 0; --l) {
      auto cands = search_layer(v, cur, efc_, l);
      connect(id, cands, l);
      cur = cands.front().id;
    }
    if (level > max_level_) {
      max_level_ = level;
      entry_ = id;
    }
  }

  // Multi-threaded batch insertion, deterministic in the thread count.
  //
  // faiss parallelizes IndexHNSW construction with OpenMP + per-node
  // locks; that build is schedule-dependent (the graph differs run to
  // run). Here insertion is split into (a) a parallel candidate-search
  // phase over a FROZEN graph snapshot — the ~95% of build cost that is
  // 769-d distance evals — and (b) a serial link-application phase in
  // node order. Level draws come from the same rng_ sequence as the
  // serial path and searches read only pre-chunk nodes, so the built
  // graph is a pure function of the inputs: identical for any n_threads
  // (including 1). The only semantic difference vs one-at-a-time adds is
  // that nodes within one chunk do not see each other as candidates —
  // with kChunk=256 on corpora of 10^5 this is noise (recall measured
  // unchanged, PERF.md), same trade-off as any batched ANN build.
  void add_batch_mt(const float* vecs, int64_t n, int n_threads) {
    const int kWarmup = 1024;  // serial until the graph is worth freezing
    const int kChunk = 256;    // fixed (not thread-scaled): determinism
    int64_t i = 0;
    while (size() < kWarmup && i < n) {
      add(vecs + i * dim_);
      ++i;
    }
    const int nt = std::max(1, n_threads);
    std::vector<Scratch> scratch(nt);
    // per-node, per-level candidate lists for the current chunk
    std::vector<std::vector<std::vector<Pair>>> cands(kChunk);

    // one persistent pool for the whole call (ADVICE r3: ~480 per-chunk
    // pools for a 123k build); workers park on a condition variable
    // between chunks. Exceptions inside a worker (e.g. bad_alloc) are
    // captured per thread instead of std::terminate'ing the host Python
    // process, and rethrown on the calling thread after the pool drains.
    int base = 0, c = 0;
    int snap_entry = 0, snap_max = 0;
    std::vector<int> lvls;
    std::atomic<int> next(0);
    std::mutex pm;
    std::condition_variable cv_start, cv_done;
    int64_t gen = 0;
    int remaining = 0;
    bool stop = false;
    std::vector<std::exception_ptr> errs(nt);

    auto search_chunk = [&](int t) {
      Scratch& s = scratch[t];
      for (;;) {
        const int j = next.fetch_add(1);
        if (j >= c) break;
        const float* q = vec(base + j);
        int cur = snap_entry;
        for (int l = snap_max; l > lvls[j]; --l) cur = greedy(q, cur, l);
        auto& per = cands[j];
        per.assign(std::min(lvls[j], snap_max) + 1, {});
        for (int l = std::min(lvls[j], snap_max); l >= 0; --l) {
          per[l] = search_layer(q, cur, efc_, l, s);
          cur = per[l].front().id;
        }
      }
    };
    auto thread_main = [&](int t) {
      int64_t seen = 0;
      for (;;) {
        std::unique_lock<std::mutex> lk(pm);
        cv_start.wait(lk, [&] { return stop || gen > seen; });
        if (stop) return;
        seen = gen;
        lk.unlock();
        try {
          search_chunk(t);
        } catch (...) {
          errs[t] = std::current_exception();
        }
        lk.lock();
        if (--remaining == 0) cv_done.notify_one();
      }
    };
    std::vector<std::thread> pool;
    for (int t = 1; t < nt; ++t) pool.emplace_back(thread_main, t);

    // Main-thread work below (data_.insert, links resize, connect) can
    // throw too (bad_alloc on the build's largest allocations). Unwinding
    // past the joinable pool would std::terminate before the C ABI's
    // catch, so capture here and fall through to the shared stop/join.
    std::exception_ptr main_err;
    try {
    while (i < n) {
      base = size();
      // align chunk ends to absolute-id multiples of kChunk: boundaries
      // (and so the frozen snapshots) are then canonical in id space —
      // a build split across several add_batch_mt calls at aligned
      // points is byte-identical to the one-shot build, and an
      // unaligned split re-aligns at the next chunk
      c = (int)std::min<int64_t>(kChunk - (base % kChunk), n - i);
      const float* v0 = vecs + i * dim_;
      data_.insert(data_.end(), v0, v0 + (size_t)c * dim_);
      lvls.assign(c, 0);
      int top = (int)upper_links_.size();
      for (int j = 0; j < c; ++j) {
        lvls[j] = random_level();
        top = std::max(top, lvls[j]);
        levels_.push_back(lvls[j]);
        links0_.emplace_back();
      }
      for (int l = (int)upper_links_.size(); l < top; ++l)
        upper_links_.emplace_back();
      for (auto& layer : upper_links_) layer.resize(size());
      snap_entry = entry_;
      snap_max = max_level_;
      next.store(0);
      {
        std::lock_guard<std::mutex> lk(pm);
        remaining = (int)pool.size();
        ++gen;  // release the parked workers onto this chunk
      }
      cv_start.notify_all();
      try {
        search_chunk(0);
      } catch (...) {
        errs[0] = std::current_exception();
      }
      {
        std::unique_lock<std::mutex> lk(pm);
        cv_done.wait(lk, [&] { return remaining == 0; });
      }
      bool failed = false;
      for (auto& e : errs) failed = failed || (e != nullptr);
      if (failed) break;  // abort the build; rethrown below
      for (int j = 0; j < c; ++j) {
        const int id = base + j;
        for (int l = std::min(lvls[j], snap_max); l >= 0; --l)
          connect(id, cands[j][l], l);
        if (lvls[j] > max_level_) {
          max_level_ = lvls[j];
          entry_ = id;
        }
      }
      i += c;
    }
    } catch (...) {
      main_err = std::current_exception();
    }
    {
      std::lock_guard<std::mutex> lk(pm);
      stop = true;
    }
    cv_start.notify_all();
    for (auto& th : pool) th.join();
    if (main_err) std::rethrow_exception(main_err);  // caught at the C ABI
    for (auto& e : errs)
      if (e) std::rethrow_exception(e);  // caught at the C ABI boundary
  }

  int search(const float* q, int k, int ef, int32_t* out_ids,
             float* out_dists) {
    if (entry_ < 0) return 0;
    int cur = entry_;
    for (int l = max_level_; l > 0; --l) cur = greedy(q, cur, l);
    auto res = search_layer(q, cur, std::max(ef, k), 0);
    const int n = std::min<int>(k, res.size());
    for (int i = 0; i < n; ++i) {
      out_ids[i] = res[i].id;
      out_dists[i] = res[i].dist;
    }
    return n;
  }
};

}  // namespace

extern "C" {

void* hnsw_new(int dim, int M, int ef_construction) {
  return new HNSW(dim, M, ef_construction);
}

void hnsw_free(void* h) { delete static_cast<HNSW*>(h); }

// Adds return 0 on success, -1 on failure (e.g. allocation failure —
// letting a C++ exception cross the C ABI into ctypes is undefined
// behavior and in practice terminates the host Python process). On
// failure the index is left partially built; callers should discard it.
int hnsw_add_batch(void* h, const float* vecs, int64_t n) {
  HNSW* idx = static_cast<HNSW*>(h);
  std::lock_guard<std::mutex> lock(idx->mu_);
  try {
    for (int64_t i = 0; i < n; ++i) idx->add(vecs + i * idx->dim_);
    return 0;
  } catch (...) {
    return -1;
  }
}

// Parallel build; the resulting graph is identical for every n_threads
// (see add_batch_mt). n_threads<=1 degrades to chunked single-thread.
int hnsw_add_batch_mt(void* h, const float* vecs, int64_t n,
                      int n_threads) {
  HNSW* idx = static_cast<HNSW*>(h);
  std::lock_guard<std::mutex> lock(idx->mu_);
  try {
    idx->add_batch_mt(vecs, n, std::max(1, n_threads));
    return 0;
  } catch (...) {
    return -1;
  }
}

int64_t hnsw_size(void* h) { return static_cast<HNSW*>(h)->size(); }

int hnsw_dim(void* h) { return static_cast<HNSW*>(h)->dim_; }

int hnsw_search(void* h, const float* q, int k, int ef, int32_t* out_ids,
                float* out_dists) {
  HNSW* x = static_cast<HNSW*>(h);
  std::lock_guard<std::mutex> lock(x->mu_);
  return x->search(q, k, ef, out_ids, out_dists);
}

// Serialization: flat binary dump.
int hnsw_save(void* h, const char* path) {
  HNSW* x = static_cast<HNSW*>(h);
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  bool ok = true;  // every fwrite checked: a full disk must NOT return 0
  auto wr = [&](const void* p, size_t sz, size_t cnt) {
    if (cnt && fwrite(p, sz, cnt, f) != cnt) ok = false;
  };
  const int64_t n = x->size();
  int64_t header[6] = {n, x->dim_, x->M_, x->efc_, x->entry_, x->max_level_};
  wr(header, sizeof(header), 1);
  wr(x->data_.data(), sizeof(float), n * x->dim_);
  wr(x->levels_.data(), sizeof(int), n);
  auto write_links = [&](const std::vector<std::vector<int32_t>>& layer) {
    for (int64_t i = 0; i < n; ++i) {
      const auto& v = i < (int64_t)layer.size() ? layer[i]
                                                : std::vector<int32_t>{};
      int32_t sz = v.size();
      wr(&sz, sizeof(sz), 1);
      wr(v.data(), sizeof(int32_t), sz);
    }
  };
  int32_t n_layers = x->upper_links_.size();
  wr(&n_layers, sizeof(n_layers), 1);
  write_links(x->links0_);
  for (auto& layer : x->upper_links_) write_links(layer);
  if (fclose(f) != 0) ok = false;
  return ok ? 0 : -1;
}

void* hnsw_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  int64_t header[6];
  if (fread(header, sizeof(header), 1, f) != 1) {
    fclose(f);
    return nullptr;
  }
  const int64_t n = header[0];
  if (n < 0 || header[1] <= 0) {
    fclose(f);
    return nullptr;
  }
  HNSW* x = new HNSW((int)header[1], (int)header[2], (int)header[3]);
  x->entry_ = (int)header[4];
  x->max_level_ = (int)header[5];
  x->data_.resize(n * x->dim_);
  x->levels_.resize(n);
  bool ok = true;  // a truncated file must fail, not load half an index
  auto rd = [&](void* p, size_t sz, size_t cnt) {
    if (cnt && fread(p, sz, cnt, f) != cnt) ok = false;
  };
  rd(x->data_.data(), sizeof(float), n * x->dim_);
  rd(x->levels_.data(), sizeof(int), n);
  int32_t n_layers = 0;
  rd(&n_layers, sizeof(n_layers), 1);
  if (n_layers < 0) ok = false;
  auto read_links = [&](std::vector<std::vector<int32_t>>& layer) {
    layer.resize(n);
    for (int64_t i = 0; ok && i < n; ++i) {
      int32_t sz = 0;
      rd(&sz, sizeof(sz), 1);
      if (!ok || sz < 0) { ok = false; return; }
      layer[i].resize(sz);
      rd(layer[i].data(), sizeof(int32_t), sz);
    }
  };
  read_links(x->links0_);
  if (ok) {
    x->upper_links_.resize(n_layers);
    for (auto& layer : x->upper_links_) read_links(layer);
  }
  fclose(f);
  if (!ok) {
    delete x;
    return nullptr;
  }
  return x;
}

}  // extern "C"
