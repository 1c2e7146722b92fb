// Fast MASTER collator core (C++).
//
// The reference's pretraining bottleneck is the Python CondenserCollator:
// eight whole-word masking streams per example built with per-token Python
// loops (MASTER/pretrain/data.py:243-431; SURVEY.md §7.4 item 5 flags it as
// the known CPU hot spot). This file implements the masking/corruption inner
// loops in C++ behind a minimal C ABI consumed via ctypes
// (simxns_tpu/data/native.py). Semantics match the numpy implementation in
// simxns_tpu/data/collator.py: same mask-count rules, same 80/10/10
// corruption, same keyword weighting — only the RNG stream differs (PCG32
// here vs numpy Generator there).
//
// Build: g++ -O3 -shared -fPIC -o libfast_collator.so fast_collator.cc

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// PCG32 — small, fast, statistically solid.
struct Pcg32 {
  uint64_t state;
  uint64_t inc;
  explicit Pcg32(uint64_t seed, uint64_t seq = 0xda3e39cb94b95bdbULL)
      : state(0), inc((seq << 1u) | 1u) {
    next();
    state += seed;
    next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = static_cast<uint32_t>(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
  }
  // uniform in [0, bound)
  uint32_t bounded(uint32_t bound) {
    if (bound == 0) return 0;
    uint32_t threshold = (-bound) % bound;
    while (true) {
      uint32_t r = next();
      if (r >= threshold) return r % bound;
    }
  }
  double uniform() { return next() * (1.0 / 4294967296.0); }
};

struct WordGroup {
  std::vector<int32_t> idx;   // member token positions (may have gaps:
                              // a continuation joins the previous word
                              // even across a skipped special — the
                              // reference/numpy grouping has no
                              // adjacency requirement, data.py:71-102)
  double weight;
};

// Group continuation tokens into words, skipping specials. special/
// continuation are per-token flags computed on the Python side (id-level
// lookups stay in Python where the tokenizer lives).
std::vector<WordGroup> word_groups(const int32_t* ids, int n,
                                   const uint8_t* special,
                                   const uint8_t* contin,
                                   const double* weights) {
  std::vector<WordGroup> groups;
  groups.reserve(n);
  for (int i = 0; i < n; ++i) {
    if (special[i]) continue;
    if (!groups.empty() && contin[i]) {
      groups.back().idx.push_back(i);
    } else {
      groups.push_back({{i}, weights ? weights[i] : 1.0});
    }
  }
  return groups;
}

void greedy_fill(std::vector<WordGroup>& order, int num_to_predict,
                 int8_t* mask) {
  int taken = 0;
  for (const auto& g : order) {
    int len = static_cast<int>(g.idx.size());
    if (taken >= num_to_predict) break;
    if (taken + len > num_to_predict) continue;
    for (int32_t j : g.idx) mask[j] = 1;
    taken += len;
  }
}

// Python's round() (and np's) is round-half-to-even; (int)(x + 0.5) is
// half-up and diverges on exact halves (e.g. 9 * 0.5 — the dual-mask and
// decoder streams). nearbyint under the default FE_TONEAREST mode matches.
int round_count(double x) {
  return std::min(512, std::max(1, (int)std::nearbyint(x)));
}

// Work-stealing row loop: one atomic counter, nt threads. For nt<=1 (or
// single-row batches) runs inline — no thread overhead on 1-core hosts.
template <typename F>
void parallel_rows(int b, int n_threads, F fn) {
  int nt = std::min(n_threads, b);
  if (nt <= 1) {
    for (int i = 0; i < b; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < b) fn(i);
    });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Whole-word mask: shuffle groups, greedily take words until
// round(n * probability) tokens are covered. mask: int8[n] out.
void whole_word_mask(const int32_t* ids, int n, const uint8_t* special,
                     const uint8_t* contin, double probability,
                     uint64_t seed, int8_t* mask) {
  std::memset(mask, 0, n);
  auto groups = word_groups(ids, n, special, contin, nullptr);
  if (groups.empty()) return;
  Pcg32 rng(seed);
  for (int i = static_cast<int>(groups.size()) - 1; i > 0; --i) {
    std::swap(groups[i], groups[rng.bounded(i + 1)]);
  }
  int num = round_count(n * probability);
  greedy_fill(groups, num, mask);
}

// Keyword-weighted mask: draw word groups with probability proportional to
// token_weight (1/frequency) until round(n_real * probability) covered.
void keyword_mask(const int32_t* ids, int n, const uint8_t* special,
                  const uint8_t* contin, const double* token_weight,
                  double probability, uint64_t seed, int8_t* mask) {
  std::memset(mask, 0, n);
  auto groups = word_groups(ids, n, special, contin, token_weight);
  if (groups.empty()) return;
  Pcg32 rng(seed);
  int n_real = 0;
  for (int i = 0; i < n; ++i) n_real += special[i] ? 0 : 1;
  int num = round_count(n_real * probability);

  std::vector<char> alive(groups.size(), 1);
  std::vector<double> cum(groups.size());
  int taken = 0;
  int alive_count = static_cast<int>(groups.size());
  while (taken < num && alive_count > 0) {
    double total = 0;
    for (size_t i = 0; i < groups.size(); ++i) {
      if (alive[i]) total += groups[i].weight;
      cum[i] = total;
    }
    if (total <= 0) break;
    for (int d = 0; d < 10 && taken < num; ++d) {
      double u = rng.uniform() * total;
      size_t gi =
          std::lower_bound(cum.begin(), cum.end(), u) - cum.begin();
      if (gi >= groups.size()) gi = groups.size() - 1;
      // the numpy oracle REJECTS a draw that lands on a dead group
      // (p=0 there; here only an exact cum-boundary hit can) — do not
      // redirect to a neighbor, which would bias its distribution
      if (!alive[gi]) continue;
      const auto& g = groups[gi];
      for (int32_t j : g.idx) mask[j] = 1;
      taken += static_cast<int>(g.idx.size());
      alive[gi] = 0;
      --alive_count;
    }
  }
}

// Complementary 50/50 masks.
void dual_mask(const int32_t* ids, int n, const uint8_t* special,
               const uint8_t* contin, uint64_t seed, int8_t* mask,
               int8_t* dual) {
  whole_word_mask(ids, n, special, contin, 0.5, seed, mask);
  for (int i = 0; i < n; ++i) dual[i] = mask[i] ? 0 : 1;
}

// HF torch_mask_tokens corruption: 80% [MASK] / 10% random / 10% keep.
// inputs int32[n] in/out, mask int8[n], labels int64[n] out (-100 unmasked).
void mask_tokens(int32_t* inputs, const int8_t* mask, int n,
                 int32_t mask_id, int32_t vocab_size, uint64_t seed,
                 int64_t* labels) {
  Pcg32 rng(seed);
  for (int i = 0; i < n; ++i) {
    if (mask[i]) {
      labels[i] = inputs[i];
      double r = rng.uniform();
      if (r < 0.8) {
        inputs[i] = mask_id;
      } else if (r < 0.9) {
        inputs[i] = static_cast<int32_t>(rng.bounded(vocab_size));
      }
    } else {
      labels[i] = -100;
    }
  }
}

// ---- Batched entry points (ABI v2) ----------------------------------------
//
// One C call per (batch, stream) instead of one per example: the per-call
// ctypes marshalling was ~60% of collator wall at batch 512 (profiled).
// Rows are padded to `stride`; row i uses ids[i*stride : i*stride+lens[i]]
// and its own seed. `n_threads` bounds the worker pool (work-stealing over
// rows; 1 -> inline).

void whole_word_mask_batch(const int32_t* ids, int b, int stride,
                           const int32_t* lens, const uint8_t* special,
                           const uint8_t* contin, double probability,
                           const uint64_t* seeds, int8_t* mask,
                           int n_threads) {
  parallel_rows(b, n_threads, [=](int i) {
    int64_t off = static_cast<int64_t>(i) * stride;
    whole_word_mask(ids + off, lens[i], special + off, contin + off,
                    probability, seeds[i], mask + off);
  });
}

void keyword_mask_batch(const int32_t* ids, int b, int stride,
                        const int32_t* lens, const uint8_t* special,
                        const uint8_t* contin, const double* token_weight,
                        double probability, const uint64_t* seeds,
                        int8_t* mask, int n_threads) {
  parallel_rows(b, n_threads, [=](int i) {
    int64_t off = static_cast<int64_t>(i) * stride;
    keyword_mask(ids + off, lens[i], special + off, contin + off,
                 token_weight + off, probability, seeds[i], mask + off);
  });
}

void dual_mask_batch(const int32_t* ids, int b, int stride,
                     const int32_t* lens, const uint8_t* special,
                     const uint8_t* contin, const uint64_t* seeds,
                     int8_t* mask, int8_t* dual, int n_threads) {
  parallel_rows(b, n_threads, [=](int i) {
    int64_t off = static_cast<int64_t>(i) * stride;
    dual_mask(ids + off, lens[i], special + off, contin + off, seeds[i],
              mask + off, dual + off);
  });
}

// Batched corruption with per-row seeds (rows of length `stride`).
void mask_tokens_batch(int32_t* inputs, const int8_t* mask, int b, int stride,
                       int32_t mask_id, int32_t vocab_size,
                       const uint64_t* seeds, int64_t* labels,
                       int n_threads) {
  parallel_rows(b, n_threads, [=](int i) {
    int64_t off = static_cast<int64_t>(i) * stride;
    mask_tokens(inputs + off, mask + off, stride, mask_id, vocab_size,
                seeds[i], labels + off);
  });
}

int fast_collator_abi_version() { return 3; }

}  // extern "C"
