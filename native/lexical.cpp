// Native IDF n-gram hashing embedder: the lexical channel's hot loop.
//
// models/lexical.py:IDFHashingEmbedder._vec is a per-character Python loop
// (gram extraction, two FNV hashes, dict lookups) — fine at 160 docs,
// the ingest bottleneck at production corpus scale. This implements the
// 1/2-gram path byte-for-byte:
//
//   chars   = non-space codepoints (CPython str.isspace semantics)
//   grams   = chars + adjacent pairs, counted in FIRST-OCCURRENCE order
//   weight  = idf[gram] looked up by FNV-1a-64 key (sorted array +
//             binary search; fit() verifies the 64-bit keys are
//             collision-free and falls back to Python otherwise)
//   v[idx] += sign * log1p(count) * w   with idx/sign from
//             mix32(FNV-1a-32(gram utf8)) — exactly hash_embedder._mix
//   v      /= float64 L2 norm
//
// Exactness is load-bearing: the embedder fingerprint (and every
// persisted index) depends on the vectors, so accumulation ORDER and
// float widths mirror the Python loop exactly (double RHS accumulated
// into a float32 row, first-occurrence gram order, float64 norm) —
// asserted in tests/test_native.py.
//
// C ABI + ctypes, no pybind (not in the image). OpenMP across texts.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline bool py_isspace(uint32_t cp) {
  switch (cp) {
    case 0x09: case 0x0A: case 0x0B: case 0x0C: case 0x0D:
    case 0x1C: case 0x1D: case 0x1E: case 0x1F:
    case 0x20: case 0x85: case 0xA0:
    case 0x1680:
    case 0x2028: case 0x2029: case 0x202F: case 0x205F:
    case 0x3000:
      return true;
    default:
      return (cp >= 0x2000 && cp <= 0x200A);
  }
}

// decode one UTF-8 codepoint; input is valid UTF-8 (produced by Python)
inline const uint8_t* next_cp(const uint8_t* p, const uint8_t* end,
                              uint32_t* cp) {
  uint8_t b = *p;
  if (b < 0x80) { *cp = b; return p + 1; }
  if ((b >> 5) == 0x6 && p + 1 < end) {
    *cp = ((b & 0x1F) << 6) | (p[1] & 0x3F);
    return p + 2;
  }
  if ((b >> 4) == 0xE && p + 2 < end) {
    *cp = ((b & 0x0F) << 12) | ((p[1] & 0x3F) << 6) | (p[2] & 0x3F);
    return p + 3;
  }
  if ((b >> 3) == 0x1E && p + 3 < end) {
    *cp = ((b & 0x07) << 18) | ((p[1] & 0x3F) << 12) |
          ((p[2] & 0x3F) << 6) | (p[3] & 0x3F);
    return p + 4;
  }
  *cp = 0xFFFD;
  return p + 1;
}

inline uint32_t fnv1a32(const uint8_t* p, size_t n) {
  uint32_t h = 0x811C9DC5u;
  for (size_t i = 0; i < n; ++i) { h ^= p[i]; h *= 0x01000193u; }
  return h;
}

inline uint64_t fnv1a64(const uint8_t* p, size_t n) {
  uint64_t h = 0xcbf29ce484222325ull;
  for (size_t i = 0; i < n; ++i) { h ^= p[i]; h *= 0x100000001b3ull; }
  return h;
}

inline uint32_t mix32(uint32_t x) {
  x *= 0x9E3779B1u;
  x ^= x >> 16;
  x *= 0x85EBCA6Bu;
  x ^= x >> 13;
  return x;
}

struct Entry {        // one unique gram, in first-occurrence order
  uint64_t key;
  uint32_t fnv32;
  uint32_t count;
};

// open-addressed slot table into the entries vector
struct GramCounter {
  std::vector<int32_t> slots;   // -1 empty, else index into entries
  std::vector<Entry> entries;
  uint32_t mask;

  explicit GramCounter(size_t cap_hint) {
    size_t cap = 64;
    while (cap < 2 * cap_hint) cap <<= 1;
    slots.assign(cap, -1);
    entries.reserve(cap_hint);
    mask = static_cast<uint32_t>(cap - 1);
  }

  void add(uint64_t key, uint32_t f32h) {
    uint32_t i = static_cast<uint32_t>(key) & mask;
    for (;;) {
      int32_t s = slots[i];
      if (s < 0) {
        slots[i] = static_cast<int32_t>(entries.size());
        entries.push_back({key, f32h, 1});
        return;
      }
      if (entries[s].key == key) {
        ++entries[s].count;
        return;
      }
      i = (i + 1) & mask;
    }
  }
};

inline double idf_lookup(const uint64_t* keys, const double* weights,
                         int64_t n_keys, uint64_t key) {
  int64_t lo = 0, hi = n_keys;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (keys[mid] < key) lo = mid + 1; else hi = mid;
  }
  if (lo < n_keys && keys[lo] == key) return weights[lo];
  return 0.0;
}

}  // namespace

extern "C" {

// texts: concatenated UTF-8; offsets[i]..offsets[i+1] bounds text i
// keys/weights: sorted FNV-1a-64 gram keys + float64 IDF weights
// out: [n_texts, dim] float32, caller-zeroed
void lex_vec_batch(const uint8_t* bytes, const int64_t* offsets,
                   int32_t n_texts, const uint64_t* keys,
                   const double* weights, int64_t n_keys, int32_t dim,
                   float* out) {
#pragma omp parallel for schedule(dynamic, 8)
  for (int32_t t = 0; t < n_texts; ++t) {
    const uint8_t* p = bytes + offsets[t];
    const uint8_t* end = bytes + offsets[t + 1];

    // non-space codepoints as (start, len) byte slices
    std::vector<std::pair<const uint8_t*, uint8_t>> chars;
    chars.reserve(static_cast<size_t>(end - p));
    while (p < end) {
      uint32_t cp;
      const uint8_t* q = next_cp(p, end, &cp);
      if (!py_isspace(cp))
        chars.emplace_back(p, static_cast<uint8_t>(q - p));
      p = q;
    }

    const size_t nc = chars.size();
    GramCounter gc(2 * nc + 1);
    uint8_t buf[8];
    for (size_t i = 0; i < nc; ++i)      // 1-grams first (Python order)
      gc.add(fnv1a64(chars[i].first, chars[i].second),
             fnv1a32(chars[i].first, chars[i].second));
    for (size_t i = 0; i + 1 < nc; ++i) {  // then adjacent 2-grams
      const size_t n1 = chars[i].second, n2 = chars[i + 1].second;
      std::memcpy(buf, chars[i].first, n1);
      std::memcpy(buf + n1, chars[i + 1].first, n2);
      gc.add(fnv1a64(buf, n1 + n2), fnv1a32(buf, n1 + n2));
    }

    float* row = out + static_cast<int64_t>(t) * dim;
    for (const Entry& e : gc.entries) {   // first-occurrence order
      const double w = idf_lookup(keys, weights, n_keys, e.key);
      if (w == 0.0) continue;
      const uint32_t h = mix32(e.fnv32);
      const uint32_t idx = h % static_cast<uint32_t>(dim);
      const double sign = ((h >> 16) & 1u) ? 1.0 : -1.0;
      // numpy NEP50 semantics of `v[idx] += pyfloat` on a float32 array:
      // the python-float RHS is rounded to f32 FIRST, then an f32 add —
      // two roundings, not one double-add (collision slots differ by an
      // ulp otherwise)
      const float rhs = static_cast<float>(
          sign * std::log1p(static_cast<double>(e.count)) * w);
      row[idx] += rhs;
    }

    double nsq = 0.0;   // float64 norm accumulation (both paths), then a
    for (int32_t j = 0; j < dim; ++j)   // float32 divisor — matches the
      nsq += static_cast<double>(row[j]) * static_cast<double>(row[j]);
    if (nsq > 0.0) {                    // numpy f32-array / weak-scalar op
      const float nf = static_cast<float>(std::sqrt(nsq));
      for (int32_t j = 0; j < dim; ++j)
        row[j] /= nf;
    }
  }
}

}  // extern "C"
