// Exact candidate re-rank against the host-RAM f16 refinement copy.
//
// The int4/int8 device scan returns rerank_factor*k candidate ids; the
// engine re-scores them exactly on the host (engine/flat.py:host_rerank —
// the Faiss "refine" tier with host RAM as the warm tier, so the device
// keeps only quantized rows). numpy's fancy-index + einsum costs ~6 ms for
// B=64 x 40 candidates at 768-d; this OpenMP version does the same work in
// one pass per candidate row (f16 convert + dot fused, no [b,kk,d]
// materialization), parallel over queries.
//
// Matches host_rerank's semantics exactly, including numpy stable-argsort
// tie-breaking (first candidate wins among equal scores) and the -inf
// scan-score mask for padded candidate slots.

#include <cstdint>
#include <cstring>

#if defined(__F16C__)
#include <immintrin.h>
#endif

namespace {

inline float half_to_float_scalar(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      exp = 1;
      while (!(man & 0x400u)) {
        man <<= 1;
        --exp;
      }
      man &= 0x3ffu;
      bits = sign | ((exp + 112u) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (man << 13);  // inf/nan
  } else {
    bits = sign | ((exp + 112u) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

// dot(q_f32[d], row_f16[d]) with fused conversion
inline float dot_f16(const float* q, const uint16_t* row, int d) {
#if defined(__F16C__) && defined(__AVX2__)
  __m256 acc = _mm256_setzero_ps();
  int j = 0;
  for (; j + 8 <= d; j += 8) {
    __m256 r = _mm256_cvtph_ps(_mm_loadu_si128((const __m128i*)(row + j)));
    acc = _mm256_fmadd_ps(_mm256_loadu_ps(q + j), r, acc);
  }
  __m128 lo = _mm256_castps256_ps128(acc);
  __m128 hi = _mm256_extractf128_ps(acc, 1);
  lo = _mm_add_ps(lo, hi);
  lo = _mm_hadd_ps(lo, lo);
  lo = _mm_hadd_ps(lo, lo);
  float s = _mm_cvtss_f32(lo);
#else
  float s = 0.f;
  int j = 0;
#endif
  for (; j < d; ++j) s += q[j] * half_to_float_scalar(row[j]);
  return s;
}

}  // namespace

extern "C" {

// refine: [n, d] f16 row-major; q: [b, d] f32 (pre-normalized by caller);
// scan_s: [b, kk] device scan scores (-inf = padded slot, skip);
// cand: [b, kk] candidate row ids (clipped into [0, n));
// out_s/out_i: [b, k] exact top-k among the candidates.
void rerank_f16(const uint16_t* refine, const float* q, const float* scan_s,
                const int32_t* cand, int64_t n, int b, int d, int kk, int k,
                float* out_s, int32_t* out_i, int threads) {
  const float NEG = -__builtin_huge_valf();
#pragma omp parallel for schedule(static) num_threads(threads)
  for (int bi = 0; bi < b; ++bi) {
    const float* qr = q + (int64_t)bi * d;
    const float* ss = scan_s + (int64_t)bi * kk;
    const int32_t* cd = cand + (int64_t)bi * kk;
    float ex[512];  // kk <= 512 enforced by the wrapper
    for (int j = 0; j < kk; ++j) {
      if (ss[j] <= NEG) {
        ex[j] = NEG;
        continue;
      }
      int64_t r = cd[j];
      if (r < 0) r = 0;
      if (r >= n) r = n - 1;
      ex[j] = dot_f16(qr, refine + r * d, d);
    }
    // selection of top-k, stable (first index wins ties) — matches
    // np.argsort(-x, kind="stable")
    bool used[512] = {false};
    for (int sel = 0; sel < k; ++sel) {
      int best = -1;
      float bs = NEG;
      for (int j = 0; j < kk; ++j) {
        if (!used[j] && (best < 0 || ex[j] > bs)) {
          bs = ex[j];
          best = j;
        }
      }
      used[best] = true;
      out_s[(int64_t)bi * k + sel] = ex[best];
      out_i[(int64_t)bi * k + sel] = cd[best];
    }
  }
}

}  // extern "C"
