// Measures the reference library's (intel/hexl) headline kernels on the
// host CPU — the baseline the TPU framework is compared against. This
// harness is original; it links the unmodified reference sources.
//
// Output: one JSON object per config on stdout.
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

#include "hexl/hexl.hpp"
#include "eltwise/eltwise-reduce-mod-avx512.hpp"  // Montgomery internals
#ifdef BASELINE_EXPERIMENTAL
#include <complex>
#include "hexl/experimental/fft-like/fft-like.hpp"
#include "hexl/experimental/seal/dyadic-multiply.hpp"
#include "hexl/experimental/seal/key-switch.hpp"
#endif

using Clock = std::chrono::steady_clock;

static std::vector<uint64_t> random_vec(size_t n, uint64_t bound,
                                        uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<uint64_t> dist(0, bound - 1);
  std::vector<uint64_t> v(n);
  for (auto& x : v) x = dist(rng);
  return v;
}

template <typename F>
static double time_per_call_us(F&& f, int min_iters = 50,
                               double min_secs = 0.5) {
  // Warm up
  f();
  f();
  int iters = min_iters;
  for (;;) {
    auto t0 = Clock::now();
    for (int i = 0; i < iters; ++i) f();
    double secs = std::chrono::duration<double>(Clock::now() - t0).count();
    if (secs >= min_secs) return secs * 1e6 / iters;
    iters *= 4;
  }
}

int main() {
  using namespace intel::hexl;

  printf("[\n");
  bool first = true;
  auto emit = [&](const char* name, uint64_t n, uint64_t q_bits,
                  double us_per_call) {
    if (!first) printf(",\n");
    first = false;
    printf("  {\"kernel\": \"%s\", \"n\": %llu, \"q_bits\": %llu, "
           "\"us_per_call\": %.3f, \"calls_per_sec\": %.1f}",
           name, (unsigned long long)n, (unsigned long long)q_bits,
           us_per_call, 1e6 / us_per_call);
    fflush(stdout);
  };

  // Fwd+Inv NTT across sizes and modulus widths: DQ-32 (q < 2^30, the
  // reference's self-declared best-performance regime, README.md:202-204),
  // IFMA (q < 2^50) and DQ-64.
  for (uint64_t log_n : {10, 12, 14, 17}) {
    uint64_t n = 1ULL << log_n;
    for (uint64_t q_bits : {29, 49, 60}) {
      uint64_t q = GeneratePrimes(1, q_bits, true, n)[0];
      NTT ntt(n, q);
      auto input = random_vec(n, q, 42);
      std::vector<uint64_t> buf(input);
      emit("fwd_ntt", n, q_bits, time_per_call_us([&] {
             ntt.ComputeForward(buf.data(), buf.data(), 1, 1);
           }));
      emit("inv_ntt", n, q_bits, time_per_call_us([&] {
             ntt.ComputeInverse(buf.data(), buf.data(), 1, 1);
           }));
      // Lazy variants (the fastest settings, OMF=4 / OMF=2)
      emit("fwd_ntt_lazy", n, q_bits, time_per_call_us([&] {
             ntt.ComputeForward(buf.data(), buf.data(), 2, 4);
           }));
      emit("inv_ntt_lazy", n, q_bits, time_per_call_us([&] {
             ntt.ComputeInverse(buf.data(), buf.data(), 2, 2);
           }));
      for (auto& x : buf) x %= q;
    }
  }

  // Eltwise ops at the BASELINE.md configs.
  {
    uint64_t n = 1ULL << 12;
    uint64_t q = GeneratePrimes(1, 60, true, n)[0];
    auto a = random_vec(n, q, 1), b = random_vec(n, q, 2);
    std::vector<uint64_t> out(n);
    emit("eltwise_add_mod", n, 60, time_per_call_us([&] {
           EltwiseAddMod(out.data(), a.data(), b.data(), n, q);
         }));
    emit("eltwise_sub_mod", n, 60, time_per_call_us([&] {
           EltwiseSubMod(out.data(), a.data(), b.data(), n, q);
         }));
  }
  {
    uint64_t n = 1ULL << 13;
    for (uint64_t q_bits : {49, 60}) {
      uint64_t q = GeneratePrimes(1, q_bits, true, n)[0];
      auto a = random_vec(n, q, 3), b = random_vec(n, q, 4);
      std::vector<uint64_t> out(n);
      emit("eltwise_mult_mod", n, q_bits, time_per_call_us([&] {
             EltwiseMultMod(out.data(), a.data(), b.data(), n, q, 1);
           }));
      auto big = random_vec(n, q * 4, 5);
      emit("eltwise_reduce_mod", n, q_bits, time_per_call_us([&] {
             EltwiseReduceMod(out.data(), big.data(), n, q, 4, 1);
           }));
    }
  }
  {
    uint64_t n = 1ULL << 14;
    uint64_t q = GeneratePrimes(1, 59, true, n)[0];
    auto a = random_vec(n, q, 6), c = random_vec(n, q, 7);
    std::vector<uint64_t> out(n);
    emit("eltwise_fma_mod", n, 59, time_per_call_us([&] {
           EltwiseFMAMod(out.data(), a.data(), 12345, c.data(), n, q, 1);
         }));
    emit("eltwise_fma_mod_no_addend", n, 59, time_per_call_us([&] {
           EltwiseFMAMod(out.data(), a.data(), 12345, nullptr, n, q, 1);
         }));
    emit("eltwise_cmp_add", n, 59, time_per_call_us([&] {
           EltwiseCmpAdd(out.data(), a.data(), n, CMPINT::NLT, q / 2, 42);
         }));
    emit("eltwise_cmp_sub_mod", n, 59, time_per_call_us([&] {
           EltwiseCmpSubMod(out.data(), a.data(), n, q, CMPINT::NLT, q / 2,
                            42);
         }));
    auto big2 = random_vec(n, q * 2, 8);
    emit("eltwise_reduce_mod_2to1", n, 59, time_per_call_us([&] {
           EltwiseReduceMod(out.data(), big2.data(), n, q, 2, 1);
         }));
  }

  // Vector-scalar add/sub (reference scalar overloads).
  {
    uint64_t n = 1ULL << 12;
    uint64_t q = GeneratePrimes(1, 60, true, n)[0];
    auto a = random_vec(n, q, 9);
    std::vector<uint64_t> out(n);
    uint64_t s = 1234567;
    emit("eltwise_add_mod_scalar", n, 60, time_per_call_us([&] {
           EltwiseAddMod(out.data(), a.data(), s, n, q);
         }));
    emit("eltwise_sub_mod_scalar", n, 60, time_per_call_us([&] {
           EltwiseSubMod(out.data(), a.data(), s, n, q);
         }));
  }

  // Montgomery family (the reference benches these AVX512 internals
  // directly, bench-eltwise-reduce-mod.cpp:227-338, with its fixed
  // 47-bit modulus and R = 2^46; our framework's family is R = 2^64 —
  // same workload class, different Montgomery radix).
  {
    uint64_t n = 1ULL << 13;
    uint64_t modulus = 67280421310725ULL;  // reference's bench modulus
    int r = 46;
    uint64_t inv_mod = HenselLemma2adicRoot(r, modulus);
    uint64_t R2_mod_q = 42006526039321ULL;
    auto a = random_vec(n, modulus, 10), b = random_vec(n, modulus, 11);
    std::vector<uint64_t> out(n);
    emit("eltwise_mont_reduce", n, 47, time_per_call_us([&] {
           EltwiseMontReduceModAVX512<52, 46>(out.data(), a.data(),
                                              b.data(), n, modulus,
                                              inv_mod);
         }));
    emit("eltwise_mont_form_in", n, 47, time_per_call_us([&] {
           EltwiseMontgomeryFormInAVX512<52, 46>(out.data(), a.data(),
                                                 R2_mod_q, n, modulus,
                                                 inv_mod);
         }));
    emit("eltwise_mont_form_out", n, 47, time_per_call_us([&] {
           EltwiseMontgomeryFormOutAVX512<52, 46>(out.data(), a.data(), n,
                                                  modulus, inv_mod);
         }));
  }

#ifdef BASELINE_EXPERIMENTAL
  // FFT-like (reference: benchmark/bench-fft-like.cpp shapes).
  for (uint64_t log_n : {12, 14}) {
    uint64_t n = 1ULL << log_n;
    double scalar = 1.0;
    FFTLike fft(n, &scalar);
    std::vector<std::complex<double>> data(n);
    std::mt19937_64 rng(9);
    std::uniform_real_distribution<double> dist(-1.0, 1.0);
    for (auto& z : data) z = {dist(rng), dist(rng)};
    std::vector<std::complex<double>> out(n);
    double scale = 1.0 / (1ULL << 30);
    emit("fwd_fft_like", n, 0, time_per_call_us([&] {
           fft.ComputeForwardFFTLike(out.data(), data.data(), &scale);
         }));
    emit("inv_fft_like", n, 0, time_per_call_us([&] {
           fft.ComputeInverseFFTLike(out.data(), data.data(), &scale);
         }));
  }

  // DyadicMultiply (ct x ct in NTT form, 4 x 50-bit RNS moduli) —
  // matches the framework's dyadic_multiply row shape.
  {
    uint64_t n = 1ULL << 14;
    uint64_t m = 4;
    auto moduli = GeneratePrimes(m, 50, true, n);
    std::vector<uint64_t> x(2 * m * n), y(2 * m * n), res(3 * m * n);
    std::mt19937_64 rng(12);
    for (uint64_t p = 0; p < 2; ++p)
      for (uint64_t i = 0; i < m; ++i) {
        std::uniform_int_distribution<uint64_t> dist(0, moduli[i] - 1);
        for (uint64_t c = 0; c < n; ++c) {
          x[(p * m + i) * n + c] = dist(rng);
          y[(p * m + i) * n + c] = dist(rng);
        }
      }
    emit("dyadic_multiply", n, 50, time_per_call_us([&] {
           DyadicMultiply(res.data(), x.data(), y.data(), n, moduli.data(),
                          m);
         }));
  }

  // KeySwitch at production CKKS shapes: the round-3 row (n=2^14, ds=3,
  // kc=2, 49-bit) plus the SEAL-typical deeper/larger shapes (ds=5 and
  // n=2^15) the round-4 verdict asked for.
  struct KsShape { uint64_t log_n, ds; const char* name; };
  for (KsShape shape : {KsShape{14, 3, "key_switch"},
                        KsShape{14, 5, "key_switch_ds5"},
                        KsShape{15, 3, "key_switch"}}) {
    uint64_t n = 1ULL << shape.log_n;
    uint64_t ds = shape.ds, kms = ds + 1, rns = ds + 1, kc = 2;
    auto moduli = GeneratePrimes(kms, 49, true, n);
    uint64_t qk = moduli[kms - 1];
    std::vector<uint64_t> t_target;
    for (uint64_t j = 0; j < ds; ++j) {
      auto v = random_vec(n, moduli[j], 100 + j);
      t_target.insert(t_target.end(), v.begin(), v.end());
    }
    // keys[j]: kc components x kms moduli x n coefficients, flat.
    std::vector<std::vector<uint64_t>> keys(ds);
    std::vector<const uint64_t*> key_ptrs(ds);
    for (uint64_t j = 0; j < ds; ++j) {
      keys[j].resize(kc * kms * n);
      for (uint64_t k = 0; k < kc; ++k)
        for (uint64_t m = 0; m < kms; ++m) {
          auto v = random_vec(n, moduli[m], 200 + j * 16 + k * 4 + m);
          std::copy(v.begin(), v.end(),
                    keys[j].begin() + (k * kms + m) * n);
        }
      key_ptrs[j] = keys[j].data();
    }
    std::vector<uint64_t> msf(ds);
    for (uint64_t i = 0; i < ds; ++i)
      msf[i] = InverseMod(qk % moduli[i], moduli[i]);
    std::vector<uint64_t> result(kc * ds * n, 0);
    emit(shape.name, n, 49, time_per_call_us(
             [&] {
               KeySwitch(result.data(), t_target.data(), n, ds, kms, rns,
                         kc, moduli.data(), key_ptrs.data(), msf.data());
             },
             5, 0.5));
  }
#endif  // BASELINE_EXPERIMENTAL

  printf("\n]\n");
  return 0;
}
