// Minimal drop-in replacement for google/cpu_features' cpuinfo_x86.h,
// sufficient for building the reference library's benchmark baseline in a
// zero-egress container (the real dependency is normally FetchContent'd).
// Feature bits come from the compiler's builtin CPU detection.
#pragma once

namespace cpu_features {

struct X86Features {
  bool avx512f;
  bool avx512dq;
  bool avx512vl;
  bool avx512ifma;
  bool avx512vbmi2;
};

struct X86Info {
  X86Features features;
};

inline X86Info GetX86Info() {
  X86Info info{};
  __builtin_cpu_init();
  info.features.avx512f = __builtin_cpu_supports("avx512f");
  info.features.avx512dq = __builtin_cpu_supports("avx512dq");
  info.features.avx512vl = __builtin_cpu_supports("avx512vl");
  info.features.avx512ifma = __builtin_cpu_supports("avx512ifma");
  info.features.avx512vbmi2 = __builtin_cpu_supports("avx512vbmi2");
  return info;
}

}  // namespace cpu_features
