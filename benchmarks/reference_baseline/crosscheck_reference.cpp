// Oracle driver for cross-checking hexl_tpu against the ACTUAL compiled
// reference library (intel/hexl), not just its ported golden vectors.
// Links the unmodified reference sources (see build.sh); this harness is
// original. Used by tests/test_vs_reference_lib.py.
//
// Protocol: argv selects the op and scalar parameters; input vectors are
// native-endian uint64 arrays on stdin, outputs the same on stdout.
//
//   fwd_ntt N q imf omf          stdin: N      stdout: N
//   inv_ntt N q imf omf          stdin: N      stdout: N
//   mult_mod N q imf             stdin: 2N     stdout: N
//   add_mod N q                  stdin: 2N     stdout: N
//   add_mod_scalar N q s         stdin: N      stdout: N
//   sub_mod N q                  stdin: 2N     stdout: N
//   sub_mod_scalar N q s         stdin: N      stdout: N
//   fma_mod N q imf s addend01   stdin: N(+N)  stdout: N
//   reduce_mod N q imf omf       stdin: N      stdout: N   (imf==q allowed)
//   cmp_add N cmp bound diff     stdin: N      stdout: N   (cmp: CMPINT int)
//   cmp_sub_mod N q cmp bound diff   stdin: N  stdout: N
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "hexl/hexl.hpp"

using intel::hexl::CMPINT;

static std::vector<uint64_t> read_u64(size_t n) {
  std::vector<uint64_t> v(n);
  if (fread(v.data(), sizeof(uint64_t), n, stdin) != n) {
    fprintf(stderr, "crosscheck: short read (wanted %zu u64)\n", n);
    exit(2);
  }
  return v;
}

static void write_u64(const std::vector<uint64_t>& v) {
  fwrite(v.data(), sizeof(uint64_t), v.size(), stdout);
  fflush(stdout);
}

static uint64_t arg_u64(char** argv, int i) {
  return strtoull(argv[i], nullptr, 10);
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: crosscheck_reference <op> <args...>\n");
    return 2;
  }
  std::string op = argv[1];
  uint64_t n = arg_u64(argv, 2);
  std::vector<uint64_t> out(n);

  if (op == "fwd_ntt" || op == "inv_ntt") {
    uint64_t q = arg_u64(argv, 3), imf = arg_u64(argv, 4),
             omf = arg_u64(argv, 5);
    intel::hexl::NTT ntt(n, q);
    auto in = read_u64(n);
    if (op == "fwd_ntt") {
      ntt.ComputeForward(out.data(), in.data(), imf, omf);
    } else {
      ntt.ComputeInverse(out.data(), in.data(), imf, omf);
    }
  } else if (op == "mult_mod") {
    uint64_t q = arg_u64(argv, 3), imf = arg_u64(argv, 4);
    auto a = read_u64(n), b = read_u64(n);
    intel::hexl::EltwiseMultMod(out.data(), a.data(), b.data(), n, q, imf);
  } else if (op == "add_mod") {
    uint64_t q = arg_u64(argv, 3);
    auto a = read_u64(n), b = read_u64(n);
    intel::hexl::EltwiseAddMod(out.data(), a.data(), b.data(), n, q);
  } else if (op == "add_mod_scalar") {
    uint64_t q = arg_u64(argv, 3), s = arg_u64(argv, 4);
    auto a = read_u64(n);
    intel::hexl::EltwiseAddMod(out.data(), a.data(), s, n, q);
  } else if (op == "sub_mod") {
    uint64_t q = arg_u64(argv, 3);
    auto a = read_u64(n), b = read_u64(n);
    intel::hexl::EltwiseSubMod(out.data(), a.data(), b.data(), n, q);
  } else if (op == "sub_mod_scalar") {
    uint64_t q = arg_u64(argv, 3), s = arg_u64(argv, 4);
    auto a = read_u64(n);
    intel::hexl::EltwiseSubMod(out.data(), a.data(), s, n, q);
  } else if (op == "fma_mod") {
    uint64_t q = arg_u64(argv, 3), imf = arg_u64(argv, 4),
             s = arg_u64(argv, 5), has_addend = arg_u64(argv, 6);
    auto a = read_u64(n);
    std::vector<uint64_t> addend;
    if (has_addend) addend = read_u64(n);
    intel::hexl::EltwiseFMAMod(out.data(), a.data(), s,
                               has_addend ? addend.data() : nullptr, n, q,
                               imf);
  } else if (op == "reduce_mod") {
    uint64_t q = arg_u64(argv, 3), imf = arg_u64(argv, 4),
             omf = arg_u64(argv, 5);
    auto a = read_u64(n);
    intel::hexl::EltwiseReduceMod(out.data(), a.data(), n, q, imf, omf);
  } else if (op == "cmp_add") {
    uint64_t cmp = arg_u64(argv, 3), bound = arg_u64(argv, 4),
             diff = arg_u64(argv, 5);
    auto a = read_u64(n);
    intel::hexl::EltwiseCmpAdd(out.data(), a.data(), n,
                               static_cast<CMPINT>(cmp), bound, diff);
  } else if (op == "cmp_sub_mod") {
    uint64_t q = arg_u64(argv, 3), cmp = arg_u64(argv, 4),
             bound = arg_u64(argv, 5), diff = arg_u64(argv, 6);
    auto a = read_u64(n);
    intel::hexl::EltwiseCmpSubMod(out.data(), a.data(), n, q,
                                  static_cast<CMPINT>(cmp), bound, diff);
  } else {
    fprintf(stderr, "crosscheck: unknown op '%s'\n", op.c_str());
    return 2;
  }
  write_u64(out);
  return 0;
}
