/* Native batch assembly for the traffic dataset: parallel window gather.
 *
 * The role of the reference's C++ DataLoader worker pool (paddle's
 * dataloader machinery behind example/D3STN/train_dde.py:99-124 in
 * DrownFish19/PaddleXDE): assembling a [B, N, his_len, D] batch from the
 * [N, T_all, D] series is B*N contiguous row copies of his_len*D elements.
 * The numpy loop pays Python/ufunc dispatch per (sample) and runs single-
 * threaded (measured 112 ms per PEMS08-scale batch); this does the same
 * copies with OpenMP across (sample, node) pairs.
 *
 * Byte-based and dtype-agnostic. Built on first use with the system cc
 * (see native/__init__.py); the numpy path remains the fallback.
 */

#include <stdint.h>
#include <string.h>

/* data:   [N, T_all, D]   (contiguous, element size isz)
 * out:    [B, N, win, D]
 * starts: [B] window start indices into the T_all axis
 */
void gather_windows(const char *data, char *out, const int64_t *starts,
                    int64_t b, int64_t n, int64_t t_all, int64_t d,
                    int64_t win, int64_t isz) {
  const int64_t row = win * d * isz;        /* one (sample, node) copy      */
  const int64_t src_node = t_all * d * isz; /* node stride in the source    */
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      memcpy(out + (i * n + j) * row,
             data + j * src_node + starts[i] * d * isz, row);
    }
  }
}

/* Time-major variant: data [T_all, N, D] -> out [B, win, N, D]; each
 * (sample) is ONE contiguous copy of win*N*D elements. */
void gather_windows_tmajor(const char *data, char *out, const int64_t *starts,
                           int64_t b, int64_t n, int64_t t_all, int64_t d,
                           int64_t win, int64_t isz) {
  const int64_t row = win * n * d * isz;
  const int64_t t_stride = n * d * isz;
  (void)t_all;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    memcpy(out + i * row, data + starts[i] * t_stride, row);
  }
}
