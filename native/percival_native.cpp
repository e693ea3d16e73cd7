// percival_native: host-side data-plane primitives (C ABI, loaded via ctypes).
//
// Reference parity: percivaltts's data loading/batching is pure Python
// (percivaltts/data.py; SURVEY.md §2 notes "native components: none" in the
// reference). This framework's host data plane is native where the
// reference's was Python: raw float32 feature-file reads and padded-batch
// assembly (copy + pad + mask) run in C++, keeping the single host core free
// to feed the TPU instead of shuffling bytes through the interpreter.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <sys/stat.h>

extern "C" {

// Returns the number of float32 elements in the file, or -1 on error.
int64_t pn_file_f32_count(const char* path) {
  struct stat st;
  if (stat(path, &st) != 0) return -1;
  if (st.st_size % 4 != 0) return -2;
  return st.st_size / 4;
}

// Reads the whole file into out (caller allocates count floats).
// Returns elements read, or negative on error.
int64_t pn_read_f32(const char* path, float* out, int64_t count) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  size_t got = fread(out, sizeof(float), (size_t)count, f);
  fclose(f);
  return (int64_t)got;
}

// Writes count floats to path. Returns elements written or negative.
int64_t pn_write_f32(const char* path, const float* data, int64_t count) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t put = fwrite(data, sizeof(float), (size_t)count, f);
  fclose(f);
  return (int64_t)put;
}

// Assemble a padded batch from per-utterance feature matrices.
//
//   srcs:     array of B pointers, srcs[j] -> (lengths[j], dim) row-major
//   lengths:  per-utterance frame counts (after any crop, <= bound)
//   offsets:  per-utterance crop start rows
//   out:      (B, bound, dim) zero-filled by this function
//   mask:     (B, bound) zero-filled, set to 1.0 for valid frames
//             (pass nullptr to skip mask writing)
void pn_assemble_batch(const float** srcs, const int32_t* lengths,
                       const int32_t* offsets, int32_t batch, int32_t bound,
                       int32_t dim, float* out, float* mask) {
  const size_t row = (size_t)dim;
  const size_t plane = (size_t)bound * row;
  for (int32_t j = 0; j < batch; ++j) {
    float* dst = out + (size_t)j * plane;
    const int32_t n = lengths[j];
    const float* src = srcs[j] + (size_t)offsets[j] * row;
    memcpy(dst, src, (size_t)n * row * sizeof(float));
    memset(dst + (size_t)n * row, 0, (size_t)(bound - n) * row * sizeof(float));
    if (mask) {
      float* m = mask + (size_t)j * bound;
      for (int32_t t = 0; t < n; ++t) m[t] = 1.0f;
      memset(m + n, 0, (size_t)(bound - n) * sizeof(float));
    }
  }
}

// Affine normalization in place: x = (x - shift) * scale, row-major
// (rows, dim) with per-column shift/scale.
void pn_normalize(float* x, int64_t rows, int32_t dim, const float* shift,
                  const float* scale) {
  for (int64_t r = 0; r < rows; ++r) {
    float* p = x + r * dim;
    for (int32_t c = 0; c < dim; ++c) p[c] = (p[c] - shift[c]) * scale[c];
  }
}

}  // extern "C"
