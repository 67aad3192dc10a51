// Native host-side data-pipeline kernels for outeffhop_tpu.
//
// The reference delegates its host data path to Python (HF datasets maps,
// csv module in `data_loader.py:36-50`, torch collators). On TPU hosts the
// input pipeline shares cores with the runtime, so the per-batch hot loops
// live here: CSV numeric parsing, counter-based MLM masking (bit-identical
// to the NumPy fallback in native/fallback.py via splitmix64), and sliding
// window gathering. Exposed through ctypes (see native/__init__.py); built
// with `g++ -O3 -shared` on first import.
//
// Everything is C ABI. Buffers are caller-allocated; functions return 0 on
// success, negative on error.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// splitmix64 counter-based RNG (public-domain construction, Vigna 2015).
// Stateless per index: both C++ and NumPy evaluate the same closed form, so
// the masking decisions are bit-identical across implementations.
// ---------------------------------------------------------------------------

static inline uint64_t sm64_mix(uint64_t z) {
  z ^= z >> 30;
  z *= 0xBF58476D1CE4E5B9ULL;
  z ^= z >> 27;
  z *= 0x94D049BB133111EBULL;
  z ^= z >> 31;
  return z;
}

static inline uint64_t sm64_at(uint64_t seed, uint64_t idx, uint64_t stream) {
  uint64_t z = seed + (idx + 1) * 0x9E3779B97F4A7C15ULL + stream * 0xD1B54A32D192ED03ULL;
  return sm64_mix(z);
}

static inline double u64_to_unit(uint64_t r) {
  // top 53 bits -> [0, 1)
  return (double)(r >> 11) * (1.0 / 9007199254740992.0);
}

// ---------------------------------------------------------------------------
// MLM dynamic masking: HF DataCollatorForLanguageModeling semantics
// (mlm_probability of non-special positions; 80% -> [MASK], 10% -> random
// token, 10% unchanged; labels -100 elsewhere).
// ---------------------------------------------------------------------------

int mlm_mask(const int32_t* tokens, int64_t n, double mlm_prob, uint64_t seed,
             int32_t mask_id, int32_t vocab_size, const int32_t* special_ids,
             int32_t n_special, int32_t* out_ids, int32_t* out_labels) {
  if (n < 0 || vocab_size <= 0) return -1;
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n < 65536) n_threads = 1;

  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int32_t t = tokens[i];
      bool special = false;
      for (int32_t s = 0; s < n_special; ++s)
        if (t == special_ids[s]) { special = true; break; }
      double p = u64_to_unit(sm64_at(seed, (uint64_t)i, 0));
      bool masked = !special && p < mlm_prob;
      out_labels[i] = masked ? t : -100;
      if (!masked) { out_ids[i] = t; continue; }
      double a = u64_to_unit(sm64_at(seed, (uint64_t)i, 1));
      if (a < 0.8) {
        out_ids[i] = mask_id;
      } else if (a < 0.9) {
        out_ids[i] = (int32_t)(sm64_at(seed, (uint64_t)i, 2) % (uint64_t)vocab_size);
      } else {
        out_ids[i] = t;
      }
    }
  };

  if (n_threads == 1) {
    work(0, n);
  } else {
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int k = 0; k < n_threads; ++k) {
      int64_t lo = k * chunk, hi = lo + chunk > n ? n : lo + chunk;
      if (lo >= hi) break;
      ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
  return 0;
}

// ---------------------------------------------------------------------------
// CSV numeric parser: header row skipped, first column (date) skipped,
// remaining fields parsed as float32. Two-pass: count rows/cols, then fill.
// ---------------------------------------------------------------------------

int csv_shape(const char* path, int64_t* out_rows, int64_t* out_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t rows = 0, cols = 0;
  int c;
  int64_t cur_cols = 1;
  bool first_line = true, line_empty = true;
  while ((c = fgetc(f)) != EOF) {
    if (c == ',') { cur_cols++; line_empty = false; }
    else if (c == '\n') {
      if (!line_empty) {
        if (first_line) { cols = cur_cols; first_line = false; }
        else rows++;
      }
      cur_cols = 1;
      line_empty = true;
    } else if (c != '\r') {
      line_empty = false;
    }
  }
  if (!line_empty) {  // file without trailing newline
    if (first_line) cols = cur_cols; else rows++;
  }
  fclose(f);
  *out_rows = rows;          // data rows (header excluded)
  *out_cols = cols - 1;      // date column excluded
  return 0;
}

int csv_parse(const char* path, float* out, int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // read whole file
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf((size_t)size + 1);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) { fclose(f); return -2; }
  fclose(f);
  buf[(size_t)size] = '\0';

  char* p = buf.data();
  char* end = p + size;
  // skip header line
  while (p < end && *p != '\n') ++p;
  if (p < end) ++p;

  int64_t r = 0;
  while (p < end && r < rows) {
    // skip date field
    while (p < end && *p != ',' && *p != '\n') ++p;
    if (p >= end || *p == '\n') { if (p < end) ++p; continue; }
    ++p;  // consume comma
    for (int64_t c = 0; c < cols; ++c) {
      char* nxt = nullptr;
      out[r * cols + c] = strtof(p, &nxt);
      p = nxt;
      while (p < end && (*p == ',' || *p == '\r')) ++p;
    }
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
    ++r;
  }
  return r == rows ? 0 : -3;
}

// ---------------------------------------------------------------------------
// Sliding-window gather: data (T, D) f32, idx (B,) window starts ->
// x (B, in_len, D), y (B, out_len, D). Pure memcpy rows.
// ---------------------------------------------------------------------------

int gather_windows(const float* data, int64_t T, int64_t D, const int64_t* idx,
                   int64_t B, int64_t in_len, int64_t out_len, float* x_out,
                   float* y_out) {
  for (int64_t b = 0; b < B; ++b) {
    int64_t s = idx[b];
    if (s < 0 || s + in_len + out_len > T) return -1;
    std::memcpy(x_out + b * in_len * D, data + s * D,
                (size_t)(in_len * D) * sizeof(float));
    std::memcpy(y_out + b * out_len * D, data + (s + in_len) * D,
                (size_t)(out_len * D) * sizeof(float));
  }
  return 0;
}

}  // extern "C"
