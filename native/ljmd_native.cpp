// Native runtime components for ljmd_tpu (C ABI, loaded via ctypes).
//
// The reference's "native" layer is its Fortran modules; the pieces that are
// genuinely host-side runtime work — bulk trajectory IO in the Fortran
// unformatted record format (md_simulation_program.f90:248-257,384-387) and
// the ran3-style RNG stream (random_numbers.f90:48-116) — are implemented
// here in C++ for speed, with pure-Python fallbacks in
// ljmd_tpu/io/fortran_records.py and ljmd_tpu/utils/ran3.py.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
//
// All functions return 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr double MBIG = 4.0e6;
constexpr double MSEED = 1618033.0;

struct Ran3State {
  double ma[56];
  int inext, inextp;
};

void ran3_init(Ran3State &s, int64_t seed) {
  double mj = MSEED - (seed < 0 ? -(double)seed : (double)seed);
  if (mj < 0) mj = -mj;
  mj = mj - MBIG * (int64_t)(mj / MBIG);  // fmod on exact small values
  s.ma[55] = mj;
  double mk = 1.0;
  for (int i = 1; i <= 54; ++i) {
    int ii = (21 * i) % 55;
    s.ma[ii] = mk;
    mk = mj - mk;
    if (mk < 0.0) mk += MBIG;
    mj = s.ma[ii];
  }
  for (int k = 0; k < 4; ++k)
    for (int i = 1; i <= 55; ++i) {
      s.ma[i] -= s.ma[1 + (i + 30) % 55];
      if (s.ma[i] < 0.0) s.ma[i] += MBIG;
    }
  s.inext = 0;
  s.inextp = 31;
}

double ran3_next(Ran3State &s) {
  if (++s.inext == 56) s.inext = 1;
  if (++s.inextp == 56) s.inextp = 1;
  double mj = s.ma[s.inext] - s.ma[s.inextp];
  if (mj < 0.0) mj += MBIG;
  s.ma[s.inext] = mj;
  return mj / MBIG;
}

int write_record(FILE *f, const void *payload, int64_t nbytes) {
  int32_t marker = (int32_t)nbytes;
  if (fwrite(&marker, 4, 1, f) != 1) return -2;
  if (nbytes && fwrite(payload, 1, (size_t)nbytes, f) != (size_t)nbytes) return -2;
  if (fwrite(&marker, 4, 1, f) != 1) return -2;
  return 0;
}

// (n_frames, n, 3) row-major -> per-frame component-major (x..., y..., z...)
void frame_to_components(const double *frame, int64_t n, double *scratch) {
  for (int64_t i = 0; i < n; ++i) {
    scratch[i] = frame[3 * i];
    scratch[n + i] = frame[3 * i + 1];
    scratch[2 * n + i] = frame[3 * i + 2];
  }
}

}  // namespace

extern "C" {

// Bulk ran3: fill out[0..n) with the uniform stream for `seed`.
int ljmd_ran3_fill(int64_t seed, double *out, int64_t n) {
  if (!out || n < 0) return -1;
  Ran3State s;
  ran3_init(s, seed);
  for (int64_t i = 0; i < n; ++i) out[i] = ran3_next(s);
  return 0;
}

// Write a complete rva.dat: header + 4 records (r, ru, v, a) per frame.
// Arrays are (n_frames, n, 3) float64 row-major.
int ljmd_write_rva(const char *path, int32_t n, double box_length, double dt,
                   int32_t output_interval, int32_t n_frames, const double *r,
                   const double *ru, const double *v, const double *a) {
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  struct __attribute__((packed)) Header {
    int32_t n;
    double L, dt;
    int32_t interval, n_snap;
  } h = {n, box_length, dt, output_interval, n_frames};
  int rc = write_record(f, &h, sizeof(h));
  std::vector<double> scratch((size_t)3 * n);
  const double *streams[4] = {r, ru, v, a};
  const int64_t frame_len = (int64_t)3 * n;
  for (int64_t s = 0; rc == 0 && s < n_frames; ++s) {
    for (int k = 0; rc == 0 && k < 4; ++k) {
      frame_to_components(streams[k] + s * frame_len, n, scratch.data());
      rc = write_record(f, scratch.data(), frame_len * 8);
    }
  }
  if (fclose(f) != 0 && rc == 0) rc = -3;
  return rc;
}

// Read an rva.dat header (4-byte markers). Returns 0 on success.
int ljmd_read_rva_header(const char *path, int32_t *n, double *box_length,
                         double *dt, int32_t *output_interval,
                         int32_t *n_frames_header, int64_t *n_frames_actual) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  int32_t m0, m1;
  struct __attribute__((packed)) Header {
    int32_t n;
    double L, dt;
    int32_t interval, n_snap;
  } h;
  if (fread(&m0, 4, 1, f) != 1 || m0 != (int32_t)sizeof(h)) { fclose(f); return -2; }
  if (fread(&h, sizeof(h), 1, f) != 1) { fclose(f); return -2; }
  if (fread(&m1, 4, 1, f) != 1 || m1 != m0) { fclose(f); return -2; }
  *n = h.n; *box_length = h.L; *dt = h.dt;
  *output_interval = h.interval; *n_frames_header = h.n_snap;
  // count body records
  int64_t records = 0;
  for (;;) {
    int32_t mark;
    if (fread(&mark, 4, 1, f) != 1) break;
    if (fseek(f, mark + 4, SEEK_CUR) != 0) break;
    ++records;
  }
  *n_frames_actual = records / 4;
  fclose(f);
  return 0;
}

// Read all frames of an rva.dat into caller-allocated (n_frames, n, 3)
// buffers (row-major), converting from component-major records.
int ljmd_read_rva_frames(const char *path, int32_t n, int64_t n_frames,
                         double *r, double *ru, double *v, double *a) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  // skip header record
  int32_t mark;
  if (fread(&mark, 4, 1, f) != 1 || fseek(f, mark + 4, SEEK_CUR) != 0) {
    fclose(f);
    return -2;
  }
  std::vector<double> scratch((size_t)3 * n);
  double *streams[4] = {r, ru, v, a};
  const int64_t frame_len = (int64_t)3 * n;
  for (int64_t s = 0; s < n_frames; ++s) {
    for (int k = 0; k < 4; ++k) {
      int32_t m0, m1;
      if (fread(&m0, 4, 1, f) != 1 || m0 != frame_len * 8) { fclose(f); return -3; }
      if (fread(scratch.data(), 8, (size_t)frame_len, f) != (size_t)frame_len) {
        fclose(f);
        return -3;
      }
      if (fread(&m1, 4, 1, f) != 1 || m1 != m0) { fclose(f); return -3; }
      double *dst = streams[k] + s * frame_len;
      for (int64_t i = 0; i < n; ++i) {
        dst[3 * i] = scratch[i];
        dst[3 * i + 1] = scratch[n + i];
        dst[3 * i + 2] = scratch[2 * n + i];
      }
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
