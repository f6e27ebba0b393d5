// Native columnar-store runtime: mmap'd zero-copy column IO and
// multithreaded column statistics.
//
// The reference delegated all native execution to the out-of-repo Voodoo
// Driver (eval_query.sh:21-27); in this framework the compute path is
// JAX/XLA/Pallas on TPU, and this library provides the host-side native
// runtime around it: binary column files loaded by mmap without copies,
// and the catalog's bounds/count/trailing-zeros statistics computed with
// parallel streaming scans (the statistics feed static-shape compilation,
// so they run over every column of every table at load time).
//
// Exposed via a C ABI consumed through ctypes (engine/nativeio.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

struct ColStats {
  int64_t min;
  int64_t max;
  int64_t or_reduction;  // OR of |values|: trailing zeros = tz(or_reduction)
  int64_t count;
};

// ---------------------------------------------------------------- file IO
// Write a column buffer to a file; returns 0 on success.
int cs_write(const char *path, const void *data, int64_t nbytes) {
  int fd = open(path, O_CREAT | O_TRUNC | O_WRONLY, 0644);
  if (fd < 0) return -1;
  const char *p = static_cast<const char *>(data);
  int64_t left = nbytes;
  while (left > 0) {
    ssize_t w = write(fd, p, static_cast<size_t>(left));
    if (w <= 0) {
      close(fd);
      return -2;
    }
    p += w;
    left -= w;
  }
  close(fd);
  return 0;
}

// mmap a column file read-only; returns the pointer (or null) and size.
void *cs_mmap(const char *path, int64_t *size_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void *p = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                 MAP_PRIVATE | MAP_POPULATE, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return nullptr;
  *size_out = st.st_size;
  return p;
}

int cs_munmap(void *ptr, int64_t size) {
  return munmap(ptr, static_cast<size_t>(size));
}

}  // extern "C" — templates below need C++ linkage

// ------------------------------------------------------------- statistics
namespace {

template <typename T>
void stats_range(const T *data, int64_t lo, int64_t hi, ColStats *out) {
  int64_t mn = INT64_MAX, mx = INT64_MIN, orred = 0;
  for (int64_t i = lo; i < hi; ++i) {
    int64_t v = static_cast<int64_t>(data[i]);
    if (v < mn) mn = v;
    if (v > mx) mx = v;
    orred |= v < 0 ? -v : v;
  }
  out->min = mn;
  out->max = mx;
  out->or_reduction = orred;
}

template <typename T>
void stats_impl(const T *data, int64_t n, int nthreads, ColStats *out) {
  if (n == 0) {
    out->min = 0;
    out->max = 0;
    out->or_reduction = 0;
    out->count = 0;
    return;
  }
  if (nthreads < 1) nthreads = 1;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  std::vector<ColStats> parts(static_cast<size_t>(nthreads));
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) {
      parts[t] = {INT64_MAX, INT64_MIN, 0, 0};
      continue;
    }
    threads.emplace_back(stats_range<T>, data, lo, hi, &parts[t]);
  }
  for (auto &th : threads) th.join();
  int64_t mn = INT64_MAX, mx = INT64_MIN, orred = 0;
  for (auto &p : parts) {
    if (p.min < mn) mn = p.min;
    if (p.max > mx) mx = p.max;
    orred |= p.or_reduction;
  }
  out->min = mn;
  out->max = mx;
  out->or_reduction = orred;
  out->count = n;
}

}  // namespace

extern "C" {

// width: 4 (int32) or 8 (int64)
int cs_stats(const void *data, int64_t n, int width, int nthreads,
             ColStats *out) {
  if (width == 4) {
    stats_impl(static_cast<const int32_t *>(data), n, nthreads, out);
  } else if (width == 8) {
    stats_impl(static_cast<const int64_t *>(data), n, nthreads, out);
  } else {
    return -1;
  }
  return 0;
}

// ------------------------------------------------------- fk index building
// For each fact key, find the row position of its (unique) dim key.
// dim keys are sorted ascending with their original positions; binary
// search per fact row, parallelized.  Returns number of dangling keys.
int64_t cs_fk_index(const int64_t *fact, int64_t nfact,
                    const int64_t *dim_sorted, const int64_t *dim_pos,
                    int64_t ndim, int64_t *out, int nthreads) {
  std::atomic<int64_t> dangling{0};
  if (nthreads < 1) nthreads = 1;
  int64_t chunk = (nfact + nthreads - 1) / nthreads;
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < nfact ? lo + chunk : nfact;
    if (lo >= hi) continue;
    threads.emplace_back([=, &dangling]() {
      int64_t miss = 0;
      for (int64_t i = lo; i < hi; ++i) {
        int64_t key = fact[i];
        int64_t a = 0, b = ndim;
        while (a < b) {
          int64_t m = (a + b) / 2;
          if (dim_sorted[m] < key)
            a = m + 1;
          else
            b = m;
        }
        if (a < ndim && dim_sorted[a] == key) {
          out[i] = dim_pos[a];
        } else {
          out[i] = 0;
          ++miss;
        }
      }
      dangling += miss;
    });
  }
  for (auto &th : threads) th.join();
  return dangling.load();
}

}  // extern "C"
