// biear_tpu native data loader.
//
// A minimal, dependency-free binary shard format + a C gather/decode core
// for the host input pipeline. The reference feeds training through
// python-side per-sample H5 reads in DataLoader worker processes
// (data_save.py:239-316); on a TPU host the input path wants to be: an
// mmap'ed flat shard, and one native call per batch that gathers the
// requested rows (optionally decoding int16 -> float32 with scaling)
// straight into the caller's pinned buffer — no python object churn, no
// intermediate copies, parallelised across worker threads when cores
// exist.
//
// Shard format (little-endian):
//   magic   u64  = 0x42494541525F4250  ("BIEAR_BP")
//   version u32
//   n_fields u32
//   n_rows  u64
//   per field: dtype u32 (0=f32, 1=i16), row_elems u64
//   then per field, contiguously: n_rows * row_elems * sizeof(dtype)
//
// Exposed C API (ctypes-friendly):
//   bl_open(path) -> handle (mmap)
//   bl_meta(handle, *n_rows, *n_fields)
//   bl_field_elems(handle, field) -> row_elems
//   bl_gather(handle, field, idx*, n_idx, out_f32*, scale, n_threads)
//   bl_close(handle)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x42494541525F4250ULL;

struct Field {
  uint32_t dtype;      // 0 = f32, 1 = i16
  uint64_t row_elems;
  uint64_t offset;     // byte offset of field data from file start
};

struct Shard {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n_rows = 0;
  std::vector<Field> fields;
};

size_t dtype_size(uint32_t d) { return d == 1 ? 2 : 4; }

}  // namespace

extern "C" {

void* bl_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }

  auto* s = new Shard();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;

  const uint8_t* p = s->base;
  uint64_t magic; std::memcpy(&magic, p, 8); p += 8;
  uint32_t version; std::memcpy(&version, p, 4); p += 4;
  uint32_t n_fields; std::memcpy(&n_fields, p, 4); p += 4;
  std::memcpy(&s->n_rows, p, 8); p += 8;
  if (magic != kMagic || version != 1) {
    munmap(const_cast<uint8_t*>(s->base), s->size);
    ::close(fd); delete s; return nullptr;
  }
  s->fields.resize(n_fields);
  for (uint32_t i = 0; i < n_fields; ++i) {
    std::memcpy(&s->fields[i].dtype, p, 4); p += 4;
    std::memcpy(&s->fields[i].row_elems, p, 8); p += 8;
  }
  uint64_t off = p - s->base;
  for (uint32_t i = 0; i < n_fields; ++i) {
    s->fields[i].offset = off;
    off += s->n_rows * s->fields[i].row_elems * dtype_size(s->fields[i].dtype);
  }
  if (off > s->size) {  // truncated file
    munmap(const_cast<uint8_t*>(s->base), s->size);
    ::close(fd); delete s; return nullptr;
  }
  return s;
}

void bl_meta(void* handle, uint64_t* n_rows, uint32_t* n_fields) {
  auto* s = static_cast<Shard*>(handle);
  *n_rows = s->n_rows;
  *n_fields = static_cast<uint32_t>(s->fields.size());
}

uint64_t bl_field_elems(void* handle, uint32_t field) {
  auto* s = static_cast<Shard*>(handle);
  if (field >= s->fields.size()) return 0;
  return s->fields[field].row_elems;
}

uint32_t bl_field_dtype(void* handle, uint32_t field) {
  auto* s = static_cast<Shard*>(handle);
  if (field >= s->fields.size()) return 0xffffffffu;
  return s->fields[field].dtype;
}

// Gather rows idx[0..n_idx) of `field` into out (n_idx * row_elems f32).
// int16 fields are decoded with `scale` (e.g. 1/32768). Returns 0 on ok.
int bl_gather(void* handle, uint32_t field, const int64_t* idx,
              int64_t n_idx, float* out, float scale, int n_threads) {
  auto* s = static_cast<Shard*>(handle);
  if (field >= s->fields.size()) return -1;
  const Field& f = s->fields[field];
  const uint64_t elems = f.row_elems;
  const size_t dsz = dtype_size(f.dtype);
  const uint8_t* data = s->base + f.offset;

  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t r = idx[i];
      if (r < 0 || static_cast<uint64_t>(r) >= s->n_rows) {
        std::memset(out + i * elems, 0, elems * sizeof(float));
        continue;
      }
      const uint8_t* src = data + static_cast<uint64_t>(r) * elems * dsz;
      float* dst = out + i * elems;
      if (f.dtype == 0) {
        std::memcpy(dst, src, elems * sizeof(float));
        if (scale != 1.0f)
          for (uint64_t e = 0; e < elems; ++e) dst[e] *= scale;
      } else {
        const int16_t* s16 = reinterpret_cast<const int16_t*>(src);
        for (uint64_t e = 0; e < elems; ++e)
          dst[e] = static_cast<float>(s16[e]) * scale;
      }
    }
  };

  if (n_threads <= 1 || n_idx < 4 * n_threads) {
    work(0, n_idx);
  } else {
    std::vector<std::thread> ts;
    const int64_t chunk = (n_idx + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk;
      int64_t hi = std::min<int64_t>(n_idx, lo + chunk);
      if (lo >= hi) break;
      ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
  return 0;
}

void bl_close(void* handle) {
  auto* s = static_cast<Shard*>(handle);
  if (s == nullptr) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

}  // extern "C"
