// codestore: memory-mapped persistent PQ-code store.
//
// Role: the reference persists its index in LMDB — packed cell-id keys with
// fine-code values, prefix-scanned per cell (reference:
// lopq/lopq/search.py:385-499 LOPQSearcherLMDB). This native store keeps the
// same durability/incremental-append semantics with a flat mmap'd file laid
// out for bulk upload to the device: one fixed-size record per item
// (cell uint32, M uint8 codes, 64-byte id), appended O(1), sorted by cell on
// demand so the whole file can be turned into the CSR device layout with a
// single pass.
//
// C ABI; Python binds via ctypes (columbiaimagesearch_tpu/native).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x434F444553543031ULL;  // "CODEST01"
constexpr int kIdLen = 64;

struct Header {
  uint64_t magic;
  uint32_t version;
  uint32_t m;          // fine codes per record
  uint64_t count;      // valid records
  uint64_t capacity;   // allocated records
  uint32_t sorted;     // 1 if records are sorted by cell
  uint32_t _pad;
};

struct Store {
  int fd = -1;
  size_t map_size = 0;
  uint8_t* base = nullptr;
  std::string path;

  Header* header() { return reinterpret_cast<Header*>(base); }
  size_t record_size() const { return 4 + m_ + kIdLen; }
  uint8_t* records() { return base + sizeof(Header); }
  uint32_t m_ = 0;

  uint8_t* record(uint64_t i) { return records() + i * record_size(); }
  uint32_t cell_of(uint64_t i) {
    uint32_t c;
    memcpy(&c, record(i), 4);
    return c;
  }
};

bool remap(Store* s, uint64_t capacity) {
  size_t new_size = sizeof(Header) + capacity * s->record_size();
  if (s->base) {
    msync(s->base, s->map_size, MS_SYNC);
    munmap(s->base, s->map_size);
    s->base = nullptr;
  }
  if (ftruncate(s->fd, new_size) != 0) return false;
  void* p = mmap(nullptr, new_size, PROT_READ | PROT_WRITE, MAP_SHARED,
                 s->fd, 0);
  if (p == MAP_FAILED) return false;
  s->base = static_cast<uint8_t*>(p);
  s->map_size = new_size;
  return true;
}

void sort_records(Store* s) {
  Header* h = s->header();
  if (h->sorted || h->count == 0) {
    h->sorted = 1;
    return;
  }
  const uint64_t n = h->count;
  const size_t rs = s->record_size();
  std::vector<uint64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](uint64_t a, uint64_t b) {
    return s->cell_of(a) < s->cell_of(b);
  });
  std::vector<uint8_t> tmp(n * rs);
  for (uint64_t i = 0; i < n; i++) {
    memcpy(tmp.data() + i * rs, s->record(order[i]), rs);
  }
  memcpy(s->records(), tmp.data(), n * rs);
  h->sorted = 1;
}

}  // namespace

extern "C" {

// Open or create a store. Returns an opaque handle (0 on failure).
void* cs_open(const char* path, uint32_t m) {
  Store* s = new Store();
  s->path = path;
  s->m_ = m;
  s->fd = open(path, O_RDWR | O_CREAT, 0644);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  struct stat st;
  fstat(s->fd, &st);
  if (st.st_size == 0) {
    if (!remap(s, 1024)) {
      close(s->fd);
      delete s;
      return nullptr;
    }
    Header* h = s->header();
    h->magic = kMagic;
    h->version = 1;
    h->m = m;
    h->count = 0;
    h->capacity = 1024;
    h->sorted = 1;
  } else {
    size_t size = st.st_size;
    void* p = mmap(nullptr, size, PROT_READ | PROT_WRITE, MAP_SHARED,
                   s->fd, 0);
    if (p == MAP_FAILED) {
      close(s->fd);
      delete s;
      return nullptr;
    }
    s->base = static_cast<uint8_t*>(p);
    s->map_size = size;
    Header* h = s->header();
    if (h->magic != kMagic || h->m != m) {
      munmap(s->base, size);
      close(s->fd);
      delete s;
      return nullptr;
    }
  }
  return s;
}

uint64_t cs_count(void* handle) {
  return static_cast<Store*>(handle)->header()->count;
}

// Append n records. ids: n x 64 bytes (zero-padded). Returns new count.
uint64_t cs_append(void* handle, uint64_t n, const uint32_t* cells,
                   const uint8_t* codes, const char* ids) {
  Store* s = static_cast<Store*>(handle);
  Header* h = s->header();
  uint64_t need = h->count + n;
  if (need > h->capacity) {
    uint64_t cap = h->capacity;
    while (cap < need) cap *= 2;
    uint64_t count = h->count;
    uint32_t sorted = h->sorted;
    if (!remap(s, cap)) return UINT64_MAX;
    h = s->header();
    h->capacity = cap;
    h->count = count;
    h->sorted = sorted;
  }
  const size_t rs = s->record_size();
  for (uint64_t i = 0; i < n; i++) {
    uint8_t* r = s->record(h->count + i);
    memcpy(r, &cells[i], 4);
    memcpy(r + 4, codes + i * s->m_, s->m_);
    memcpy(r + 4 + s->m_, ids + i * kIdLen, kIdLen);
  }
  h->count += n;
  h->sorted = 0;
  return h->count;
}

// Sort by cell (stable) and flush to disk.
void cs_sync(void* handle) {
  Store* s = static_cast<Store*>(handle);
  sort_records(s);
  msync(s->base, s->map_size, MS_SYNC);
}

// Bulk export in cell-sorted order: fills cells[count], codes[count*m],
// ids[count*64]. Sorts first if needed. Returns count.
uint64_t cs_read_all(void* handle, uint32_t* cells, uint8_t* codes,
                     char* ids) {
  Store* s = static_cast<Store*>(handle);
  sort_records(s);
  Header* h = s->header();
  const size_t rs = s->record_size();
  for (uint64_t i = 0; i < h->count; i++) {
    const uint8_t* r = s->record(i);
    memcpy(&cells[i], r, 4);
    memcpy(codes + i * s->m_, r + 4, s->m_);
    memcpy(ids + i * kIdLen, r + 4 + s->m_, kIdLen);
  }
  return h->count;
}

// Fetch one cell's bucket (binary search over sorted records).
// Returns number of items written (up to max_items).
uint64_t cs_query_cell(void* handle, uint32_t cell, uint8_t* codes,
                       char* ids, uint64_t max_items) {
  Store* s = static_cast<Store*>(handle);
  sort_records(s);
  Header* h = s->header();
  uint64_t lo = 0, hi = h->count;
  while (lo < hi) {  // lower bound
    uint64_t mid = (lo + hi) / 2;
    if (s->cell_of(mid) < cell) lo = mid + 1;
    else hi = mid;
  }
  uint64_t out = 0;
  while (lo < h->count && s->cell_of(lo) == cell && out < max_items) {
    const uint8_t* r = s->record(lo);
    memcpy(codes + out * s->m_, r + 4, s->m_);
    memcpy(ids + out * kIdLen, r + 4 + s->m_, kIdLen);
    lo++;
    out++;
  }
  return out;
}

void cs_close(void* handle) {
  Store* s = static_cast<Store*>(handle);
  if (s->base) {
    msync(s->base, s->map_size, MS_SYNC);
    munmap(s->base, s->map_size);
  }
  if (s->fd >= 0) close(s->fd);
  delete s;
}

int cs_id_len() { return kIdLen; }

}  // extern "C"
