// ldkv: a minimal mmap'd read-only key-value store (LMDB replacement).
//
// The reference keeps region features and tokenized text in LMDB
// (uniter_model/data/data.py:44-174). This container has no LMDB binding, so
// the framework ships its own native store: one file, written once by the
// prepro pipeline, memory-mapped and shared read-only by every dataloader
// worker. Zero-copy reads: ldkv_get returns a pointer into the mapping.
//
// File layout (little endian):
//   [0]   magic  "LDKV0001"                      (8 bytes)
//   [8]   u64 n_records
//   [16]  u64 index_offset
//   [24]  ... record payloads (concatenated, 8-byte aligned) ...
//   [index_offset] n * IndexEntry (sorted by key_hash, then key bytes)
//   key blob (all keys concatenated)
//
// IndexEntry: u64 key_hash, u64 key_off (into key blob), u32 key_len,
//             u32 _pad, u64 val_off (absolute), u64 val_len   (40 bytes)
//
// Python writes the file (lightningdot_tpu/data/kvstore.py); this library is
// the fast read path, bound via ctypes.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'L', 'D', 'K', 'V', '0', '0', '0', '1'};

struct IndexEntry {
  uint64_t key_hash;
  uint64_t key_off;
  uint32_t key_len;
  uint32_t pad_;
  uint64_t val_off;
  uint64_t val_len;
};
static_assert(sizeof(IndexEntry) == 40, "IndexEntry layout");

struct Handle {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n = 0;
  const IndexEntry* index = nullptr;
  const uint8_t* key_blob = nullptr;
};

uint64_t fnv1a(const uint8_t* data, size_t len) {
  uint64_t h = 14695981039346656037ULL;
  for (size_t i = 0; i < len; ++i) {
    h ^= data[i];
    h *= 1099511628211ULL;
  }
  return h;
}

}  // namespace

extern "C" {

void* ldkv_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(mem, st.st_size, MADV_WILLNEED);
  const uint8_t* base = static_cast<const uint8_t*>(mem);
  if (memcmp(base, kMagic, 8) != 0) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  uint64_t n_records, index_off;
  memcpy(&n_records, base + 8, 8);
  memcpy(&index_off, base + 16, 8);
  // reject truncated/corrupt files: the index and the key blob must lie
  // inside the mapping, or the first lookup would read out of bounds
  const uint64_t fsize = static_cast<uint64_t>(st.st_size);
  if (index_off > fsize || n_records > (fsize - index_off) / sizeof(IndexEntry)) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  Handle* h = new Handle();
  h->fd = fd;
  h->base = base;
  h->size = st.st_size;
  h->n = n_records;
  h->index = reinterpret_cast<const IndexEntry*>(base + index_off);
  h->key_blob = base + index_off + h->n * sizeof(IndexEntry);
  return h;
}

void ldkv_close(void* handle) {
  if (!handle) return;
  Handle* h = static_cast<Handle*>(handle);
  munmap(const_cast<uint8_t*>(h->base), h->size);
  ::close(h->fd);
  delete h;
}

uint64_t ldkv_count(void* handle) {
  return handle ? static_cast<Handle*>(handle)->n : 0;
}

// Returns 1 on hit (val/val_len set), 0 on miss.
int ldkv_get(void* handle, const uint8_t* key, uint32_t key_len,
             const uint8_t** val, uint64_t* val_len) {
  Handle* h = static_cast<Handle*>(handle);
  const uint64_t target = fnv1a(key, key_len);
  uint64_t lo = 0, hi = h->n;
  while (lo < hi) {  // lower_bound on hash
    uint64_t mid = (lo + hi) / 2;
    if (h->index[mid].key_hash < target) {
      lo = mid + 1;
    } else {
      hi = mid;
    }
  }
  for (; lo < h->n && h->index[lo].key_hash == target; ++lo) {
    const IndexEntry& e = h->index[lo];
    if (e.key_len == key_len &&
        memcmp(h->key_blob + e.key_off, key, key_len) == 0) {
      *val = h->base + e.val_off;
      *val_len = e.val_len;
      return 1;
    }
  }
  return 0;
}

// Fetch the idx-th key (index order). Returns 1 on success.
int ldkv_key_at(void* handle, uint64_t idx, const uint8_t** key,
                uint32_t* key_len) {
  Handle* h = static_cast<Handle*>(handle);
  if (idx >= h->n) return 0;
  const IndexEntry& e = h->index[idx];
  *key = h->key_blob + e.key_off;
  *key_len = e.key_len;
  return 1;
}

}  // extern "C"
