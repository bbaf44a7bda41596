// Native packed-dataset reader: parallel sample IO for the training loader.
//
// The reference feeds its trainer with torch.utils.data.DataLoader worker
// processes (C++ under the hood). This is the TPU framework's equivalent:
// samples live in one packed ".fpk" file (header + per-sample offset table +
// contiguous blobs + JSON metadata, written by datasets/datapack.py), and
// fpk_read_batch() fans a batch's reads across a thread pool with pread --
// no GIL, no per-sample file opens, sequential-friendly layout.
//
// File layout (little-endian):
//   [0]  magic  "FPK1"            (4 bytes)
//   [4]  u32    version (1)
//   [8]  u64    n_samples
//   [16] u64    json_offset
//   [24] u64    json_size
//   [32] table  n_samples x { u64 offset, u64 size }
//   [..] blobs  (each sample contiguous)
//   [json_offset] JSON metadata (parsed by Python, opaque here)

#include <atomic>
#include <cstdint>
#include <new>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Entry {
  uint64_t offset;
  uint64_t size;
};

struct Pack {
  int fd = -1;
  uint64_t n_samples = 0;
  uint64_t json_offset = 0;
  uint64_t json_size = 0;
  std::vector<Entry> table;
  std::vector<char> json;
};

bool read_exact(int fd, void *dst, size_t n, uint64_t off) {
  char *p = static_cast<char *>(dst);
  while (n > 0) {
    ssize_t r = pread(fd, p, n, static_cast<off_t>(off));
    if (r <= 0) return false;
    p += r;
    off += static_cast<uint64_t>(r);
    n -= static_cast<size_t>(r);
  }
  return true;
}

} // namespace

extern "C" {

void *fpk_open(const char *path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;

  char header[32];
  if (!read_exact(fd, header, sizeof(header), 0) ||
      std::memcmp(header, "FPK1", 4) != 0) {
    close(fd);
    return nullptr;
  }
  uint32_t version;
  std::memcpy(&version, header + 4, 4);
  if (version != 1) {
    close(fd);
    return nullptr;
  }

  uint64_t n_samples, json_offset, json_size;
  std::memcpy(&n_samples, header + 8, 8);
  std::memcpy(&json_offset, header + 16, 8);
  std::memcpy(&json_size, header + 24, 8);

  // Validate header fields against the real file size before allocating:
  // a truncated/corrupt .fpk must yield a clean nullptr, not a multi-GB
  // resize whose std::bad_alloc would cross the extern "C" boundary (UB).
  off_t fsize = lseek(fd, 0, SEEK_END);
  if (fsize < 32) {
    close(fd);
    return nullptr;
  }
  const uint64_t file_size = static_cast<uint64_t>(fsize);
  if (n_samples > (file_size - 32) / sizeof(Entry) ||
      json_offset > file_size || json_size > file_size - json_offset) {
    close(fd);
    return nullptr;
  }

  Pack *pack = nullptr;
  try {
    pack = new Pack();
    pack->fd = fd;
    pack->n_samples = n_samples;
    pack->json_offset = json_offset;
    pack->json_size = json_size;
    pack->table.resize(n_samples);
    pack->json.resize(json_size + 1, 0);
  } catch (const std::bad_alloc &) {
    close(fd);
    delete pack;
    return nullptr;
  }

  if (!read_exact(fd, pack->table.data(), n_samples * sizeof(Entry), 32)) {
    close(fd);
    pack->fd = -1;
    delete pack;
    return nullptr;
  }
  // Per-sample extents must also lie inside the file.
  for (const Entry &e : pack->table) {
    if (e.offset > file_size || e.size > file_size - e.offset) {
      close(fd);
      pack->fd = -1;
      delete pack;
      return nullptr;
    }
  }
  if (json_size &&
      !read_exact(fd, pack->json.data(), json_size, json_offset)) {
    close(fd);
    pack->fd = -1;
    delete pack;
    return nullptr;
  }
  return pack;
}

void fpk_close(void *h) {
  auto *pack = static_cast<Pack *>(h);
  if (!pack) return;
  if (pack->fd >= 0) close(pack->fd);
  delete pack;
}

int64_t fpk_num_samples(void *h) {
  return static_cast<int64_t>(static_cast<Pack *>(h)->n_samples);
}

const char *fpk_json(void *h) { return static_cast<Pack *>(h)->json.data(); }

int64_t fpk_sample_size(void *h, int64_t idx) {
  auto *pack = static_cast<Pack *>(h);
  if (idx < 0 || static_cast<uint64_t>(idx) >= pack->n_samples) return -1;
  return static_cast<int64_t>(pack->table[idx].size);
}

// Synchronous single-sample read. dst must hold fpk_sample_size(h, idx).
int fpk_read(void *h, int64_t idx, char *dst) {
  auto *pack = static_cast<Pack *>(h);
  if (idx < 0 || static_cast<uint64_t>(idx) >= pack->n_samples) return -1;
  const Entry &e = pack->table[idx];
  return read_exact(pack->fd, dst, e.size, e.offset) ? 0 : -2;
}

// Parallel batch read: n samples into caller-provided buffers. Blocks until
// every read completes. Returns 0, or -1 on any failure.
int fpk_read_batch(void *h, const int64_t *indices, int64_t n, char **dsts,
                   int32_t threads) {
  auto *pack = static_cast<Pack *>(h);
  if (threads < 1) threads = 1;
  if (threads > n) threads = static_cast<int32_t>(n);

  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t idx = indices[i];
      if (idx < 0 || static_cast<uint64_t>(idx) >= pack->n_samples) {
        failed.store(1);
        continue;
      }
      const Entry &e = pack->table[idx];
      if (!read_exact(pack->fd, dsts[i], e.size, e.offset)) failed.store(1);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto &th : pool) th.join();
  return failed.load() ? -1 : 0;
}

} // extern "C"
