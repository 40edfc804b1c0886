// Native IO: fast EuRoC CSV parsing, threaded file preloading, and
// PLY/PCD map export.
//
// Parity: the reference's data/runtime layer is C++ (EuRoCReader CSV
// parsing, Mapper::exportPLY/exportPCD fprintf loops — SURVEY.md rows
// 10, 13). The TPU framework keeps these native too: a multi-minute
// EuRoC IMU CSV (hundreds of thousands of rows) parses in milliseconds,
// and a 200k-point map writes without Python string formatting.
//
// C ABI for ctypes.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Parse a numeric CSV (skipping '#' comments). Returns number of rows;
// fills out[] (row-major, num_cols per row) up to max_rows.
// Non-numeric trailing fields (e.g. filenames) are skipped.
int64_t csv_parse_numeric(const char* path, int num_cols, double* out,
                          int64_t max_rows) {
  std::ifstream f(path);
  if (!f.is_open()) return -1;
  std::string line;
  int64_t rows = 0;
  while (std::getline(f, line) && rows < max_rows) {
    if (line.empty() || line[0] == '#') continue;
    const char* s = line.c_str();
    char* end = nullptr;
    int col = 0;
    while (col < num_cols) {
      double v = strtod(s, &end);
      if (end == s) break;  // not a number
      out[rows * num_cols + col] = v;
      ++col;
      s = (*end == ',') ? end + 1 : end;
    }
    if (col == num_cols) ++rows;
  }
  return rows;
}

// Count numeric rows (for pre-allocation).
int64_t csv_count_rows(const char* path) {
  std::ifstream f(path);
  if (!f.is_open()) return -1;
  std::string line;
  int64_t rows = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line[0] != '#') ++rows;
  }
  return rows;
}

// ---------------------------------------------------------------- preloader
// Threaded read-ahead of raw file bytes (PNG decode stays in Python/
// OpenCV; the disk latency is what the reference's H13 pipeline hides).
struct Preloader {
  std::vector<std::string> paths;
  std::vector<std::vector<char>> bufs;
  std::vector<std::atomic<int>> ready;  // 0 = pending, 1 = done, -1 = error
  std::thread worker;
  std::atomic<bool> stop{false};

  explicit Preloader(int n) : bufs(n), ready(n) {
    for (auto& r : ready) r.store(0);
  }
};

static void preload_loop(Preloader* p) {
  for (size_t i = 0; i < p->paths.size(); ++i) {
    if (p->stop.load(std::memory_order_acquire)) return;
    std::ifstream f(p->paths[i], std::ios::binary | std::ios::ate);
    if (!f.is_open()) {
      p->ready[i].store(-1, std::memory_order_release);
      continue;
    }
    const auto size = f.tellg();
    f.seekg(0);
    p->bufs[i].resize(static_cast<size_t>(size));
    f.read(p->bufs[i].data(), size);
    p->ready[i].store(1, std::memory_order_release);
  }
}

Preloader* preloader_create(const char** paths, int n) {
  auto* p = new Preloader(n);
  p->paths.assign(paths, paths + n);
  p->worker = std::thread(preload_loop, p);
  return p;
}

// Returns size (>=0) when ready, -2 while pending, -1 on error.
int64_t preloader_poll(Preloader* p, int idx) {
  const int st = p->ready[idx].load(std::memory_order_acquire);
  if (st == 0) return -2;
  if (st == -1) return -1;
  return static_cast<int64_t>(p->bufs[idx].size());
}

void preloader_take(Preloader* p, int idx, char* dst) {
  std::memcpy(dst, p->bufs[idx].data(), p->bufs[idx].size());
  p->bufs[idx].clear();
  p->bufs[idx].shrink_to_fit();
}

void preloader_destroy(Preloader* p) {
  p->stop.store(true, std::memory_order_release);
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

// ------------------------------------------------------------------ export
// ASCII PLY with uchar RGB (parity: Mapper::exportPLY,
// src/legacy/Mapper.cpp:182-216).
int64_t ply_write(const char* path, const float* xyz, const uint8_t* rgb,
                  int64_t n) {
  FILE* f = fopen(path, "w");
  if (f == nullptr) return -1;
  fprintf(f,
          "ply\nformat ascii 1.0\nelement vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "end_header\n",
          static_cast<long long>(n));
  for (int64_t i = 0; i < n; ++i) {
    fprintf(f, "%.6f %.6f %.6f %u %u %u\n", xyz[3 * i], xyz[3 * i + 1],
            xyz[3 * i + 2], rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]);
  }
  fclose(f);
  return n;
}

// ASCII PCD with packed-float RGB (parity: Mapper::exportPCD,
// src/legacy/Mapper.cpp:218-256).
int64_t pcd_write(const char* path, const float* xyz, const uint8_t* rgb,
                  int64_t n) {
  FILE* f = fopen(path, "w");
  if (f == nullptr) return -1;
  fprintf(f,
          "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
          "FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
          "WIDTH %lld\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS %lld\n"
          "DATA ascii\n",
          static_cast<long long>(n), static_cast<long long>(n));
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t packed = (static_cast<uint32_t>(rgb[3 * i]) << 16) |
                            (static_cast<uint32_t>(rgb[3 * i + 1]) << 8) |
                            static_cast<uint32_t>(rgb[3 * i + 2]);
    float pf;
    std::memcpy(&pf, &packed, sizeof(pf));
    fprintf(f, "%.6f %.6f %.6f %.9e\n", xyz[3 * i], xyz[3 * i + 1],
            xyz[3 * i + 2], pf);
  }
  fclose(f);
  return n;
}

}  // extern "C"
