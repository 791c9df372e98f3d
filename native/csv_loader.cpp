// Fast loader for the per-ray CSV artifact (the L1 -> L3 data contract,
// cttoray.py:303-308 schema: index;image_id;pixel_value;
// distance_pixel_value;x_position;y_position;ray_origins_{x,y,z};
// ray_directions_{x,y,z}, sep=';').
//
// The reference parses these with pandas (plus ast.literal_eval per cell
// for list columns) — minutes for a full 73x73-view sweep. This loader
// mmaps the file, hand-parses floats with std::from_chars across threads,
// and fills caller-allocated numpy buffers through a ctypes ABI. The
// image_id string column becomes an order-preserving integer view index
// (exactly what training needs, training/train.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        csv_loader.cpp -o libcsvloader.so

#include <atomic>
#include <cctype>
#include <charconv>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = ::open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  return m;
}

void unmap(Mapped& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) ::close(m.fd);
  m.data = nullptr;
}

inline const char* find_eol(const char* p, const char* end) {
  const void* nl = memchr(p, '\n', end - p);
  return nl ? static_cast<const char*>(nl) : end;
}

inline double parse_double(const char* b, const char* e) {
  double v = 0.0;
  auto res = std::from_chars(b, e, v);
  if (res.ec != std::errc()) {
    // fall back for exotic formats (from_chars handles inf/nan/exp already)
    char buf[64];
    size_t n = std::min<size_t>(e - b, 63);
    memcpy(buf, b, n);
    buf[n] = 0;
    v = strtod(buf, nullptr);
  }
  return v;
}

// column order after the pandas index column
enum Col {
  COL_IMAGE_ID = 0,
  COL_PIXEL = 1,
  COL_DIST = 2,
  COL_X = 3,
  COL_Y = 4,
  COL_OX = 5,
  COL_OY = 6,
  COL_OZ = 7,
  COL_DX = 8,
  COL_DY = 9,
  COL_DZ = 10,
  N_COLS = 11,
};

struct Row {
  const char* id_b;
  const char* id_e;
  float pixel, dist;
  int32_t x, y;
  float ox, oy, oz, dx, dy, dz;
};

bool parse_row(const char* p, const char* eol, Row* r) {
  // split on ';'; field -1 is the pandas index column
  const char* begins[N_COLS + 1];
  const char* ends[N_COLS + 1];
  int c = -1;
  const char* field_start = p;
  for (const char* q = p; q <= eol; ++q) {
    if (q == eol || *q == ';') {
      if (c >= 0 && c < N_COLS + 1) {
        begins[c] = field_start;
        ends[c] = q;
      }
      field_start = q + 1;
      ++c;
    }
  }
  if (c < N_COLS) return false;
  r->id_b = begins[COL_IMAGE_ID];
  r->id_e = ends[COL_IMAGE_ID];
  r->pixel = (float)parse_double(begins[COL_PIXEL], ends[COL_PIXEL]);
  r->dist = (float)parse_double(begins[COL_DIST], ends[COL_DIST]);
  r->x = (int32_t)parse_double(begins[COL_X], ends[COL_X]);
  r->y = (int32_t)parse_double(begins[COL_Y], ends[COL_Y]);
  r->ox = (float)parse_double(begins[COL_OX], ends[COL_OX]);
  r->oy = (float)parse_double(begins[COL_OY], ends[COL_OY]);
  r->oz = (float)parse_double(begins[COL_OZ], ends[COL_OZ]);
  r->dx = (float)parse_double(begins[COL_DX], ends[COL_DX]);
  r->dy = (float)parse_double(begins[COL_DY], ends[COL_DY]);
  r->dz = (float)parse_double(begins[COL_DZ], ends[COL_DZ]);
  return true;
}

}  // namespace

extern "C" {

// Pass 1: number of data rows (lines after the header).
int64_t rays_csv_count(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  int64_t lines = 0;
  // skip header
  p = find_eol(p, end);
  if (p < end) ++p;
  while (p < end) {
    const char* eol = find_eol(p, end);
    if (eol > p) ++lines;
    p = eol + 1;
  }
  unmap(m);
  return lines;
}

// Pass 2: fill caller-allocated buffers (all length n from rays_csv_count).
// image_idx gets an order-preserving view index; returns the number of rows
// parsed, or -1 on error.
int64_t rays_csv_parse(
    const char* path, int64_t n,
    float* origins /* n*3 */, float* directions /* n*3 */,
    float* pixel_values, float* weights,
    int32_t* x_positions, int32_t* y_positions, int32_t* image_idx,
    int32_t* n_views_out) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  p = find_eol(p, end);
  if (p < end) ++p;

  // multithreaded over chunks; image_idx assigned in a serial pre-scan of
  // id-change boundaries (ids arrive view-major, cttoray.py:247)
  std::vector<std::pair<const char*, const char*>> lines;
  lines.reserve(n);
  while (p < end) {
    const char* eol = find_eol(p, end);
    if (eol > p) lines.emplace_back(p, eol);
    p = eol + 1;
  }
  if ((int64_t)lines.size() < n) n = lines.size();

  // serial id pass: ids arrive view-major, so a string compare only fires
  // on view boundaries; order-preserving first-occurrence indexing matches
  // load_data (data/datasets.py)
  std::vector<std::string> seen;
  std::string cur;
  int32_t cur_idx = -1;
  {
    Row r;
    for (int64_t i = 0; i < n; ++i) {
      if (!parse_row(lines[i].first, lines[i].second, &r)) return -1;
      std::string id(r.id_b, r.id_e);
      if (cur_idx < 0 || id != cur) {
        int32_t idx = -1;
        for (size_t k = 0; k < seen.size(); ++k) {
          if (seen[k] == id) { idx = (int32_t)k; break; }
        }
        if (idx < 0) {
          idx = (int32_t)seen.size();
          seen.push_back(id);
        }
        cur = id;
        cur_idx = idx;
      }
      image_idx[i] = cur_idx;
    }
  }
  *n_views_out = (int32_t)seen.size();

  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = hw ? (int)std::min<unsigned>(hw, 16) : 4;
  std::atomic<int64_t> failed{0};
  auto work = [&](int t) {
    int64_t lo = n * t / n_threads;
    int64_t hi = n * (t + 1) / n_threads;
    Row r;
    for (int64_t i = lo; i < hi; ++i) {
      if (!parse_row(lines[i].first, lines[i].second, &r)) {
        failed.fetch_add(1);
        continue;
      }
      origins[3 * i] = r.ox;
      origins[3 * i + 1] = r.oy;
      origins[3 * i + 2] = r.oz;
      directions[3 * i] = r.dx;
      directions[3 * i + 1] = r.dy;
      directions[3 * i + 2] = r.dz;
      pixel_values[i] = r.pixel;
      weights[i] = r.dist;
      x_positions[i] = r.x;
      y_positions[i] = r.y;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
  unmap(m);
  return failed.load() ? -1 : n;
}

}  // extern "C"
