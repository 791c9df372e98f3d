// Fast JSON export for the evaluation artifacts (the L4 -> web-app
// contract). The sweep writes one {pred, org, diff} JSON per view — 1369
// files x 3 x H*W floats at the reference's 37x37x100x100 flagship sweep
// (~41M numbers); CPython's json.dump + ndarray.tolist() needs minutes of
// the single host core for that. This writer serializes float64 arrays
// with std::to_chars (shortest round-trip formatting, so json.load sees
// bit-identical values) at ~50M numbers/s.
//
// Bound via ctypes in nerf_for_angiography_tpu/native/__init__.py with a
// pure-Python fallback when the toolchain is unavailable.
//
// Counterpart behavior: visualization/helpers.py:247-259 (reference) /
// evaluation/heatmap.py (rebuild).

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline char* fmt_double(char* p, double v) {
    // non-finite: match CPython json.dump's (non-standard) spellings so
    // json.load round-trips — std::to_chars would emit "nan"/"inf"
    if (std::isnan(v)) { std::memcpy(p, "NaN", 3); return p + 3; }
    if (std::isinf(v)) {
        if (v < 0) { std::memcpy(p, "-Infinity", 9); return p + 9; }
        std::memcpy(p, "Infinity", 8); return p + 8;
    }
    // shortest round-trip; integral values render without a fraction
    // (json.load parses them as int — equal in value to the float)
    auto res = std::to_chars(p, p + 32, v);
    return res.ptr;
}

void append_array(std::string& out, const char* key, const double* v,
                  int64_t n) {
    out.push_back('"');
    out += key;
    out += "\": [";
    char buf[40];
    for (int64_t i = 0; i < n; ++i) {
        char* end = fmt_double(buf, v[i]);
        if (i) out.push_back(',');
        out.append(buf, end - buf);
    }
    out.push_back(']');
}

int64_t write_file(const char* path, const std::string& body) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    size_t written = std::fwrite(body.data(), 1, body.size(), f);
    std::fclose(f);
    return written == body.size() ? 0 : -2;
}

}  // namespace

extern "C" {

// {"pred": [...], "org": [...], "diff": [...]} — one per sweep view.
int64_t write_angle_json(const char* path, const double* pred,
                         const double* org, const double* diff, int64_t n) {
    std::string out;
    out.reserve(static_cast<size_t>(3 * n) * 24 + 64);
    out.push_back('{');
    append_array(out, "pred", pred, n);
    out += ", ";
    append_array(out, "org", org, n);
    out += ", ";
    append_array(out, "diff", diff, n);
    out.push_back('}');
    return write_file(path, out);
}

// {"rad": [...], "theta": [...], "angles": [[t, p], ...], "vals": [...]}
// — the polar heatmap JSON (helpers.py:245).
int64_t write_heatmap_json(const char* path, const double* rad,
                           const double* theta, const double* angles,
                           const double* vals, int64_t n) {
    std::string out;
    out.reserve(static_cast<size_t>(5 * n) * 24 + 64);
    out.push_back('{');
    append_array(out, "rad", rad, n);
    out += ", ";
    append_array(out, "theta", theta, n);
    out += ", \"angles\": [";
    char buf[40];
    for (int64_t i = 0; i < n; ++i) {
        if (i) out.push_back(',');
        out.push_back('[');
        char* end = fmt_double(buf, angles[2 * i]);
        out.append(buf, end - buf);
        out += ", ";
        end = fmt_double(buf, angles[2 * i + 1]);
        out.append(buf, end - buf);
        out.push_back(']');
    }
    out += "], ";
    append_array(out, "vals", vals, n);
    out.push_back('}');
    return write_file(path, out);
}

}  // extern "C"
