// fastcsv — minimal, fast CSV parsing for the ingest layer.
//
// The framework's data layer parses thousands of small light-curve/spectra
// CSVs once at ingest (data/ztfbts.py). pandas pays interpreter+object
// overhead per file; this parser reads the whole file with one syscall and
// tokenises in place, auto-typing each column (numeric -> double with NaN
// for empty/invalid cells, else string). Exposed through a tiny C ABI bound
// with ctypes (data/native/__init__.py). Build: `make` in this directory.
//
// Scope intentionally small: comma separator, optional header row, no
// quoted-field escapes (the ZTF BTS corpus has none).

#include <cerrno>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Column {
  std::string name;
  bool numeric = true;
  std::vector<double> values;        // valid when numeric
  std::vector<std::string> strings;  // always populated (numeric parse may fail late)
};

struct Table {
  std::vector<Column> cols;
  long long nrows = 0;
};

// Split one line into fields (in place over the buffer slice).
inline void split_fields(const char* begin, const char* end,
                         std::vector<std::pair<const char*, const char*>>& out) {
  out.clear();
  const char* field = begin;
  for (const char* p = begin; p <= end; ++p) {
    if (p == end || *p == ',') {
      const char* fe = p;
      // trim \r and spaces
      while (fe > field && (fe[-1] == '\r' || fe[-1] == ' ')) --fe;
      const char* fb = field;
      while (fb < fe && *fb == ' ') ++fb;
      out.emplace_back(fb, fe);
      field = p + 1;
    }
  }
}

inline bool parse_double(const char* b, const char* e, double* out) {
  if (b == e) {
    *out = std::nan("");
    return true;  // empty cell -> NaN, still numeric
  }
  char buf[64];
  size_t n = static_cast<size_t>(e - b);
  if (n >= sizeof(buf)) return false;
  std::memcpy(buf, b, n);
  buf[n] = 0;
  char* endp = nullptr;
  errno = 0;
  double v = std::strtod(buf, &endp);
  if (endp != buf + n || errno == ERANGE) {
    // allow NaN spellings
    if ((n == 3 && (std::strncmp(buf, "nan", 3) == 0 || std::strncmp(buf, "NaN", 3) == 0)) ||
        (n == 2 && std::strncmp(buf, "NA", 2) == 0)) {
      *out = std::nan("");
      return true;
    }
    return false;
  }
  *out = v;
  return true;
}

}  // namespace

extern "C" {

void* fastcsv_parse(const char* path, int has_header) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  Table* t = new Table();
  std::vector<std::pair<const char*, const char*>> fields;
  const char* p = buf.data();
  const char* end = buf.data() + buf.size();
  bool first_line = true;

  while (p < end) {
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    const char* line_end = nl ? nl : end;
    if (line_end > p) {  // skip blank lines
      split_fields(p, line_end, fields);
      if (first_line) {
        t->cols.resize(fields.size());
        for (size_t c = 0; c < fields.size(); ++c) {
          if (has_header) {
            t->cols[c].name.assign(fields[c].first, fields[c].second);
          } else {
            t->cols[c].name = std::to_string(c);
          }
        }
        first_line = false;
        if (has_header) {
          p = line_end + 1;
          continue;
        }
      }
      size_t n = fields.size() < t->cols.size() ? fields.size() : t->cols.size();
      for (size_t c = 0; c < t->cols.size(); ++c) {
        const char* fb = c < n ? fields[c].first : nullptr;
        const char* fe = c < n ? fields[c].second : nullptr;
        Column& col = t->cols[c];
        col.strings.emplace_back(fb ? std::string(fb, fe) : std::string());
        if (col.numeric) {
          double v;
          if (fb ? parse_double(fb, fe, &v) : (v = std::nan(""), true)) {
            col.values.push_back(v);
          } else {
            col.numeric = false;
            col.values.clear();
          }
        }
      }
      ++t->nrows;
    }
    if (!nl) break;
    p = nl + 1;
  }
  return t;
}

int fastcsv_ncols(void* handle) {
  return static_cast<int>(static_cast<Table*>(handle)->cols.size());
}

long long fastcsv_nrows(void* handle) {
  return static_cast<Table*>(handle)->nrows;
}

const char* fastcsv_colname(void* handle, int c) {
  return static_cast<Table*>(handle)->cols[static_cast<size_t>(c)].name.c_str();
}

int fastcsv_col_is_numeric(void* handle, int c) {
  return static_cast<Table*>(handle)->cols[static_cast<size_t>(c)].numeric ? 1 : 0;
}

void fastcsv_copy_numeric(void* handle, int c, double* out) {
  const Column& col = static_cast<Table*>(handle)->cols[static_cast<size_t>(c)];
  std::memcpy(out, col.values.data(), col.values.size() * sizeof(double));
}

const char* fastcsv_string_item(void* handle, int c, long long r) {
  return static_cast<Table*>(handle)
      ->cols[static_cast<size_t>(c)]
      .strings[static_cast<size_t>(r)]
      .c_str();
}

void fastcsv_free(void* handle) { delete static_cast<Table*>(handle); }

}  // extern "C"
