// Fast JSONL trial-table scanner for the PD1/PD2 data loaders.
//
// The reference loads trial tables with pandas.read_json(lines=True)
// (hyperbo/bo_utils/data.py:411-413), which materializes every column of
// every row through the Python JSON machinery. The hyperbo loaders only
// need a handful of numeric hyperparameter/metric columns plus the
// study_group string, so this scanner extracts exactly those fields with
// a single linear pass over the file — no allocation per cell, no
// Python-object churn. Exposed through a minimal C ABI consumed via
// ctypes (hyperbo_tpu/native/jsonl.py).
//
// Assumptions (validated by the Python wrapper, which falls back to
// pandas when they do not hold): flat JSON objects per line, keys
// without escaped quotes.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Find `"key":` at top level of `line` and return the pointer to the
// first non-space character of its value, or nullptr.
const char* find_value(const char* line, size_t len, const char* key,
                       size_t key_len) {
  const char* p = line;
  const char* end = line + len;
  while (p < end) {
    const char* hit = static_cast<const char*>(
        memmem(p, end - p, key, key_len));
    if (hit == nullptr) return nullptr;
    // Must be a quoted key: preceded by '"' and followed by '"' then ':'.
    const char* after = hit + key_len;
    if (hit > line && hit[-1] == '"' && after < end && after[0] == '"') {
      const char* q = after + 1;
      while (q < end && (*q == ' ' || *q == '\t')) q++;
      if (q < end && *q == ':') {
        q++;
        while (q < end && (*q == ' ' || *q == '\t')) q++;
        return q;
      }
    }
    p = hit + 1;
  }
  return nullptr;
}

double parse_number(const char* p) {
  if (p == nullptr) return NAN;
  if (strncmp(p, "null", 4) == 0) return NAN;
  if (strncmp(p, "true", 4) == 0) return 1.0;
  if (strncmp(p, "false", 5) == 0) return 0.0;
  char* endp = nullptr;
  double v = strtod(p, &endp);
  if (endp == p) return NAN;
  return v;
}

// Copy a JSON string value (no unescaping beyond \" and \\) into out.
std::string parse_string(const char* p) {
  std::string out;
  if (p == nullptr || *p != '"') return out;
  p++;
  while (*p && *p != '"') {
    if (*p == '\\' && (p[1] == '"' || p[1] == '\\')) p++;
    out.push_back(*p++);
  }
  return out;
}

}  // namespace

extern "C" {

// Parse `path`, extracting n_keys numeric fields and one string field per
// line. On success returns the number of rows and fills:
//   *out_values  — malloc'd row-major [nrows x n_keys] doubles
//   *out_strings — malloc'd array of malloc'd C strings (string field)
// Returns -1 on I/O failure. Lines missing the string field are skipped.
long pd1_parse(const char* path, const char** numeric_keys, int n_keys,
               const char* string_key, double** out_values,
               char*** out_strings) {
  FILE* f = fopen(path, "rb");
  if (f == nullptr) return -1;

  std::vector<double> values;
  std::vector<char*> strings;
  std::vector<size_t> key_lens(n_keys);
  for (int k = 0; k < n_keys; ++k) key_lens[k] = strlen(numeric_keys[k]);
  size_t skey_len = strlen(string_key);

  char* line = nullptr;
  size_t cap = 0;
  ssize_t len;
  while ((len = getline(&line, &cap, f)) != -1) {
    if (len <= 2) continue;
    const char* sp = find_value(line, static_cast<size_t>(len), string_key,
                                skey_len);
    std::string sval = parse_string(sp);
    if (sval.empty()) continue;
    for (int k = 0; k < n_keys; ++k) {
      const char* vp = find_value(line, static_cast<size_t>(len),
                                  numeric_keys[k], key_lens[k]);
      values.push_back(parse_number(vp));
    }
    strings.push_back(strdup(sval.c_str()));
  }
  free(line);
  fclose(f);

  long nrows = static_cast<long>(strings.size());
  double* vbuf = static_cast<double*>(
      malloc(sizeof(double) * values.size()));
  memcpy(vbuf, values.data(), sizeof(double) * values.size());
  char** sbuf = static_cast<char**>(malloc(sizeof(char*) * strings.size()));
  memcpy(sbuf, strings.data(), sizeof(char*) * strings.size());
  *out_values = vbuf;
  *out_strings = sbuf;
  return nrows;
}

void pd1_free(double* values, char** strings, long nrows) {
  free(values);
  if (strings != nullptr) {
    for (long i = 0; i < nrows; ++i) free(strings[i]);
    free(strings);
  }
}

}  // extern "C"
