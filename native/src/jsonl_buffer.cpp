// Native replay-buffer ingest: multithreaded JSON-lines -> flat arrays.
//
// The reference materializes training buffers by pd.read_json on JSON-lines
// blobs (reference ikea/data_utils/replay_buffer.py:48) — a generic parser
// that builds Python objects for every cell. This is the TPU framework's
// host-side equivalent, specialized to the 7-column replay-buffer row schema
// (SURVEY.md §1 L1):
//
//   {"state":[i32...],"action":i32,"r_act":f32,"next_state":[i32...],
//    "true_state_len":i32,"true_next_state_len":i32,"is_end":bool}
//
// Keys may appear in any order; unknown keys are skipped; eval buffers omit
// some columns (pass null output pointers). Parsing is sharded by newline
// boundaries across threads and writes straight into caller-allocated numpy
// buffers — zero Python-object churn.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Outputs {
  int32_t* state;            // (n, state_len) or null
  int32_t* action;           // (n,) or null
  float* r_act;              // (n,) or null
  int32_t* next_state;       // (n, state_len) or null
  int32_t* true_state_len;   // (n,) or null
  int32_t* true_next_state_len;  // (n,) or null
  uint8_t* is_end;           // (n,) or null
  int64_t state_len;
};

struct ErrorSlot {
  std::atomic<int64_t> row{-1};
  char msg[256] = {0};
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Parse a JSON number (int or float); returns pointer past it.
const char* parse_number(const char* p, const char* end, double* out) {
  char* stop = nullptr;
  *out = strtod(p, &stop);
  if (stop == p || stop > end) return nullptr;
  return stop;
}

// Parse [i32,...] into dst (capacity cap), zero-padding the tail.
// Returns pointer past ']' or null on error; *count = parsed elements.
const char* parse_int_array(const char* p, const char* end, int32_t* dst,
                            int64_t cap, int64_t* count) {
  p = skip_ws(p, end);
  if (p >= end || *p != '[') return nullptr;
  ++p;
  int64_t n = 0;
  p = skip_ws(p, end);
  if (p < end && *p == ']') {
    *count = 0;
    if (dst) memset(dst, 0, sizeof(int32_t) * cap);
    return p + 1;
  }
  while (p < end) {
    double v;
    p = parse_number(skip_ws(p, end), end, &v);
    if (!p) return nullptr;
    if (dst && n < cap) dst[n] = static_cast<int32_t>(v);
    ++n;
    p = skip_ws(p, end);
    if (p < end && *p == ',') { ++p; continue; }
    if (p < end && *p == ']') { ++p; break; }
    return nullptr;
  }
  if (dst) {
    for (int64_t i = n; i < cap; ++i) dst[i] = 0;
  }
  *count = n;
  return p;
}

// Skip any JSON value (for unknown keys). Shallow nesting suffices here.
const char* skip_value(const char* p, const char* end) {
  p = skip_ws(p, end);
  if (p >= end) return nullptr;
  if (*p == '"') {
    ++p;
    while (p < end && *p != '"') p += (*p == '\\') ? 2 : 1;
    return (p < end) ? p + 1 : nullptr;
  }
  if (*p == '[' || *p == '{') {
    char open = *p, close = (open == '[') ? ']' : '}';
    int depth = 0;
    while (p < end) {
      if (*p == '"') {
        ++p;
        while (p < end && *p != '"') p += (*p == '\\') ? 2 : 1;
        if (p >= end) return nullptr;
      } else if (*p == open) {
        ++depth;
      } else if (*p == close) {
        if (--depth == 0) return p + 1;
      }
      ++p;
    }
    return nullptr;
  }
  while (p < end && *p != ',' && *p != '}' && *p != ' ' && *p != '\t' &&
         *p != '\r' && *p != '\n')
    ++p;
  return p;
}

// Bitmask positions for per-row key-presence tracking.
enum FieldBit : unsigned {
  kState = 1u << 0,
  kAction = 1u << 1,
  kRAct = 1u << 2,
  kNextState = 1u << 3,
  kTrueLen = 1u << 4,
  kTrueNextLen = 1u << 5,
  kIsEnd = 1u << 6,
};

// Every requested (non-null) output must be written by every row; a row that
// omits a column row 0 had would otherwise leave uninitialized memory.
bool check_required(unsigned seen, int64_t row, const Outputs& o, char* err) {
  struct Req { const void* ptr; unsigned bit; const char* name; };
  const Req reqs[] = {
      {o.state, kState, "state"},
      {o.action, kAction, "action"},
      {o.r_act, kRAct, "r_act"},
      {o.next_state, kNextState, "next_state"},
      {o.true_state_len, kTrueLen, "true_state_len"},
      {o.true_next_state_len, kTrueNextLen, "true_next_state_len"},
      {o.is_end, kIsEnd, "is_end"},
  };
  for (const Req& r : reqs) {
    if (r.ptr && !(seen & r.bit)) {
      snprintf(err, 256, "row %lld: missing key %s", (long long)row, r.name);
      return false;
    }
  }
  return true;
}

bool parse_row(const char* p, const char* end, int64_t row, const Outputs& o,
               char* err) {
  p = skip_ws(p, end);
  if (p >= end || *p != '{') {
    snprintf(err, 256, "row %lld: expected '{'", (long long)row);
    return false;
  }
  ++p;
  unsigned seen = 0;
  while (p < end) {
    p = skip_ws(p, end);
    if (p < end && *p == '}') return check_required(seen, row, o, err);
    if (p >= end || *p != '"') {
      snprintf(err, 256, "row %lld: expected key", (long long)row);
      return false;
    }
    const char* k = ++p;
    while (p < end && *p != '"') ++p;
    if (p >= end) return false;
    size_t klen = static_cast<size_t>(p - k);
    ++p;
    p = skip_ws(p, end);
    if (p >= end || *p != ':') {
      snprintf(err, 256, "row %lld: expected ':'", (long long)row);
      return false;
    }
    ++p;

    auto is_key = [&](const char* name) {
      return klen == strlen(name) && memcmp(k, name, klen) == 0;
    };

    if (is_key("state") || is_key("next_state")) {
      int32_t* dst = is_key("state") ? o.state : o.next_state;
      seen |= is_key("state") ? kState : kNextState;
      int64_t cnt = 0;
      p = parse_int_array(p, end, dst ? dst + row * o.state_len : nullptr,
                          o.state_len, &cnt);
      if (!p) {
        snprintf(err, 256, "row %lld: bad array", (long long)row);
        return false;
      }
      // Ragged rows are rejected: zero-padding would silently substitute
      // item id 0 (a REAL item — the framework's pad id is num_items).
      if (dst && cnt != o.state_len) {
        snprintf(err, 256, "row %lld: array has %lld items, state_len is %lld",
                 (long long)row, (long long)cnt, (long long)o.state_len);
        return false;
      }
    } else if (is_key("action") || is_key("true_state_len") ||
               is_key("true_next_state_len")) {
      double v;
      p = parse_number(skip_ws(p, end), end, &v);
      if (!p) {
        snprintf(err, 256, "row %lld: bad int for %.*s", (long long)row,
                 (int)klen, k);
        return false;
      }
      int32_t* dst = is_key("action") ? o.action
                     : is_key("true_state_len") ? o.true_state_len
                                                : o.true_next_state_len;
      seen |= is_key("action") ? kAction
              : is_key("true_state_len") ? kTrueLen
                                         : kTrueNextLen;
      if (dst) dst[row] = static_cast<int32_t>(v);
    } else if (is_key("r_act")) {
      double v;
      p = parse_number(skip_ws(p, end), end, &v);
      if (!p) {
        snprintf(err, 256, "row %lld: bad r_act", (long long)row);
        return false;
      }
      seen |= kRAct;
      if (o.r_act) o.r_act[row] = static_cast<float>(v);
    } else if (is_key("is_end")) {
      p = skip_ws(p, end);
      uint8_t v;
      if (end - p >= 4 && memcmp(p, "true", 4) == 0) { v = 1; p += 4; }
      else if (end - p >= 5 && memcmp(p, "false", 5) == 0) { v = 0; p += 5; }
      else {
        double d;
        p = parse_number(p, end, &d);
        if (!p) {
          snprintf(err, 256, "row %lld: bad is_end", (long long)row);
          return false;
        }
        v = d != 0.0;
      }
      seen |= kIsEnd;
      if (o.is_end) o.is_end[row] = v;
    } else {
      p = skip_value(p, end);
      if (!p) {
        snprintf(err, 256, "row %lld: bad value for %.*s", (long long)row,
                 (int)klen, k);
        return false;
      }
    }
    p = skip_ws(p, end);
    if (p < end && *p == ',') { ++p; continue; }
    if (p < end && *p == '}') return check_required(seen, row, o, err);
    snprintf(err, 256, "row %lld: expected ',' or '}'", (long long)row);
    return false;
  }
  snprintf(err, 256, "row %lld: truncated", (long long)row);
  return false;
}

// Non-empty-line offsets (a "row" is any line with a non-ws character).
void line_offsets(const char* buf, int64_t len, std::vector<int64_t>* starts,
                  std::vector<int64_t>* ends) {
  int64_t i = 0;
  while (i < len) {
    int64_t j = i;
    while (j < len && buf[j] != '\n') ++j;
    int64_t a = i, b = j;
    while (a < b && isspace((unsigned char)buf[a])) ++a;
    while (b > a && isspace((unsigned char)buf[b - 1])) --b;
    if (b > a) {
      starts->push_back(a);
      ends->push_back(b);
    }
    i = j + 1;
  }
}

}  // namespace

extern "C" {

// Count non-empty lines (rows) in a JSON-lines buffer.
int64_t ikea_jsonl_count(const char* buf, int64_t len) {
  std::vector<int64_t> s, e;
  line_offsets(buf, len, &s, &e);
  return static_cast<int64_t>(s.size());
}

// Parse n_rows rows into caller-allocated arrays (any output may be null to
// skip that column). Returns 0 on success; on error returns 1 and writes a
// message into err (errlen bytes).
int ikea_jsonl_parse(const char* buf, int64_t len, int64_t state_len,
                     int64_t n_rows, int32_t* state, int32_t* action,
                     float* r_act, int32_t* next_state,
                     int32_t* true_state_len, int32_t* true_next_state_len,
                     uint8_t* is_end, int n_threads, char* err, int errlen) {
  std::vector<int64_t> starts, ends;
  line_offsets(buf, len, &starts, &ends);
  if (static_cast<int64_t>(starts.size()) != n_rows) {
    snprintf(err, errlen, "row count mismatch: buffer has %lld, caller %lld",
             (long long)starts.size(), (long long)n_rows);
    return 1;
  }
  Outputs o{state, action, r_act, next_state, true_state_len,
            true_next_state_len, is_end, state_len};

  if (n_threads < 1) n_threads = 1;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw > 0 && n_threads > hw) n_threads = hw;
  if (n_rows < 4096) n_threads = 1;

  ErrorSlot error;
  auto worker = [&](int64_t lo, int64_t hi) {
    char local_err[256];
    for (int64_t r = lo; r < hi; ++r) {
      if (error.row.load(std::memory_order_relaxed) >= 0) return;
      if (!parse_row(buf + starts[r], buf + ends[r], r, o, local_err)) {
        int64_t expect = -1;
        if (error.row.compare_exchange_strong(expect, r)) {
          memcpy(error.msg, local_err, sizeof(local_err));
        }
        return;
      }
    }
  };

  if (n_threads == 1) {
    worker(0, n_rows);
  } else {
    std::vector<std::thread> ts;
    int64_t chunk = (n_rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = lo + chunk;
      if (lo >= n_rows) break;
      if (hi > n_rows) hi = n_rows;
      ts.emplace_back(worker, lo, hi);
    }
    for (auto& t : ts) t.join();
  }

  if (error.row.load() >= 0) {
    snprintf(err, errlen, "%s", error.msg);
    return 1;
  }
  return 0;
}

}  // extern "C"
