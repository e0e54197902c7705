// Native graph file parsing for cognn_tpu.
//
// TPU-native counterpart of the reference's C++ loader layer
// (include/graph_io_util.h:41-208: strtoull fast path + 8-thread load pool;
// algo_kernels/common_harness/harness.cpp:21-48 loadVertexData). Python's
// text parsing (np.loadtxt) is 10-100x slower on the vertex files
// (V x input_dim doubles); this library mmaps the file and parses with
// strtoll/strtod across a thread pool, filling caller-provided buffers.
//
// C ABI (ctypes):
//   cognn_count_rows(path)                        -> rows (non-empty, non-#)
//   cognn_parse_edge_list(path, n, src, dst, w, default_w) -> rows or -errno
//   cognn_parse_vertex_file(path, n, cols, vid, feat, label) -> rows or -err
//
// Two-pass protocol: count first, then allocate numpy arrays and fill.

#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
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
    void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
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
    if (m.data) ::munmap(const_cast<char*>(m.data), m.size);
    if (m.fd >= 0) ::close(m.fd);
}

inline bool effective_line(const char* b, const char* e) {
    while (b < e && (*b == ' ' || *b == '\t' || *b == '\r')) ++b;
    return b < e && *b != '#' && *b != '\n';
}

// Collect [start, end) offsets of effective lines.
std::vector<std::pair<size_t, size_t>> line_spans(const Mapped& m) {
    std::vector<std::pair<size_t, size_t>> spans;
    size_t start = 0;
    for (size_t i = 0; i <= m.size; ++i) {
        if (i == m.size || m.data[i] == '\n') {
            if (effective_line(m.data + start, m.data + i))
                spans.emplace_back(start, i);
            start = i + 1;
        }
    }
    return spans;
}

// 0 = auto (hardware_concurrency, capped); set via cognn_set_threads
// (the harness's -t flag, reference harness.h:25 "-t threads").
int64_t g_thread_override = 0;

unsigned worker_count(size_t rows) {
    if (g_thread_override > 0)
        return static_cast<unsigned>(
            g_thread_override > 64 ? 64 : g_thread_override);
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 4;
    if (hw > 16) hw = 16;  // matches the reference's bounded load pool
    if (rows < 4096) return 1;
    return hw;
}

template <typename Fn>
void parallel_rows(size_t rows, Fn fn) {
    unsigned nw = worker_count(rows);
    if (nw <= 1) {
        fn(0, rows);
        return;
    }
    std::vector<std::thread> threads;
    size_t chunk = (rows + nw - 1) / nw;
    for (unsigned t = 0; t < nw; ++t) {
        size_t lo = t * chunk, hi = std::min(rows, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([=]() { fn(lo, hi); });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void cognn_set_threads(int64_t n) { g_thread_override = n; }

int64_t cognn_count_rows(const char* path) {
    Mapped m = map_file(path);
    if (!m.ok()) return -static_cast<int64_t>(errno ? errno : 1);
    int64_t n = static_cast<int64_t>(line_spans(m).size());
    unmap(m);
    return n;
}

// Parse "<src> <dst> [w]" rows. Returns rows filled, or negative on error.
int64_t cognn_parse_edge_list(const char* path, int64_t capacity,
                              int64_t* src, int64_t* dst, double* w,
                              double default_w) {
    Mapped m = map_file(path);
    if (!m.ok()) return -static_cast<int64_t>(errno ? errno : 1);
    auto spans = line_spans(m);
    int64_t rows = static_cast<int64_t>(spans.size());
    if (rows > capacity) {
        unmap(m);
        return -1000;  // caller under-allocated
    }
    std::vector<char> bad(worker_count(rows), 0);
    parallel_rows(rows, [&](size_t lo, size_t hi) {
        for (size_t r = lo; r < hi; ++r) {
            const char* p = m.data + spans[r].first;
            char* end = nullptr;
            long long s = strtoll(p, &end, 10);
            if (end == p) { bad[0] = 1; return; }
            p = end;
            long long d = strtoll(p, &end, 10);
            if (end == p) { bad[0] = 1; return; }
            p = end;
            double weight = default_w;
            while (*p == ' ' || *p == '\t') ++p;
            if (*p != '\n' && *p != '\r' && *p != '#'
                && p < m.data + spans[r].second) {
                weight = strtod(p, &end);
                if (end == p) { bad[0] = 1; return; }
            }
            src[r] = s;
            dst[r] = d;
            if (w) w[r] = weight;
        }
    });
    unmap(m);
    if (bad[0]) return -2000;  // malformed line
    return rows;
}

// Parse "<vid> <f0> ... <f{cols-1}> <label>" rows.
int64_t cognn_parse_vertex_file(const char* path, int64_t capacity,
                                int64_t cols, int64_t* vid, double* feat,
                                int64_t* label) {
    Mapped m = map_file(path);
    if (!m.ok()) return -static_cast<int64_t>(errno ? errno : 1);
    auto spans = line_spans(m);
    int64_t rows = static_cast<int64_t>(spans.size());
    if (rows > capacity) {
        unmap(m);
        return -1000;
    }
    volatile int bad = 0;
    parallel_rows(rows, [&](size_t lo, size_t hi) {
        for (size_t r = lo; r < hi; ++r) {
            const char* p = m.data + spans[r].first;
            const char* line_end = m.data + spans[r].second;
            char* end = nullptr;
            long long v = strtoll(p, &end, 10);
            if (end == p) { bad = 1; return; }
            p = end;
            double* row = feat + r * cols;
            for (int64_t c = 0; c < cols; ++c) {
                row[c] = strtod(p, &end);
                if (end == p) { bad = 1; return; }
                p = end;
            }
            long long lab = strtoll(p, &end, 10);
            if (end == p || end > line_end) { bad = 1; return; }
            // reject extra trailing tokens (column-count mismatch)
            while (end < line_end && (*end == ' ' || *end == '\t'
                                      || *end == '\r')) ++end;
            if (end != line_end) { bad = 1; return; }
            vid[r] = v;
            label[r] = lab;
        }
    });
    unmap(m);
    if (bad) return -2000;
    return rows;
}

}  // extern "C"
