// eclio: ECLIPSE binary file I/O (native core).
//
// TPU-native rebuild of the slice of opm-common's EclipseIO / EclFilesComparator
// that the framework needs for ECL-compatible output (reference consumes it
// via ebos/eclwriter.hh; SURVEY.md L8). The hot path — packing big-endian
// Fortran unformatted records from large arrays — is native C++, driven from
// Python via a minimal C ABI (ctypes; the environment has no pybind11).
//
// Format (ECLIPSE unified binary files):
//   * big-endian Fortran sequential records: [int32 n][n bytes][int32 n]
//   * keyword block = header record (8-char name, int32 count, 4-char type)
//     followed by data records of at most 1000 elements (105 for CHAR)
//   * element types: INTE(i32) REAL(f32) DOUB(f64) LOGI(i32) CHAR(8 bytes)
//
// Build: g++ -O2 -shared -fPIC -o libeclio.so eclio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kNumericBlock = 1000;
constexpr int kCharBlock = 105;

inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

struct EclFile {
    FILE* f = nullptr;
};

void write_record(EclFile* h, const void* data, int nbytes) {
    uint32_t len = bswap32(static_cast<uint32_t>(nbytes));
    fwrite(&len, 4, 1, h->f);
    fwrite(data, 1, nbytes, h->f);
    fwrite(&len, 4, 1, h->f);
}

int elem_size(const char* type) {
    if (!strncmp(type, "CHAR", 4)) return 8;
    if (!strncmp(type, "DOUB", 4)) return 8;
    if (!strncmp(type, "C0", 2)) return 8;  // C008..C099 extended char
    return 4;  // INTE, REAL, LOGI
}

bool is_char(const char* type) {
    return !strncmp(type, "CHAR", 4) || !strncmp(type, "C0", 2);
}

}  // namespace

extern "C" {

void* eclio_open(const char* path) {
    auto* h = new EclFile;
    h->f = fopen(path, "wb");
    if (!h->f) {
        delete h;
        return nullptr;
    }
    return h;
}

void eclio_close(void* vh) {
    auto* h = static_cast<EclFile*>(vh);
    if (h) {
        if (h->f) fclose(h->f);
        delete h;
    }
}

// Write one keyword block. `name` is space-padded to 8 chars here; `type`
// is one of INTE/REAL/DOUB/LOGI/CHAR/MESS. `data` points to `count`
// native-endian elements (CHAR: count strings of 8 bytes, caller-padded).
int eclio_write_kw(void* vh, const char* name, const char* type, int count,
                   const void* data) {
    auto* h = static_cast<EclFile*>(vh);
    if (!h || !h->f) return -1;

    char header[16];
    memset(header, ' ', 16);
    size_t nlen = strlen(name);
    memcpy(header, name, nlen > 8 ? 8 : nlen);
    uint32_t cnt_be = bswap32(static_cast<uint32_t>(count));
    memcpy(header + 8, &cnt_be, 4);
    memcpy(header + 12, type, 4);
    write_record(h, header, 16);

    if (!strncmp(type, "MESS", 4) || count == 0) return 0;

    const int esz = elem_size(type);
    const int block = is_char(type) ? kCharBlock : kNumericBlock;
    const char* src = static_cast<const char*>(data);

    std::vector<char> buf;
    for (int off = 0; off < count; off += block) {
        int n = count - off > block ? block : count - off;
        buf.resize(static_cast<size_t>(n) * esz);
        memcpy(buf.data(), src + static_cast<size_t>(off) * esz,
               static_cast<size_t>(n) * esz);
        if (!is_char(type)) {
            if (esz == 4) {
                auto* p = reinterpret_cast<uint32_t*>(buf.data());
                for (int i = 0; i < n; ++i) p[i] = bswap32(p[i]);
            } else {
                auto* p = reinterpret_cast<uint64_t*>(buf.data());
                for (int i = 0; i < n; ++i) p[i] = bswap64(p[i]);
            }
        }
        write_record(h, buf.data(), n * esz);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Reader (for round-trip tests and RESTART loading).
// ---------------------------------------------------------------------------

struct EclReader {
    FILE* f = nullptr;
};

void* eclio_open_read(const char* path) {
    auto* h = new EclReader;
    h->f = fopen(path, "rb");
    if (!h->f) {
        delete h;
        return nullptr;
    }
    return h;
}

void eclio_close_read(void* vh) {
    auto* h = static_cast<EclReader*>(vh);
    if (h) {
        if (h->f) fclose(h->f);
        delete h;
    }
}

namespace {
bool read_record(EclReader* h, std::vector<char>& out) {
    uint32_t len_be;
    if (fread(&len_be, 4, 1, h->f) != 1) return false;
    uint32_t len = bswap32(len_be);
    out.resize(len);
    if (len && fread(out.data(), 1, len, h->f) != len) return false;
    uint32_t tail;
    if (fread(&tail, 4, 1, h->f) != 1) return false;
    return bswap32(tail) == len;
}
}  // namespace

// Read the next keyword header. Returns 1 on success, 0 on EOF, -1 error.
// name: char[9] out (nul-terminated), type: char[5] out, count out.
int eclio_next_kw(void* vh, char* name, char* type, int* count) {
    auto* h = static_cast<EclReader*>(vh);
    std::vector<char> rec;
    if (!read_record(h, rec)) return feof(h->f) ? 0 : -1;
    if (rec.size() != 16) return -1;
    memcpy(name, rec.data(), 8);
    name[8] = 0;
    memcpy(type, rec.data() + 12, 4);
    type[4] = 0;
    uint32_t cnt;
    memcpy(&cnt, rec.data() + 8, 4);
    *count = static_cast<int>(bswap32(cnt));
    return 1;
}

// Read the data blocks for a keyword of `count` elements of `type` into
// caller-provided native-endian buffer. Returns 0 ok, -1 error.
int eclio_read_data(void* vh, const char* type, int count, void* data) {
    auto* h = static_cast<EclReader*>(vh);
    if (!strncmp(type, "MESS", 4) || count == 0) return 0;
    const int esz = elem_size(type);
    const int block = is_char(type) ? kCharBlock : kNumericBlock;
    char* dst = static_cast<char*>(data);
    std::vector<char> rec;
    for (int off = 0; off < count; off += block) {
        int n = count - off > block ? block : count - off;
        if (!read_record(h, rec)) return -1;
        if (static_cast<int>(rec.size()) != n * esz) return -1;
        if (!is_char(type)) {
            if (esz == 4) {
                auto* p = reinterpret_cast<uint32_t*>(rec.data());
                for (int i = 0; i < n; ++i) p[i] = bswap32(p[i]);
            } else {
                auto* p = reinterpret_cast<uint64_t*>(rec.data());
                for (int i = 0; i < n; ++i) p[i] = bswap64(p[i]);
            }
        }
        memcpy(dst + static_cast<size_t>(off) * esz, rec.data(),
               static_cast<size_t>(n) * esz);
    }
    return 0;
}

}  // extern "C"
