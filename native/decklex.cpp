// decklex: fast lexer for ECLIPSE deck bulk numeric arrays (native core).
//
// TPU-native rebuild of the hot slice of opm-common's deck parser
// (reference consumes it via utils/readDeck.cpp:189): real corner-point
// decks carry multi-MB ZCORN/COORD/PORO arrays whose per-token Python
// parsing dominates startup. This lexer consumes whitespace-separated
// numbers with N*value repeats and '--' comments up to the terminating
// '/', in one pass over the raw text. Anything else (quoted strings,
// defaults 'N*', stray tokens) returns an error and the caller falls
// back to the Python tokenizer.
//
// Two-pass API (repeat counts make the value count unknowable from the
// text length): decklex_count sizes the output, decklex_fill writes it.
//
// Build: g++ -O2 -shared -fPIC -o libdecklex.so decklex.cpp

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Scan {
    const char* p;
    const char* end;
};

inline void skip_ws_comments(Scan& s) {
    for (;;) {
        while (s.p < s.end && (*s.p == ' ' || *s.p == '\t' || *s.p == '\n'
                               || *s.p == '\r'))
            ++s.p;
        if (s.p + 1 < s.end && s.p[0] == '-' && s.p[1] == '-') {
            while (s.p < s.end && *s.p != '\n') ++s.p;
            continue;
        }
        return;
    }
}

// Parse one number token (handles E/e/D/d exponents). Returns false on
// a malformed token.
inline bool parse_number(const char* tok, long len, double* out) {
    char buf[64];
    if (len <= 0 || len >= 63) return false;
    bool seen_digit = false;
    for (long i = 0; i < len; ++i) {
        char c = tok[i];
        if (c == 'D' || c == 'd') c = 'E';
        if (c >= '0' && c <= '9') seen_digit = true;
        else if (c != '+' && c != '-' && c != '.' && c != 'E' && c != 'e')
            return false;
        buf[i] = c;
    }
    if (!seen_digit) return false;
    buf[len] = 0;
    char* endp = nullptr;
    *out = strtod(buf, &endp);
    return endp == buf + len;
}

// Scan one token: [count '*'] number | '/'.
// ret: 1 = value(s), 0 = slash (done), <0 = error.
inline int next_item(Scan& s, long* count, double* value) {
    skip_ws_comments(s);
    if (s.p >= s.end) return -3;  // no terminating slash
    if (*s.p == '/') { ++s.p; return 0; }
    const char* start = s.p;
    while (s.p < s.end && *s.p != ' ' && *s.p != '\t' && *s.p != '\n'
           && *s.p != '\r' && *s.p != '/')
        ++s.p;
    long len = s.p - start;
    // N*value repeat?
    const char* star = (const char*)memchr(start, '*', len);
    if (star != nullptr) {
        long nlen = star - start;
        if (nlen <= 0 || nlen > 18) return -2;
        long n = 0;
        for (long i = 0; i < nlen; ++i) {
            if (start[i] < '0' || start[i] > '9') return -2;
            n = n * 10 + (start[i] - '0');
        }
        long vlen = (start + len) - (star + 1);
        if (vlen == 0) return -2;  // 'N*' default: not a plain number
        double v;
        if (!parse_number(star + 1, vlen, &v)) return -2;
        *count = n;
        *value = v;
        return 1;
    }
    double v;
    if (!parse_number(start, len, &v)) return -2;
    *count = 1;
    *value = v;
    return 1;
}

}  // namespace

extern "C" {

// Number of values up to the first '/', or <0 on error/fallback.
long decklex_count(const char* buf, long len) {
    Scan s{buf, buf + len};
    long total = 0;
    for (;;) {
        long n;
        double v;
        int r = next_item(s, &n, &v);
        if (r == 0) return total;
        if (r < 0) return r;
        total += n;
    }
}

// Fill out[0..cap) with the values; returns count, or <0 on error.
long decklex_fill(const char* buf, long len, double* out, long cap) {
    Scan s{buf, buf + len};
    long total = 0;
    for (;;) {
        long n;
        double v;
        int r = next_item(s, &n, &v);
        if (r == 0) return total;
        if (r < 0) return r;
        if (total + n > cap) return -1;
        for (long i = 0; i < n; ++i) out[total + i] = v;
        total += n;
    }
}

}  // extern "C"
