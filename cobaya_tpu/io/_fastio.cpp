// Fast fixed-width text formatting of chain matrices.
//
// The only host-side hot loop in this framework is turning multi-megabyte
// sample batches into cobaya-format text ("%17.8g" columns) when flushing
// chains to disk; Python string formatting dominates that path.  This tiny
// C++ kernel formats a whole row-major float64 matrix in one call.
//
// Built on demand by cobaya_tpu/io/native.py (g++ -O3 -shared), loaded via
// ctypes; the Python formatter remains as a fallback.

#include <cstdio>
#include <cstring>

extern "C" {

// Formats an (n x m) row-major matrix into `out` as space-separated
// %17.8g columns, one row per line.  `out` must have room for at least
// n * (m * 18 + 1) + 1 bytes.  Returns the number of bytes written.
long format_rows(const double* data, long n, long m, char* out) {
    char* p = out;
    for (long i = 0; i < n; ++i) {
        const double* row = data + i * m;
        for (long j = 0; j < m; ++j) {
            int written = snprintf(p, 32, "%17.8g", row[j]);
            p += written;
            *p++ = (j + 1 < m) ? ' ' : '\n';
        }
    }
    *p = '\0';
    return (long)(p - out);
}

}  // extern "C"
