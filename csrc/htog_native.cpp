// Native harness utilities — C++ tier of the framework.
//
// TPU-native equivalents of the reference's C utility layer (L2):
//   - htog_dclock:        aarch64/dclock.cpp:8-22 (BLIS-style wall clock;
//                         here CLOCK_MONOTONIC_RAW so NTP slew can't bend
//                         benchmark timings)
//   - htog_compare:       aarch64/compare_matrices.cpp:5-31 (max-abs-diff
//                         with first-offender coordinates)
//   - htog_fill_uniform:  aarch64/random_matrix.cpp:3-19 (xoshiro256**
//                         uniform(-1,1) fill; the reference's drand48 is
//                         commented out in favor of 1.0f — we keep random
//                         as default and constant fill as an option)
//
// Loaded from Python via ctypes (utils/native.py); no pybind11 needed.

#include <cstdint>
#include <cstdio>
#include <ctime>

extern "C" {

double htog_dclock() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC_RAW, &ts);
    return static_cast<double>(ts.tv_sec) + 1e-9 * ts.tv_nsec;
}

// Max |out-ref| over an m*n row-major pair, plus the first element whose
// |diff| / denom exceeds rel_gate (first_i/j = -1 when none does).
void htog_compare(const float* out, const double* ref,
                  std::int64_t m, std::int64_t n,
                  double denom, double rel_gate,
                  double* max_abs, std::int64_t* first_i,
                  std::int64_t* first_j) {
    double best = 0.0;
    std::int64_t fi = -1, fj = -1;
    for (std::int64_t i = 0; i < m; ++i) {
        for (std::int64_t j = 0; j < n; ++j) {
            double d = static_cast<double>(out[i * n + j]) - ref[i * n + j];
            if (d < 0) d = -d;
            if (d > best) best = d;
            if (fi < 0 && d / denom > rel_gate) {
                fi = i;
                fj = j;
            }
        }
    }
    *max_abs = best;
    *first_i = fi;
    *first_j = fj;
}

namespace {
inline std::uint64_t rotl(std::uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
}
}  // namespace

// xoshiro256** uniform(-1, 1) fill (or constant `fill_value` when
// use_constant != 0, the reference's all-ones fixture).
void htog_fill_uniform(float* buf, std::int64_t count, std::uint64_t seed,
                       int use_constant, float fill_value) {
    if (use_constant) {
        for (std::int64_t i = 0; i < count; ++i) buf[i] = fill_value;
        return;
    }
    std::uint64_t s[4] = {seed ^ 0x9E3779B97F4A7C15ULL,
                          rotl(seed + 0xBF58476D1CE4E5B9ULL, 17),
                          seed * 0x94D049BB133111EBULL + 1,
                          rotl(seed ^ 0xD6E8FEB86659FD93ULL, 33)};
    for (std::int64_t i = 0; i < count; ++i) {
        std::uint64_t r = rotl(s[1] * 5, 7) * 9;
        std::uint64_t t = s[1] << 17;
        s[2] ^= s[0];
        s[3] ^= s[1];
        s[1] ^= s[2];
        s[0] ^= s[3];
        s[2] ^= t;
        s[3] = rotl(s[3], 45);
        // 53-bit mantissa path -> [0,1) -> [-1,1)
        double u = static_cast<double>(r >> 11) * (1.0 / 9007199254740992.0);
        buf[i] = static_cast<float>(2.0 * u - 1.0);
    }
}

// Octave-style .m result writer — native tier of the L4 data layer
// (format: aarch64/makefile:41-44 + committed output_*.m files).
// rows = count * 3 doubles: (size, gflops, diff). Returns 0 on success.
int htog_write_mfile(const char* path, const char* version,
                     const double* rows, std::int64_t count) {
    std::FILE* f = std::fopen(path, "w");
    if (!f) return -1;
    std::fprintf(f, "version = '%s';\nMY_MMult = [\n", version);
    for (std::int64_t i = 0; i < count; ++i) {
        std::fprintf(f, "%d %e %e\n", static_cast<int>(rows[3 * i]),
                     rows[3 * i + 1], rows[3 * i + 2]);
    }
    std::fprintf(f, "];\n");
    return std::fclose(f) == 0 ? 0 : -1;
}

// Parse an .m file written by htog_write_mfile (or the reference's
// makefiles): fills up to max_rows * 3 doubles, returns the row count
// (or -1 on open failure). Skips header/footer/junk lines the same way
// aarch64/plot.py:4-25 does.
std::int64_t htog_read_mfile(const char* path, double* rows,
                             std::int64_t max_rows) {
    std::FILE* f = std::fopen(path, "r");
    if (!f) return -1;
    char line[512];
    std::int64_t n = 0;
    while (n < max_rows && std::fgets(line, sizeof line, f)) {
        double p, g, d;
        if (std::sscanf(line, "%lf %lf %lf", &p, &g, &d) == 3) {
            rows[3 * n] = p;
            rows[3 * n + 1] = g;
            rows[3 * n + 2] = d;
            ++n;
        }
    }
    std::fclose(f);
    return n;
}

}  // extern "C"
