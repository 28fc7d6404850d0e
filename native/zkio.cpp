// Native runtime kernels: trace IO, limb marshaling, host-side hashes.
//
// The TPU-native counterpart of the reference's native runtime layer
// (reference src/utils/utils.cpp mapFile/copyFile, the mmap'd pols buffer
// prover.cpp:99-120, src/goldilocks PoseidonGoldilocks scalar path, and
// src/XKCP keccak-f).  Compute-path kernels live in JAX/XLA; this module
// covers the host hot paths around them:
//
//   * u64 trace <-> (lo, hi) u32 plane conversion — the host<->device
//     marshaling of committed-polynomial matrices
//   * mmap-backed read/write of raw row-major u64 pols files (the
//     reference zkevm.commit format)
//   * Poseidon-Goldilocks permutation (sequential SMT/transcript path)
//   * keccak-f[1600] for the executor's hash streams
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include "poseidon_gl_constants.h"

extern "C" {

// ---------------------------------------------------------------------------
// Limb marshaling
// ---------------------------------------------------------------------------

void u64_to_u32pair(const uint64_t* src, uint32_t* lo, uint32_t* hi,
                    size_t n) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n; i++) {
        lo[i] = (uint32_t)(src[i] & 0xFFFFFFFFu);
        hi[i] = (uint32_t)(src[i] >> 32);
    }
}

void u32pair_to_u64(const uint32_t* lo, const uint32_t* hi, uint64_t* dst,
                    size_t n) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n; i++) {
        dst[i] = (uint64_t)lo[i] | ((uint64_t)hi[i] << 32);
    }
}

// ---------------------------------------------------------------------------
// Raw pols file IO (row-major u64 felts, the reference commit format)
// ---------------------------------------------------------------------------

int write_pols_file(const char* path, const uint64_t* data, uint64_t n) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    size_t written = fwrite(data, sizeof(uint64_t), n, f);
    fclose(f);
    return written == n ? 0 : -2;
}

// Maps the file read-only; returns pointer, sets *n to element count.
// Caller frees with unmap_pols_file.
const uint64_t* map_pols_file(const char* path, uint64_t* n) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
    void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (p == MAP_FAILED) return nullptr;
    *n = (uint64_t)st.st_size / sizeof(uint64_t);
    return (const uint64_t*)p;
}

void unmap_pols_file(const uint64_t* p, uint64_t n) {
    if (p) munmap((void*)p, n * sizeof(uint64_t));
}

// ---------------------------------------------------------------------------
// Goldilocks field + Poseidon permutation
// ---------------------------------------------------------------------------

static const uint64_t GL_P = 0xFFFFFFFF00000001ULL;

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    if (s < a || s >= GL_P) s -= GL_P;  // a,b < p so at most one wrap
    return s;
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
    __uint128_t t = (__uint128_t)a * b;
    uint64_t lo = (uint64_t)t;
    uint64_t hi = (uint64_t)(t >> 64);
    uint64_t hi_lo = hi & 0xFFFFFFFFULL;
    uint64_t hi_hi = hi >> 32;
    // 2^64 = 2^32 - 1, 2^96 = -1 (mod p)
    uint64_t r = lo - hi_hi;
    if (lo < hi_hi) r -= 0xFFFFFFFFULL;           // borrow correction
    uint64_t t1 = (hi_lo << 32) - hi_lo;
    uint64_t s = r + t1;
    if (s < r) s += 0xFFFFFFFFULL;                // carry correction
    if (s >= GL_P) s -= GL_P;
    return s;
}

static inline uint64_t gl_pow7(uint64_t a) {
    uint64_t a2 = gl_mul(a, a);
    uint64_t a4 = gl_mul(a2, a2);
    uint64_t a3 = gl_mul(a2, a);
    return gl_mul(a3, a4);
}

void poseidon_gl_permute(const uint64_t in[12], uint64_t out[12]) {
    uint64_t st[12];
    memcpy(st, in, sizeof(st));
    for (int r = 0; r < 30; r++) {
        for (int s = 0; s < 12; s++)
            st[s] = gl_add(st[s] % GL_P, POSEIDON_C[r * 12 + s] % GL_P);
        if (r < 4 || r >= 26) {
            for (int s = 0; s < 12; s++) st[s] = gl_pow7(st[s]);
        } else {
            st[0] = gl_pow7(st[0]);
        }
        uint64_t acc[12];
        for (int x = 0; x < 12; x++) {
            uint64_t sum = 0;
            for (int y = 0; y < 12; y++)
                sum = gl_add(sum, gl_mul(st[y], POSEIDON_M[x][y]));
            acc[x] = sum;
        }
        memcpy(st, acc, sizeof(st));
    }
    memcpy(out, st, sizeof(st));
}

// count states of 12 u64 each; out receives the full 12-wide outputs
void poseidon_gl_permute_batch(const uint64_t* in, uint64_t* out,
                               uint64_t count) {
#pragma omp parallel for schedule(static)
    for (uint64_t i = 0; i < count; i++) {
        poseidon_gl_permute(in + i * 12, out + i * 12);
    }
}

// ---------------------------------------------------------------------------
// keccak-f[1600]
// ---------------------------------------------------------------------------

static const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static inline uint64_t rotl64(uint64_t x, int n) {
    return (x << n) | (x >> (64 - n));
}

void keccak_f1600(uint64_t st[25]) {
    static const int rho[5][5] = {
        {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
        {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14},
    };
    for (int round = 0; round < 24; round++) {
        uint64_t c[5], d[5];
        for (int x = 0; x < 5; x++)
            c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
        uint64_t b[25];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) {
                uint64_t v = st[x + 5 * y] ^ d[x];
                int nx = y, ny = (2 * x + 3 * y) % 5;
                b[nx + 5 * ny] = rotl64(v, rho[x][y]);
            }
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                st[x + 5 * y] = b[x + 5 * y] ^
                    ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
        st[0] ^= KECCAK_RC[round];
    }
}

}  // extern "C"
