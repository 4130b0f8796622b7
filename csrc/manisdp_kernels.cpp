// Native CPU kernels for the multiblock product-manifold geometry.
//
// Re-implementation of the reference's 7 MEX kernels
// (src/C-files/{innerc,lincombc,projc,retrc,randc,zerovecc}.cpp and the
// binary-only mexmat) with the MATHEMATICALLY CORRECT per-column
// oblique semantics: the shipped projc.cpp computes a single
// whole-block inner product (sphere-style) and retrc.cpp normalizes
// Euclidean blocks too — both disagree with the pure-MATLAB drivers
// (SURVEY §2.3).  Here:
//   - proj: for blocks < nob, per-COLUMN tangent projection
//           U - X .* colsum(X .* U); identity for the rest;
//   - retr: per-column normalize(x + u) for blocks < nob, x + u else.
//
// Layout: all blocks concatenated in one contiguous double buffer;
// block b is column-major p_b x n_b at offset off[b].  Exposed via a
// plain C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>

extern "C" {

// sum_b <u_b, v_b> over all blocks (innerc.cpp)
double msdp_inner(int64_t total, const double* u, const double* v) {
    double acc = 0.0;
    for (int64_t i = 0; i < total; ++i) acc += u[i] * v[i];
    return acc;
}

// out = a1*u1 (+ a2*u2)  (lincombc.cpp)
void msdp_lincomb(int64_t total, double a1, const double* u1,
                  double a2, const double* u2, double* out) {
    if (u2 == nullptr) {
        for (int64_t i = 0; i < total; ++i) out[i] = a1 * u1[i];
    } else {
        for (int64_t i = 0; i < total; ++i)
            out[i] = a1 * u1[i] + a2 * u2[i];
    }
}

// tangent projection (projc.cpp, corrected semantics)
void msdp_proj(int64_t nblocks, int64_t nob, const int64_t* ps,
               const int64_t* ns, const double* x, const double* u,
               double* out) {
    int64_t off = 0;
    for (int64_t b = 0; b < nblocks; ++b) {
        const int64_t p = ps[b], n = ns[b], sz = p * n;
        if (b < nob) {
            for (int64_t j = 0; j < n; ++j) {
                const double* xc = x + off + j * p;
                const double* uc = u + off + j * p;
                double* oc = out + off + j * p;
                double dot = 0.0;
                for (int64_t i = 0; i < p; ++i) dot += xc[i] * uc[i];
                for (int64_t i = 0; i < p; ++i)
                    oc[i] = uc[i] - xc[i] * dot;
            }
        } else {
            std::memcpy(out + off, u + off, sz * sizeof(double));
        }
        off += sz;
    }
}

// retraction (retrc.cpp, corrected semantics)
void msdp_retr(int64_t nblocks, int64_t nob, const int64_t* ps,
               const int64_t* ns, const double* x, const double* u,
               double* out) {
    int64_t off = 0;
    for (int64_t b = 0; b < nblocks; ++b) {
        const int64_t p = ps[b], n = ns[b], sz = p * n;
        if (b < nob) {
            for (int64_t j = 0; j < n; ++j) {
                const double* xc = x + off + j * p;
                const double* uc = u + off + j * p;
                double* oc = out + off + j * p;
                double nrm2 = 0.0;
                for (int64_t i = 0; i < p; ++i) {
                    const double t = xc[i] + uc[i];
                    oc[i] = t;
                    nrm2 += t * t;
                }
                const double inv = 1.0 / std::sqrt(nrm2);
                for (int64_t i = 0; i < p; ++i) oc[i] *= inv;
            }
        } else {
            for (int64_t i = 0; i < sz; ++i)
                out[off + i] = x[off + i] + u[off + i];
        }
        off += sz;
    }
}

// Gaussian init, column-normalized for the first nob blocks (randc.cpp
// minus its seeding quirks: one mt19937_64 seeded once per call)
void msdp_rand(uint64_t seed, int64_t nblocks, int64_t nob,
               const int64_t* ps, const int64_t* ns, double* out) {
    std::mt19937_64 gen(seed);
    std::normal_distribution<double> nd(0.0, 1.0);
    int64_t off = 0;
    for (int64_t b = 0; b < nblocks; ++b) {
        const int64_t p = ps[b], n = ns[b], sz = p * n;
        for (int64_t i = 0; i < sz; ++i) out[off + i] = nd(gen);
        if (b < nob) {
            for (int64_t j = 0; j < n; ++j) {
                double* oc = out + off + j * p;
                double nrm2 = 0.0;
                for (int64_t i = 0; i < p; ++i) nrm2 += oc[i] * oc[i];
                const double inv = 1.0 / std::sqrt(nrm2);
                for (int64_t i = 0; i < p; ++i) oc[i] *= inv;
            }
        }
        off += sz;
    }
}

// zero vector (zerovecc.cpp)
void msdp_zerovec(int64_t total, double* out) {
    std::memset(out, 0, total * sizeof(double));
}

// mat: reshape a column-major vec into a dense n x n matrix and
// symmetrize, the SDPT3 `mexmat` operation used by read_sedumi
// (read_sedumi.m:172,222; binary-only in the reference)
void msdp_mat_symmetrize(int64_t n, const double* vec, double* out) {
    for (int64_t j = 0; j < n; ++j)
        for (int64_t i = 0; i < n; ++i)
            out[i + j * n] = 0.5 * (vec[i + j * n] + vec[j + i * n]);
}

// CSR sparse A times dense factor pair-products:
//   w_k = sum_e v_e * <Y[:, i_e], U[:, j_e]>  for the entries of
// constraint row k — the CPU-native equivalent of the device
// ConstraintOp.apply_factored, used for host-side verification.
void msdp_apply_factored(int64_t m, const int64_t* indptr,
                         const int64_t* ii, const int64_t* jj,
                         const double* vv, const double* Y,
                         const double* U, int64_t p, double* w) {
    for (int64_t k = 0; k < m; ++k) {
        double acc = 0.0;
        for (int64_t e = indptr[k]; e < indptr[k + 1]; ++e) {
            const double* yc = Y + ii[e] * p;
            const double* uc = U + jj[e] * p;
            double dot = 0.0;
            for (int64_t q = 0; q < p; ++q) dot += yc[q] * uc[q];
            acc += vv[e] * dot;
        }
        w[k] = acc;
    }
}

}  // extern "C"
