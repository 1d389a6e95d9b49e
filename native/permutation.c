/* Greedy frequency-permutation alignment for FDICA — native host runtime.
 *
 * Port target: the reference's solve_permutation (bss/fdica.py:106-138):
 * given per-bin normalized amplitude envelopes P (n_bins, n_sources,
 * n_frames) and the ascending bin order, greedily accumulate a criterion
 * envelope and, per bin, brute-force all S! source permutations maximizing
 * the correlation with the accumulated criterion.
 *
 * The algorithm is inherently sequential over bins with a data-dependent
 * accumulator — a poor fit for the TPU but a perfect fit for native host
 * code (the device solvers hand off to this once per solve).
 *
 * Exported C ABI (ctypes):
 *   int solve_permutation(const double *P, const long *order,
 *                         long n_bins, long n_sources, long n_frames,
 *                         long *perms_out);
 * where perms_out (n_bins, n_sources) receives, for every bin (in original
 * bin indexing), the chosen source permutation (identity for the first bin
 * in `order`).  Returns 0 on success, -1 on unsupported n_sources (> 8).
 */

#include <string.h>

#define MAX_SOURCES 8

static void heap_permutations(long n, long *a, long *out, long *count) {
    /* iterative Heap's algorithm writing all n! permutations of a[0..n) */
    long c[MAX_SOURCES] = {0};
    memcpy(out + (*count) * n, a, n * sizeof(long));
    (*count)++;
    long i = 0;
    while (i < n) {
        if (c[i] < i) {
            long j = (i % 2 == 0) ? 0 : c[i];
            long tmp = a[j]; a[j] = a[i]; a[i] = tmp;
            memcpy(out + (*count) * n, a, n * sizeof(long));
            (*count)++;
            c[i]++;
            i = 0;
        } else {
            c[i] = 0;
            i++;
        }
    }
}

int solve_permutation(const double *P, const long *order,
                      long n_bins, long n_sources, long n_frames,
                      long *perms_out) {
    if (n_sources > MAX_SOURCES || n_sources < 1) return -1;

    long fact = 1;
    for (long k = 2; k <= n_sources; k++) fact *= k;

    long ident[MAX_SOURCES];
    for (long s = 0; s < n_sources; s++) ident[s] = s;

    /* all permutations, generated once */
    static long perm_buf[40320 * MAX_SOURCES]; /* 8! * 8 */
    long count = 0;
    long work[MAX_SOURCES];
    memcpy(work, ident, sizeof(ident));
    heap_permutations(n_sources, work, perm_buf, &count);

    /* criterion accumulator (n_sources, n_frames) */
    /* allocated by caller convention: use a local VLA-free heap-less scheme:
       caller guarantees n_frames reasonable; use static-limited stack? Use
       the output area? Simplest: criterion lives after perms in caller
       memory — instead allocate on stack up to a limit. */
    /* We avoid malloc for portability: criterion is written into a caller-
       provided scratch region appended to perms_out. */
    double *criteria = (double *)(perms_out + n_bins * n_sources);

    /* initialize criterion with the first bin in `order` (identity perm) */
    long f0 = order[0];
    for (long s = 0; s < n_sources; s++) {
        for (long t = 0; t < n_frames; t++) {
            criteria[s * n_frames + t] = P[(f0 * n_sources + s) * n_frames + t];
        }
        perms_out[f0 * n_sources + s] = s;
    }

    for (long idx = 1; idx < n_bins; idx++) {
        long f = order[idx];
        double best = -1.0;
        long best_p = 0;
        for (long p = 0; p < fact; p++) {
            const long *perm = perm_buf + p * n_sources;
            double score = 0.0;
            for (long s = 0; s < n_sources; s++) {
                const double *crit = criteria + s * n_frames;
                const double *row = P + (f * n_sources + perm[s]) * n_frames;
                for (long t = 0; t < n_frames; t++) score += crit[t] * row[t];
            }
            if (score > best) { best = score; best_p = p; }
        }
        const long *perm = perm_buf + best_p * n_sources;
        for (long s = 0; s < n_sources; s++) {
            const double *row = P + (f * n_sources + perm[s]) * n_frames;
            double *crit = criteria + s * n_frames;
            for (long t = 0; t < n_frames; t++) crit[t] += row[t];
            perms_out[f * n_sources + s] = perm[s];
        }
    }
    return 0;
}
