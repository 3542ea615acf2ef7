/* Native host-runtime kernels for plate_inverse_problem_tpu.
 *
 * The TPU owns the compute path (XLA); this C library owns the init-time
 * host runtime the reference implemented in C++ (jax_plate_lib — the
 * process-lifetime sparse-pattern registry and assembly plumbing,
 * InnerState.h:49-162).  Loaded via ctypes; numpy arrays pass as raw
 * pointers.  Pure C99, no Python API dependency.
 *
 * Kernels:
 *   pip_locate_points  — point-in-triangle location with a uniform-grid
 *                        spatial index (replaces an O(P*T) Python loop;
 *                        the analog of FreeFEM's interpolate() search).
 *   pip_coo_accumulate — scatter-add of element-matrix entries into flat
 *                        pattern slots (np.add.at is ~30x slower).
 *   pip_smoke          — 2x + sin(x) elementwise (the native smoke test,
 *                        counterpart of test_function.h:18-46).
 */
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* ---------------------------------------------------------------- */

EXPORT void pip_smoke(const double *x, double *y, int64_t n) {
    for (int64_t i = 0; i < n; ++i) y[i] = 2.0 * x[i] + sin(x[i]);
}

/* ---------------------------------------------------------------- */

EXPORT void pip_coo_accumulate(const int64_t *slots, const double *vals,
                               double *out, int64_t n_entries) {
    for (int64_t i = 0; i < n_entries; ++i) out[slots[i]] += vals[i];
}

/* ---------------------------------------------------------------- */
/* uniform-grid point location                                       */

typedef struct {
    double xmin, ymin, inv_hx, inv_hy;
    int nx, ny;
    int64_t *cell_start;  /* (nx*ny + 1) CSR offsets into cell_tris */
    int64_t *cell_tris;
} Grid;

static inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

/* Locate each query point: returns triangle index + barycentric coords.
 * Points outside every triangle get the least-negative-barycentric match
 * among grid-local candidates, falling back to a global scan. */
EXPORT void pip_locate_points(
    const double *nodes, int64_t n_nodes,
    const int32_t *tris, int64_t n_tris,
    const double *pts, int64_t n_pts,
    int32_t *out_tri, double *out_bary)
{
    (void)n_nodes;
    /* bounding box */
    double xmin = 1e300, xmax = -1e300, ymin = 1e300, ymax = -1e300;
    for (int64_t t = 0; t < n_tris; ++t) {
        for (int k = 0; k < 3; ++k) {
            const double *p = nodes + 2 * (int64_t)tris[3 * t + k];
            if (p[0] < xmin) xmin = p[0];
            if (p[0] > xmax) xmax = p[0];
            if (p[1] < ymin) ymin = p[1];
            if (p[1] > ymax) ymax = p[1];
        }
    }
    int g = (int)ceil(sqrt((double)n_tris));
    if (g < 1) g = 1;
    if (g > 512) g = 512;
    Grid grid;
    grid.nx = g; grid.ny = g;
    grid.xmin = xmin; grid.ymin = ymin;
    double hx = (xmax - xmin) / g, hy = (ymax - ymin) / g;
    if (hx <= 0) hx = 1.0;
    if (hy <= 0) hy = 1.0;
    grid.inv_hx = 1.0 / hx; grid.inv_hy = 1.0 / hy;

    /* count triangle-cell incidences (bbox overlap) */
    int64_t n_cells = (int64_t)g * g;
    int64_t *count = (int64_t *)calloc(n_cells + 1, sizeof(int64_t));
    int *t_lo = (int *)malloc(sizeof(int) * 4 * n_tris);
    for (int64_t t = 0; t < n_tris; ++t) {
        double tx0 = 1e300, tx1 = -1e300, ty0 = 1e300, ty1 = -1e300;
        for (int k = 0; k < 3; ++k) {
            const double *p = nodes + 2 * (int64_t)tris[3 * t + k];
            if (p[0] < tx0) tx0 = p[0];
            if (p[0] > tx1) tx1 = p[0];
            if (p[1] < ty0) ty0 = p[1];
            if (p[1] > ty1) ty1 = p[1];
        }
        int ix0 = clampi((int)((tx0 - xmin) * grid.inv_hx), 0, g - 1);
        int ix1 = clampi((int)((tx1 - xmin) * grid.inv_hx), 0, g - 1);
        int iy0 = clampi((int)((ty0 - ymin) * grid.inv_hy), 0, g - 1);
        int iy1 = clampi((int)((ty1 - ymin) * grid.inv_hy), 0, g - 1);
        t_lo[4 * t] = ix0; t_lo[4 * t + 1] = ix1;
        t_lo[4 * t + 2] = iy0; t_lo[4 * t + 3] = iy1;
        for (int ix = ix0; ix <= ix1; ++ix)
            for (int iy = iy0; iy <= iy1; ++iy)
                count[(int64_t)ix * g + iy + 1]++;
    }
    for (int64_t c = 0; c < n_cells; ++c) count[c + 1] += count[c];
    int64_t *cell_tris = (int64_t *)malloc(sizeof(int64_t) * count[n_cells]);
    int64_t *cursor = (int64_t *)malloc(sizeof(int64_t) * n_cells);
    memcpy(cursor, count, sizeof(int64_t) * n_cells);
    for (int64_t t = 0; t < n_tris; ++t) {
        for (int ix = t_lo[4 * t]; ix <= t_lo[4 * t + 1]; ++ix)
            for (int iy = t_lo[4 * t + 2]; iy <= t_lo[4 * t + 3]; ++iy)
                cell_tris[cursor[(int64_t)ix * g + iy]++] = t;
    }
    free(t_lo); free(cursor);
    grid.cell_start = count;
    grid.cell_tris = cell_tris;

    for (int64_t q = 0; q < n_pts; ++q) {
        double px = pts[2 * q], py = pts[2 * q + 1];
        int ix = clampi((int)((px - xmin) * grid.inv_hx), 0, g - 1);
        int iy = clampi((int)((py - ymin) * grid.inv_hy), 0, g - 1);

        double best = -1e300;
        int64_t best_t = 0;
        double best_l[3] = {0, 0, 0};
        int found = 0;

        for (int ring = 0; ring <= g && !found; ++ring) {
            int x0 = clampi(ix - ring, 0, g - 1), x1 = clampi(ix + ring, 0, g - 1);
            int y0 = clampi(iy - ring, 0, g - 1), y1 = clampi(iy + ring, 0, g - 1);
            for (int cx = x0; cx <= x1; ++cx)
                for (int cy = y0; cy <= y1; ++cy) {
                    /* only the new ring's cells */
                    if (ring > 0 && cx > x0 && cx < x1 && cy > y0 && cy < y1)
                        continue;
                    int64_t c = (int64_t)cx * g + cy;
                    for (int64_t s = grid.cell_start[c];
                         s < grid.cell_start[c + 1]; ++s) {
                        int64_t t = grid.cell_tris[s];
                        const double *a = nodes + 2 * (int64_t)tris[3 * t];
                        const double *b = nodes + 2 * (int64_t)tris[3 * t + 1];
                        const double *cc = nodes + 2 * (int64_t)tris[3 * t + 2];
                        double det = (b[0] - a[0]) * (cc[1] - a[1])
                                   - (b[1] - a[1]) * (cc[0] - a[0]);
                        if (det == 0.0) continue;
                        double l2 = ((px - a[0]) * (cc[1] - a[1])
                                   - (py - a[1]) * (cc[0] - a[0])) / det;
                        double l3 = ((b[0] - a[0]) * (py - a[1])
                                   - (b[1] - a[1]) * (px - a[0])) / det;
                        double l1 = 1.0 - l2 - l3;
                        double worst = l1 < l2 ? (l1 < l3 ? l1 : l3)
                                               : (l2 < l3 ? l2 : l3);
                        if (worst > best) {
                            best = worst;
                            best_t = t;
                            best_l[0] = l1; best_l[1] = l2; best_l[2] = l3;
                        }
                    }
                }
            if (best >= -1e-12) found = 1;  /* inside (tolerance) */
        }

        /* clip negatives and renormalize (matches mesh.locate semantics) */
        double s = 0;
        for (int k = 0; k < 3; ++k) {
            if (best_l[k] < 0) best_l[k] = 0;
            s += best_l[k];
        }
        if (s <= 0) { best_l[0] = 1; s = 1; }
        out_tri[q] = (int32_t)best_t;
        for (int k = 0; k < 3; ++k) out_bary[3 * q + k] = best_l[k] / s;
    }

    free(grid.cell_start);
    free(grid.cell_tris);
}
