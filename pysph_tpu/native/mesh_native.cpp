// Native mesh -> particle helpers (the runtime analog of the
// reference's Cython tools/mesh_tools.pyx): triangle-surface point
// sampling and exact ray-parity interior voxel fill.  Compiled on
// first use by pysph_tpu/native/__init__.py (g++ -O3 -shared) and
// bound with ctypes; pysph_tpu/tools/mesh_tools.py falls back to the
// pure-numpy path when no compiler is available.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Sample one triangle at spacing ~dx with a barycentric lattice
// (matches the Python _triangle_points layout: rows of constant u).
static int64_t sample_triangle(const double *p0, const double *p1,
                               const double *p2, double dx,
                               double *out, int64_t max_out,
                               int64_t n_written) {
    double a = 0.0, b = 0.0;
    for (int d = 0; d < 3; ++d) {
        a += (p1[d] - p0[d]) * (p1[d] - p0[d]);
        b += (p2[d] - p0[d]) * (p2[d] - p0[d]);
    }
    a = std::sqrt(a);
    b = std::sqrt(b);
    int n = (int)std::ceil(std::max(a, b) / dx);
    if (n < 1) n = 1;
    for (int i = 0; i <= n; ++i) {
        double u = (double)i / n;
        int m = n - i;
        for (int j = 0; j <= (m == 0 ? 0 : m); ++j) {
            double v = (m == 0) ? 0.0 : (1.0 - u) * j / m;
            if (n_written >= max_out) return -1;
            for (int d = 0; d < 3; ++d)
                out[3 * n_written + d] =
                    p0[d] + u * (p1[d] - p0[d]) + v * (p2[d] - p0[d]);
            ++n_written;
        }
    }
    return n_written;
}

// Sample every non-degenerate triangle of the mesh.  Returns the
// number of points written, or -1 if max_out was too small.
int64_t surface_points(const double *verts, int64_t n_verts,
                       const int64_t *tris, int64_t n_tris,
                       double dx, double *out, int64_t max_out) {
    (void)n_verts;
    int64_t n_written = 0;
    for (int64_t t = 0; t < n_tris; ++t) {
        const double *p0 = verts + 3 * tris[3 * t + 0];
        const double *p1 = verts + 3 * tris[3 * t + 1];
        const double *p2 = verts + 3 * tris[3 * t + 2];
        double ux = p1[0] - p0[0], uy = p1[1] - p0[1],
               uz = p1[2] - p0[2];
        double vx = p2[0] - p0[0], vy = p2[1] - p0[1],
               vz = p2[2] - p0[2];
        double cx = uy * vz - uz * vy;
        double cy = uz * vx - ux * vz;
        double cz = ux * vy - uy * vx;
        double area2 = cx * cx + cy * cy + cz * cz;
        if (area2 < 1e-60) continue;
        n_written = sample_triangle(p0, p1, p2, dx, out, max_out,
                                    n_written);
        if (n_written < 0) return -1;
    }
    return n_written;
}

// Exact interior fill: cast a +z ray through every (x, y) lattice
// column, collect triangle crossings, and emit lattice points between
// odd/even crossing pairs.  Returns points written or -1 on overflow.
int64_t fill_volume(const double *verts, int64_t n_verts,
                    const int64_t *tris, int64_t n_tris, double dx,
                    double xmin, double xmax, double ymin,
                    double ymax, double zmin, double zmax,
                    double *out, int64_t max_out) {
    (void)n_verts;
    int nx = (int)std::floor((xmax - xmin) / dx) + 1;
    int ny = (int)std::floor((ymax - ymin) / dx) + 1;
    std::vector<std::vector<double>> hits((size_t)nx * ny);
    const double eps = 1e-12;
    for (int64_t t = 0; t < n_tris; ++t) {
        const double *p0 = verts + 3 * tris[3 * t + 0];
        const double *p1 = verts + 3 * tris[3 * t + 1];
        const double *p2 = verts + 3 * tris[3 * t + 2];
        double txmin = std::min(p0[0], std::min(p1[0], p2[0]));
        double txmax = std::max(p0[0], std::max(p1[0], p2[0]));
        double tymin = std::min(p0[1], std::min(p1[1], p2[1]));
        double tymax = std::max(p0[1], std::max(p1[1], p2[1]));
        int i0 = std::max(0, (int)std::ceil((txmin - xmin) / dx));
        int i1 = std::min(nx - 1,
                          (int)std::floor((txmax - xmin) / dx));
        int j0 = std::max(0, (int)std::ceil((tymin - ymin) / dx));
        int j1 = std::min(ny - 1,
                          (int)std::floor((tymax - ymin) / dx));
        // 2D (x, y) barycentric solve per column
        double ax = p1[0] - p0[0], ay = p1[1] - p0[1];
        double bx = p2[0] - p0[0], by = p2[1] - p0[1];
        double det = ax * by - ay * bx;
        if (std::fabs(det) < 1e-30) continue;  // z-parallel triangle
        for (int i = i0; i <= i1; ++i) {
            double px = xmin + i * dx - p0[0];
            for (int j = j0; j <= j1; ++j) {
                double py = ymin + j * dx - p0[1];
                double u = (px * by - py * bx) / det;
                double v = (ax * py - ay * px) / det;
                if (u < -eps || v < -eps || u + v > 1.0 + eps)
                    continue;
                double z = p0[2] + u * (p1[2] - p0[2]) +
                           v * (p2[2] - p0[2]);
                hits[(size_t)i * ny + j].push_back(z);
            }
        }
    }
    int64_t n_written = 0;
    for (int i = 0; i < nx; ++i) {
        for (int j = 0; j < ny; ++j) {
            std::vector<double> &h = hits[(size_t)i * ny + j];
            if (h.size() < 2) continue;
            std::sort(h.begin(), h.end());
            // dedupe near-equal crossings (shared edges)
            std::vector<double> u;
            for (double z : h)
                if (u.empty() || z - u.back() > 1e-9 * (1.0 +
                                                        std::fabs(z)))
                    u.push_back(z);
            for (size_t k = 0; k + 1 < u.size(); k += 2) {
                int k0 = (int)std::ceil((u[k] - zmin) / dx);
                int k1 = (int)std::floor((u[k + 1] - zmin) / dx);
                for (int kk = std::max(0, k0); kk <= k1; ++kk) {
                    double z = zmin + kk * dx;
                    if (z > zmax) break;
                    if (n_written >= max_out) return -1;
                    out[3 * n_written + 0] = xmin + i * dx;
                    out[3 * n_written + 1] = ymin + j * dx;
                    out[3 * n_written + 2] = z;
                    ++n_written;
                }
            }
        }
    }
    return n_written;
}

}  // extern "C"
