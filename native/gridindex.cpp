// Native grid index for host-side point-cloud preprocessing.
//
// Replaces the reference's per-point Python loop over sklearn KD-tree radius
// queries for z-normalization (reference utils/load_data.py:237-249, hot
// loop #2 in SURVEY.md §3.5) and the scipy cKDTree disk queries used for
// parcel->plot extraction (prepare.py:76, inference/prepare_utils.py:47-53).
//
// Algorithm: uniform hash grid with cell size == query radius. For each
// query, visit the 3x3 neighborhood of cells and test exact distances.
// OpenMP-parallel over points/queries. Exact (no approximation): results
// match the brute-force oracle bit-for-bit on the min-z path.
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)
// Python binding: ctypes (stratanet2_tpu/data/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Grid {
  double x0, y0, inv_cell;
  double cell;  // stored so rect-pruning uses the SAME size the grid was built with
  int ncx, ncy;
  std::vector<int32_t> cell_start;  // CSR offsets, size ncx*ncy+1
  std::vector<int32_t> order;       // point ids sorted by cell

  Grid(const double* xy, int64_t n, double cell) {
    double xmin = 1e300, ymin = 1e300, xmax = -1e300, ymax = -1e300;
    for (int64_t i = 0; i < n; ++i) {
      xmin = std::min(xmin, xy[2 * i]);
      xmax = std::max(xmax, xy[2 * i]);
      ymin = std::min(ymin, xy[2 * i + 1]);
      ymax = std::max(ymax, xy[2 * i + 1]);
    }
    x0 = xmin;
    y0 = ymin;
    this->cell = cell;
    inv_cell = 1.0 / cell;
    ncx = std::max(1, (int)std::floor((xmax - xmin) * inv_cell) + 1);
    ncy = std::max(1, (int)std::floor((ymax - ymin) * inv_cell) + 1);

    std::vector<int32_t> counts((size_t)ncx * ncy + 1, 0);
    std::vector<int32_t> cid(n);
    for (int64_t i = 0; i < n; ++i) {
      int cx = (int)((xy[2 * i] - x0) * inv_cell);
      int cy = (int)((xy[2 * i + 1] - y0) * inv_cell);
      cx = std::min(std::max(cx, 0), ncx - 1);
      cy = std::min(std::max(cy, 0), ncy - 1);
      cid[i] = cx * ncy + cy;
      counts[cid[i] + 1]++;
    }
    for (size_t c = 1; c < counts.size(); ++c) counts[c] += counts[c - 1];
    cell_start = counts;
    order.resize(n);
    std::vector<int32_t> cursor(cell_start.begin(), cell_start.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[cid[i]]++] = (int32_t)i;
  }

  inline int cx_of(double x) const {
    return std::min(std::max((int)((x - x0) * inv_cell), 0), ncx - 1);
  }
  inline int cy_of(double y) const {
    return std::min(std::max((int)((y - y0) * inv_cell), 0), ncy - 1);
  }
};

// Squared distance from (xi, yi) to the nearest/farthest point of the cell
// rectangle [cx0, cx0+cell] x [cy0, cy0+cell].
inline void cell_dist2_bounds(double xi, double yi, double cx0, double cy0,
                              double cell, double* dmin2, double* dmax2) {
  const double cx1 = cx0 + cell, cy1 = cy0 + cell;
  const double dxn = std::max(std::max(cx0 - xi, xi - cx1), 0.0);
  const double dyn = std::max(std::max(cy0 - yi, yi - cy1), 0.0);
  const double dxf = std::max(xi - cx0, cx1 - xi);
  const double dyf = std::max(yi - cy0, cy1 - yi);
  *dmin2 = dxn * dxn + dyn * dyn;
  *dmax2 = dxf * dxf + dyf * dyf;
}

}  // namespace

extern "C" {

// out[i] = min z among points within `radius` of point i in xy (incl. itself).
void minz_in_radius(const double* xy, const double* z, int64_t n,
                    double radius, double* out) {
  if (n == 0) return;
  Grid grid(xy, n, radius);
  const double r2 = radius * radius;
  const double cell = grid.cell;

  // Per-cell min z: lets a query (a) skip whole cells that cannot improve
  // its running best and (b) absorb fully-inside cells in O(1). Exactness
  // is unchanged — cells are only skipped when provably irrelevant (their
  // nearest corner is outside the radius, or their global min z is already
  // >= the running best) and only absorbed when every point is provably
  // inside the radius. ~5-10x on dense lidar plots (ground points give an
  // early low `best` that prunes nearly all per-point scans).
  std::vector<double> cellminz((size_t)grid.ncx * grid.ncy, 1e300);
  for (size_t c = 0; c < cellminz.size(); ++c) {
    for (int32_t s = grid.cell_start[c]; s < grid.cell_start[c + 1]; ++s)
      cellminz[c] = std::min(cellminz[c], z[grid.order[s]]);
  }

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double xi = xy[2 * i], yi = xy[2 * i + 1];
    const int cx = grid.cx_of(xi), cy = grid.cy_of(yi);
    double best = z[i];
    // Center cell first: it usually sets a tight `best` that prunes the
    // 8 neighbors via their cellminz.
    for (int ring = 0; ring < 9; ++ring) {
      static const int offs[9][2] = {{0, 0},  {-1, 0}, {1, 0},  {0, -1},
                                     {0, 1},  {-1, -1}, {-1, 1}, {1, -1},
                                     {1, 1}};
      const int gx = cx + offs[ring][0], gy = cy + offs[ring][1];
      if (gx < 0 || gx >= grid.ncx || gy < 0 || gy >= grid.ncy) continue;
      const int c = gx * grid.ncy + gy;
      if (cellminz[c] >= best) continue;
      double dmin2, dmax2;
      cell_dist2_bounds(xi, yi, grid.x0 + gx * cell, grid.y0 + gy * cell,
                        cell, &dmin2, &dmax2);
      if (dmin2 > r2) continue;
      if (dmax2 <= r2) {  // whole cell inside the disk
        best = cellminz[c];
        continue;
      }
      for (int32_t s = grid.cell_start[c]; s < grid.cell_start[c + 1]; ++s) {
        const int32_t j = grid.order[s];
        if (z[j] >= best) continue;  // cheaper test first
        const double ddx = xy[2 * j] - xi, ddy = xy[2 * j + 1] - yi;
        if (ddx * ddx + ddy * ddy <= r2) best = z[j];
      }
    }
    out[i] = best;
  }
}

// Phase 1 of a CSR disk query: counts[q] = number of points within radius of
// center q. Cell size of the grid equals the radius, so candidates live in
// the ceil(r/cell)+1 = 2-cell neighborhood.
void disk_query_count(const double* xy, int64_t n, const double* centers,
                      int64_t m, double radius, int64_t* counts) {
  if (n == 0) {
    std::memset(counts, 0, sizeof(int64_t) * m);
    return;
  }
  Grid grid(xy, n, radius);
  const double r2 = radius * radius;
  const double cell = grid.cell;
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < m; ++q) {
    const double xq = centers[2 * q], yq = centers[2 * q + 1];
    int64_t cnt = 0;
    const int cx0 = (int)std::floor((xq - radius - grid.x0) * grid.inv_cell);
    const int cx1 = (int)std::floor((xq + radius - grid.x0) * grid.inv_cell);
    const int cy0 = (int)std::floor((yq - radius - grid.y0) * grid.inv_cell);
    const int cy1 = (int)std::floor((yq + radius - grid.y0) * grid.inv_cell);
    for (int gx = std::max(cx0, 0); gx <= std::min(cx1, grid.ncx - 1); ++gx)
      for (int gy = std::max(cy0, 0); gy <= std::min(cy1, grid.ncy - 1); ++gy) {
        const int c = gx * grid.ncy + gy;
        double dmin2, dmax2;
        cell_dist2_bounds(xq, yq, grid.x0 + gx * cell, grid.y0 + gy * cell,
                          cell, &dmin2, &dmax2);
        if (dmin2 > r2) continue;
        if (dmax2 <= r2) {  // whole cell inside: count without testing
          cnt += grid.cell_start[c + 1] - grid.cell_start[c];
          continue;
        }
        for (int32_t s = grid.cell_start[c]; s < grid.cell_start[c + 1]; ++s) {
          const int32_t j = grid.order[s];
          const double ddx = xy[2 * j] - xq, ddy = xy[2 * j + 1] - yq;
          if (ddx * ddx + ddy * ddy <= r2) ++cnt;
        }
      }
    counts[q] = cnt;
  }
}

// Phase 2: fill point indices per query into `out` at CSR offsets.
void disk_query_fill(const double* xy, int64_t n, const double* centers,
                     int64_t m, double radius, const int64_t* offsets,
                     int32_t* out) {
  if (n == 0) return;
  Grid grid(xy, n, radius);
  const double r2 = radius * radius;
  const double cell = grid.cell;
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < m; ++q) {
    const double xq = centers[2 * q], yq = centers[2 * q + 1];
    int64_t w = offsets[q];
    const int cx0 = (int)std::floor((xq - radius - grid.x0) * grid.inv_cell);
    const int cx1 = (int)std::floor((xq + radius - grid.x0) * grid.inv_cell);
    const int cy0 = (int)std::floor((yq - radius - grid.y0) * grid.inv_cell);
    const int cy1 = (int)std::floor((yq + radius - grid.y0) * grid.inv_cell);
    for (int gx = std::max(cx0, 0); gx <= std::min(cx1, grid.ncx - 1); ++gx)
      for (int gy = std::max(cy0, 0); gy <= std::min(cy1, grid.ncy - 1); ++gy) {
        const int c = gx * grid.ncy + gy;
        double dmin2, dmax2;
        cell_dist2_bounds(xq, yq, grid.x0 + gx * cell, grid.y0 + gy * cell,
                          cell, &dmin2, &dmax2);
        if (dmin2 > r2) continue;
        if (dmax2 <= r2) {  // whole cell inside: bulk-copy its point ids
          for (int32_t s = grid.cell_start[c]; s < grid.cell_start[c + 1]; ++s)
            out[w++] = grid.order[s];
          continue;
        }
        for (int32_t s = grid.cell_start[c]; s < grid.cell_start[c + 1]; ++s) {
          const int32_t j = grid.order[s];
          const double ddx = xy[2 * j] - xq, ddy = xy[2 * j + 1] - yq;
          if (ddx * ddx + ddy * ddy <= r2) out[w++] = j;
        }
      }
  }
}

}  // extern "C"
