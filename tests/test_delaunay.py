"""Native C++ Delaunay triangulator tests: structural validity, the Delaunay
empty-circumcircle property, agreement with scipy/Qhull, and degenerate
(grid/cocircular) inputs — the configurations pixel-grid features hit."""

import numpy as np
import pytest

from flame_tpu.mesh import delaunay


def check_valid(points, tri):
    """Structural checks on any triangulation output."""
    T = tri.triangles
    assert T.shape[1] == 3
    n = points.shape[0]
    assert T.min() >= 0 and T.max() < n

    # Positive signed area (canonical winding), no degenerate triangles.
    p = points[T]
    area2 = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
             - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0]))
    assert np.all(area2 > 0), f"bad winding: {np.sum(area2 <= 0)} triangles"

    # Euler relation for planar triangulations: E = T + (hull + interior
    # structure); check via unique-edge count from triangles.
    edges = set()
    for t in T:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.add((min(a, b), max(a, b)))
    assert len(edges) == tri.edges.shape[0]
    got_edges = {(min(a, b), max(a, b)) for a, b in tri.edges}
    assert got_edges == edges

    # Neighbor consistency: neighbors share exactly the opposite edge and
    # point back.
    for ti, t in enumerate(T):
        for e in range(3):
            nb = tri.neighbors[ti, e]
            if nb < 0:
                continue
            shared = {t[(e + 1) % 3], t[(e + 2) % 3]}
            nbv = set(T[nb])
            assert shared < nbv, f"tri {ti} edge {e} neighbor {nb} mismatch"
            assert ti in tri.neighbors[nb], "back-pointer missing"


def check_delaunay_property(points, tri, tol=1e-5):
    """No vertex strictly inside any triangle's circumcircle."""
    T = tri.triangles
    p = points.astype(np.float64)
    for t in T:
        a, b, c = p[t[0]], p[t[1]], p[t[2]]
        # Circumcenter.
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        if abs(d) < 1e-12:
            continue
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
              + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
              + (c @ c) * (b[0] - a[0])) / d
        center = np.array([ux, uy])
        r = np.linalg.norm(a - center)
        dists = np.linalg.norm(p - center, axis=1)
        inside = dists < r * (1 - tol) - tol
        inside[t] = False
        assert not inside.any(), f"point inside circumcircle of {t}"


def test_native_builds():
    assert delaunay.native_available(), "native triangulator failed to build"


def test_random_points_valid(rng):
    pts = rng.uniform(0, 640, size=(200, 2)).astype(np.float32)
    tri = delaunay.triangulate(pts)
    check_valid(pts, tri)
    check_delaunay_property(pts, tri)


def test_matches_scipy_on_generic_points(rng):
    """On points in general position the triangulation is unique: triangle
    sets must match Qhull exactly."""
    pts = rng.uniform(0, 500, size=(120, 2)).astype(np.float32)
    ours = delaunay.triangulate(pts)
    ref = delaunay._triangulate_scipy(pts)
    ours_set = {tuple(sorted(t)) for t in ours.triangles}
    ref_set = {tuple(sorted(t)) for t in ref.triangles}
    assert ours_set == ref_set


def test_grid_points_degenerate():
    """Regular pixel grid: maximally cocircular input must still produce a
    valid full triangulation (2*(n-1)^2 triangles for an n x n grid)."""
    n = 8
    xs, ys = np.meshgrid(np.arange(n) * 16.0, np.arange(n) * 16.0)
    pts = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    tri = delaunay.triangulate(pts)
    check_valid(pts, tri)
    assert tri.triangles.shape[0] == 2 * (n - 1) ** 2
    # Euler: E = 3*inner + hull; for grid: (n-1)*n*2 axis edges + (n-1)^2
    # diagonals = 2n(n-1) + (n-1)^2.
    assert tri.edges.shape[0] == 2 * n * (n - 1) + (n - 1) ** 2


def test_collinear_subsets(rng):
    """Many collinear points plus generic points."""
    line = np.stack([np.linspace(0, 100, 20), np.full(20, 50.0)], 1)
    extra = rng.uniform(0, 100, size=(30, 2))
    pts = np.concatenate([line, extra]).astype(np.float32)
    tri = delaunay.triangulate(pts)
    check_valid(pts, tri)


def test_minimal_input():
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [5.0, 8.0]], np.float32)
    tri = delaunay.triangulate(pts)
    assert tri.triangles.shape[0] == 1
    assert tri.edges.shape[0] == 3
    assert np.all(tri.neighbors[0] == -1)


def test_too_few_points_raises():
    with pytest.raises(ValueError):
        delaunay.triangulate(np.zeros((2, 2), np.float32))


def test_large_scale(rng):
    """Feature-scale input (4k points, the pipeline's capacity) runs and
    validates."""
    pts = rng.uniform(0, 640, size=(4096, 2)).astype(np.float32)
    tri = delaunay.triangulate(pts)
    check_valid(pts, tri)
    # ~2N triangles, ~3N edges for a Delaunay triangulation.
    assert tri.triangles.shape[0] > 1.8 * 4096
    assert tri.edges.shape[0] > 2.8 * 4096


def test_deterministic(rng):
    pts = rng.uniform(0, 640, size=(300, 2)).astype(np.float32)
    t1 = delaunay.triangulate(pts)
    t2 = delaunay.triangulate(pts)
    assert np.array_equal(t1.triangles, t2.triangles)
    assert np.array_equal(t1.edges, t2.edges)
