"""Host-side numpy geometry oracles for testing the device kernels.

Independent implementations (Sutherland–Hodgman convex clipping, shoelace,
Monte-Carlo areas) used to validate ``subzero_tpu.geometry`` — the same role
the Clipper MEX smoke test plays in the reference (``private/clipper_test.m``).
"""

from __future__ import annotations

import numpy as np


def shoelace(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def centroid(poly: np.ndarray) -> np.ndarray:
    x, y = poly[:, 0], poly[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    w = x * yn - xn * y
    a = 0.5 * np.sum(w)
    cx = np.sum(w * (x + xn)) / (6.0 * a)
    cy = np.sum(w * (y + yn)) / (6.0 * a)
    return np.array([cx, cy])


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: subject polygon clipped by a CONVEX CCW clip
    polygon.  Returns the (possibly empty) result vertex array."""
    out = list(map(np.asarray, subject))
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        inp, out = out, []
        if not inp:
            break

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= 0

        def intersect(p, q):
            d = q - p
            denom = edge[0] * d[1] - edge[1] * d[0]
            t = (edge[0] * (a[1] - p[1]) - edge[1] * (a[0] - p[0])) / denom
            return p + t * d

        for j in range(len(inp)):
            cur, nxt = inp[j], inp[(j + 1) % len(inp)]
            if inside(cur):
                out.append(cur)
                if not inside(nxt):
                    out.append(intersect(cur, nxt))
            elif inside(nxt):
                out.append(intersect(cur, nxt))
    return np.array(out) if out else np.zeros((0, 2))


def convex_intersection_area(p: np.ndarray, q: np.ndarray) -> float:
    r = clip_convex(p, q)
    return abs(shoelace(r)) if len(r) >= 3 else 0.0


def points_in_poly_np(pts: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Crossing-number point-in-polygon (matplotlib-free, vectorized)."""
    x, y = pts[:, 0:1], pts[:, 1:2]
    x0, y0 = poly[None, :, 0], poly[None, :, 1]
    x1, y1 = np.roll(poly[:, 0], -1)[None], np.roll(poly[:, 1], -1)[None]
    cond = (y0 > y) != (y1 > y)
    denom = np.where(y1 == y0, 1.0, y1 - y0)
    xint = x0 + (y - y0) / denom * (x1 - x0)
    return (np.sum(cond & (x < xint), axis=1) % 2) == 1


def mc_area(region_test, lo, hi, n=400_000, seed=0) -> float:
    """Monte-Carlo area of {p in [lo,hi]^2 : region_test(p)}."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(lo, hi, size=(n, 2))
    frac = np.mean(region_test(pts))
    return float(frac * (hi - lo) ** 2)


def random_convex(rng, n=8, radius=1.0, center=(0.0, 0.0)) -> np.ndarray:
    """Random convex CCW polygon: sorted angles on a random-radius star."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = radius * rng.uniform(0.5, 1.0, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1) + np.asarray(center)
    # convex hull of the star to guarantee convexity
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    return pts[hull.vertices]
