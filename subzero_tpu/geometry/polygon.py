"""Batched padded-polygon primitives (pure jnp, vmap/jit friendly).

Convention
----------
A polygon is an array ``verts[..., V, 2]`` of CCW-ordered vertices together
with a valid count ``nv``.  Slots ``nv:`` are *padded with the first vertex*
(``verts[..., k, :] = verts[..., 0, :]`` for ``k >= nv``).  With this
convention the edge list ``(verts[k], verts[(k+1) % V])`` automatically

* closes the polygon at edge ``nv-1`` (last valid vertex -> first vertex), and
* degenerates to zero-length edges for all padded slots, which contribute
  exactly nothing to any boundary integral (area, centroid, moments, winding
  numbers, clip integrals).

This replaces the reference's variable-length MATLAB contours (``c0`` /
``c_alpha`` in ``Initialize_Model/initialize_floe_values.m:12-52``) with a
fixed-shape layout the XLA/TPU compiler can tile.

These routines mirror the math of the reference's polygon library
(``polygon_operations/PolygonMoments.m``, ``polygon_operations/inpolygon.m``,
``polygon_operations/polyangles.m``) but are written as batched tensor ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pad_polygon",
    "pad_polygons",
    "poly_edges",
    "poly_area",
    "poly_centroid",
    "poly_moments",
    "poly_inertia_z",
    "poly_rmax",
    "poly_angles",
    "points_in_polygon",
    "apply_padding",
]


# ---------------------------------------------------------------------------
# Host-side construction helpers
# ---------------------------------------------------------------------------

def pad_polygon(verts: np.ndarray, v_max: int) -> tuple[np.ndarray, int]:
    """Pad one ``[n, 2]`` CCW vertex array to ``[v_max, 2]`` (pad = vertex 0).

    Drops a duplicated closing vertex if present and enforces CCW order.
    """
    verts = np.asarray(verts, dtype=np.float64)
    if verts.ndim != 2 or verts.shape[1] != 2:
        raise ValueError(f"expected [n,2] vertex array, got {verts.shape}")
    # Drop duplicate closing vertex.
    if len(verts) > 1 and np.allclose(verts[0], verts[-1]):
        verts = verts[:-1]
    # Enforce CCW.
    x, y = verts[:, 0], verts[:, 1]
    signed = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    if signed < 0:
        verts = verts[::-1]
    n = len(verts)
    if n > v_max:
        raise ValueError(f"polygon has {n} vertices > capacity {v_max}")
    out = np.empty((v_max, 2), dtype=np.float64)
    out[:n] = verts
    out[n:] = verts[0]
    return out, n


def pad_polygons(polys: list[np.ndarray], v_max: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of polygons to ``[N, v_max, 2]`` + counts ``[N]``."""
    out = np.zeros((len(polys), v_max, 2), dtype=np.float64)
    nv = np.zeros((len(polys),), dtype=np.int32)
    for i, p in enumerate(polys):
        out[i], nv[i] = pad_polygon(p, v_max)
    return out, nv


def apply_padding(verts: jnp.ndarray, nv: jnp.ndarray) -> jnp.ndarray:
    """Re-apply the pad-with-first-vertex convention on device.

    ``verts[..., V, 2]``, ``nv[...]`` -> padded verts.  Used after on-device
    vertex edits (e.g. rotation writes every slot, which is fine, but slot
    surgery in lifecycle ops must re-pad).
    """
    v = verts.shape[-2]
    idx = jax.lax.broadcasted_iota(jnp.int32, verts.shape[:-1], verts.ndim - 2)
    mask = idx < nv[..., None]
    first = verts[..., 0:1, :]
    return jnp.where(mask[..., None], verts, first)


# ---------------------------------------------------------------------------
# Boundary-integral properties (Green's theorem)
# ---------------------------------------------------------------------------

def poly_edges(verts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Edge endpoints ``(p0, p1)`` with wraparound; padded edges are 0-length."""
    return verts, jnp.roll(verts, -1, axis=-2)


def _cross_z(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def poly_area(verts: jnp.ndarray) -> jnp.ndarray:
    """Signed area (positive for CCW).  Shoelace over padded edges."""
    p0, p1 = poly_edges(verts)
    return 0.5 * jnp.sum(_cross_z(p0, p1), axis=-1)


def poly_centroid(verts: jnp.ndarray) -> jnp.ndarray:
    """Area centroid ``[..., 2]``.  Falls back to vertex 0 for ~zero area."""
    p0, p1 = poly_edges(verts)
    w = _cross_z(p0, p1)
    a = 0.5 * jnp.sum(w, axis=-1)
    cx = jnp.sum(w * (p0[..., 0] + p1[..., 0]), axis=-1) / 6.0
    cy = jnp.sum(w * (p0[..., 1] + p1[..., 1]), axis=-1) / 6.0
    safe = jnp.where(jnp.abs(a) > 1e-12, a, 1.0)
    c = jnp.stack([cx, cy], axis=-1) / safe[..., None]
    return jnp.where((jnp.abs(a) > 1e-12)[..., None], c, verts[..., 0, :])


def poly_moments(verts: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Area moments about the coordinate origin (PolygonMoments.m math).

    Returns dict with ``area, max (M_Ax), may (M_Ay), ixx, iyy, ixy``.
    """
    p0, p1 = poly_edges(verts)
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    w = x0 * y1 - x1 * y0
    area = 0.5 * jnp.sum(w, axis=-1)
    max_ = jnp.sum(w * (y0 + y1), axis=-1) / 6.0
    may_ = jnp.sum(w * (x0 + x1), axis=-1) / 6.0
    ixx = jnp.sum(w * ((y0 + y1) ** 2 - y0 * y1), axis=-1) / 12.0
    iyy = jnp.sum(w * ((x0 + x1) ** 2 - x0 * x1), axis=-1) / 12.0
    ixy = jnp.sum(w * ((x0 + x1) * (y0 + y1) + x0 * y0 + x1 * y1), axis=-1) / 24.0
    return {"area": area, "max": max_, "may": may_, "ixx": ixx, "iyy": iyy, "ixy": ixy}


def poly_inertia_z(verts: jnp.ndarray, h: jnp.ndarray, rho_ice: float = 920.0) -> jnp.ndarray:
    """Polar moment of inertia ``Izz = |Ixx+Iyy| * h * rho_ice``.

    Matches ``PolygonMoments(xy, h)`` (PolygonMoments.m:29-32); ``verts`` must
    be in the body frame (relative to centroid), as the reference passes
    ``c0`` (initialize_floe_values.m:19).
    """
    m = poly_moments(verts)
    return jnp.abs(m["ixx"] + m["iyy"]) * h * rho_ice


def poly_rmax(verts: jnp.ndarray, center: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max distance from ``center`` (default origin) to any vertex."""
    if center is not None:
        verts = verts - center[..., None, :]
    return jnp.sqrt(jnp.max(jnp.sum(verts**2, axis=-1), axis=-1))


def poly_angles(verts: jnp.ndarray, nv: jnp.ndarray) -> jnp.ndarray:
    """Interior vertex angles in degrees, concavity-corrected ``[..., V]``.

    For a CCW polygon the interior angle at v is the angle from (next-v) to
    (prev-v) measured CCW, in (0, 360).  Mirrors polygon_operations/
    polyangles.m:40-54.  Padded slots return 0.
    """
    v = verts.shape[-2]
    idx = jnp.arange(v)
    prev_i = jnp.where(idx == 0, nv[..., None] - 1, idx - 1)
    next_i = jnp.where(idx == nv[..., None] - 1, 0, idx + 1)
    prev = jnp.take_along_axis(verts, prev_i[..., None].astype(jnp.int32), axis=-2)
    nxt = jnp.take_along_axis(verts, next_i[..., None].astype(jnp.int32), axis=-2)
    e1 = nxt - verts   # edge to next vertex
    e2 = prev - verts  # edge to previous vertex
    ang = jnp.arctan2(_cross_z(e1, e2), jnp.sum(e1 * e2, axis=-1))
    ang = jnp.where(ang < 0, ang + 2 * jnp.pi, ang) * (180.0 / jnp.pi)
    valid = idx < nv[..., None]
    return jnp.where(valid, ang, 0.0)


# ---------------------------------------------------------------------------
# Point-in-polygon
# ---------------------------------------------------------------------------

def points_in_polygon(points: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """Even-odd (crossing-number) point-in-polygon test.

    ``points[..., P, 2]`` vs ``verts[..., V, 2]`` -> bool ``[..., P]``.
    Batched equivalent of polygon_operations/inpolygon.m as used for the
    Monte-Carlo masks (initialize_floe_values.m:33).

    Uses the standard upward/downward crossing rule which is consistent for
    shared vertices; zero-length (padded) edges never cross.
    """
    p0, p1 = poly_edges(verts)
    px = points[..., :, None, 0]
    py = points[..., :, None, 1]
    x0, y0 = p0[..., None, :, 0], p0[..., None, :, 1]
    x1, y1 = p1[..., None, :, 0], p1[..., None, :, 1]
    # Edge straddles the horizontal ray through py (half-open rule).
    cond = (y0 > py) != (y1 > py)
    # x coordinate of edge at height py.
    t = (py - y0) / jnp.where(y1 == y0, 1.0, y1 - y0)
    xint = x0 + t * (x1 - x0)
    crossings = jnp.sum((cond & (px < xint)).astype(jnp.int32), axis=-1)
    return (crossings % 2) == 1
