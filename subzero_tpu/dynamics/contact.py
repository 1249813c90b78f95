"""Narrow-phase contact forces: the batched equivalent of
``collisions/floe_interactions.m``.

Physics reproduced (file:line cites into /root/reference):

* Hertz-like spring constant ``Force_factor = E h1 h2 / (h1 r2 + h2 r1)``
  with r = sqrt(area) (floe_interactions.m:12); boundary contact uses
  ``E h1 / r1`` (:14).
* Normal force  = force_dir * overlap_area * Force_factor (:167), with the
  direction derived analytically from the overlap-boundary chord (see
  geometry/clip.py) instead of the reference's displace-and-reclip search
  (:139-165).
* Contact requires >= 2 boundary crossings (:71) and a contact length
  dl >= 0.1 m (:141), where dl = |chord| replaces the reference's mean
  region-edge length.
* Tangential force from the relative contact-point velocity
  ``force_t = -|v_t|^2 dl G dt * dir_t`` with shear modulus
  G = E/(2(1+nu)), nu=0.3, capped by Coulomb mu |Fn| with mu=0.2
  (:20-21, :169-183).
* Merge flags: overlap fraction > 0.55 of either floe's area marks the pair
  for fusion (:53-60); > 0.75 of a floe outside the domain marks absorption
  by the boundary (:35-40).
* Contact point = overlap-region centroid (:97,108); torque about each
  centroid = cross(p - r_i, F) (floe_interactions_all.m:227-231).

Aggregation delta (documented): one effective contact per floe pair (areas
summed, centroid area-weighted, chords summed) instead of one per disjoint
overlap region — exact for convex contacts, see geometry/clip.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..geometry.clip import _difference_one, _overlap_one
from .broadphase import NeighborTable


class PairContacts(NamedTuple):
    """Per-(floe, neighbor-slot) contact results, shapes [N, K] (+ trailing).

    fx, fy:    contact force on floe i from neighbor k
    px, py:    contact point (world frame of floe i)
    overlap:   overlap area of the pair
    merge_i:   floe i should be absorbed into neighbor (overlap frac > 0.55)
    merge_j:   neighbor should be absorbed into floe i
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    overlap: jnp.ndarray
    merge_i: jnp.ndarray
    merge_j: jnp.ndarray


class BoundaryContact(NamedTuple):
    """Per-floe contact with the domain boundary, shapes [N].

    absorb: floe is >75% outside the domain -> kill (floe_interactions.m:37-39)
    out:    centroid left the domain -> kill (floe_interactions_all.m:152-155)
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    overlap: jnp.ndarray
    absorb: jnp.ndarray
    out: jnp.ndarray


def _pair_force(
    verts_i, verts_j,           # [V,2] world-frame padded polygons
    ui, vi, ksi_i, xi, yi,      # floe i kinematics
    uj, vj, ksi_j, xj, yj,      # neighbor kinematics
    ff,                         # Force_factor for the pair
    area_i, area_j,
    shear_g, mu, dt,
    min_chord, merge_frac,
    dtype,
):
    """Contact force of one floe pair (both world-frame polygons)."""
    st = _overlap_one(verts_i, verts_j)
    ar = jnp.maximum(st.area, 0.0)

    chord = st.chord_p
    dl = jnp.sqrt(chord[0] ** 2 + chord[1] ** 2)
    # Overlap-reducing force direction on floe i (see geometry/clip.py).
    fdir = jnp.stack([-chord[1], chord[0]]) / jnp.where(dl > 0, dl, 1.0)

    # Validity: >=2 crossings, measurable chord, positive area
    # (floe_interactions.m:71,141).
    ok = (st.n_cross >= 2) & (dl >= min_chord) & (ar > 0)

    fn = fdir * ar * ff                                   # normal force

    # Tangential: relative velocity at the contact point (rigid-body).
    px, py = st.centroid[0], st.centroid[1]
    v1x = ui - ksi_i * (py - yi)
    v1y = vi + ksi_i * (px - xi)
    v2x = uj - ksi_j * (py - yj)
    v2y = vj + ksi_j * (px - xj)
    vtx = v1x - v2x
    vty = v1y - v2y
    vt = jnp.sqrt(vtx * vtx + vty * vty)
    tdirx = vtx / jnp.where(vt > 0, vt, 1.0)
    tdiry = vty / jnp.where(vt > 0, vt, 1.0)
    # force_t = -dot(dir_t, v_t) * dl * G * |v_t| * dir_t * dt
    #         = -|v_t|^2 dl G dt dir_t        (floe_interactions.m:178)
    ft_mag = vt * vt * dl * shear_g * dt
    fn_norm = ar * ff
    # Coulomb cap (floe_interactions.m:180-183).
    ft_mag = jnp.minimum(ft_mag, mu * fn_norm)
    ftx = -ft_mag * tdirx
    fty = -ft_mag * tdiry

    fx = jnp.where(ok, fn[0] + ftx, 0.0)
    fy = jnp.where(ok, fn[1] + fty, 0.0)

    # Merge flags (floe_interactions.m:53-60): overlap fraction tested even
    # when the contact force itself is invalid.
    touching = ar > 0
    merge_i = touching & (ar / area_i > merge_frac)
    merge_j = touching & (ar / area_j > merge_frac) & ~merge_i
    overlap = jnp.where(touching & ok, ar, 0.0)

    return (
        fx.astype(dtype), fy.astype(dtype),
        px.astype(dtype), py.astype(dtype),
        overlap.astype(dtype), merge_i, merge_j,
    )


def contact_forces(
    verts_world: jnp.ndarray,     # [N, V, 2]
    x, y, u, v, ksi,              # [N]
    h, area,                      # [N]
    nbr: NeighborTable,
    modulus: float,
    cfg: SimConfig,
    src: tuple | None = None,     # optional candidate-source arrays
) -> PairContacts:
    """Contact forces for every (floe, candidate) in the neighbor table.

    Each unordered pair appears twice (once per endpoint); antisymmetry of the
    chord guarantees Newton's third law without a symmetrization pass.

    ``src``: (verts_world_s, x_s, y_s, u_s, v_s, ksi_s, h_s, area_s) when
    the neighbor table indexes a different candidate set (spatial
    decomposition: local + ghost floes).
    """
    dtype = x.dtype
    n, k = nbr.idx.shape
    phys = cfg.physics
    dt = cfg.numerics.dt
    if src is None:
        verts_s, x_s, y_s, u_s, v_s, ksi_s, h_s, area_s = (
            verts_world, x, y, u, v, ksi, h, area)
    else:
        verts_s, x_s, y_s, u_s, v_s, ksi_s, h_s, area_s = src

    vj = verts_s[nbr.idx] + nbr.shift[:, :, None, :]      # [N, K, V, 2]
    vi = jnp.broadcast_to(verts_world[:, None], vj.shape)

    r = jnp.sqrt(area)
    r_src = jnp.sqrt(area_s)
    h_i = jnp.broadcast_to(h[:, None], (n, k))
    h_j = h_s[nbr.idx]
    r_i = jnp.broadcast_to(r[:, None], (n, k))
    r_j = r_src[nbr.idx]
    # Force_factor (floe_interactions.m:12); giant-floe special case (:15-18).
    ff = modulus * h_i * h_j / (h_i * r_j + h_j * r_i)
    giant = (r_i > 1e5) | (r_j > 1e5)
    r_min = jnp.minimum(r_i, r_j)
    h_min = jnp.minimum(h_i, h_j)
    ff = jnp.where(giant, modulus * h_min / r_min, ff)

    shear_g = modulus / (2.0 * (1.0 + phys.nu_poisson))

    pair = jax.vmap(jax.vmap(
        _pair_force,
        in_axes=(0, 0, None, None, None, None, None,
                 0, 0, 0, 0, 0, 0, None, 0, None, None, None, None, None, None),
    ), in_axes=(0, 0, 0, 0, 0, 0, 0,
                0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None, None, None))

    fx, fy, px, py, overlap, merge_i, merge_j = pair(
        vi, vj,
        u, v, ksi, x, y,
        u_s[nbr.idx], v_s[nbr.idx], ksi_s[nbr.idx],
        x_s[nbr.idx] + nbr.shift[..., 0], y_s[nbr.idx] + nbr.shift[..., 1],
        ff,
        area, area_s[nbr.idx],
        shear_g, phys.mu_friction, dt,
        cfg.contact.min_chord, cfg.contact.merge_overlap_frac,
        dtype,
    )

    valid = nbr.valid
    zero = jnp.zeros((), dtype)
    return PairContacts(
        fx=jnp.where(valid, fx, zero),
        fy=jnp.where(valid, fy, zero),
        px=px,
        py=py,
        overlap=jnp.where(valid, overlap, zero),
        merge_i=valid & merge_i,
        merge_j=valid & merge_j,
    )


def boundary_contact(
    verts_world: jnp.ndarray,      # [N, V, 2]
    x, y, u, v, ksi,               # [N]
    h, area, alive,                # [N]
    domain_verts: jnp.ndarray,     # [Vb, 2] CCW domain polygon
    modulus: float,
    cfg: SimConfig,
) -> BoundaryContact:
    """Floe-vs-domain-boundary contact (the reference's ``floebound`` path).

    The overlap region is the part of the floe OUTSIDE the domain polygon:
    ``polyclip(c1, c2, 'dif')`` (floe_interactions.m:34).  Force components
    normal to a wall the contact point sits on are kept; the tangential wall
    components are zeroed by the caller per the rectangular-wall rule
    (floe_interactions_all.m:157-166).
    """
    dtype = x.dtype
    phys = cfg.physics
    dt = cfg.numerics.dt
    r1 = jnp.sqrt(area)
    ff = modulus * h / r1                          # floe_interactions.m:14
    shear_g = modulus / (2.0 * (1.0 + phys.nu_poisson))

    def one(verts_i, xi, yi, ui, vi_, ksi_i, ff_i, area_i):
        st = _difference_one(verts_i, domain_verts)
        ar = jnp.maximum(st.area, 0.0)
        chord = st.chord_p
        dl = jnp.sqrt(chord[0] ** 2 + chord[1] ** 2)
        fdir = jnp.stack([-chord[1], chord[0]]) / jnp.where(dl > 0, dl, 1.0)
        ok = (st.n_cross >= 2) & (dl >= cfg.contact.min_chord) & (ar > 0)
        fn = fdir * ar * ff_i

        px, py = st.centroid[0], st.centroid[1]
        # Boundary is static: v2 = 0.
        vtx = ui - ksi_i * (py - yi)
        vty = vi_ + ksi_i * (px - xi)
        vt = jnp.sqrt(vtx * vtx + vty * vty)
        tdx = vtx / jnp.where(vt > 0, vt, 1.0)
        tdy = vty / jnp.where(vt > 0, vt, 1.0)
        ft = jnp.minimum(vt * vt * dl * shear_g * dt,
                         phys.mu_friction * ar * ff_i)
        fx = jnp.where(ok, fn[0] - ft * tdx, 0.0)
        fy = jnp.where(ok, fn[1] - ft * tdy, 0.0)
        absorb = ar / area_i > cfg.contact.boundary_overlap_frac
        return (fx.astype(dtype), fy.astype(dtype), px.astype(dtype),
                py.astype(dtype), jnp.where(ok, ar, 0.0).astype(dtype), absorb)

    fx, fy, px, py, overlap, absorb = jax.vmap(one)(
        verts_world, x, y, u, v, ksi, ff, area
    )

    # Centroid-outside-domain kill (floe_interactions_all.m:152-155).
    from ..geometry.polygon import points_in_polygon

    pts = jnp.stack([x, y], axis=-1)
    inside = points_in_polygon(pts[None], domain_verts)[0]
    out = alive & ~inside

    return BoundaryContact(
        fx=fx, fy=fy, px=px, py=py, overlap=overlap,
        absorb=alive & absorb, out=out,
    )
