"""Fixed-capacity SoA floe state — the TPU-native replacement for the
reference's ``Floe`` struct array.

The reference keeps one MATLAB struct per floe (schema defined at
``Initialize_Model/initialize_floe_values.m:12-52``) and grows/shrinks the
array on fracture/weld/kill.  Here the whole population lives in a single
pytree of ``[N, ...]`` arrays with an ``alive`` mask; birth/death is slot
allocation under mask (SURVEY.md section 7, design delta #1).  Every array is
static-shaped so the full physics step jits once.

Slots ``[0, n_boundary)`` are immovable boundary/topography floes (the
reference's ``Nb`` convention, ``Subzero.m:59-66``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig
from .geometry.polygon import pad_polygon


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FloeState:
    """SoA floe population, shapes ``[N]`` / ``[N, V, 2]`` / etc.

    Mirrors the reference floe schema (initialize_floe_values.m:12-52):

      verts_body  [N,V,2]  c0: body-frame boundary about centroid (unrotated)
      nv          [N]      valid vertex count (padding = vertex 0)
      x, y        [N]      Xi, Yi centroid position
      alpha       [N]      alpha_i rotation angle
      u, v        [N]      Ui, Vi velocity
      ksi         [N]      ksi_ice angular velocity
      h           [N]      thickness
      mass        [N]      mass
      inertia     [N]      inertia_moment (polar, about centroid)
      area        [N]      polygon area
      rmax        [N]      bounding radius
      dx_p..dksi_p [N]     Adams-Bashforth-2 predecessor tendencies
                           (dXi_p, dYi_p, dalpha_i_p, dUi_p, dVi_p, dksi_ice_p)
      mc_xy       [N,P,2]  Monte-Carlo sample points (body frame, unrotated
                           bounding square of radius rmax)
      mc_in       [N,P]    inpolygon mask of the samples ('A')
      fx_oa,fy_oa,tq_oa [N] cached ocean/atm force+torque per unit area
                           (FxOA/FyOA/torqueOA, refreshed every doInt.step)
      stress_hist [N,W,3]  stress ring buffer (xx, yy, xy of symmetric 2x2)
      stress      [N,3]    mean of stress_hist (the floe 'Stress')
      strain      [N,3]    boundary-integral strain tensor
      overlap_area[N]      total contact overlap area this step ('OverlapArea')
      alive       [N]      liveness mask (bool)
    """

    verts_body: jnp.ndarray
    nv: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    alpha: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    ksi: jnp.ndarray
    h: jnp.ndarray
    mass: jnp.ndarray
    inertia: jnp.ndarray
    area: jnp.ndarray
    rmax: jnp.ndarray
    dx_p: jnp.ndarray
    dy_p: jnp.ndarray
    dalpha_p: jnp.ndarray
    du_p: jnp.ndarray
    dv_p: jnp.ndarray
    dksi_p: jnp.ndarray
    mc_xy: jnp.ndarray
    mc_in: jnp.ndarray
    fx_oa: jnp.ndarray
    fy_oa: jnp.ndarray
    tq_oa: jnp.ndarray
    stress_hist: jnp.ndarray
    stress: jnp.ndarray
    strain: jnp.ndarray
    overlap_area: jnp.ndarray
    alive: jnp.ndarray

    @property
    def n(self) -> int:
        return self.verts_body.shape[0]

    @property
    def v_cap(self) -> int:
        return self.verts_body.shape[1]

    def replace(self, **kw) -> "FloeState":
        return dataclasses.replace(self, **kw)

    # -- derived geometry ---------------------------------------------------

    def rot_matrix(self) -> jnp.ndarray:
        """[N, 2, 2] rotation by alpha (calc_trajectory.m:221)."""
        c, s = jnp.cos(self.alpha), jnp.sin(self.alpha)
        return jnp.stack(
            [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
        )

    def verts_rot(self) -> jnp.ndarray:
        """c_alpha: body-frame boundary rotated by alpha, [N, V, 2]."""
        return jnp.einsum("nij,nvj->nvi", self.rot_matrix(), self.verts_body)

    def verts_world(self) -> jnp.ndarray:
        """World-frame boundary c_alpha + (Xi, Yi), [N, V, 2]."""
        pos = jnp.stack([self.x, self.y], axis=-1)
        return self.verts_rot() + pos[:, None, :]


def empty_state(cfg: SimConfig, dtype=None) -> FloeState:
    """All-dead state at the configured capacities."""
    n = cfg.capacity.max_floes
    v = cfg.capacity.verts_now
    p = cfg.capacity.n_mc_points
    w = cfg.capacity.stress_window
    dt = dtype or jnp.dtype(cfg.numerics.dtype)
    zf = lambda *s: jnp.zeros(s, dt)  # noqa: E731
    return FloeState(
        verts_body=zf(n, v, 2),
        nv=jnp.zeros((n,), jnp.int32),
        x=zf(n), y=zf(n), alpha=zf(n), u=zf(n), v=zf(n), ksi=zf(n),
        h=jnp.ones((n,), dt), mass=jnp.ones((n,), dt),
        inertia=jnp.ones((n,), dt), area=jnp.ones((n,), dt), rmax=zf(n),
        dx_p=zf(n), dy_p=zf(n), dalpha_p=zf(n),
        du_p=zf(n), dv_p=zf(n), dksi_p=zf(n),
        mc_xy=zf(n, p, 2), mc_in=jnp.zeros((n, p), jnp.bool_),
        fx_oa=zf(n), fy_oa=zf(n), tq_oa=zf(n),
        stress_hist=zf(n, w, 3), stress=zf(n, 3), strain=zf(n, 3),
        overlap_area=zf(n),
        alive=jnp.zeros((n,), jnp.bool_),
    )


def make_floe_arrays(
    polys: list[np.ndarray],
    heights: np.ndarray,
    cfg: SimConfig,
    seed: int = 0,
    v_cap: int | None = None,
):
    """Host-side floe construction from world-frame polygons.

    Numpy equivalent of ``initialize_floe_values.m``: centroid, body-frame
    contour, area, inertia, rmax, Monte-Carlo sample mask (with the <=10
    retry rule at initialize_floe_values.m:28-36 collapsed into a single
    large-sample draw — the retry loop exists only because MATLAB redraws
    fixed 1000-point batches).

    Returns a dict of numpy arrays for the first ``len(polys)`` slots.
    """
    n = len(polys)
    v = v_cap or cfg.capacity.verts_now
    p = cfg.capacity.n_mc_points
    rng = np.random.default_rng(seed)
    heights = np.broadcast_to(np.asarray(heights, np.float64), (n,)).copy()

    verts = np.zeros((n, v, 2))
    nv = np.zeros((n,), np.int32)

    for i, poly in enumerate(polys):
        verts[i], nv[i] = pad_polygon(poly, v)

    # All geometric properties in one vectorized numpy pass (the padded-edge
    # convention makes every boundary integral a plain masked sum).
    x0, y0 = verts[..., 0], verts[..., 1]
    x1 = np.roll(x0, -1, axis=1)
    y1 = np.roll(y0, -1, axis=1)
    w = x0 * y1 - x1 * y0
    area = 0.5 * np.sum(w, axis=1)
    cx = np.sum(w * (x0 + x1), axis=1) / (6.0 * area)
    cy = np.sum(w * (y0 + y1), axis=1) / (6.0 * area)
    verts = verts - np.stack([cx, cy], 1)[:, None, :]  # body frame (c0)

    # recompute moments about the centroid (initialize_floe_values.m:19)
    x0, y0 = verts[..., 0], verts[..., 1]
    x1 = np.roll(x0, -1, axis=1)
    y1 = np.roll(y0, -1, axis=1)
    w = x0 * y1 - x1 * y0
    ixx = np.sum(w * ((y0 + y1) ** 2 - y0 * y1), axis=1) / 12.0
    iyy = np.sum(w * ((x0 + x1) ** 2 - x0 * x1), axis=1) / 12.0
    inertia = np.abs(ixx + iyy) * heights * cfg.physics.rho_ice
    rmax = np.sqrt(np.max(x0**2 + y0**2, axis=1))
    mass = area * heights * cfg.physics.rho_ice

    # Monte-Carlo masks: uniform in the rmax bounding square (body frame),
    # crossing-number PIP, fully vectorized [n, p] x [n, v].
    mc_xy = rmax[:, None, None] * (2.0 * rng.random((n, p, 2)) - 1.0)
    px = mc_xy[..., 0][:, :, None]
    py = mc_xy[..., 1][:, :, None]
    ex0, ey0 = x0[:, None, :], y0[:, None, :]
    ex1, ey1 = x1[:, None, :], y1[:, None, :]
    cond = (ey0 > py) != (ey1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(ey1 == ey0, 0.0, (py - ey0) / np.where(
            ey1 == ey0, 1.0, ey1 - ey0))
    xint = ex0 + t * (ex1 - ex0)
    mc_in = (np.sum(cond & (px < xint), axis=2) % 2) == 1

    return dict(
        verts_body=verts, nv=nv, x=cx, y=cy,
        h=heights, mass=mass, inertia=inertia, area=area, rmax=rmax,
        mc_xy=mc_xy, mc_in=mc_in,
        alive=np.ones((n,), bool),
    )


def state_from_polygons(
    polys: list[np.ndarray],
    heights,
    cfg: SimConfig,
    seed: int = 0,
    velocities: np.ndarray | None = None,
) -> FloeState:
    """Build a FloeState with floes in slots [0, len(polys)) and the rest
    dead padding."""
    n_cap = cfg.capacity.max_floes
    if len(polys) > n_cap:
        raise ValueError(f"{len(polys)} floes > capacity {n_cap}")
    arrs = make_floe_arrays(polys, heights, cfg, seed)
    # Assemble host-side (single device transfer per field at the end).
    proto = empty_state(cfg)
    upd = {}
    for k, val in arrs.items():
        cur = getattr(proto, k)
        buf = np.zeros(cur.shape, cur.dtype)
        if k in ("h", "mass", "inertia", "area"):
            buf[:] = 1.0  # dead-slot defaults avoid 0-divides
        buf[: len(polys)] = val
        upd[k] = jnp.asarray(buf, cur.dtype)
    st = proto.replace(**upd)
    if velocities is not None:
        dt = proto.x.dtype
        vel = np.zeros((n_cap, 2))
        vel[: len(polys)] = velocities
        st = st.replace(
            u=jnp.asarray(vel[:, 0], dt), v=jnp.asarray(vel[:, 1], dt)
        )
    return st
