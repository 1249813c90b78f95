"""Ocean and atmosphere forcing fields.

Replaces ``Initialize_Model/initialize_ocean.m`` and the wind setup at
``Subzero.m:46-49``.  The forcing lives on a regular grid and is sampled on
device with bilinear interpolation (the reference uses ``interp2`` at
``calc_trajectory.m:134-137``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Forcing:
    """Regular-grid ocean + wind forcing.

    x0, dx:   grid origin and spacing (uniform, shared by all fields)
    uo, vo:   [Ny, Nx] ocean surface currents
    ua, va:   [Ny, Nx] 10-m winds
    """

    x0: jnp.ndarray          # scalar
    y0: jnp.ndarray          # scalar
    dx: jnp.ndarray          # scalar
    uo: jnp.ndarray
    vo: jnp.ndarray
    ua: jnp.ndarray
    va: jnp.ndarray

    @property
    def nx(self) -> int:
        return self.uo.shape[1]

    @property
    def ny(self) -> int:
        return self.uo.shape[0]

    def extent(self):
        """(xmin, xmax, ymin, ymax) of the grid."""
        return (
            self.x0,
            self.x0 + (self.nx - 1) * self.dx,
            self.y0,
            self.y0 + (self.ny - 1) * self.dx,
        )


def interp_bilinear(field: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                    x0, y0, dx) -> jnp.ndarray:
    """Bilinear sample of ``field[Ny, Nx]`` at world points (clamped to the
    grid; out-of-grid floes are killed by an explicit bounds check upstream,
    mirroring calc_trajectory.m:116-117 rather than interp2's NaN fill)."""
    gx = (fx - x0) / dx
    gy = (fy - y0) / dx
    ny, nx = field.shape
    gx = jnp.clip(gx, 0.0, nx - 1.000001)
    gy = jnp.clip(gy, 0.0, ny - 1.000001)
    ix = jnp.floor(gx).astype(jnp.int32)
    iy = jnp.floor(gy).astype(jnp.int32)
    tx = gx - ix
    ty = gy - iy
    f00 = field[iy, ix]
    f01 = field[iy, ix + 1]
    f10 = field[iy + 1, ix]
    f11 = field[iy + 1, ix + 1]
    return (
        f00 * (1 - ty) * (1 - tx)
        + f01 * (1 - ty) * tx
        + f10 * ty * (1 - tx)
        + f11 * ty * tx
    )


def interp_bilinear_mxu(fields: jnp.ndarray, fx: jnp.ndarray,
                        fy: jnp.ndarray, x0, y0, dx,
                        chunk: int = 65536) -> jnp.ndarray:
    """Bilinear sample of ``fields[C, Ny, Nx]`` at flat points [P] -> [C, P].

    Gather-free formulation for TPU: bilinear interpolation is the
    contraction of two one-hot-pair weight matrices with the field,

        out[c, p] = sum_ij wy[p, i] fields[c, i, j] wx[p, j],

    evaluated as two MXU matmuls over point chunks (precision=HIGHEST, which
    is exact for f32 here).  16M pointwise gathers cost ~73 ms/step on a v5e
    at the bench workload; this runs in ~4 ms.  Only sensible for smallish
    grids (one-hot work scales with Ny + Nx per point); all reference
    configurations use <= 81x81 ocean grids (initialize_ocean.m:10-12).

    Same clamping convention as ``interp_bilinear``.
    """
    c, ny, nx = fields.shape
    dtype = fields.dtype
    iota_y = jnp.arange(ny, dtype=dtype)
    iota_x = jnp.arange(nx, dtype=dtype)

    p_total = fx.size
    pad = (-p_total) % chunk
    gx = jnp.concatenate([fx.reshape(-1), jnp.zeros(pad, dtype)])
    gy = jnp.concatenate([fy.reshape(-1), jnp.zeros(pad, dtype)])
    gx = jnp.clip((gx - x0) / dx, 0.0, nx - 1.000001)
    gy = jnp.clip((gy - y0) / dx, 0.0, ny - 1.000001)

    def one(uv):
        cu, cv = uv
        iy = jnp.floor(cv)
        ty = cv - iy
        ix = jnp.floor(cu)
        tx = cu - ix
        wy = (
            jnp.where(iota_y[None, :] == iy[:, None], (1 - ty)[:, None], 0.0)
            + jnp.where(iota_y[None, :] == iy[:, None] + 1, ty[:, None], 0.0)
        )
        wx = (
            jnp.where(iota_x[None, :] == ix[:, None], (1 - tx)[:, None], 0.0)
            + jnp.where(iota_x[None, :] == ix[:, None] + 1, tx[:, None], 0.0)
        )
        t = jnp.einsum("pi,cij->pcj", wy, fields, precision="highest",
                       preferred_element_type=dtype)
        return jnp.einsum("pcj,pj->pc", t, wx, precision="highest",
                          preferred_element_type=dtype)

    n_chunks = (p_total + pad) // chunk
    out = jax.lax.map(one, (gx.reshape(n_chunks, chunk),
                            gy.reshape(n_chunks, chunk)))
    return out.reshape(-1, c)[:p_total].T


def sample_forcing(forcing: Forcing, px: jnp.ndarray, py: jnp.ndarray):
    """Sample (uo, vo, ua, va) at world points of any shape."""
    ny, nx = forcing.uo.shape
    if max(ny, nx) <= 512:
        fields = jnp.stack([forcing.uo, forcing.vo, forcing.ua, forcing.va])
        chunk = min(65536, max(512, px.size))
        out = interp_bilinear_mxu(fields, px, py, forcing.x0, forcing.y0,
                                  forcing.dx, chunk=chunk)
        return tuple(o.reshape(px.shape) for o in out)
    args = (px, py, forcing.x0, forcing.y0, forcing.dx)
    return (
        interp_bilinear(forcing.uo, *args),
        interp_bilinear(forcing.vo, *args),
        interp_bilinear(forcing.ua, *args),
        interp_bilinear(forcing.va, *args),
    )


def gyre_ocean(
    lx: float = 4e5,
    dx: float = 1e4,
    transport: float = 0.5e4,
    n_gyres: int = 4,
    wind_u: float = 0.0,
    wind_v: float = 0.0,
    dtype=jnp.float32,
) -> Forcing:
    """The reference's default 4-gyre sinusoidal ocean
    (initialize_ocean.m:11-24): psi = T sin(4 kx X) sin(4 ky Y) on a
    [-lx, lx]^2 grid, velocities by one-sided finite difference of psi
    (u = -dpsi/dy, v = +dpsi/dx), plus uniform winds (Subzero.m:46-49)."""
    k = np.pi / lx
    xs = np.arange(-lx, lx + dx / 2, dx)
    xg, yg = np.meshgrid(xs, xs)
    psi = transport * np.sin(n_gyres * k * xg) * np.sin(n_gyres * k * yg)
    uo = np.zeros_like(psi)
    vo = np.zeros_like(psi)
    # Reference uses one-sided differences (initialize_ocean.m:22-24).
    uo[1:, :] = -(psi[1:, :] - psi[:-1, :]) / dx
    vo[:, 1:] = (psi[:, 1:] - psi[:, :-1]) / dx
    return Forcing(
        x0=jnp.asarray(-lx, dtype),
        y0=jnp.asarray(-lx, dtype),
        dx=jnp.asarray(dx, dtype),
        uo=jnp.asarray(uo, dtype),
        vo=jnp.asarray(vo, dtype),
        ua=jnp.full(psi.shape, wind_u, dtype),
        va=jnp.full(psi.shape, wind_v, dtype),
    )


def uniform_forcing(
    lx: float = 4e5,
    dx: float = 1e4,
    uo: float = 0.0,
    vo: float = 0.0,
    ua: float = 0.0,
    va: float = 0.0,
    dtype=jnp.float32,
) -> Forcing:
    """Spatially uniform forcing (for tests and the Nares wind case)."""
    xs = np.arange(-lx, lx + dx / 2, dx)
    shape = (len(xs), len(xs))
    return Forcing(
        x0=jnp.asarray(-lx, dtype),
        y0=jnp.asarray(-lx, dtype),
        dx=jnp.asarray(dx, dtype),
        uo=jnp.full(shape, uo, dtype),
        vo=jnp.full(shape, vo, dtype),
        ua=jnp.full(shape, ua, dtype),
        va=jnp.full(shape, va, dtype),
    )


def thermo_params(dt: float, n_dt_pack: int,
                  k: float = 2.14, t_air: float = -20.0, t_ocean: float = 0.0,
                  rho_ice: float = 920.0, latent: float = 2.93e5):
    """Ocean heat flux HFo and new-ice thickness h0
    (initialize_ocean.m:37-46).  NOTE the reference overwrites the caller's
    dt with 10 s at initialize_ocean.m:38; we honor the passed dt."""
    heat_flux = k * (t_air - t_ocean) / (rho_ice * latent)
    h0 = float(np.sqrt(max(2 * k * dt * n_dt_pack * (t_ocean - t_air), 0.0)
                       / (rho_ice * latent)))
    return heat_flux, h0
