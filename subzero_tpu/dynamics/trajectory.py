"""Per-floe trajectory update — the batched equivalent of
``calc_trajectory.m``.

Sequence reproduced (file:line cites into /root/reference):

1. Stress ring buffer: virial stress from this step's contacts
   ``1/(2 A h) Σ [(p-r)⊗F + F⊗(p-r)]`` pushed into a length-W ring whose
   mean is the floe stress (calc_trajectory.m:9-29).
2. Clamps: h <= 10 m; tiny-mass floes die; contact force/torque divided by
   10 until |F| <= m/(5 dt) (:36-46).
3. Thermodynamic growth dh = HFo dt / h applied to mass, inertia, h (:76-80).
4. Ocean/wind forcing averaged over the floe's Monte-Carlo sample points:
   quadratic ocean drag with Ekman turn angle, uniform atmospheric stress
   from the mean 10-m wind, SSH-tilt pressure gradient, ocean-drag torque;
   cached as FxOA/FyOA/torqueOA and refreshed only when ``do_int``
   (:94,121-166).  The Coriolis term of the *current* velocity is folded
   into the cache exactly as the reference does (:159-165).
5. Adams-Bashforth-2 update of position, angle, velocity, spin with the
   acceleration cap |du| <= 0.5 h/dt (proportional rescale, applied to spin
   too) and the spin cap |ksi| <= 1e-5 (:174-219).
6. Boundary-integral strain-rate tensor when ``do_int`` (:224-234).
7. Out-of-ocean-grid floes are killed (:116-117).

Everything is a masked [N]-batched tensor op; per-floe branches in the
reference become ``jnp.where``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..forcing import Forcing, sample_forcing
from ..state import FloeState


def stress_from_sums(state: FloeState, sxx, syy, sxy) -> jnp.ndarray:
    """Virial contact stress per floe, [N, 3] (xx, yy, xy), from precomputed
    Σ (p - r) ⊗ F sums (exact for per-region contacts: each region's point
    enters the sum individually).  Mirrors calc_trajectory.m:9-13."""
    inv = 1.0 / (state.area * state.h)
    return jnp.stack([sxx, syy, sxy], axis=-1) * inv[:, None]


def floe_stress(state: FloeState, cf_x, cf_y, px, py, f_valid) -> jnp.ndarray:
    """Virial contact stress per floe, [N, 3] (xx, yy, xy).

    cf_x/cf_y/px/py: [N, K] per-contact forces and contact points;
    f_valid: [N, K] contact mask.  Mirrors calc_trajectory.m:9-13, which
    forms (sym of) Σ (p - r) ⊗ F over the interaction list.
    """
    rx = px - state.x[:, None]
    ry = py - state.y[:, None]
    w = f_valid.astype(cf_x.dtype)
    sxx = jnp.sum(w * rx * cf_x, axis=1)
    syy = jnp.sum(w * ry * cf_y, axis=1)
    sxy = jnp.sum(w * 0.5 * (rx * cf_y + ry * cf_x), axis=1)
    denom = 2.0 * state.area * state.h
    # The symmetrized sum doubles the diagonal and averages the off-diagonal:
    # 1/(2Ah) * ([rx Fx, ry Fx; rx Fy, ry Fy] + transpose-pairing) ==
    # (1/(A h)) * [rx Fx, (rx Fy + ry Fx)/2; ..., ry Fy].
    return jnp.stack([sxx, syy, sxy], axis=-1) * (2.0 / denom)[:, None]


def push_stress(state: FloeState, stress_new: jnp.ndarray, step: jnp.ndarray):
    """Write this step's stress into the ring buffer and update the mean.

    The reference's per-floe StressCount advances in lockstep for floes born
    together (calc_trajectory.m:14-28); we use a global ring index
    ``step % W``.  The mean is over the full window including the zero
    entries of a not-yet-filled ring, exactly like ``mean(StressH, 3)``.

    The mean is maintained incrementally (old slot subtracted, new added)
    instead of reducing the whole [N, W, 3] buffer every step; float drift
    is reset by an exact re-reduction once per ring wrap.
    """
    w = state.stress_hist.shape[1]
    idx = (step % w).astype(jnp.int32)
    old = jax.lax.dynamic_index_in_dim(state.stress_hist, idx, axis=1,
                                       keepdims=False)
    hist = state.stress_hist.at[:, idx, :].set(stress_new)
    stress = jax.lax.cond(
        idx == 0,
        lambda: jnp.mean(hist, axis=1),               # periodic exact reset
        lambda: state.stress + (stress_new - old) / w,
    )
    return state.replace(stress_hist=hist, stress=stress)


def ocean_forcing(state: FloeState, forcing: Forcing, cfg: SimConfig):
    """Area-averaged ocean/atm force per unit area + torque (FxOA, FyOA,
    torqueOA), including the Coriolis terms (calc_trajectory.m:121-165).

    Returns (fx_oa, fy_oa, tq_oa), each [N].
    """
    phys = cfg.physics

    # Rotate the Monte-Carlo sample points into the world frame.
    rot = state.rot_matrix()                                # [N, 2, 2]
    xr = jnp.einsum("nij,npj->npi", rot, state.mc_xy)       # [N, P, 2]
    gx = xr[..., 0] + state.x[:, None]
    gy = xr[..., 1] + state.y[:, None]

    # Gather-free MXU interpolation (see forcing.interp_bilinear_mxu): the
    # [N, P] sample of all four fields is the dominant cost of the refresh.
    uo, vo, ua, va = sample_forcing(forcing, gx, gy)

    mask = state.mc_in.astype(gx.dtype)
    n_in = jnp.maximum(jnp.sum(mask, axis=1), 1.0)

    # Uniform atmospheric stress from the mean 10-m wind over the floe
    # (calc_trajectory.m:139-141).
    u10 = jnp.sum(ua * mask, axis=1) / n_in
    v10 = jnp.sum(va * mask, axis=1) / n_in
    wind_speed = jnp.sqrt(u10**2 + v10**2)
    fx_atm = phys.rho_air * phys.cd_atm * wind_speed * u10
    fy_atm = phys.rho_air * phys.cd_atm * wind_speed * v10

    # Local ice velocity at each sample (rigid body): U - ksi*y_r, V + ksi*x_r
    # (cart2pol form at calc_trajectory.m:127-128: rho sin(theta) = y_r).
    uice = state.u[:, None] - state.ksi[:, None] * xr[..., 1]
    vice = state.v[:, None] + state.ksi[:, None] * xr[..., 0]

    du = uo - uice
    dv = vo - vice
    sp = jnp.sqrt(du**2 + dv**2)
    ca = jnp.cos(phys.turn_angle)
    sa = jnp.sin(phys.turn_angle)
    tau_x = phys.rho_ocean * phys.cd_ocean * sp * (ca * du - sa * dv)
    tau_y = phys.rho_ocean * phys.cd_ocean * sp * (sa * du + ca * dv)

    # SSH-tilt pressure gradient (calc_trajectory.m:143-144).
    m_over_a = (state.mass / state.area)[:, None]
    fx_tilt = -m_over_a * phys.f_coriolis * vo
    fy_tilt = +m_over_a * phys.f_coriolis * uo

    fx = tau_x + fx_atm[:, None] + fx_tilt
    fy = tau_y + fy_atm[:, None] + fy_tilt

    # Torque BEFORE adding Coriolis (which has none) — calc_trajectory.m:156.
    torque = -fx * xr[..., 1] + fy * xr[..., 0]

    # Remaining Coriolis of the floe-mean velocity (calc_trajectory.m:159-160)
    # — deliberately folded into the cached force like the reference.
    fx = fx + m_over_a * phys.f_coriolis * state.v[:, None]
    fy = fy - m_over_a * phys.f_coriolis * state.u[:, None]

    fx_oa = jnp.sum(fx * mask, axis=1) / n_in
    fy_oa = jnp.sum(fy * mask, axis=1) / n_in
    tq_oa = jnp.sum(torque * mask, axis=1) / n_in
    return fx_oa, fy_oa, tq_oa


def trajectory_update(
    state: FloeState,
    forcing: Forcing,
    cf_x: jnp.ndarray,          # [N] total contact force
    cf_y: jnp.ndarray,
    cf_t: jnp.ndarray,          # [N] total contact torque
    heat_flux: float,
    do_int: jnp.ndarray,        # scalar bool: refresh ocean forcing?
    cfg: SimConfig,
) -> FloeState:
    """AB2 trajectory update for all floes (masked)."""
    cl = cfg.clamps
    dt = cfg.numerics.dt
    n_b = cfg.n_boundary

    alive = state.alive

    # --- clamps (calc_trajectory.m:36-46) ---------------------------------
    h = jnp.minimum(state.h, cl.max_thickness)
    tiny = state.mass < cl.min_mass
    mass = jnp.where(tiny, cl.dead_mass, state.mass)
    alive = alive & ~tiny

    # force-magnitude clamp: divide by 10 until |F| <= m/(5 dt).  The loop
    # divides both components and the torque by the same power of 10.
    fmax = jnp.maximum(jnp.abs(cf_x), jnp.abs(cf_y))
    limit = mass / (cl.force_dt_factor * dt)
    # number of /10 steps: ceil(log10(fmax/limit)) when exceeding
    ratio = jnp.where(fmax > limit, fmax / limit, 1.0)
    k10 = jnp.ceil(jnp.log10(ratio))
    scale = 10.0 ** (-k10)
    cf_x = cf_x * scale
    cf_y = cf_y * scale
    cf_t = cf_t * scale

    # --- thermodynamic growth (calc_trajectory.m:76-80) -------------------
    dh = heat_flux * dt / jnp.maximum(h, 1e-6)
    grow = (h - dh) / jnp.maximum(h, 1e-6)
    mass = grow * mass
    inertia = grow * state.inertia
    h = h - dh

    st = state.replace(h=h, mass=mass, inertia=inertia)

    # --- out-of-ocean-grid kill (calc_trajectory.m:116-117) ---------------
    xmin, xmax, ymin, ymax = forcing.extent()
    alive = alive & (
        (st.x + st.rmax < xmax) & (st.x - st.rmax > xmin)
        & (st.y + st.rmax < ymax) & (st.y - st.rmax > ymin)
    ) | (jnp.arange(st.n) < n_b)

    # --- ocean forcing cache (calc_trajectory.m:94,121-166) ---------------
    # The MC-point interpolation dominates the step cost, so it only runs
    # when some floe actually refreshes (every doInt.step steps, or when
    # thin floes are present) — measured 70 ms/step at 4k floes otherwise.
    if cfg.physics.ocean_coupling:
        refresh = do_int | (st.h < 0.1)
        need = do_int | jnp.any((st.h < 0.1) & alive)
        fresh = jax.lax.cond(
            need,
            lambda s: ocean_forcing(s, forcing, cfg),
            lambda s: (s.fx_oa, s.fy_oa, s.tq_oa),
            st,
        )
        fx_oa = jnp.where(refresh, fresh[0], st.fx_oa)
        fy_oa = jnp.where(refresh, fresh[1], st.fy_oa)
        tq_oa = jnp.where(refresh, fresh[2], st.tq_oa)
    else:
        # uniaxial case: all motion boundary-driven (README.md 1h)
        fx_oa = jnp.zeros_like(st.fx_oa)
        fy_oa = jnp.zeros_like(st.fy_oa)
        tq_oa = jnp.zeros_like(st.tq_oa)

    # --- AB2 position update with OLD velocity (calc_trajectory.m:174-177) -
    x_new = st.x + 1.5 * dt * st.u - 0.5 * dt * st.dx_p
    y_new = st.y + 1.5 * dt * st.v - 0.5 * dt * st.dy_p
    alpha_new = st.alpha + 1.5 * dt * st.ksi - 0.5 * dt * st.dalpha_p
    dx_p = st.u
    dy_p = st.v
    dalpha_p = st.ksi

    # --- acceleration with cap (calc_trajectory.m:181-204) ----------------
    du_dt = (fx_oa * st.area + cf_x) / mass
    dv_dt = (fy_oa * st.area + cf_y) / mass
    cap = cl.accel_h_factor * h / dt
    exceed_u = jnp.abs(dt * du_dt) > cl.accel_h_factor * h
    exceed_v = jnp.abs(dt * dv_dt) > cl.accel_h_factor * h
    frac_u = jnp.where(exceed_u, cap / jnp.maximum(jnp.abs(du_dt), 1e-30), 1.0)
    frac_v = jnp.where(exceed_v, cap / jnp.maximum(jnp.abs(dv_dt), 1e-30), 1.0)
    frac = jnp.where(
        exceed_u & exceed_v, jnp.minimum(frac_u, frac_v),
        jnp.where(exceed_u, frac_u, jnp.where(exceed_v, frac_v, 1.0)),
    )
    du_dt = frac * du_dt
    dv_dt = frac * dv_dt

    u_new = st.u + 1.5 * dt * du_dt - 0.5 * dt * st.du_p
    v_new = st.v + 1.5 * dt * dv_dt - 0.5 * dt * st.dv_p

    # --- spin update with caps (calc_trajectory.m:210-219) ----------------
    dksi_dt = (tq_oa * st.area + cf_t) / st.inertia
    dksi_dt = frac * dksi_dt        # reference applies frac to spin too (:212)
    ksi_new = st.ksi + 1.5 * dt * dksi_dt - 0.5 * dt * st.dksi_p
    ksi_new = jnp.clip(ksi_new, -cl.max_spin, cl.max_spin)

    # --- strain-rate tensor (calc_trajectory.m:224-234) -------------------
    # Boundary integral of the rigid-body velocity field over c_alpha.
    verts_rot = st.replace(alpha=alpha_new).verts_rot()     # [N, V, 2]
    vx = verts_rot[..., 0]
    vy = verts_rot[..., 1]
    u_b = u_new[:, None] - ksi_new[:, None] * vy
    v_b = v_new[:, None] + ksi_new[:, None] * vx
    d_u = jnp.roll(u_b, -1, axis=1) - u_b
    d_v = jnp.roll(v_b, -1, axis=1) - v_b
    d_x = jnp.roll(vx, -1, axis=1) - vx
    d_y = jnp.roll(vy, -1, axis=1) - vy
    inv2a = 0.5 / st.area
    du_dx = jnp.sum(d_u * d_y, axis=1) * inv2a
    du_dy = jnp.sum(d_u * d_x, axis=1) * inv2a
    dv_dx = jnp.sum(d_v * d_y, axis=1) * inv2a
    dv_dy = jnp.sum(d_v * d_x, axis=1) * inv2a
    strain = jnp.stack(
        [du_dx, dv_dy, 0.5 * (du_dy + dv_dx)], axis=-1
    )

    # --- masked commit: boundary floes (slots < n_boundary) and dead floes
    # keep their state frozen -------------------------------------------------
    idx = jnp.arange(st.n)
    movable = alive & (idx >= n_b)

    def sel(new, old):
        return jnp.where(movable, new, old)

    return st.replace(
        x=sel(x_new, st.x), y=sel(y_new, st.y),
        alpha=sel(alpha_new, st.alpha),
        u=sel(u_new, st.u), v=sel(v_new, st.v),
        ksi=sel(ksi_new, st.ksi),
        dx_p=sel(dx_p, st.dx_p), dy_p=sel(dy_p, st.dy_p),
        dalpha_p=sel(dalpha_p, st.dalpha_p),
        du_p=sel(du_dt, st.du_p), dv_p=sel(dv_dt, st.dv_p),
        dksi_p=sel(dksi_dt, st.dksi_p),
        fx_oa=jnp.where(movable, fx_oa, st.fx_oa),
        fy_oa=jnp.where(movable, fy_oa, st.fy_oa),
        tq_oa=jnp.where(movable, tq_oa, st.tq_oa),
        strain=jnp.where(movable[:, None], strain,
                         st.strain),
        h=jnp.where(alive, h, st.h),
        mass=jnp.where(alive, mass, st.mass),
        inertia=jnp.where(alive, inertia, st.inertia),
        alive=alive,
    )
