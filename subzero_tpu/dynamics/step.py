"""The fused physics step — batched equivalent of
``floe_interactions_all.m`` (broad phase -> narrow phase -> force/torque
reduction -> trajectory update -> periodic wrap).

One ``step(state, forcing, step_idx) -> (state, aux)`` function, jittable and
shardable.  Differences from the reference orchestration, by design:

* No ghost floes: periodicity via minimum-image shifts in the broad phase
  (see dynamics/broadphase.py).  Ghost force/torque reduction onto parents
  (floe_interactions_all.m:218-246) is implicit.
* No sequential symmetrization (:187-214): each unordered pair is evaluated
  from both endpoints; the chord construction makes the two evaluations
  exactly antisymmetric.
* Kill/merge events (overlap>0.55 fusion, boundary absorption, :470-501) are
  *flagged* in the aux output; topology surgery happens host-side at process
  cadence (SURVEY.md section 7, hard part #2) rather than inline.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..forcing import Forcing
from ..geometry.polygon import pad_polygon
from ..state import FloeState
from .broadphase import neighbor_candidates
from .contact import boundary_contact, contact_forces
from .trajectory import push_stress, stress_from_sums, trajectory_update


class StepAux(NamedTuple):
    """Per-step auxiliary outputs (diagnostics + lifecycle flags)."""

    n_collisions: jnp.ndarray     # collision count (calc_collisionNum.m)
    merge_i: jnp.ndarray          # [N, K] floe i to be absorbed into nbr k
    merge_j: jnp.ndarray          # [N, K] nbr k to be absorbed into floe i
    absorb_boundary: jnp.ndarray  # [N] floe >75% outside domain
    killed: jnp.ndarray           # [N] floes newly dead this step
    exported: jnp.ndarray         # [N] killed floes whose mass LEFT the
                                  # domain (out-of-domain / boundary absorb /
                                  # below-ymin export) — ledger as exported,
                                  # not dissolved
    nbr_overflow: jnp.ndarray     # broad-phase candidate overflow
    nbr_demand: jnp.ndarray       # [] max broad-phase candidates of any
                                  # row (true K requirement; two-way pool
                                  # auto-sizing)
    overlap_area: jnp.ndarray     # [N] total overlap area per floe
    collision_force: jnp.ndarray  # [N, 2]
    collision_torque: jnp.ndarray  # [N]
    # pair-level contact info for the lifecycle passes (corner grinding,
    # fracture plastic deformation, ridge/raft candidate selection)
    nbr_idx: jnp.ndarray          # [N, K] neighbor slot per candidate
    pair_valid: jnp.ndarray       # [N, K] contact force present
    pair_px: jnp.ndarray          # [N, K] contact point
    pair_py: jnp.ndarray          # [N, K]
    pair_fx: jnp.ndarray          # [N, K] contact force on i from nbr
    pair_fy: jnp.ndarray          # [N, K]
    pair_overlap: jnp.ndarray     # [N, K] overlap area
    boundary_contact: jnp.ndarray  # [N] floe touches the domain boundary
    region_overflow: jnp.ndarray  # [] >=4-crossing contacts exceeded the
                                  # per-region decomposition pool
    region_pool_need: jnp.ndarray  # [] >=4-crossing contact slots this step
                                   # (pool demand; sizes region_pair_frac)
    pair_pool_overflow: jnp.ndarray  # [] bbox-active pairs exceeded the
                                     # active-pair pool (contacts zeroed;
                                     # the driver re-runs the chunk)
    pair_pool_need: jnp.ndarray      # [] bbox-active pair slots this step


def domain_polygon(cfg: SimConfig, v_cap: int = 8) -> jnp.ndarray:
    """Padded CCW rectangle |x|<=lx, |y|<=ly (initialize_boundaries.m)."""
    lx, ly = cfg.domain.lx, cfg.domain.ly
    rect = np.array([[-lx, -ly], [lx, -ly], [lx, ly], [-lx, ly]])
    padded, _ = pad_polygon(rect, v_cap)
    return jnp.asarray(padded, jnp.dtype(cfg.numerics.dtype))


def physics_step(
    state: FloeState,
    forcing: Forcing,
    step_idx: jnp.ndarray,
    domain_verts: jnp.ndarray,
    modulus: float,
    heat_flux: float,
    cfg: SimConfig,
) -> tuple[FloeState, StepAux]:
    """One full physics step (floe_interactions_all.m + calc_trajectory.m)."""
    proc = cfg.processes
    periodic = proc.periodic
    dtype = state.x.dtype
    n = state.n
    idx_arange = jnp.arange(n)

    do_int = (step_idx % proc.n_ocean_force) == 0

    verts_world = state.verts_world()

    # ---- broad phase ------------------------------------------------------
    use_cells = (
        cfg.numerics.broadphase == "cells" and cfg.numerics.cell_size > 0
        and int(2 * cfg.domain.lx / cfg.numerics.cell_size) >= 3
        and int(2 * cfg.domain.ly / cfg.numerics.cell_size) >= 3
    )
    if use_cells:
        from .broadphase import neighbor_candidates_cells

        nbr = neighbor_candidates_cells(
            state.x, state.y, state.rmax, state.alive,
            cfg.capacity.max_neighbors, periodic,
            cfg.domain.lx, cfg.domain.ly,
            cfg.numerics.cell_size, cfg.capacity.max_per_cell,
            n_skip_rows=cfg.n_boundary,
        )
    else:
        nbr = neighbor_candidates(
            state.x, state.y, state.rmax, state.alive,
            cfg.capacity.max_neighbors, periodic,
            cfg.domain.lx, cfg.domain.ly,
            n_skip_rows=cfg.n_boundary,
        )

    # ---- narrow phase: floe-floe ------------------------------------------
    if proc.collision:
        pc = contact_forces(
            verts_world, state.x, state.y, state.u, state.v, state.ksi,
            state.h, state.area, nbr, modulus, cfg,
            nv=state.nv, domain_verts=domain_verts,
        )
    else:
        zk = jnp.zeros(nbr.idx.shape, dtype)
        pc_zero_bool = jnp.zeros(nbr.idx.shape, bool)
        from .contact import PairContacts

        pc = PairContacts(fx=zk, fy=zk, px=zk, py=zk, tq=zk,
                          sxx=zk, syy=zk, sxy=zk, overlap=zk,
                          merge_i=pc_zero_bool, merge_j=pc_zero_bool,
                          region_overflow=jnp.zeros((), bool),
                          region_need=jnp.zeros((), jnp.int32),
                          pair_pool_overflow=jnp.zeros((), bool),
                          pair_pool_need=jnp.zeros((), jnp.int32))

    # ---- narrow phase: boundary -------------------------------------------
    if not periodic:
        # Rectangular-wall force-component zeroing
        # (floe_interactions_all.m:157-166) is applied inside (per region in
        # per-region mode).  The reference compares with ==, which never
        # fires for a region centroid — the default wall_zero_tol=0.0
        # reproduces that (wall friction survives).
        bc = boundary_contact(
            verts_world, state.x, state.y, state.u, state.v, state.ksi,
            state.h, state.area, state.alive, domain_verts, modulus, cfg,
            nv=state.nv,
        )
    else:
        zn = jnp.zeros((n,), dtype)
        from .contact import BoundaryContact

        bc = BoundaryContact(
            fx=zn, fy=zn, px=zn, py=zn, tq=zn, sxx=zn, syy=zn, sxy=zn,
            overlap=zn,
            absorb=jnp.zeros((n,), bool), out=jnp.zeros((n,), bool),
            region_overflow=jnp.zeros((), bool),
            region_need=jnp.zeros((), jnp.int32),
        )

    # ---- reduce forces & torques -----------------------------------------
    f_valid = (jnp.abs(pc.fx) + jnp.abs(pc.fy)) > 0
    b_valid = (jnp.abs(bc.fx) + jnp.abs(bc.fy)) > 0

    cf_x = jnp.sum(pc.fx, axis=1) + bc.fx
    cf_y = jnp.sum(pc.fy, axis=1) + bc.fy

    # torque about own centroid (floe_interactions_all.m:255-259); torques
    # come from the narrow phase (exact per-region sums in per-region mode)
    cf_t = jnp.sum(pc.tq, axis=1) + bc.tq

    overlap_total = jnp.sum(pc.overlap, axis=1) + bc.overlap

    # ---- stress ring buffer ----------------------------------------------
    # Virial sums Σ (p - r) ⊗ F, precomputed in the narrow phase
    # (per-region exact).
    s_new = stress_from_sums(
        state,
        jnp.sum(pc.sxx, axis=1) + bc.sxx,
        jnp.sum(pc.syy, axis=1) + bc.syy,
        jnp.sum(pc.sxy, axis=1) + bc.sxy,
    )
    state = push_stress(state, s_new, step_idx)

    state = state.replace(overlap_area=overlap_total)

    # ---- kill flags -------------------------------------------------------
    alive_before = state.alive
    killed_boundary = bc.absorb | bc.out
    if proc.kill_below_ymin:
        # Nares export rule (README.md Validation 2 item 6b): a floe whose
        # lowest vertex drops below the southern wall dies.  Padded slots
        # repeat vertex 0, so the min over V is the min over real vertices.
        y_min_wall = jnp.min(domain_verts[:, 1])
        below = state.alive & (
            jnp.min(verts_world[..., 1], axis=1) < y_min_wall)
        killed_boundary = killed_boundary | below
    exported = alive_before & killed_boundary  # mass leaves the domain
    if not proc.keep_min:
        # small-floe cull, device-side (Subzero.m:366-372)
        too_small = (state.area < cfg.min_floe_size) & (
            idx_arange >= cfg.n_boundary
        )
        killed_boundary = killed_boundary | too_small
    state = state.replace(alive=state.alive & ~killed_boundary)

    # ---- trajectory update ------------------------------------------------
    state = trajectory_update(
        state, forcing, cf_x, cf_y, cf_t, heat_flux, do_int, cfg
    )

    # ---- periodic wrap (floe_interactions_all.m:267-277) ------------------
    if periodic:
        lx, ly = cfg.domain.lx, cfg.domain.ly
        x = state.x
        y = state.y
        x = jnp.where(jnp.abs(x) > lx, x - 2 * lx * jnp.sign(x), x)
        y = jnp.where(jnp.abs(y) > ly, y - 2 * ly * jnp.sign(y), y)
        state = state.replace(x=x, y=y)

    # ---- diagnostics ------------------------------------------------------
    # calc_collisionNum.m: floe-floe contact pairs /2 + boundary contacts.
    # Boundary/topography floes have no candidate rows (n_skip_rows), so a
    # floe-vs-topography contact appears once (in the moving floe's row)
    # and counts at full weight like a wall contact.
    if cfg.n_boundary > 0:
        vs_topo = nbr.idx < cfg.n_boundary
        n_collisions = (
            jnp.sum((f_valid & ~vs_topo).astype(jnp.int32)) // 2
            + jnp.sum((f_valid & vs_topo).astype(jnp.int32))
            + jnp.sum(b_valid.astype(jnp.int32))
        ).astype(jnp.int32)
    else:
        n_collisions = (
            jnp.sum(f_valid.astype(jnp.int32)) // 2
            + jnp.sum(b_valid.astype(jnp.int32))
        ).astype(jnp.int32)

    aux = StepAux(
        n_collisions=n_collisions,
        merge_i=pc.merge_i,
        merge_j=pc.merge_j,
        absorb_boundary=bc.absorb,
        killed=alive_before & ~state.alive,
        exported=exported,
        nbr_overflow=nbr.overflow,
        nbr_demand=nbr.demand.astype(jnp.int32),
        overlap_area=overlap_total,
        collision_force=jnp.stack([cf_x, cf_y], axis=-1),
        collision_torque=cf_t,
        nbr_idx=nbr.idx.astype(jnp.int32),
        pair_valid=f_valid,
        pair_px=pc.px,
        pair_py=pc.py,
        pair_fx=pc.fx,
        pair_fy=pc.fy,
        pair_overlap=pc.overlap,
        boundary_contact=b_valid | (bc.overlap > 0),
        region_overflow=pc.region_overflow | bc.region_overflow,
        region_pool_need=pc.region_need + bc.region_need,
        pair_pool_overflow=pc.pair_pool_overflow,
        pair_pool_need=pc.pair_pool_need.astype(jnp.int32),
    )
    return state, aux


def make_step_fn(cfg: SimConfig, forcing: Forcing, modulus: float,
                 heat_flux: float = 0.0):
    """Build a jitted ``step(state, step_idx) -> (state, aux)``.

    Closed-over constants (forcing grids, the domain polygon) are pinned to
    HOST numpy before tracing: lowering embeds a jaxpr constant by reading
    its value, and reading a device-resident array back through the axon
    tunnel costs ~30 s PER CONSTANT — measured 260 s of a 277 s "cold
    compile" at 10k floes, vs 16 s of actual XLA compilation.  numpy
    constants embed from host memory and XLA ships them to the device once
    at execution.
    """
    forcing = jax.tree_util.tree_map(np.asarray, forcing)
    domain_verts = np.asarray(domain_polygon(cfg))

    @jax.jit
    def step(state: FloeState, step_idx):
        return physics_step(
            state, forcing, step_idx, jnp.asarray(domain_verts),
            modulus, heat_flux, cfg
        )

    return step
