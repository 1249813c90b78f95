"""Simulation driver — the functional replacement of the ``Subzero.m``
script loop.

The reference interleaves physics steps with process passes gated on
``mod(i_step, K)`` (Subzero.m:151-378).  Here the inner loop is a
``lax.scan`` over chunks of jitted physics steps (one device dispatch per
chunk, not per pair as in the MATLAB/MEX split — SURVEY.md section 3.2);
host-side work (diagnostics output, checkpointing, lifecycle topology
surgery) happens only at chunk boundaries.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig
from .diagnostics import dissolved_mass_grid, eulerian_data, total_mass
from .dynamics.step import StepAux, domain_polygon, physics_step
from .forcing import Forcing, gyre_ocean
from .state import FloeState


@dataclasses.dataclass
class Simulation:
    """Owns the state + step function and runs the time loop."""

    cfg: SimConfig
    state: FloeState
    forcing: Forcing
    modulus: float
    heat_flux: float = 0.0
    nx_coarse: int = 10
    ny_coarse: int = 10
    step_idx: int = 0
    dissolved: np.ndarray | None = None
    seed: int = 0
    pack_target: float = 1.0
    # Automatic output cadence (Subzero.m:220-298): when set, every
    # cfg.processes.n_dt_out steps the driver writes a full-state snapshot +
    # Eulerian fields (+ a figure when ``plot_output``) under this directory
    # and appends to the total-mass series.  With cfg.processes.average the
    # Eulerian fields are the time mean since the previous output
    # (accumulated at chunk boundaries, i.e. a 5-step-stride sampling of the
    # reference's every-step accumulation at Subzero.m:304-314).
    output_dir: "str | Path | None" = None
    plot_output: bool = False
    # moving walls (uniaxial case): step_idx -> (lx, ly) of the domain box
    wall_fn: "Callable[[int], tuple[float, float]] | None" = None
    # multi-device: a jax.sharding.Mesh with axis "shards" switches the
    # inner loop to the spatial-decomposition step (parallel/spatial.py)
    mesh: "object | None" = None

    def __post_init__(self):
        if self.dissolved is None:
            self.dissolved = np.zeros((self.ny_coarse, self.nx_coarse))
        self._domain = domain_polygon(self.cfg)
        # lifecycle orchestrator (host-side topology surgery)
        from .forcing import thermo_params
        from .processes.lifecycle import Lifecycle

        _, pack_h0 = thermo_params(
            self.cfg.numerics.dt, self.cfg.processes.n_pack,
            k=self.cfg.physics.k_thermal, t_air=self.cfg.physics.t_air,
            t_ocean=self.cfg.physics.t_ocean,
            rho_ice=self.cfg.physics.rho_ice,
            latent=self.cfg.physics.latent_heat,
        )
        areas = np.asarray(self.state.area)[np.asarray(self.state.alive)]
        amax = float(areas.max()) if len(areas) else None
        self.lifecycle = Lifecycle(
            self.cfg, np.asarray(domain_polygon(self.cfg), np.float64)[:4],
            seed=self.seed + 1, amax=amax,
            pack_h0=pack_h0 if self.heat_flux < 0 else 0.0,
            pack_target=self.pack_target,
            nx=self.nx_coarse, ny=self.ny_coarse,
        )
        # Pin closed-over forcing constants to host numpy: lowering a jitted
        # step embeds each jaxpr constant by reading its value, and reading
        # a device array back through the axon tunnel costs ~30 s PER
        # CONSTANT (measured; see dynamics/step.py make_step_fn).
        self.forcing = jax.tree_util.tree_map(np.asarray, self.forcing)
        cfg = self.cfg
        modulus = self.modulus
        heat_flux = self.heat_flux
        domain = self._domain
        nx, ny = self.nx_coarse, self.ny_coarse

        if self.mesh is not None:
            from .parallel import make_spatial_step, rebalance_slabs, shard_state

            self._spatial_step = make_spatial_step(
                cfg, self.forcing, modulus, heat_flux, self.mesh)
            n_shards = int(np.prod(self.mesh.devices.shape))
            self.state = shard_state(
                rebalance_slabs(self.state, cfg, n_shards), self.mesh)
            self._n_shards = n_shards

        @jax.jit
        def chunk_fn(state: FloeState, start: jnp.ndarray, n: jnp.ndarray,
                     dissolved: jnp.ndarray, domain_verts: jnp.ndarray):
            """Run ``n`` physics steps (bounded by static chunk size)."""

            def body(carry, i):
                st, dis = carry
                idx = start + i

                def do(args):
                    st, dis = args
                    if self.mesh is not None:
                        fn = getattr(self._spatial_step, "__wrapped__",
                                     self._spatial_step)
                        st2, aux = fn(st, idx, domain_verts)
                    else:
                        st2, aux = physics_step(
                            st, self.forcing, idx, domain_verts, modulus,
                            heat_flux, cfg,
                        )
                    dis2 = dis + dissolved_mass_grid(st, aux.killed, cfg,
                                                     nx, ny)
                    return (st2, dis2), aux

                def skip(args):
                    st, dis = args
                    zaux = _zero_aux(st, cfg)
                    return (st, dis), zaux

                (st2, dis2), aux = jax.lax.cond(i < n, do, skip, (st, dis))
                return (st2, dis2), aux

            (state, dissolved), auxes = jax.lax.scan(
                body, (state, dissolved), jnp.arange(self._chunk)
            )
            return state, dissolved, auxes

        # chunk = gcd of all process cadences (10, 20, 25, 75, 150, 500...)
        # so every cadence boundary lands on a chunk boundary
        self._chunk = 5
        self._chunk_fn = chunk_fn

    # -- main loop ---------------------------------------------------------

    def run(self, n_steps: int,
            on_chunk: Callable[["Simulation", StepAux], None] | None = None,
            log_every: int = 0) -> "Simulation":
        """Advance ``n_steps``; host callbacks at chunk boundaries."""
        done = 0
        t0 = time.time()
        dissolved = jnp.asarray(self.dissolved, self.state.x.dtype)
        while done < n_steps:
            n = min(self._chunk, n_steps - done)
            if self.wall_fn is not None:
                # moving walls (uniaxial case): rebuild the domain polygon
                lx, ly = self.wall_fn(self.step_idx)
                dom_np = np.array([[-lx, -ly], [lx, -ly], [lx, ly], [-lx, ly]])
                pad, _ = _pad_domain(dom_np)
                self._domain = jnp.asarray(pad, self.state.x.dtype)
                self.lifecycle.domain_poly = dom_np
            self.state, dissolved, auxes = self._chunk_fn(
                self.state, jnp.asarray(self.step_idx), jnp.asarray(n),
                dissolved, self._domain,
            )
            self.step_idx += n
            done += n
            # host-side lifecycle at the chunk boundary
            aux_last = jax.tree_util.tree_map(lambda a: a[n - 1], auxes)
            merge_pairs = chunk_merge_pairs(auxes, n)
            dis_np = np.asarray(dissolved)
            self.state, dis_np, changed = self.lifecycle.step(
                self.state, aux_last, self.step_idx, dis_np,
                merge_pairs=merge_pairs,
            )
            if changed and self.mesh is not None:
                from .parallel import rebalance_slabs, shard_state

                self.state = shard_state(
                    rebalance_slabs(self.state, self.cfg, self._n_shards),
                    self.mesh)
            dissolved = jnp.asarray(dis_np, self.state.x.dtype)
            if self.cfg.processes.advect_dissolved:
                # Advect-diffuse the dissolved field (Advect_Dissolved_Ice.m;
                # carried disabled by the reference driver, Subzero.m:359)
                from .dissolved import advect_dissolved

                tend = getattr(self, "_vd_tend", None)
                if tend is None:
                    tend = jnp.zeros_like(dissolved)
                for _ in range(n):
                    dissolved, tend = advect_dissolved(
                        dissolved, tend, self.forcing, self.cfg,
                        self.cfg.numerics.dt, self.nx_coarse, self.ny_coarse)
                self._vd_tend = tend
            # keep the public field in sync mid-run: _auto_output's mass
            # series and on_chunk callbacks read sim.dissolved (it was
            # previously only written back after run() returned, so the
            # recorded dissolved column was the stale pre-run value)
            self.dissolved = np.asarray(dissolved)
            # Surface per-region pool overflow: those steps fell back to
            # aggregate contacts (physics degradation — raise
            # ContactConfig.region_pair_frac if this keeps firing).
            self.region_pool_need_max = max(
                getattr(self, "region_pool_need_max", 0),
                int(np.max(np.asarray(auxes.region_pool_need[:n]))))
            n_rov = int(np.sum(np.asarray(auxes.region_overflow[:n])))
            if n_rov:
                self.region_overflow_steps = (
                    getattr(self, "region_overflow_steps", 0) + n_rov)
                if not getattr(self, "_rov_warned", False):
                    self._rov_warned = True
                    print(
                        f"[sim] WARNING step {self.step_idx}: per-region "
                        f"pool overflow — {n_rov} step(s) fell back to "
                        "aggregate contacts (raise ContactConfig."
                        "region_pair_frac)"
                    )
            if self.output_dir is not None:
                self._auto_output()
            if on_chunk is not None:
                on_chunk(self, auxes)
            if log_every and (self.step_idx % log_every == 0):
                self.record_metrics(auxes)
                m = self.metrics_history()
                rate = done / max(time.time() - t0, 1e-9)
                print(
                    f"step {self.step_idx}: {m['alive'][-1]} floes, "
                    f"{m['collisions'][-1]} collisions, {rate:.1f} steps/s"
                )
        self.dissolved = np.asarray(dissolved)
        return self

    # -- automatic output (Subzero.m:220-298) --------------------------------

    def _auto_output(self) -> None:
        """Accumulate AVERAGE fields each chunk; every n_dt_out steps write
        snapshot + Eulerian fields (+ figure) and append the mass series."""
        n_out = self.cfg.processes.n_dt_out
        if self.cfg.processes.average:
            eul = {k: np.asarray(v) for k, v in self.eulerian()._asdict().items()}
            acc = getattr(self, "_eul_acc", None)
            if acc is None:
                self._eul_acc = eul
                self._eul_n = 1
            else:
                for k in acc:
                    acc[k] = acc[k] + eul[k]
                self._eul_n += 1
        if self.step_idx % n_out != 0:
            return
        out = Path(self.output_dir)
        snap = out / f"snap{self.step_idx:07d}"
        self.save(snap)
        if self.cfg.processes.average and getattr(self, "_eul_acc", None):
            eul = {k: v / self._eul_n for k, v in self._eul_acc.items()}
            self._eul_acc = None
        else:
            eul = {k: np.asarray(v)
                   for k, v in self.eulerian()._asdict().items()}
        np.savez_compressed(snap / "eulerian.npz", **eul)
        # total-mass series (Subzero.m:294-295); continue an existing
        # on-disk series across checkpoint resumes
        series = getattr(self, "_mass_series", None)
        if series is None:
            series = []
            prior = out / "mass_series.npy"
            if prior.exists():
                series = [tuple(row) for row in np.load(prior)
                          if row[0] < self.step_idx]
        series.append((self.step_idx, self.total_mass(),
                       float(np.sum(self.dissolved if self.dissolved
                                    is not None else 0.0))))
        self._mass_series = series
        np.save(out / "mass_series.npy", np.asarray(series))
        if self.plot_output:
            try:
                import matplotlib

                matplotlib.use("Agg")
                from .plotting import plot_basic

                fig = plot_basic(self.state, self.cfg, self.forcing)
                fig.savefig(out / f"fig{self.step_idx:07d}.png", dpi=110)
                import matplotlib.pyplot as plt

                plt.close(fig)
            except Exception as e:  # plotting must never kill a run
                print(f"[sim] plot failed: {e}")

    # -- observability -----------------------------------------------------
    # (SURVEY.md section 5: the reference has only tic/toc prints; here a
    # structured metrics record + an XLA profiler hook)

    def metrics_history(self) -> dict:
        """Accumulated per-chunk series: step, wall time, collisions, live
        floe count, total mass."""
        if not hasattr(self, "_metrics"):
            self._metrics = {
                "step": [], "wall_s": [], "collisions": [],
                "alive": [], "mass": [],
            }
        return self._metrics

    def record_metrics(self, auxes) -> None:
        m = self.metrics_history()
        m["step"].append(self.step_idx)
        m["wall_s"].append(time.time())
        m["collisions"].append(int(np.max(np.asarray(auxes.n_collisions))))
        m["alive"].append(int(np.sum(np.asarray(self.state.alive))))
        m["mass"].append(float(total_mass(self.state)))

    def profile(self, path: str, n_steps: int = 10) -> str:
        """Run ``n_steps`` under the JAX/XLA profiler; trace goes to
        ``path`` (open with TensorBoard or xprof)."""
        import jax.profiler

        with jax.profiler.trace(path):
            self.run(n_steps)
        return path

    # -- diagnostics -------------------------------------------------------

    def eulerian(self):
        return eulerian_data(self.state, self.cfg, self.nx_coarse,
                             self.ny_coarse)

    def total_mass(self) -> float:
        return float(total_mass(self.state))

    # -- checkpoint / resume (SURVEY.md section 5: orbax-style full-state
    # snapshots replacing the .mat dumps at Subzero.m:285) ------------------

    def save(self, path: str | Path):
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        arrays = {
            f.name: np.asarray(getattr(self.state, f.name))
            for f in dataclasses.fields(self.state)
        }
        np.savez_compressed(path / "state.npz", **arrays)
        meta = {
            "step_idx": self.step_idx,
            "modulus": self.modulus,
            "heat_flux": self.heat_flux,
            "nx_coarse": self.nx_coarse,
            "ny_coarse": self.ny_coarse,
            "seed": self.seed,
            "pack_target": self.pack_target,
            "cfg": dataclasses.asdict(self.cfg),
        }
        (path / "meta.json").write_text(json.dumps(meta, indent=1))
        np.save(path / "dissolved.npy", self.dissolved)

    @classmethod
    def load(cls, path: str | Path, cfg: SimConfig, forcing: Forcing,
             ) -> "Simulation":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        data = np.load(path / "state.npz")
        from .state import empty_state

        proto = empty_state(cfg)

        def _fit(k):
            # Saved at a smaller floe capacity than cfg now asks for: pad
            # with empty slots so a resumed run can grow (capacity bumps
            # between campaign legs must not invalidate snapshots).
            arr = jnp.asarray(data[k], getattr(proto, k).dtype)
            tgt = getattr(proto, k)
            if (arr.shape != tgt.shape and arr.shape[1:] == tgt.shape[1:]
                    and arr.shape[0] < tgt.shape[0]):
                arr = jnp.concatenate([arr, tgt[arr.shape[0]:]], axis=0)
            return arr

        state = proto.replace(**{k: _fit(k) for k in data.files})
        return cls(
            cfg=cfg, state=state, forcing=forcing,
            modulus=meta["modulus"], heat_flux=meta["heat_flux"],
            nx_coarse=meta["nx_coarse"], ny_coarse=meta["ny_coarse"],
            step_idx=meta["step_idx"],
            seed=meta.get("seed", 0),
            pack_target=meta.get("pack_target", 1.0),
            dissolved=np.load(path / "dissolved.npy"),
        )


def chunk_merge_pairs(auxes: StepAux, n: int
                      ) -> "list[tuple[int, int]] | None":
    """(absorbee, partner) merge pairs OR'd across a whole device chunk.

    The reference fuses >55%-overlap pairs EVERY step
    (floe_interactions_all.m:470-501); flags raised at any step of the chunk
    must not be dropped just because the overlap cleared by the last step —
    each flag is resolved against its own step's neighbor table."""
    mi = np.asarray(auxes.merge_i[:n])
    if not mi.any():
        return None
    nbr = np.asarray(auxes.nbr_idx[:n])
    s_t, i_t, k_t = np.nonzero(mi)
    return list(dict.fromkeys(
        (int(i), int(nbr[s, i, k]))
        for s, i, k in zip(s_t, i_t, k_t)))


def _pad_domain(rect: np.ndarray, v_cap: int = 8):
    from .geometry.polygon import pad_polygon

    return pad_polygon(rect, v_cap)


def _zero_aux(state: FloeState, cfg: SimConfig) -> StepAux:
    n = state.n
    k = cfg.capacity.max_neighbors
    dt = state.x.dtype
    zk = jnp.zeros((n, k), dt)
    return StepAux(
        n_collisions=jnp.zeros((), jnp.int32),
        merge_i=jnp.zeros((n, k), bool),
        merge_j=jnp.zeros((n, k), bool),
        absorb_boundary=jnp.zeros((n,), bool),
        killed=jnp.zeros((n,), bool),
        nbr_overflow=jnp.zeros((), bool),
        overlap_area=jnp.zeros((n,), dt),
        collision_force=jnp.zeros((n, 2), dt),
        collision_torque=jnp.zeros((n,), dt),
        nbr_idx=jnp.zeros((n, k), jnp.int32),
        pair_valid=jnp.zeros((n, k), bool),
        pair_px=zk, pair_py=zk, pair_fx=zk, pair_fy=zk, pair_overlap=zk,
        boundary_contact=jnp.zeros((n,), bool),
        region_overflow=jnp.zeros((), bool),
        region_pool_need=jnp.zeros((), jnp.int32),
    )


def out_of_box_sim(seed: int = 0, n_floes: int = 10) -> Simulation:
    """The reference's out-of-box configuration: ~10 Voronoi floes in a
    +-1e5 m box over the 4-gyre ocean, dt=10 s, collisions + corners only
    (README.md 'Running your first model'; Subzero.m:6-36)."""
    from .config import ContactConfig
    from .init import initial_state

    # tiny population: size the per-region pool so the decomposition never
    # falls back to aggregate contacts (peak demand measured 212 of the
    # ~90 ordered pair slots' ghost-expanded table in the r3 campaign)
    cfg = SimConfig(contact=ContactConfig(region_pair_frac=0.5))
    state, modulus = initial_state(cfg, 1.0, n_floes, 0.25, seed=seed)
    forcing = gyre_ocean()
    return Simulation(cfg=cfg, state=state, forcing=forcing, modulus=modulus)
