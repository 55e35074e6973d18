"""Shared CLI plumbing: gauge setup, operator/MG assembly, logging.

The equivalent of the reference's main-program scaffolding
(`programs/CalcMG_*.cpp` + tests/utils flag parsing [U]; SURVEY.md C30):
every executable loads a YAML RunConfig and goes through setup() here.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("tpuqcd")


def parse_args(description: str):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--config", required=True, help="YAML run config")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--device", default=None,
                    help="cpu to force the CPU backend")
    args = ap.parse_args()
    # multi-process launch (TPUQCD_DIST=1, one process per host): form
    # the global runtime BEFORE the first device touch below
    from ..parallel.dist import init_distributed
    init_distributed()
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        stream=sys.stdout)
    if jax.process_count() > 1 and jax.process_index() != 0:
        # rank-0-style logging (SURVEY.md §6.5): non-zero processes keep
        # warnings/errors only
        logging.getLogger("tpuqcd").setLevel(logging.WARNING)
    # CLI policy: eager/physics/analysis code runs on the host CPU; the
    # jitted solver runs on the accelerator via explicitly device_put
    # inputs.  (Full-layout complex arrays cannot materialize on the axon
    # TPU backend, so the default device must be the CPU.)
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    global _ACCEL
    if args.device == "cpu":
        _ACCEL = jax.devices("cpu")[0]
    # persistent XLA compilation cache: MG setup is ~97% compile time
    # (measured 101 s cold vs 3.4 s warm in-process at 32^3x64), so any
    # cross-process compile reuse is free wallclock (~20% on the
    # remote-compile axon backend).  The reference's QUDA_RESOURCE_PATH
    # tunecache plays the same role.  Gated on the ACTUAL accelerator
    # platform, not the --device flag: XLA:CPU AOT executables are
    # host-feature-sensitive and reloading one written on a different
    # machine segfaults.  TPUQCD_NO_COMPILE_CACHE=1 opts out.
    if (accel().platform != "cpu"
            and not os.environ.get("TPUQCD_NO_COMPILE_CACHE")
            and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        cache_dir = os.path.join(
            os.environ.get("TPUQCD_RESOURCE_PATH",
                           os.path.expanduser("~/.cache/tpuqcd")), "xla")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass
    from ..utils.config import load_config
    return load_config(args.config), args


_ACCEL = None


def accel():
    """The accelerator device for solves/contractions (honors
    ``--device cpu``)."""
    return _ACCEL if _ACCEL is not None else jax.devices()[0]


def ensemble_members(cfg):
    """Yield (ctag, cfg_member) for each gauge configuration of an
    ensemble run, or a single ("", cfg) in single-config mode.

    The reference measures an ensemble by scripting one process per
    configuration ([U] CalcMG_* driver scripts; SURVEY.md §4.1); here
    the members run in ONE persistent process, so every XLA program
    (solvers, MG setup probing, contraction engines) compiles once and
    the per-member setup cost drops to warm-execution time (measured
    ~3% of the cold first-member cost — BASELINE.md).  Members come
    from gauge.config_files (ILDG paths) or gauge.random_seeds; each
    member's physics.output gets '.<ctag>' inserted before the file
    suffix so correlators land in per-configuration files, matching the
    reference's output organization.
    """
    import dataclasses as _dc
    g = cfg.gauge
    files = tuple(getattr(g, "config_files", ()) or ())
    seeds = tuple(getattr(g, "random_seeds", ()) or ())
    hb_chain = (getattr(g, "heatbath_beta", None) is not None
                and getattr(g, "heatbath_n_cfg", 1) > 1)
    if not files and not seeds and not hb_chain:
        yield "", cfg
        return
    if hb_chain:
        members = _heatbath_chain_members(cfg)
        files = tuple(m[1].config_file for m in members)
    elif files:
        members = [(os.path.splitext(os.path.basename(f))[0],
                    _dc.replace(g, config_file=f)) for f in files]
    else:
        members = [(f"s{int(s)}", _dc.replace(g, random_seed=int(s)))
                   for s in seeds]
    root, ext = os.path.splitext(cfg.physics.output)
    for i, (ctag, g_i) in enumerate(members):
        if files and i + 1 < len(members):
            # read-ahead: member i+1's gauge file loads on a background
            # thread while member i computes (io/prefetch.py)
            from ..io.prefetch import prefetch
            prefetch(members[i + 1][1].config_file)
        ph = _dc.replace(cfg.physics, output=f"{root}.{ctag}{ext}")
        yield ctag, _dc.replace(cfg, gauge=g_i, physics=ph)


def _heatbath_chain_members(cfg):
    """Generate heatbath ensemble members from ONE Markov chain
    (ops/heatbath.generate_ensemble: thermalize once, then a member
    every heatbath_skip compound sweeps — the reference consumes chains
    produced exactly this way by its HMC/heatbath codes [U]), write each
    to ILDG via io/lime.py, and return (ctag, gauge-params) whose
    config_file re-reads the member through the C28 LIME reader with a
    plaquette_check pinned to the generated value: the ensemble path IS
    the write/read round-trip validation (VERDICT r3 #7).
    """
    import dataclasses as _dc

    from .. import su3
    from ..fields import gauge_eo_to_full
    from ..io.lime import write_ildg_gauge
    from ..lattice import Lattice
    from ..ops.gauge_tools import plaquette
    from ..ops.heatbath import generate_ensemble
    from ..ops.layout import gauge_from_device

    g = cfg.gauge
    lat = Lattice(tuple(g.dims))
    out_dir = g.heatbath_dir or os.path.join(
        os.path.dirname(cfg.physics.output) or ".", "ensemble")
    os.makedirs(out_dir, exist_ok=True)
    cpu = jax.devices("cpu")[0]
    # born on the accelerator, not shipped (complex device_put dies
    # UNIMPLEMENTED on axon — see setup_gauge)
    with jax.default_device(accel()):
        u0 = jax.jit(lambda: su3.unit_gauge_dev(lat))()
    members = []
    gen = generate_ensemble(jax.random.PRNGKey(g.random_seed), lat,
                            g.heatbath_beta, g.heatbath_n_cfg,
                            n_therm=g.heatbath_sweeps,
                            n_skip=g.heatbath_skip, u0=u0)
    for i, u_dev in enumerate(gen):
        with jax.default_device(accel()):
            plaq = float(plaquette(u_dev, lat))
        path = os.path.join(
            out_dir, f"hb_b{g.heatbath_beta:g}_{i:04d}.lime")
        # split INSIDE the accel context + np.asarray fetch (complex64
        # transfers die UNIMPLEMENTED on axon; see setup_gauge)
        with jax.default_device(accel()):
            re, im = jax.jit(lambda x: (jnp.real(x),
                                        jnp.imag(x)))(u_dev)
        re_h, im_h = np.asarray(re), np.asarray(im)
        with jax.default_device(cpu):
            u_h = jax.lax.complex(jnp.asarray(re_h), jnp.asarray(im_h))
            u_full = gauge_eo_to_full(gauge_from_device(u_h, lat), lat)
            write_ildg_gauge(path, np.asarray(u_full), lat)
        log.info("heatbath chain member %d -> %s (plaquette %.8f)",
                 i, path, plaq)
        members.append((f"c{i:04d}",
                        _dc.replace(g, heatbath_beta=None,
                                    config_file=path,
                                    plaquette_check=plaq)))
    return members


def setup_gauge(cfg):
    """Load or generate the gauge field; returns (lat, u_full, u_pk,
    u_dev_complex)."""
    from .. import su3
    from ..fields import apply_boundary_phase, gauge_full_to_eo
    from ..lattice import Lattice
    from ..ops.gauge_tools import plaquette
    from ..ops.layout import gauge_to_device
    from ..utils.packed import pack_gauge

    # full-layout complex arrays (trailing (3,3)) cannot even materialize
    # on the axon TPU backend — build them on the host CPU; only the
    # device-layout forms (site-minor trailing dims) go to the TPU.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if cfg.gauge.config_file:
            # joins an in-flight ensemble read-ahead, else reads now
            from ..io.prefetch import take
            u_np, lat = take(cfg.gauge.config_file)
            u_full = jnp.asarray(u_np)
            log.info("loaded gauge %s dims=%s", cfg.gauge.config_file,
                     lat.dims)
        elif getattr(cfg.gauge, "heatbath_beta", None) is not None:
            # quenched heatbath source (ops/heatbath.py): thermalize in
            # the device layout on the accelerator (site-minor complex
            # is TPU-safe), then form the host full-layout copy.
            from ..fields import gauge_eo_to_full
            from ..ops.heatbath import thermalize
            from ..ops.layout import gauge_from_device
            lat = Lattice(tuple(cfg.gauge.dims))
            # COMPUTE the cold start on the accelerator (one jitted
            # constant program): complex64 device_put transfers die
            # UNIMPLEMENTED on axon, so the unit gauge must be born
            # there, not shipped
            with jax.default_device(accel()):
                u0 = jax.jit(lambda: su3.unit_gauge_dev(lat))()
                u_hb = thermalize(
                    jax.random.PRNGKey(cfg.gauge.random_seed), lat,
                    cfg.gauge.heatbath_beta, cfg.gauge.heatbath_sweeps,
                    u0=u0)
                # split INSIDE the accel context (under the CLI's
                # global CPU default device, a jit on the TPU-resident
                # complex array would try to SHIP it to the CPU first —
                # the UNIMPLEMENTED complex transfer), then fetch the
                # real parts via np.asarray (the only transfer the axon
                # backend implements)
                re, im = jax.jit(
                    lambda x: (jnp.real(x), jnp.imag(x)))(u_hb)
            re_h, im_h = np.asarray(re), np.asarray(im)
            with jax.default_device(cpu):
                u_hb = jax.lax.complex(jnp.asarray(re_h),
                                       jnp.asarray(im_h))
            u_full = gauge_eo_to_full(gauge_from_device(u_hb, lat), lat)
            log.info("heatbath gauge dims=%s beta=%.3f sweeps=%d seed=%d",
                     lat.dims, cfg.gauge.heatbath_beta,
                     cfg.gauge.heatbath_sweeps, cfg.gauge.random_seed)
        else:
            lat = Lattice(tuple(cfg.gauge.dims))
            u_full = su3.random_gauge(
                jax.random.PRNGKey(cfg.gauge.random_seed), lat)
            log.info("generated random gauge dims=%s seed=%d", lat.dims,
                     cfg.gauge.random_seed)
        u_dev = gauge_to_device(gauge_full_to_eo(u_full, lat), lat)
    plaq = float(plaquette(u_dev, lat))
    log.info("plaquette = %.8f", plaq)
    if cfg.gauge.plaquette_check is not None:
        if abs(plaq - cfg.gauge.plaquette_check) > 1e-5:
            raise RuntimeError(
                f"plaquette check failed: {plaq} != "
                f"{cfg.gauge.plaquette_check}")
    if getattr(cfg.gauge, "fix", ""):
        # gauge fixing BEFORE boundary phases, on the raw periodic
        # links (reference gaugeFixingOVR order [U]; SURVEY.md C16).
        # The overrelaxation loop is host-driven (per-sweep functional
        # fetch) — keep it on the CPU backend; the fixed field then
        # flows through the same packing/upload path below.
        from ..fields import gauge_eo_to_full
        from ..ops.gauge_fix import gauge_fix
        from ..ops.layout import gauge_from_device
        with jax.default_device(cpu):
            u_dev, hist = gauge_fix(u_dev, lat, gauge=cfg.gauge.fix,
                                    n_sweeps=cfg.gauge.fix_sweeps,
                                    tol=cfg.gauge.fix_tol)
            u_full = gauge_eo_to_full(gauge_from_device(u_dev, lat), lat)
        log.info("%s gauge fixing: %d sweeps, functional %.8f",
                 cfg.gauge.fix, len(hist), hist[-1] if hist else 0.0)
    with jax.default_device(cpu):
        u_full_bc = apply_boundary_phase(u_full, lat,
                                         cfg.gauge.antiperiodic_t)
        u_dev_bc = gauge_to_device(gauge_full_to_eo(u_full_bc, lat), lat)
        u_pk_host = pack_gauge(u_dev_bc)
    u_pk = jax.device_put(u_pk_host, accel())
    return lat, u_full_bc, u_pk, u_dev_bc


def smeared_gauge(cfg, lat, u_dev):
    """APE- or stout-smeared gauge for Gaussian smearing (no boundary
    phase; physics.smear_type, reference performAPEnStep /
    performSTOUTnStep [U] C16)."""
    if cfg.physics.smear_n_ape <= 0:
        return u_dev
    if cfg.physics.smear_type == "stout":
        from ..ops.gauge_tools import stout_smear
        log.info("stout smearing: rho=%.3f n=%d",
                 cfg.physics.smear_rho_stout, cfg.physics.smear_n_ape)
        return stout_smear(u_dev, lat, rho=cfg.physics.smear_rho_stout,
                           n_steps=cfg.physics.smear_n_ape,
                           spatial_only=True)  # smearing links are 3-D
    from ..ops.gauge_tools import ape_smear
    log.info("APE smearing: alpha=%.3f n=%d", cfg.physics.smear_alpha_ape,
             cfg.physics.smear_n_ape)
    return ape_smear(u_dev, lat, alpha=cfg.physics.smear_alpha_ape,
                     n_steps=cfg.physics.smear_n_ape)


def _mg_fine_level(cfg, lat, u_pk, flavor, lmesh=None):
    """TM or TM-clover fine level per the action config; with a
    LatticeMesh the fine level is the shard_map ShardedFineLevel
    (multi-chip MG, config 5)."""
    from ..mg.device import DeviceFineCloverLevel, DeviceFineLevel
    u32 = u_pk.astype(jnp.float32)
    cl_pk = None
    if getattr(cfg.action, "csw", 0.0):
        from ..ops.clover import clover_blocks
        from ..utils.packed import pack_clover, unpack_gauge
        a = clover_blocks(unpack_gauge(u32), lat, cfg.action.kappa,
                          cfg.action.csw)
        cl_pk = jnp.stack([pack_clover(a[0]), pack_clover(a[1])])
    if lmesh is not None:
        from ..mg.shard import ShardedFineLevel
        return ShardedFineLevel.build(
            lat, lmesh, u32, cfg.action.kappa, cfg.action.mu,
            flavor=flavor, backend=cfg.solver.backend,
            clover_pk=cl_pk, csw=float(getattr(cfg.action, "csw", 0.0)))
    tb = -1 if cfg.gauge.antiperiodic_t else +1
    if cl_pk is not None:
        return DeviceFineCloverLevel(lat, u32, cl_pk, cfg.action.kappa,
                                     cfg.action.mu, csw=cfg.action.csw,
                                     flavor=flavor,
                                     backend=cfg.solver.backend,
                                     t_boundary=tb)
    return DeviceFineLevel(lat, u32, cfg.action.kappa, cfg.action.mu,
                           flavor, backend=cfg.solver.backend,
                           t_boundary=tb)


def make_solver(cfg, lat, u_pk, u_full):
    """Returns solve(b_full [T,Z,Y,X,4,3], flavor) -> x_full, honoring
    the MG config (MG-preconditioned full-system solve) or the eo
    mixed-precision path."""
    from ..phys.propagator import full_to_packed, packed_to_full
    from ..solve import solve_tm
    from ..utils.profile import solve_flops

    sloppy = (jnp.bfloat16 if cfg.solver.sloppy_dtype == "bfloat16"
              else jnp.float32)
    csw = float(getattr(cfg.action, "csw", 0.0) or 0.0)
    rhs_batch = max(1, int(getattr(cfg.solver, "rhs_batch", 1)))

    # multi-chip domain decomposition (config 5; the reference's
    # --gridsize [U] SURVEY.md §6.8): a (t, z, y) LatticeMesh routes
    # every solve through the sharded operators / sharded MG fine level,
    # and all device fields carry the mesh sharding
    lmesh = None
    mesh_cfg = getattr(cfg, "mesh", None)
    mesh_ny = int(getattr(mesh_cfg, "ny", 1) or 1) if mesh_cfg else 1
    if mesh_cfg is not None and mesh_cfg.nt * mesh_cfg.nz * mesh_ny > 1:
        from ..parallel.mesh import LatticeMesh
        # devices of the ACCELERATOR platform (with --device cpu this is
        # the forced-multi-device CPU backend, the virtual-mesh test rig)
        lmesh = LatticeMesh.make(lat, mesh_cfg.nt, mesh_cfg.nz, mesh_ny,
                                 devices=jax.devices(accel().platform))
        log.info("lattice mesh: %d x %d x %d devices over (T, Z, Y)",
                 mesh_cfg.nt, mesh_cfg.nz, mesh_ny)

    def _put(arr):
        """Place a packed SOLVER-layout array [.., 2par, 2ri, 4, 3, T,
        Z, S] on the accelerator (mesh sharding when mesh is on)."""
        if lmesh is None:
            return jax.device_put(arr, accel())
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.dist import global_put
        spec = [None] * arr.ndim
        spec[arr.ndim - 3] = "t"
        spec[arr.ndim - 2] = "z"
        spec[arr.ndim - 1] = "y"    # packed S is y-major
        return global_put(arr, NamedSharding(lmesh.mesh, P(*spec)))

    def _chunked_batch(solve_chunk_fn, b_pks, flavor):
        """Drive solve_chunk_fn(b [k, 2par, 2ri, ...]) -> x over
        rhs_batch-sized chunks of the leading axis."""
        n = b_pks.shape[0]
        outs = []
        for lo in range(0, n, rhs_batch):
            outs.append(solve_chunk_fn(b_pks[lo:lo + rhs_batch], flavor))
        return jnp.concatenate(outs, axis=0)

    if cfg.mg.enabled:
        # device-resident MG (mg/dsolve.py): setup, V-cycles, and the f64
        # certification all run on the accelerator
        from ..mg.device import DeviceFineLevel
        from ..mg.dsolve import DeviceMG, DeviceMGParams
        from ..utils.checkpoint import load_device_mg, save_device_mg
        params = DeviceMGParams(n_vec=tuple(cfg.mg.n_vec),
                                block=tuple(cfg.mg.block),
                                setup_iters=cfg.mg.setup_iters,
                                smoother_iters=cfg.mg.smoother_iters,
                                coarse_iters=cfg.mg.coarse_maxiter,
                                restart=cfg.mg.restart,
                                mu_factor=cfg.mg.mu_factor,
                                setup_solver=cfg.mg.setup_solver,
                                smoother_dtype=cfg.mg.smoother_dtype,
                                coarse_dtype=cfg.mg.coarse_dtype,
                                gcr_dtype=cfg.mg.gcr_dtype,
                                vec_dtype=cfg.mg.vec_dtype)
        if lmesh is not None and (cfg.mg.vec_infile or cfg.mg.vec_outfile):
            raise NotImplementedError(
                "mg.vec_infile/vec_outfile checkpointing is single-chip; "
                "drop it from the config when mesh is enabled")
        mgs = {}
        for flavor in (+1, -1):
            lv = _mg_fine_level(cfg, lat, u_pk, flavor, lmesh)
            if cfg.mg.vec_infile:
                mg = load_device_mg(f"{cfg.mg.vec_infile}.f{flavor:+d}.npz",
                                    lv, params)
                log.info("MG hierarchy loaded (flavor %+d)", flavor)
            else:
                log.info("MG setup (flavor %+d)...", flavor)
                mg = DeviceMG(lv, params)
                if cfg.mg.vec_outfile:
                    save_device_mg(
                        f"{cfg.mg.vec_outfile}.f{flavor:+d}.npz", mg)
            mgs[flavor] = mg

        def solve_pk_src(b_pk, flavor=+1):
            """packed source [2par, 2ri, 4, 3, T, Z, S] -> packed result
            (the all-device pipeline entry: device seq sources etc.)."""
            from ..solve import solve_tm_mg
            b_pk = _put(b_pk)
            res = solve_tm_mg(mgs[flavor], b_pk, tol=cfg.solver.tol,
                              inner_tol=cfg.solver.inner_tol)
            log.info("  mg solve: relres=%.2e iters=%d",
                     float(res.relres), int(res.iters))
            return res

        def solve_pk(b_full, flavor=+1):
            """packed f32 solution on the accelerator (device-contraction
            consumers: phys.contract_dev)."""
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                b_pk = full_to_packed(b_full, lat)
            return solve_pk_src(b_pk, flavor)

        def solve(b_full, flavor=+1):
            from ..fields import eo_to_full
            from ..ops.layout import spinor_from_device
            res = solve_pk(b_full, flavor)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                # keep f64 end-to-end so the certified tolerance survives
                x64 = jax.device_put(res.x, cpu)
                c = jax.lax.complex(x64[:, 0], x64[:, 1])
                return eo_to_full(spinor_from_device(c, lat), lat)

        def solve_pk_src_batch(b_pks, flavor=+1):
            """batched multi-RHS MG solve over chunks of rhs_batch
            columns (SURVEY.md §8.4): b_pks [n, 2par, 2ri, 4, 3, T, Z,
            S] -> x f32 same layout."""
            from ..solve import solve_tm_mg_batch
            if lmesh is not None:
                # vmap over the shard_map fine level is untested; on a
                # mesh the columns run sequentially (each fully sharded)
                return jnp.stack(
                    [solve_pk_src(b_pks[i], flavor).x.astype(jnp.float32)
                     for i in range(b_pks.shape[0])])

            def chunk(bs, fl):
                bs = jax.device_put(bs, accel())
                res = solve_tm_mg_batch(mgs[fl], bs, tol=cfg.solver.tol,
                                        inner_tol=cfg.solver.inner_tol)
                log.info("  mg batch solve (%d rhs): max relres=%.2e "
                         "iters=%d", bs.shape[0],
                         float(np.max(res.relres)), int(res.iters))
                return res.x.astype(jnp.float32)

            return _chunked_batch(chunk, b_pks, flavor)

        solve.packed = lambda b_full, flavor=+1: \
            solve_pk(b_full, flavor).x.astype(jnp.float32)
        solve.packed_src = lambda b_pk, flavor=+1: \
            solve_pk_src(b_pk, flavor).x.astype(jnp.float32)
        solve.packed_src_batch = solve_pk_src_batch
        solve.lmesh = lmesh
        solve.put = _put
        return solve

    if cfg.solver.solver == "eigcg":
        if csw != 0.0:
            raise NotImplementedError(
                "solver: eigcg runs on the plain twisted-mass operator "
                "only; with action.csw != 0 use mg.enabled or "
                "solver: cg/bicgstab (which honor the clover term)")
        # incremental eigCG: one stateful solver per flavor; the
        # deflation space grows across the 12-column propagator solves.
        # On a mesh the sharded twin binds the shard_map operator and
        # the whole deflation basis carries the mesh sharding (C20).
        from ..solve import EigCGSolver, ShardedEigCGSolver
        u_acc = jax.device_put(u_pk, accel())
        solvers = {}

        def _eigcg_solver(flavor):
            if flavor not in solvers:
                if lmesh is not None:
                    solvers[flavor] = ShardedEigCGSolver(
                        u_pk, lat, lmesh, kappa=cfg.action.kappa,
                        mu=cfg.action.mu, flavor=flavor,
                        backend=cfg.solver.backend)
                else:
                    solvers[flavor] = EigCGSolver(
                        u_acc, lat, kappa=cfg.action.kappa,
                        mu=cfg.action.mu, flavor=flavor,
                        backend=cfg.solver.backend,
                        t_boundary=-1 if cfg.gauge.antiperiodic_t else +1)
            return solvers[flavor]

        def solve_pk_src(b_pk, flavor=+1):
            b_pk = _put(b_pk)
            res = _eigcg_solver(int(flavor)).solve(
                b_pk, tol=cfg.solver.tol, inner_tol=cfg.solver.inner_tol,
                maxiter=cfg.solver.maxiter)
            log.info("  eigcg solve: relres=%.2e iters=%d (space k=%d)",
                     float(res.relres), int(res.iters),
                     _eigcg_solver(int(flavor)).space.k)
            return res.x.astype(jnp.float32)

        def solve_pk(b_full, flavor=+1):
            cpu_ = jax.devices("cpu")[0]
            with jax.default_device(cpu_):
                b_pk = full_to_packed(b_full, lat)
            return solve_pk_src(b_pk, flavor)

        def solve(b_full, flavor=+1):
            x_pk = solve_pk(b_full, flavor)
            cpu_ = jax.devices("cpu")[0]
            with jax.default_device(cpu_):
                return packed_to_full(jax.device_put(x_pk, cpu_), lat)

        solve.packed = solve_pk
        solve.packed_src = solve_pk_src
        # eigCG thrives on the SEQUENCE (the deflation space grows per
        # column), so the batch entry just loops
        solve.packed_src_batch = lambda b_pks, flavor=+1: jnp.stack(
            [solve_pk_src(b_pks[i], flavor)
             for i in range(b_pks.shape[0])])
        solve.lmesh = lmesh
        solve.put = _put
        return solve

    from functools import partial

    if lmesh is not None:
        # sharded mixed-precision solve (config-5 plain path): fused
        # per-shard kernels (pallas) or GSPMD-free overlap repairs (xla)
        # for the iteration; f64 certification on the dtype-generic twin
        import dataclasses as _dc
        from ..parallel.sharded import (ShardedTMCloverOperatorPC,
                                        ShardedTMOperatorPC)
        from ..solve import make_clover_fields, solve_tm_sharded

        def _static_policy():
            """overlap choice derivable without timing, else None."""
            if cfg.solver.backend == "xla":
                return True      # xla interior IS the overlap form
            if lmesh.ny > 1:
                return True      # no fused halo_y mode (validated too)
            pol = cfg.solver.comm_policy
            if pol in ("fused", "overlap"):
                return pol == "overlap"
            return None

        def _resolve_policy(op_fused, fields, probe_shape):
            """comm_policy knob -> overlap bool (tune on real TPUs)."""
            st = _static_policy()
            if st is not None:
                return st
            n_dev = lmesh.nt * lmesh.nz * lmesh.ny
            on_tpu = jax.devices()[0].platform not in ("cpu",)
            if n_dev == 1 or not on_tpu:
                # single shard has no comms to hide; off-hardware
                # timings are meaningless — heuristic: fused
                return False
            from ..utils.tune import tune_comm_policy
            op_over = _dc.replace(op_fused, overlap=True)
            b = _put(jnp.ones(probe_shape, jnp.float32))
            tag = "clover" if csw != 0.0 else "tm"
            winner = tune_comm_policy(
                lat, lmesh,
                {"fused": lambda x: op_fused.apply(fields, x),
                 "overlap": lambda x: op_over.apply(fields, x)},
                b, tag=tag)
            log.info("comm_policy auto -> %s", winner)
            return winner == "overlap"

        overlap_s = bool(_static_policy())
        ops = {}
        if csw != 0.0:
            clover = make_clover_fields(u_pk, lat, kappa=cfg.action.kappa,
                                        mu=cfg.action.mu, csw=csw)
            for flavor in (+1, -1):
                op_s = ShardedTMCloverOperatorPC(
                    lat, lmesh, kappa=cfg.action.kappa, mu=cfg.action.mu,
                    csw=csw, flavor=flavor, backend=cfg.solver.backend,
                    overlap=overlap_s)
                ops[flavor] = (op_s,
                               _dc.replace(op_s, backend="xla",
                                           overlap=True))
            # Extend/shard at native dtype, downcast per consumer
            # (f32-truncated fields would floor the f64 certification
            # residual at ~1e-7 — ADVICE r3).
            f0 = ops[+1][0].extend_fields(u_pk, *clover)
            fields_hp = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64), f0)
            fields_s = jax.tree_util.tree_map(
                lambda a: a.astype(sloppy), fields_hp)
        else:
            for flavor in (+1, -1):
                op_s = ShardedTMOperatorPC(
                    lat, lmesh, kappa=cfg.action.kappa, mu=cfg.action.mu,
                    flavor=flavor, backend=cfg.solver.backend,
                    overlap=overlap_s)
                ops[flavor] = (op_s,
                               _dc.replace(op_s, backend="xla",
                                           overlap=True))
            # Shard at native dtype; downcast for the sloppy operator
            # only (an f32-truncated gauge would floor the f64
            # certification residual at ~1e-7 — ADVICE r3).
            u_ext = ops[+1][0].extend_gauge(
                lmesh.shard_gauge(u_pk)).astype(jnp.float64)
            fields_s = u_ext.astype(sloppy)
            fields_hp = u_ext
        if cfg.solver.backend == "pallas":
            S = lat.Ly * lat.Lx // 2
            ov = _resolve_policy(ops[+1][0], fields_s,
                                 (2, 4, 3, lat.Lt, lat.Lz, S))
            if ov != overlap_s:
                ops = {fl: (_dc.replace(o, overlap=ov), hp)
                       for fl, (o, hp) in ops.items()}

        @partial(jax.jit, static_argnums=(0, 1))
        def _sharded_jit(op_s, op_hp, fs, fhp, b_sh):
            res = solve_tm_sharded(op_s, op_hp, fs, fhp, b_sh,
                                   tol=cfg.solver.tol,
                                   maxiter=cfg.solver.maxiter,
                                   inner_tol=cfg.solver.inner_tol,
                                   solver=cfg.solver.solver)
            return res.x.astype(jnp.float32), res.relres, res.iters

        def solve_pk_src(b_pk, flavor=+1):
            op_s, op_hp = ops[int(flavor)]
            x, relres, iters = _sharded_jit(op_s, op_hp, fields_s,
                                            fields_hp, _put(b_pk))
            log.info("  sharded solve: relres=%.2e iters=%d",
                     float(relres), int(iters))
            return x

        def solve_pk(b_full, flavor=+1):
            cpu_ = jax.devices("cpu")[0]
            with jax.default_device(cpu_):
                b_pk = full_to_packed(b_full, lat)
            return solve_pk_src(b_pk, flavor)

        def solve(b_full, flavor=+1):
            x_pk = solve_pk(b_full, flavor)
            cpu_ = jax.devices("cpu")[0]
            with jax.default_device(cpu_):
                return packed_to_full(jax.device_put(x_pk, cpu_), lat)

        solve.packed = solve_pk
        solve.packed_src = solve_pk_src
        solve.packed_src_batch = lambda b_pks, flavor=+1: jnp.stack(
            [solve_pk_src(b_pks[i], flavor)
             for i in range(b_pks.shape[0])])
        solve.lmesh = lmesh
        solve.put = _put
        return solve

    # one-time clover construction shared by every solve (ADVICE r1:
    # action.csw must reach the non-MG mixed-precision path too, or the
    # f64 certification certifies the WRONG operator)
    clover = None
    if csw != 0.0:
        from ..solve import make_clover_fields
        clover = make_clover_fields(u_pk, lat, kappa=cfg.action.kappa,
                                    mu=cfg.action.mu, csw=csw)
        clover = jax.device_put(clover, accel())

    @partial(jax.jit, static_argnums=(3,))
    def _solve_jit(u_pk_, clover_, b_pk, flavor):
        res = solve_tm(u_pk_, b_pk, lat, kappa=cfg.action.kappa,
                       mu=cfg.action.mu, flavor=flavor,
                       tol=cfg.solver.tol, maxiter=cfg.solver.maxiter,
                       inner_tol=cfg.solver.inner_tol,
                       solver=cfg.solver.solver, sloppy_dtype=sloppy,
                       backend=cfg.solver.backend, csw=csw,
                       clover=clover_,
                       t_boundary=-1 if cfg.gauge.antiperiodic_t else +1)
        # return PACKED (f32 pairs): full-layout complex outputs cannot
        # materialize on the axon TPU backend (small trailing dims)
        return res.x.astype(jnp.float32), res.relres, res.iters

    cpu = jax.devices("cpu")[0]

    def solve_pk_src(b_pk, flavor=+1):
        b_pk = jax.device_put(b_pk, accel())
        x_pk, relres, iters = _solve_jit(u_pk, clover, b_pk, int(flavor))
        log.info("  solve: relres=%.2e iters=%d", float(relres),
                 int(iters))
        return x_pk

    def solve_pk(b_full, flavor=+1):
        with jax.default_device(cpu):
            b_pk = full_to_packed(b_full, lat)
        return solve_pk_src(b_pk, flavor)

    def solve(b_full, flavor=+1):
        x_pk = solve_pk(b_full, flavor)
        with jax.default_device(cpu):
            return packed_to_full(jax.device_put(x_pk, cpu), lat)

    @partial(jax.jit, static_argnums=(3,))
    def _solve_jit_b(u_pk_, clover_, b_pks, flavor):
        from ..solve import solve_tm_batch
        res = solve_tm_batch(u_pk_, b_pks, lat, kappa=cfg.action.kappa,
                             mu=cfg.action.mu, flavor=flavor,
                             tol=cfg.solver.tol,
                             maxiter=cfg.solver.maxiter,
                             inner_tol=cfg.solver.inner_tol,
                             solver=cfg.solver.solver,
                             sloppy_dtype=sloppy,
                             backend=cfg.solver.backend, csw=csw,
                             clover=clover_,
                             t_boundary=-1 if cfg.gauge.antiperiodic_t
                             else +1)
        return res.x.astype(jnp.float32), res.relres, res.iters

    def solve_pk_src_batch(b_pks, flavor=+1):
        """vmapped multi-RHS mixed-precision solve (one iteration
        stream for all columns; SURVEY.md §8.4) — with the automatic
        near-critical gate: the batched CG stream measured ~5x SLOWER
        per RHS than sequential at high iteration counts (mechanism
        measured in BASELINE.md round 5: per-lockstep-iteration cost
        inflates ~5x beyond the 12x work; the MG-batched path is
        unaffected), so the FIRST column is solved sequentially and its
        iteration count decides the remainder."""
        n = b_pks.shape[0]
        gate = int(getattr(cfg.solver, "rhs_batch_gate_iters", 1500))
        gate_chunk = int(getattr(cfg.solver, "rhs_batch_gate_chunk", 4))
        lead = None
        batch_n = rhs_batch
        if n > 1 and rhs_batch > gate_chunk and gate > 0:
            b0 = jax.device_put(b_pks[0], accel())
            x0, rel0, it0 = _solve_jit(u_pk, clover, b0, int(flavor))
            log.info("  solve: relres=%.2e iters=%d (batch-gate probe)",
                     float(rel0), int(it0))
            if int(it0) > gate:
                log.info(
                    "  batch gate: %d iters > %d — high-iteration "
                    "regime where wide batched-CG efficiency collapses "
                    "(measured per-lockstep-iteration 0.39/0.39/0.66/"
                    "3.31 ms at n=1/2/4/12, BASELINE.md round 5); "
                    "re-chunking the remaining %d columns to %d",
                    int(it0), gate, n - 1, gate_chunk)
                batch_n = gate_chunk
            lead = x0

        def chunk(bs, fl):
            bs = jax.device_put(bs, accel())
            x, relres, iters = _solve_jit_b(u_pk, clover, bs, int(fl))
            log.info("  batch solve (%d rhs): max relres=%.2e iters<=%d",
                     bs.shape[0], float(jnp.max(relres)),
                     int(jnp.max(iters)))
            return x

        rest_b = b_pks[1:] if lead is not None else b_pks
        outs = []
        for lo in range(0, rest_b.shape[0], batch_n):
            outs.append(chunk(rest_b[lo:lo + batch_n], flavor))
        rest = jnp.concatenate(outs, axis=0) if outs else None
        if lead is not None:
            return (jnp.concatenate([lead[None], rest], axis=0)
                    if rest is not None else lead[None])
        return rest

    solve.packed = solve_pk
    solve.packed_src = solve_pk_src
    solve.packed_src_batch = solve_pk_src_batch
    solve.lmesh = None
    solve.put = _put
    return solve
