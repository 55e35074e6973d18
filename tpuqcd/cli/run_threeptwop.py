"""Nucleon two- + three-point production run (config 5 connected part).

The CalcMG_threepTwop equivalent ([U] programs/CalcMG_threepTwop.cpp;
SURVEY.md §4.1): forward props -> 2pt -> per (t_sink, projector, flavor)
sequential sources -> backward props -> ultra-local + one-derivative
insertions -> HDF5.

With physics.smear_n_gauss > 0 the run uses the fixed-SMEARED-sink
method ([U] seqSourceFixSink): the written 2pt and the sequential
sources are built from sink-smeared propagators and the sequential
source itself is Wuppertal-smeared before the backward inversion;
the insertion contractions couple to the UNsmeared forward props.

On an accelerator the whole pipeline is device-resident: packed
propagators (phys/contract_dev.py), grad-derived sequential sources and
the contraction/momentum-projection engine of phys/threep_dev.py — only
the tiny [n_mom, T] correlators cross to the host.

    python -m tpuqcd.cli.run_threeptwop --config examples/threep.yaml
"""
from __future__ import annotations

import os

import numpy as np

from .common import (accel, ensemble_members, log, make_solver,
                     parse_args, setup_gauge, smeared_gauge)


def _forward_props_host(cfg, lat, solve, srcs):
    import jax.numpy as jnp
    props = {}
    for name, flavor in (("u", +1), ("d", -1)):
        log.info(" forward props flavor %s", name)
        cols = [solve(srcs[s, c], flavor=flavor)
                for s in range(4) for c in range(3)]
        cols = jnp.stack(cols).reshape(4, 3, *lat.full_shape, 4, 3)
        props[name] = jnp.transpose(cols, (2, 3, 4, 5, 6, 7, 0, 1))
    return props


def _forward_props_dev(cfg, lat, solve, srcs):
    import jax
    from ..phys.propagator import assemble_propagator_pk, packed_sources
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b_pks = packed_sources(srcs, lat)
    props = {}
    for name, flavor in (("u", +1), ("d", -1)):
        log.info(" forward props flavor %s (device, batched rhs)", name)
        xs = solve.packed_src_batch(b_pks, flavor=flavor)
        props[name] = assemble_propagator_pk([xs[i] for i in range(12)])
    return props


def main():
    cfg, _args = parse_args(__doc__)
    for ctag, c in ensemble_members(cfg):
        if ctag:
            log.info("=== ensemble member %s ===", ctag)
        _measure(c)


def _measure(cfg):
    from ..gammas import PROJECTORS
    from ..io.hdf5io import write_twop
    from ..phys.contract import proton_2pt
    from ..phys.contract_dev import proton_2pt_dev
    from ..phys.propagator import point_sources, smear_sources

    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    u_sm = smeared_gauge(cfg, lat, u_dev)
    solve = make_solver(cfg, lat, u_pk, u_full)
    momenta = np.asarray(cfg.physics.momenta)
    projs = PROJECTORS
    n_gauss = cfg.physics.smear_n_gauss
    a_gauss = cfg.physics.smear_alpha_gauss

    acc = accel()
    use_dev = (solve.lmesh is not None or acc.platform != "cpu"
               or os.environ.get("TPUQCD_DEVICE_CONTRACT") == "1")
    if use_dev:
        u_pk_acc = solve.put(u_pk)
        if n_gauss > 0:
            from ..utils.packed import pack_gauge
            u_sm_acc = solve.put(pack_gauge(u_sm))

    for src in cfg.physics.source_positions:
        log.info("source %s (contractions on %s)", src,
                 "device" if use_dev else "host")
        srcs = point_sources(lat, tuple(src))
        if cfg.physics.smear_n_gauss > 0:
            srcs = smear_sources(u_sm, srcs, lat,
                                 cfg.physics.smear_alpha_gauss,
                                 cfg.physics.smear_n_gauss)
        props = (_forward_props_dev if use_dev else _forward_props_host)(
            cfg, lat, solve, srcs)
        # Fixed-SMEARED-sink method (reference seqSourceFixSink): the 2pt
        # written here and the sequential sources are built from the
        # sink-smeared propagators; the insertion contractions below use
        # the UNsmeared forward props (the current couples to the local
        # quark field at t_ins).
        if n_gauss > 0:
            if use_dev:
                from ..phys.propagator import sink_smear_prop_pk
                props_sm = {k: sink_smear_prop_pk(
                    u_sm_acc, v, lat, a_gauss, n_gauss)
                    for k, v in props.items()}
            else:
                from ..phys.propagator import sink_smear_propagator
                props_sm = {k: sink_smear_propagator(
                    u_sm, v, lat, a_gauss, n_gauss)
                    for k, v in props.items()}
        else:
            props_sm = props

        tag = f"sx{src[3]}sy{src[2]}sz{src[1]}st{src[0]}"
        # The neutron is the isospin mirror of the proton Wick engine:
        # swap the u and d propagators.  Engine leg "u" (the
        # doubly-represented quark) is then the physical d quark, whose
        # backward solve flips to the opposite twisted flavor.
        flavor_of = {"u": +1, "d": -1}
        for baryon in cfg.physics.baryons:
            if baryon == "proton":
                pu, pd = props_sm["u"], props_sm["d"]
                phys_of = {"u": "u", "d": "d"}
            else:
                pu, pd = props_sm["d"], props_sm["u"]
                phys_of = {"u": "d", "d": "u"}

            for pname in cfg.physics.projectors:
                if use_dev:
                    c2 = proton_2pt_dev(pu, pd, lat, momenta,
                                        src_pos=tuple(src),
                                        proj=projs[pname])
                else:
                    c2 = proton_2pt(pu, pd, lat, momenta,
                                    src_pos=tuple(src), proj=projs[pname])
                write_twop(cfg.physics.output,
                           f"twop/{baryon}/{pname}/{tag}",
                           np.asarray(c2), momenta, src)

            _threep(cfg, lat, solve, use_dev, baryon, pu, pd, props,
                    phys_of, flavor_of, projs, momenta, src, tag,
                    u_pk_acc if use_dev else u_full,
                    (u_sm_acc if use_dev else u_sm) if n_gauss > 0
                    else None, a_gauss, n_gauss)
        log.info("wrote 2pt+3pt for %s -> %s", tag, cfg.physics.output)


def _threep(cfg, lat, solve, use_dev, baryon, pu, pd, props, phys_of,
            flavor_of, projs, momenta, src, tag, u_arg, smear_u,
            a_gauss, n_gauss):
    """Sequential-source 3pt for one baryon: per (t_sink, projector,
    leg) backward props + ultra-local and one-derivative insertions.

    pu/pd: the (sink-smeared) engine propagators; props: UNsmeared
    physical propagators keyed by flavor (insertion side); u_arg: the
    unsmeared gauge in the path's layout (derivative insertions);
    smear_u: smearing gauge (None = point sink)."""
    from ..gammas import INSERTION_GAMMAS
    from ..io.hdf5io import write_threep
    from ..phys.threep import (backward_prop, proton_seq_source,
                               threep_one_derivative, threep_ultralocal)
    from ..phys.threep_dev import (backward_prop_pk, proton_seq_source_pk,
                                   threep_one_derivative_all_pk,
                                   threep_ultralocal_pk)
    snk_mom = tuple(int(q) for q in cfg.physics.sink_momentum)
    snk = np.asarray(snk_mom) if any(snk_mom) else None
    meta = {"sink_momentum": np.asarray(snk_mom)}
    for t_sink in cfg.physics.t_sinks:
        for pname in cfg.physics.projectors:
            for leg in ("u", "d"):
                phys = phys_of[leg]        # physical quark of this leg
                flip = -flavor_of[phys]    # backward-solve flavor
                log.info(" seq source %s tsink=%d proj=%s quark=%s",
                         baryon, t_sink, pname, phys)
                if use_dev:
                    seq = proton_seq_source_pk(
                        pu, pd, t_sink, leg, lat, proj=projs[pname],
                        snk_mom=snk)
                    if smear_u is not None:  # smear the seq source too
                        from ..phys.propagator import sink_smear_prop_pk
                        seq = sink_smear_prop_pk(
                            smear_u, seq, lat, a_gauss, n_gauss)
                    bwd = backward_prop_pk(
                        seq, solve_batch_fn=lambda bs:
                        solve.packed_src_batch(bs, flavor=flip))
                    c3 = threep_ultralocal_pk(
                        bwd, props[phys], INSERTION_GAMMAS, lat,
                        momenta, src_pos=tuple(src))
                else:
                    seq = proton_seq_source(pu, pd, t_sink, leg, lat,
                                            proj=projs[pname],
                                            snk_mom=snk)
                    if smear_u is not None:
                        from ..phys.propagator import sink_smear_propagator
                        seq = sink_smear_propagator(
                            smear_u, seq, lat, a_gauss, n_gauss)
                    bwd = backward_prop(
                        seq, lambda b: solve(b, flavor=flip))
                    c3 = threep_ultralocal(bwd, props[phys],
                                           INSERTION_GAMMAS, lat,
                                           momenta, src_pos=tuple(src))
                names = list(c3.keys())
                arr = np.stack([np.asarray(c3[k]) for k in names])
                write_threep(cfg.physics.output,
                             f"threep/{baryon}/{pname}/{phys}/"
                             f"ts{t_sink}/{tag}",
                             arr, momenta, names, src, t_sink,
                             meta=meta)
                # one-derivative insertions gamma_mu D_nu
                if use_dev:
                    dall = threep_one_derivative_all_pk(
                        bwd, props[phys], u_arg, lat, momenta,
                        src_pos=tuple(src))
                    dnames = [f"der_g{m}_D{n}"
                              for m in range(4) for n in range(4)]
                    dcorrs = [np.asarray(dall[k]) for k in dnames]
                else:
                    dnames, dcorrs = [], []
                    for mu_ in range(4):
                        for nu_ in range(4):
                            c3d = threep_one_derivative(
                                bwd, props[phys], u_arg, mu_, nu_, lat,
                                momenta, src_pos=tuple(src))
                            dnames.append(f"der_g{mu_}_D{nu_}")
                            dcorrs.append(np.asarray(c3d))
                write_threep(cfg.physics.output,
                             f"threep_der/{baryon}/{pname}/{phys}/"
                             f"ts{t_sink}/{tag}",
                             np.stack(dcorrs), momenta, dnames, src,
                             t_sink, meta=meta)


if __name__ == "__main__":
    main()
