"""Nucleon/meson two-point production run (config 4 of BASELINE.md).

The CalcMG_threepTwop two-point half ([U] programs/CalcMG_threepTwop.cpp;
SURVEY.md §4.1): gauge load + plaquette check -> APE smear -> smeared
sources -> 12 forward solves per flavor -> sink smearing -> proton +
pion correlators -> momentum projection -> HDF5.

    python -m tpuqcd.cli.run_twop --config examples/twop.yaml
"""
from __future__ import annotations

import numpy as np

from .common import (accel, ensemble_members, log, make_solver,
                     parse_args, setup_gauge, smeared_gauge)


def main():
    cfg, _args = parse_args(__doc__)
    for ctag, c in ensemble_members(cfg):
        if ctag:
            log.info("=== ensemble member %s ===", ctag)
        _measure(c)


def _measure(cfg):
    import os

    import jax
    import jax.numpy as jnp
    from ..gammas import MESON_CHANNELS, PROJECTORS
    from ..io.hdf5io import write_twop
    from ..phys.contract import meson_2pt, proton_2pt
    from ..phys.contract_dev import meson_2pt_dev, proton_2pt_dev
    from ..phys.propagator import (assemble_propagator_pk, point_sources,
                                   smear_sources)

    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    u_sm = smeared_gauge(cfg, lat, u_dev)
    solve = make_solver(cfg, lat, u_pk, u_full)
    momenta = np.asarray(cfg.physics.momenta)

    # device contraction path: propagators stay packed on the accelerator
    # and the Wick engine (phys/contract_dev.py) streams there; only the
    # tiny density crosses to the host for momentum projection
    acc = accel()
    use_dev = (solve.lmesh is not None or acc.platform != "cpu"
               or os.environ.get("TPUQCD_DEVICE_CONTRACT") == "1")
    if use_dev and cfg.physics.smear_n_gauss > 0:
        # packed form: complex gauge arrays cannot device_put to the TPU
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
        props = {}
        if use_dev:
            from ..phys.propagator import packed_sources
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                b_pks = packed_sources(srcs, lat)
        for name, flavor in (("u", +1), ("d", -1)):
            log.info(" forward props flavor %s%s", name,
                     " (batched rhs)" if use_dev else "")
            if use_dev:
                xs = solve.packed_src_batch(b_pks, flavor=flavor)
                p = assemble_propagator_pk([xs[i] for i in range(12)])
                if cfg.physics.smear_n_gauss > 0:
                    # one vmapped dispatch for all 12 sink columns
                    from ..phys.propagator import sink_smear_prop_pk
                    p = sink_smear_prop_pk(
                        u_sm_acc, p, lat,
                        cfg.physics.smear_alpha_gauss,
                        cfg.physics.smear_n_gauss)
                props[name] = p
            else:
                cols = [solve(srcs[s, c], flavor=flavor)
                        for s in range(4) for c in range(3)]
                cols = jnp.stack(cols).reshape(4, 3, *lat.full_shape, 4, 3)
                props[name] = jnp.transpose(cols, (2, 3, 4, 5, 6, 7, 0, 1))
        if not use_dev and cfg.physics.smear_n_gauss > 0:
            from ..phys.propagator import sink_smear_propagator
            for k in props:
                props[k] = sink_smear_propagator(
                    u_sm, props[k], lat, cfg.physics.smear_alpha_gauss,
                    cfg.physics.smear_n_gauss)

        proton = proton_2pt_dev if use_dev else proton_2pt
        meson = meson_2pt_dev if use_dev else meson_2pt
        tag = f"sx{src[3]}sy{src[2]}sz{src[1]}st{src[0]}"
        for pname in cfg.physics.projectors:
            proj = PROJECTORS[pname]
            c2 = proton(props["u"], props["d"], lat, momenta,
                        src_pos=tuple(src), proj=proj)
            write_twop(cfg.physics.output,
                       f"twop/proton/{pname}/{tag}", np.asarray(c2),
                       momenta, src, meta={"kappa": cfg.action.kappa,
                                           "mu": cfg.action.mu})
            # neutron = isospin mirror (swap u <-> d propagators)
            c2n = proton(props["d"], props["u"], lat, momenta,
                         src_pos=tuple(src), proj=proj)
            write_twop(cfg.physics.output,
                       f"twop/neutron/{pname}/{tag}", np.asarray(c2n),
                       momenta, src, meta={"kappa": cfg.action.kappa,
                                           "mu": cfg.action.mu})
        for chan in cfg.physics.meson_channels:
            cm = meson(props["u"], props["u"], MESON_CHANNELS[chan],
                       lat, momenta, src_pos=tuple(src))
            write_twop(cfg.physics.output, f"twop/{chan}/{tag}",
                       np.asarray(cm), momenta, src,
                       meta={"kappa": cfg.action.kappa,
                             "mu": cfg.action.mu})
        log.info("wrote correlators for %s -> %s", tag,
                 cfg.physics.output)


if __name__ == "__main__":
    main()
