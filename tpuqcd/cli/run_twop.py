"""Nucleon/meson two-point production run (config 4 of BASELINE.md).

The CalcMG_threepTwop two-point half ([U] programs/CalcMG_threepTwop.cpp;
SURVEY.md §4.1): gauge load + plaquette check -> APE smear -> smeared
sources -> 12 forward solves per flavor -> sink smearing -> proton +
pion correlators -> momentum projection -> HDF5.

    python -m tpuqcd.cli.run_twop --config examples/twop.yaml
"""
from __future__ import annotations

import numpy as np

from .common import log, make_solver, parse_args, setup_gauge, smeared_gauge


def main():
    import jax.numpy as jnp
    from ..gammas import GAMMA5, PARITY_PLUS, PARITY_MINUS
    from ..io.hdf5io import write_twop
    from ..phys.contract import meson_2pt, proton_2pt
    from ..phys.propagator import point_sources, smear_sources
    from ..phys.smear import gaussian_smear

    cfg, args = parse_args(__doc__)
    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    u_sm = smeared_gauge(cfg, lat, u_dev)
    solve = make_solver(cfg, lat, u_pk, u_full)
    momenta = np.asarray(cfg.physics.momenta)

    for src in cfg.physics.source_positions:
        log.info("source %s", src)
        srcs = point_sources(lat, tuple(src))
        if cfg.physics.smear_n_gauss > 0:
            srcs = smear_sources(u_sm, srcs, lat,
                                 cfg.physics.smear_alpha_gauss,
                                 cfg.physics.smear_n_gauss)
        props = {}
        for name, flavor in (("u", +1), ("d", -1)):
            log.info(" forward props flavor %s", name)
            cols = []
            for s in range(4):
                for c in range(3):
                    cols.append(solve(srcs[s, c], flavor=flavor))
            cols = jnp.stack(cols).reshape(4, 3, *lat.full_shape, 4, 3)
            props[name] = jnp.transpose(cols, (2, 3, 4, 5, 6, 7, 0, 1))
        # sink smearing (smeared-smeared correlators)
        if cfg.physics.smear_n_gauss > 0:
            from ..phys.propagator import sink_smear_propagator
            for k in props:
                props[k] = sink_smear_propagator(
                    u_sm, props[k], lat, cfg.physics.smear_alpha_gauss,
                    cfg.physics.smear_n_gauss)

        tag = f"sx{src[3]}sy{src[2]}sz{src[1]}st{src[0]}"
        for pname, proj in (("P+", PARITY_PLUS), ("P-", PARITY_MINUS)):
            if pname not in cfg.physics.projectors:
                continue
            c2 = proton_2pt(props["u"], props["d"], lat, momenta,
                            src_pos=tuple(src), proj=proj)
            write_twop(cfg.physics.output,
                       f"twop/proton/{pname}/{tag}", np.asarray(c2),
                       momenta, src, meta={"kappa": cfg.action.kappa,
                                           "mu": cfg.action.mu})
        cpi = meson_2pt(props["u"], props["u"], GAMMA5, lat, momenta,
                        src_pos=tuple(src))
        write_twop(cfg.physics.output, f"twop/pion/{tag}",
                   np.asarray(cpi), momenta, src)
        log.info("wrote correlators for %s -> %s", tag,
                 cfg.physics.output)


if __name__ == "__main__":
    main()
