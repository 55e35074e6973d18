"""Quenched heatbath physics validation (SURVEY.md §5 invariants;
VERDICT r2 #2: structured gauge fields generated in-repo).

The plaquette at thermalization is checked against regimes with known
analytic values:
  - weak coupling:  <P> = 1 - 2/beta - 1.22/beta^2 + O(1/beta^3)
    (SU(3) lattice perturbation theory) -> 0.825 at beta = 12
  - strong coupling: <P> = beta/18 + O(beta^5) -> 0.0278 at beta = 0.5
  - beta = 6.0: the canonical quenched point, <P> ~ 0.594 (large-volume
    literature value; small volumes sit a little high)
Both couplings share ONE compiled program (beta and the sweep count are
dynamic arguments of the cached thermalize jit).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd.lattice import Lattice
from tpuqcd.ops import mat3
from tpuqcd.ops.gauge_tools import plaquette
from tpuqcd.ops.heatbath import generate_ensemble, thermalize


def _max_su3_violation(u):
    m = u.reshape((8, 3, 3) + u.shape[4:])

    @jax.jit
    def viol(m):
        e = 0.0
        for a in range(8):
            udu = mat3.mul(m[a], m[a], adag=True)
            e = jnp.maximum(e, jnp.abs(udu - mat3.eye_like(udu)).max())
            e = jnp.maximum(e, jnp.abs(mat3.det(m[a]) - 1.0).max())
        return e

    return float(viol(m))


def test_plaquette_weak_and_strong_coupling():
    lat = Lattice((4, 4, 4, 4))
    u = thermalize(jax.random.PRNGKey(0), lat, beta=12.0, n_sweeps=30)
    p_weak = float(plaquette(u, lat))
    assert 0.80 < p_weak < 0.85, p_weak      # perturbative 0.825
    assert _max_su3_violation(u) < 1e-5

    u = thermalize(jax.random.PRNGKey(1), lat, beta=0.5, n_sweeps=60)
    p_strong = float(plaquette(u, lat))
    assert 0.005 < p_strong < 0.055, p_strong  # strong-coupling 0.0278
    assert _max_su3_violation(u) < 1e-5


def test_ensemble_members_decorrelate():
    lat = Lattice((4, 4, 4, 4))
    cfgs = list(generate_ensemble(jax.random.PRNGKey(7), lat, 6.0,
                                  n_cfg=3, n_therm=60, n_skip=10))
    ps = [float(plaquette(c, lat)) for c in cfgs]
    for p in ps:
        assert 0.55 < p < 0.65, ps           # thermalized band at beta=6
    # members are distinct configurations, not aliases
    assert len({round(p, 6) for p in ps}) == 3
    assert not np.allclose(np.asarray(cfgs[0]), np.asarray(cfgs[1]))


def test_chain_continuation_stays_on_su3():
    """Regression (VERDICT r3 weak #2): continuation segments shorter
    than reunit_every restart the in-loop sweep counter, so without the
    loop-exit reunitarization the SU(3) violation compounds ~1.3e-6 per
    sweep across segments (measured 1.03e-5 after 4 x 10-sweep
    continuations at 8^4).  Every thermalize() return must be exactly
    reunitarized regardless of segment length."""
    lat = Lattice((4, 4, 4, 4))
    u = thermalize(jax.random.PRNGKey(11), lat, beta=6.0, n_sweeps=12)
    for i in range(4):
        u = thermalize(jax.random.PRNGKey(200 + i), lat, beta=6.0,
                       n_sweeps=5, u0=u)
        assert _max_su3_violation(u) < 2e-6


def test_cli_heatbath_chain_ensemble_ildg_roundtrip(monkeypatch,
                                                    tmp_path, capsys):
    """gauge.heatbath_n_cfg ensemble: members come from ONE Markov
    chain (continuation, not cold restarts), each is written to ILDG
    and re-read through the C28 LIME reader with plaquette_check pinned
    to the generated value — the physical end-to-end round-trip of the
    gauge I/O (VERDICT r3 #7)."""
    import sys

    from tpuqcd.cli.run_invert import main
    cfgp = tmp_path / "hbens.yaml"
    out = tmp_path / "inv.h5"
    cfgp.write_text(f"""
gauge:
  dims: [4, 4, 4, 4]
  heatbath_beta: 6.0
  heatbath_sweeps: 10
  heatbath_n_cfg: 2
  heatbath_skip: 3
  heatbath_dir: {tmp_path / "ens"}
action: {{kappa: 0.11, mu: 0.07}}
solver: {{tol: 1.0e-8, solver: cg, backend: xla}}
physics: {{output: {out}}}
""")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    main()
    res = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("RESULT")]
    assert len(res) == 2                  # one certified solve/member
    files = sorted((tmp_path / "ens").glob("*.lime"))
    assert len(files) == 2
    # re-read the members directly: distinct thermalized configs
    from tpuqcd.io.lime import read_ildg_gauge
    u0, l0 = read_ildg_gauge(str(files[0]))
    u1, _ = read_ildg_gauge(str(files[1]))
    assert l0.dims == (4, 4, 4, 4)
    assert not np.allclose(u0, u1)


@pytest.mark.slow
def test_beta6_plaquette_matches_literature():
    """8^4 at beta = 6.0: the canonical quenched Wilson point.  The
    large-volume literature value is 0.5937; an 8^4 box lands within
    ~1%.  This is the physics certificate that the generator produces
    genuinely structured (confining-phase) gauge fields for the MG
    benchmarks."""
    lat = Lattice((8, 8, 8, 8))
    u = thermalize(jax.random.PRNGKey(3), lat, beta=6.0, n_sweeps=150)
    # average a few decorrelated measurements to tame the single-config
    # fluctuation (sigma ~ 2e-3 at this volume)
    ps = []
    for i in range(4):
        ps.append(float(plaquette(u, lat)))
        u = thermalize(jax.random.PRNGKey(100 + i), lat, beta=6.0,
                       n_sweeps=10, u0=u)
    p = float(np.mean(ps))
    assert abs(p - 0.5937) < 0.01, ps
    assert _max_su3_violation(u) < 1e-5
