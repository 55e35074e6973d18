"""Three-point functions vs the dense all-to-all oracle (exact Wick
evaluation of the current insertion) on a 2^3 x 4 lattice."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase
from tpuqcd.gammas import GAMMA, GAMMA5, ID4, PARITY_PLUS
from tpuqcd.lattice import Lattice
from tpuqcd.operators import TMOperator
from tpuqcd.phys.contract import proton_2pt_site
from tpuqcd.phys.threep import (backward_prop, proton_seq_source,
                                threep_ultralocal)
from tpuqcd.utils.dense import (all_to_all_propagator,
                                point_propagator_from_dense)

LAT = Lattice((2, 2, 2, 4))
KAPPA, MU = 0.11, 0.07
TSINK = 2


def _setup():
    u = apply_boundary_phase(
        su3.random_gauge(jax.random.PRNGKey(5), LAT), LAT)
    ata = {}
    inv = {}
    for nm, fl in (("u", +1), ("d", -1)):
        m = TMOperator(LAT, kappa=KAPPA, mu=MU, flavor=fl)
        u128 = u.astype(jnp.complex128)

        @jax.jit
        def ap(v, m=m, u128=u128):
            return m.apply(u128, v.reshape(*LAT.full_shape, 4, 3)).reshape(
                *LAT.full_shape, 12)
        ata[nm] = all_to_all_propagator(ap, LAT)
    props = {k: jnp.asarray(point_propagator_from_dense(v).astype(
        np.complex64)) for k, v in ata.items()}
    return u, ata, props


def _dense_insertion(ata_f, t_ins, op):
    """sum_{x_i @ t_ins} S(x, x_i) O S(x_i, 0): [T,Z,Y,X,4,3,4,3]."""
    s = ata_f  # [T,Z,Y,X,4,3, T,Z,Y,X,4,3]
    out = 0
    Z, Y, X = LAT.Lz, LAT.Ly, LAT.Lx
    for z in range(Z):
        for y in range(Y):
            for x in range(X):
                s1 = s[..., t_ins, z, y, x, :, :]       # S(x <- x_i)
                s0 = s[t_ins, z, y, x]                  # S(x_i <- all)
                s0 = s0[..., 0, 0, 0, 0, :, :]          # source at origin
                out = out + np.einsum("tzyxsagc,gh,hcqb->tzyxsaqb",
                                      s1, op, s0)
    return out


@pytest.mark.slow
def test_threep_ultralocal_matches_dense():
    u, ata, props = _setup()
    m_u = TMOperator(LAT, kappa=KAPPA, mu=MU, flavor=+1)
    m_d = TMOperator(LAT, kappa=KAPPA, mu=MU, flavor=-1)
    u128 = u.astype(jnp.complex128)

    for flavor_leg, flip_m in (("d", m_u), ("u", m_d)):
        seq = proton_seq_source(props["u"], props["d"], TSINK, flavor_leg,
                                LAT)
        # solve with the flipped operator via dense inverse (exact)
        flip_name = "u" if flavor_leg == "d" else "d"
        s_flip = ata[flip_name].reshape(12 * LAT.volume, 12 * LAT.volume)

        def solve_flip(b):
            x = s_flip @ np.asarray(b.astype(jnp.complex128)).reshape(-1)
            return jnp.asarray(x.reshape(*LAT.full_shape, 4, 3)
                               .astype(np.complex64))

        bwd = backward_prop(seq, solve_flip)
        for op_name, op in (("g5", GAMMA5), ("gt", GAMMA[3]), ("one", ID4)):
            c3 = threep_ultralocal(bwd, props[flavor_leg], {op_name: op},
                                   LAT, np.array([[0, 0, 0]]))[op_name]
            # dense direct evaluation at each t_ins
            for t_ins in range(LAT.Lt):
                sos = jnp.asarray(
                    _dense_insertion(ata[flavor_leg], t_ins, op)
                    .astype(np.complex64))
                if flavor_leg == "d":
                    dens = proton_2pt_site(props["u"], sos)
                else:
                    _, dens = jax.jvp(
                        lambda su: proton_2pt_site(su, props["d"]),
                        (props["u"],), (sos,))
                want = complex(jnp.sum(dens[TSINK]))
                got = complex(c3[0, t_ins])
                np.testing.assert_allclose(got, want, rtol=2e-3,
                                           atol=1e-6 * abs(want) + 1e-8)


def _dense_source_side_deriv(ata_f, u_np, nu):
    """(S <-D_nu)(x, x_i) = [S(x, x_i+nu) U_nu(x_i)^dag
                             - S(x, x_i-nu) U_nu(x_i-nu)] / 2."""
    from tpuqcd.lattice import AXIS_OF_MU
    ax = 6 + AXIS_OF_MU[nu]          # source-site axis in the ata array
    s_p = np.roll(ata_f, -1, axis=ax)   # S(x, x_i+nu) indexed at x_i
    s_m = np.roll(ata_f, +1, axis=ax)
    # contract source color (last axis... layout [...,4,3, T,Z,Y,X, 4, 3])
    term1 = np.einsum("tzyxsaTZYXgc,TZYXdc->tzyxsaTZYXgd",
                      s_p, np.conj(u_np[nu]))
    u_m = np.roll(u_np[nu], +1, axis=AXIS_OF_MU[nu])
    term2 = np.einsum("tzyxsaTZYXgc,TZYXcd->tzyxsaTZYXgd", s_m, u_m)
    return 0.5 * (term1 - term2)


def test_threep_one_derivative_matches_dense():
    from tpuqcd.phys.threep import cov_deriv_sym, threep_one_derivative
    u, ata, props = _setup()
    u_np = np.asarray(u)
    flavor_leg = "d"
    seq = proton_seq_source(props["u"], props["d"], TSINK, flavor_leg, LAT)
    s_flip = ata["u"].reshape(12 * LAT.volume, 12 * LAT.volume)

    def solve_flip(b):
        x = s_flip @ np.asarray(b.astype(jnp.complex128)).reshape(-1)
        return jnp.asarray(x.reshape(*LAT.full_shape, 4, 3)
                           .astype(np.complex64))

    bwd = backward_prop(seq, solve_flip)
    for mu, nu in ((0, 3), (3, 0), (1, 1)):
        c3 = threep_one_derivative(bwd, props["d"], jnp.asarray(u), mu, nu,
                                   LAT, np.array([[0, 0, 0]]))
        # dense direct: S(x,xi) g (D S)(xi,0) - (S<-D)(x,xi) g S(xi,0)
        ds_point = np.asarray(cov_deriv_sym(jnp.asarray(u), props["d"], nu))
        s_lderiv = _dense_source_side_deriv(ata["d"], u_np, nu)
        g = np.asarray(GAMMA[mu])
        for t_ins in range(LAT.Lt):
            sos = 0
            for z in range(LAT.Lz):
                for y in range(LAT.Ly):
                    for x in range(LAT.Lx):
                        s1 = ata["d"][..., t_ins, z, y, x, :, :]
                        ds0 = ds_point[t_ins, z, y, x]
                        sos = sos + 0.5 * np.einsum(
                            "tzyxsagc,gh,hcqb->tzyxsaqb", s1, g, ds0)
                        ld = s_lderiv[..., t_ins, z, y, x, :, :]
                        s0 = ata["d"][t_ins, z, y, x][..., 0, 0, 0, 0, :, :]
                        sos = sos - 0.5 * np.einsum(
                            "tzyxsagc,gh,hcqb->tzyxsaqb", ld, g, s0)
            dens = proton_2pt_site(props["u"],
                                   jnp.asarray(sos.astype(np.complex64)))
            want = complex(jnp.sum(dens[TSINK]))
            got = complex(c3[0, t_ins])
            np.testing.assert_allclose(got, want, rtol=5e-3,
                                       atol=1e-6 * abs(want) + 1e-8)
