"""collide_moments (MXU moment-space path) == collide_unrolled (scalar path).

The moment-space formulation relies on exact lattice identities (discrete 2nd
moment of the 2nd-order equilibrium = rho(uu^T + cs^2 I); linearity of the
sponge blend and Guo forcing); this pins those identities against the
per-direction oracle on random states across all physics-flag combinations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from open_ludwig_tpu import lattice as lat
from open_ludwig_tpu.ops import collide_math as cm


@pytest.mark.parametrize("wall_model", [False, True])
@pytest.mark.parametrize("sponge_blend", [False, True])
def test_collide_moments_matches_unrolled(wall_model, sponge_blend):
    rng = np.random.default_rng(11)
    S = (4, 8, 128)
    f = (lat.W[:, None, None, None]
         * (1 + 0.08 * rng.standard_normal((27,) + S))).astype(np.float32)
    nbrs = tuple(
        jnp.asarray(0.03 * rng.standard_normal((3,) + S).astype(np.float32))
        for _ in range(6)
    )
    obs = jnp.asarray(rng.random(S) < 0.1)
    sp = jnp.asarray((rng.random(S) * 0.5).astype(np.float32))
    wd = jnp.asarray(
        np.where(rng.random(S) < 0.3, rng.uniform(0.5, 5, S), 100.0
                 ).astype(np.float32)
    )
    kw = dict(tau=0.53, c_wale=0.2, nu_sgs_background=5e-4,
              wall_model=wall_model, sponge_blend=sponge_blend)
    u = jnp.float32(0.04)
    fl = [jnp.asarray(f[k]) for k in range(27)]
    a_f, a_r, a_v = cm.collide_unrolled(fl, nbrs, obs, sp, wd, u, **kw)
    for other in (cm.collide_moments, cm.collide_unrolled_v2):
        arg = jnp.asarray(f) if other is cm.collide_moments else fl
        b_f, b_r, b_v = other(arg, nbrs, obs, sp, wd, u, **kw)
        df = max(float(jnp.max(jnp.abs(a_f[k] - b_f[k]))) for k in range(27))
        assert df < 2e-6, (other.__name__, df)
        assert float(jnp.max(jnp.abs(a_r - b_r))) < 2e-6
        assert float(jnp.max(jnp.abs(a_v - b_v))) < 2e-6


def test_moment_matrices_identities():
    """MOM_MAT rows recover (1, c, cc); BACK_MAT reproduces the equilibrium
    for random (rho, u) through the 16-field basis."""
    M = lat.MOM_MAT
    assert np.allclose(M[0], np.ones(27))
    assert np.allclose(M[1:4], lat.C)
    rng = np.random.default_rng(5)
    rho = rng.uniform(0.9, 1.1, 10)
    u = rng.uniform(-0.1, 0.1, (3, 10))
    feq = lat.equilibrium_np(rho, u[0], u[1], u[2]).T  # (27, 10)
    usq = np.sum(u * u, axis=0)
    y = np.stack([
        rho - 1.5 * rho * usq,
        rho * u[0], rho * u[1], rho * u[2],
        rho * u[0] * u[0], rho * u[1] * u[1], rho * u[2] * u[2],
        rho * u[0] * u[1], rho * u[1] * u[2], rho * u[2] * u[0],
        *([np.zeros(10)] * 6),
    ])
    assert np.allclose(lat.BACK_MAT @ y, feq, atol=1e-6)
    # discrete 2nd moment of the equilibrium = rho (u u^T + cs^2 I)
    S6 = lat.PI_MAT @ feq
    expect = np.stack([
        rho * (u[0] * u[0] + 1 / 3), rho * (u[1] * u[1] + 1 / 3),
        rho * (u[2] * u[2] + 1 / 3),
        rho * u[0] * u[1], rho * u[1] * u[2], rho * u[2] * u[0],
    ])
    assert np.allclose(S6, expect, atol=1e-6)
