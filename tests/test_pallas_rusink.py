"""Fused dir2rusink->BRDF-chain kernel vs the exact unfused program
(ops/geom.dir2rusink + chain_reference), forward AND input gradients,
through the Pallas interpreter on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfactor_tpu.ops import geom as geomops
from nerfactor_tpu.ops import pallas_mlp as pm
from nerfactor_tpu.ops import pallas_rusink as pr


@pytest.fixture(autouse=True)
def interpret_mode():
    pm.INTERPRET = True
    old = pm.KERNEL_MATMUL_DTYPE
    pm.KERNEL_MATMUL_DTYPE = None
    yield
    pm.INTERPRET = False
    pm.KERNEL_MATMUL_DTYPE = old


def make_inputs(n=200, z_dim=3, seed=0):
    rng = np.random.RandomState(seed)
    z = jnp.asarray(rng.randn(n, z_dim) * 0.5, jnp.float32)
    # Unit-ish but NOT exactly unit: exercises the normalize VJP
    ldir = jnp.asarray(rng.randn(n, 3), jnp.float32)
    vdir = jnp.asarray(rng.randn(n, 3), jnp.float32)
    return z, ldir, vdir


def make_plan_params(z_dim=3, width=16, depth=4, seed=1):
    plan = pm.make_plan([(z_dim, 0), (3, 2)],
                        (width,) * depth + (1,),
                        ('relu',) * depth + ('softplus',),
                        (depth // 2 - 1,))
    rng = np.random.RandomState(seed)
    dims = pm.layer_in_dims(plan)
    params = [
        (jnp.asarray(rng.randn(dims[i], w) * 0.3, jnp.float32),
         jnp.asarray(rng.randn(w) * 0.05, jnp.float32))
        for i, w in enumerate(plan.widths)]
    return plan, params


def test_rusink_rows_match_oracle():
    """The in-kernel Rusinkiewicz transform == ops/geom.dir2rusink."""
    _, ldir, vdir = make_inputs()
    lt, vt = ldir.T, vdir.T
    pd, th, td, _ = pr._rusink_fwd(lt[0:1], lt[1:2], lt[2:3],
                                   vt[0:1], vt[1:2], vt[2:3])
    got = jnp.concatenate([pd, th, td], axis=0).T
    want = geomops.dir2rusink(ldir, vdir)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_reference():
    z, ldir, vdir = make_inputs()
    plan, params = make_plan_params()
    y_f = pr._fused(plan, 'default', z, ldir, vdir, tuple(params))
    y_r = pr.reference(plan, z, ldir, vdir, params)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match_reference():
    """d(loss)/d(z, ldir, vdir) through the fused kernel == through the
    unfused program (incl. the safe_acos/safe_atan2/normalize VJPs)."""
    z, ldir, vdir = make_inputs()
    plan, params = make_plan_params()
    w = jnp.asarray(np.random.RandomState(7).randn(z.shape[0], 1),
                    jnp.float32)

    def loss_f(z_, l_, v_):
        return jnp.sum(w * pr._fused(plan, 'default', z_, l_, v_, tuple(params)))

    def loss_r(z_, l_, v_):
        return jnp.sum(w * pr.reference(plan, z_, l_, v_, params))

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(z, ldir, vdir)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(z, ldir, vdir)
    for a, b, name in zip(gf, gr, ('dz', 'dldir', 'dvdir')):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=name)


def test_gradients_finite_at_degeneracies():
    """ldir == vdir (theta_d = 0, phi_d undefined) and h straight up
    (phi_h undefined) must produce finite gradients -- the safe-math
    semantics the reference NOTE warns about (util/geom.py:182-186)."""
    plan, params = make_plan_params()
    same = jnp.asarray([[0.3, 0.4, 0.86], [0.0, 0.0, 1.0]], jnp.float32)
    z = jnp.zeros((2, 3), jnp.float32)

    def loss(z_, l_, v_):
        return jnp.sum(pr._fused(plan, 'default', z_, l_, v_, tuple(params)))

    g = jax.grad(loss, argnums=(0, 1, 2))(z, same, same)
    for a in g:
        assert np.all(np.isfinite(np.asarray(a)))
