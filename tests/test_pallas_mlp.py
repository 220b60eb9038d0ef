"""Fused Pallas MLP chain vs the pure-JAX reference (which itself is
pinned to networks.apply_mlp + ops.encoding.posenc semantics by
test_networks_losses_ckpt). Kernels run through the Pallas interpreter
on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfactor_tpu.models import networks
from nerfactor_tpu.ops import encoding, pallas_mlp as pm


@pytest.fixture(autouse=True,
                params=[(True, True), (True, False), (False, False)],
                ids=['transposed-ladder', 'transposed-stash', 'rowmajor'])
def interpret_mode(request):
    pm.INTERPRET = True
    # Exactness tests run the kernels at f32 (on TPU the kernels default
    # to bf16 MXU passes; a dedicated test covers that tolerance).
    # Both boundary orientations (transposed = compact custom-call
    # layouts, the TPU default; row-major = the legacy kernels) must
    # match the reference, with the transposed kernels in both trig
    # modes (ladder = stash-free double-angle recurrences, the TPU
    # default; stash = sin(x@A+P) with a forward stash).
    old = pm.KERNEL_MATMUL_DTYPE
    old_t = pm.TRANSPOSED_BOUNDARY
    old_l = pm.TRIG_LADDER
    pm.KERNEL_MATMUL_DTYPE = None
    pm.TRANSPOSED_BOUNDARY, pm.TRIG_LADDER = request.param
    yield
    pm.INTERPRET = False
    pm.KERNEL_MATMUL_DTYPE = old
    pm.TRANSPOSED_BOUNDARY = old_t
    pm.TRIG_LADDER = old_l


def make_params(plan, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    dims = pm.layer_in_dims(plan)
    return [
        (jnp.asarray(rng.randn(dims[i], w) * scale, jnp.float32),
         jnp.asarray(rng.randn(w) * 0.05, jnp.float32))
        for i, w in enumerate(plan.widths)]


PLANS = [
    # shape-model lvis chain: two embedded parts, mid skip, sigmoid head
    pm.make_plan([(3, 4), (3, 2)], (16, 16, 16, 16, 1),
                 ('relu',) * 4 + ('sigmoid',), (1,)),
    # brdf prior: raw latent part + embedded rusink, softplus head
    pm.make_plan([(3, 0), (3, 2)], (16, 16, 1),
                 ('relu', 'relu', 'softplus'), (0,)),
    # no posenc at all, no skip, linear head
    pm.make_plan([(5, 0)], (8, 3), ('relu', None), ()),
    # skip on the LAST layer (output includes the embedding concat)
    pm.make_plan([(3, 2)], (8, 8), ('relu', 'relu'), (1,)),
]


@pytest.mark.parametrize('plan', PLANS)
@pytest.mark.parametrize('n', [64, 100])  # 100 exercises row padding
def test_forward_matches_reference(plan, n):
    params = make_params(plan)
    x = jnp.asarray(np.random.RandomState(1).randn(n, pm.raw_dim(plan)),
                    jnp.float32)
    ref = pm.chain_reference(plan, x, params)
    out = pm._fused_chain(plan, x, params)
    assert out.shape == (n, pm.out_dim(plan))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('plan', PLANS)
@pytest.mark.parametrize('n', [64, 100])
def test_transposed_input_matches_rowmajor(plan, n):
    """input_t=True ((raw, N) operands, the distillation march's
    boundary layout) must agree with the row-major entry bitwise on
    values and match on input cotangents (returned transposed)."""
    params = make_params(plan)
    x = jnp.asarray(np.random.RandomState(4).randn(n, pm.raw_dim(plan)),
                    jnp.float32)
    out_row = pm._fused_chain(plan, x, params)
    out_t = pm._fused_chain(plan, x.T, params, input_t=True)
    assert out_t.shape == (n, pm.out_dim(plan))
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_row))

    co = jnp.asarray(
        np.random.RandomState(5).randn(n, pm.out_dim(plan)), jnp.float32)

    def loss_row(x_):
        return jnp.sum(pm._fused_chain(plan, x_, params) * co)

    def loss_t(x_t):
        return jnp.sum(
            pm._fused_chain(plan, x_t, params, input_t=True) * co)

    gx_row = jax.grad(loss_row)(x)
    gx_t = jax.grad(loss_t)(x.T)
    assert gx_t.shape == (pm.raw_dim(plan), n)
    np.testing.assert_allclose(np.asarray(gx_t.T), np.asarray(gx_row),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('plan', PLANS)
def test_gradients_match_reference(plan):
    params = make_params(plan)
    x = jnp.asarray(np.random.RandomState(2).randn(70, pm.raw_dim(plan)),
                    jnp.float32)
    co = jnp.asarray(
        np.random.RandomState(3).randn(70, pm.out_dim(plan)), jnp.float32)

    def loss(fn):
        return lambda x_, p_: jnp.sum(fn(plan, x_, p_) * co)

    gx_r, gp_r = jax.grad(loss(pm.chain_reference), argnums=(0, 1))(
        x, params)
    gx_k, gp_k = jax.grad(loss(pm._fused_chain), argnums=(0, 1))(
        x, params)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    for (wr, br), (wk, bk) in zip(gp_r, gp_k):
        np.testing.assert_allclose(np.asarray(wk), np.asarray(wr),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(bk), np.asarray(br),
                                   rtol=1e-4, atol=1e-4)


def test_reference_matches_networks_apply():
    """chain_reference == embed + apply_mlp + head (the model path)."""
    mlp_spec = networks.MLPSpec(
        encoding.embed_dims(3, 4), [16, 16, 16], acts='relu', skip_at=[1])
    out_spec = networks.MLPSpec(mlp_spec.out_dim, [2], acts='sigmoid')
    plan = pm.plan_from_specs([(3, 4)], mlp_spec, out_spec)
    key = jax.random.PRNGKey(0)
    p_mlp = mlp_spec.init(key)
    p_out = out_spec.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(4).randn(33, 3), jnp.float32)
    via_model = out_spec.apply(p_out, mlp_spec.apply(
        p_mlp, encoding.posenc(x, 4)))
    via_chain = pm.chain_reference(
        plan, x, pm.params_from_tree(p_mlp, p_out))
    np.testing.assert_allclose(np.asarray(via_chain),
                               np.asarray(via_model), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize('plan', PLANS[:3])
def test_needs_dx_false_weight_grads_match(plan):
    """needs_dx=False skips the input-cotangent branch but must leave
    the weight gradients identical (and return zero dx)."""
    params = make_params(plan, seed=8)
    x = jnp.asarray(np.random.RandomState(8).randn(70, pm.raw_dim(plan)),
                    jnp.float32)
    co = jnp.asarray(
        np.random.RandomState(9).randn(70, pm.out_dim(plan)), jnp.float32)

    def loss(needs_dx):
        return lambda x_, p_: jnp.sum(
            pm._fused_chain(plan, x_, p_, needs_dx=needs_dx) * co)

    gx_t, gp_t = jax.grad(loss(True), argnums=(0, 1))(x, params)
    gx_f, gp_f = jax.grad(loss(False), argnums=(0, 1))(x, params)
    assert np.all(np.asarray(gx_f) == 0.0)
    assert np.any(np.asarray(gx_t) != 0.0)
    for (wt, bt), (wf, bf) in zip(gp_t, gp_f):
        np.testing.assert_allclose(np.asarray(wf), np.asarray(wt),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bf), np.asarray(bt),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('plan', PLANS[:2])
def test_needs_dw_false_input_grads_match(plan):
    """needs_dw=False (frozen-net differentiation, e.g. the sigma-
    gradient normal pass) must keep dx identical and return zero
    weight cotangents."""
    params = make_params(plan, seed=13)
    x = jnp.asarray(np.random.RandomState(13).randn(
        70, pm.raw_dim(plan)), jnp.float32)
    co = jnp.asarray(np.random.RandomState(14).randn(
        70, pm.out_dim(plan)), jnp.float32)

    def loss(needs_dw):
        return lambda x_, p_: jnp.sum(
            pm._fused_chain(plan, x_, p_, needs_dw=needs_dw) * co)

    gx_t, gp_t = jax.grad(loss(True), argnums=(0, 1))(x, params)
    gx_f, gp_f = jax.grad(loss(False), argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_t),
                               rtol=1e-5, atol=1e-6)
    if pm.TRANSPOSED_BOUNDARY:
        assert all(np.all(np.asarray(l) == 0.0)
                   for l in jax.tree_util.tree_leaves(gp_f))
    assert any(np.any(np.asarray(l) != 0.0)
               for l in jax.tree_util.tree_leaves(gp_t))


@pytest.mark.parametrize('plan', PLANS[:2])
def test_kernel_bf16_matmul_tolerance(plan):
    """The TPU-default bf16 MXU passes stay within bf16 tolerance of the
    f32 reference (phases of the trig embedding remain exact f32)."""
    params = make_params(plan)
    x = jnp.asarray(np.random.RandomState(9).randn(64, pm.raw_dim(plan)),
                    jnp.float32)
    ref = pm.chain_reference(plan, x, params)
    pm.KERNEL_MATMUL_DTYPE = jnp.bfloat16
    try:
        out = pm._fused_chain(plan, x, params)
    finally:
        pm.KERNEL_MATMUL_DTYPE = None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.05)


@pytest.mark.parametrize('plan', PLANS)
def test_bf16_compute_dtype_close_to_f32(plan):
    """bf16 big-chain mode: forward within bf16 tolerance of f32, f32
    output dtype, finite f32 weight gradients."""
    params = make_params(plan)
    x = jnp.asarray(np.random.RandomState(7).randn(80, pm.raw_dim(plan)),
                    jnp.float32)
    ref = pm.chain_reference(plan, x, params)
    out = pm.chain_reference(plan, x, params, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    # bf16 has ~3 significant decimal digits; activations compound a few
    # layers deep
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.05)

    def loss(x_, p_):
        return jnp.sum(pm.chain_reference(
            plan, x_, p_, compute_dtype=jnp.bfloat16) ** 2)

    gx, gp = jax.grad(loss, argnums=(0, 1))(x, params)
    assert gx.dtype == jnp.float32
    for w, b in gp:
        assert w.dtype == jnp.float32 and b.dtype == jnp.float32
        assert np.isfinite(np.asarray(w)).all()
        assert np.isfinite(np.asarray(b)).all()


@pytest.mark.parametrize('plan', PLANS[:2])
def test_per_call_kernel_dtype_overrides_global(plan):
    """Per-call compute_dtype must reach the fused kernels (round 3):
    with the module global at the TPU-shipping bf16 default, an
    f32-pinned call (compute_dtype=None, what f32_chains produces) must
    run TRUE-f32 kernels and match the f32 reference exactly, while a
    bf16 call stays off it by bf16 quantization."""
    params = make_params(plan)
    x = jnp.asarray(np.random.RandomState(11).randn(
        64, pm.raw_dim(plan)), jnp.float32)
    ref = pm.chain_reference(plan, x, params)
    saved = pm.KERNEL_MATMUL_DTYPE
    pm.KERNEL_MATMUL_DTYPE = jnp.bfloat16  # simulate the TPU default
    try:
        pinned = pm._fused_chain(
            plan, x, params, kernel_dtype=pm.kernel_dtype_for(None))
        bf16 = pm._fused_chain(
            plan, x, params,
            kernel_dtype=pm.kernel_dtype_for(jnp.bfloat16))
    finally:
        pm.KERNEL_MATMUL_DTYPE = saved
    np.testing.assert_allclose(np.asarray(pinned), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(bf16), np.asarray(ref),
                           rtol=1e-5, atol=1e-5)


def test_kernel_dtype_for_mapping():
    assert pm.kernel_dtype_for(None) is None
    # float32 means the same full-precision program as None on the XLA
    # reference path; the fused path must agree (ADVICE round 3)
    assert pm.kernel_dtype_for(jnp.float32) is None
    assert pm.kernel_dtype_for(jnp.bfloat16) == jnp.bfloat16
    with pytest.raises(ValueError, match='compute_dtype'):
        pm.kernel_dtype_for(jnp.float16)


def test_kernel_under_jit_and_vjp_in_train_shape():
    """The exact shape-model lvis configuration, under jit."""
    plan = pm.make_plan([(3, 10), (3, 4)], (128,) * 4 + (1,),
                        ('relu',) * 4 + ('sigmoid',), (1,))
    params = make_params(plan, seed=5, scale=0.1)
    x = jnp.asarray(
        np.random.RandomState(6).randn(256, 6), jnp.float32)

    @jax.jit
    def f(x_, p_):
        return jnp.mean(pm._fused_chain(plan, x_, p_) ** 2)

    val = f(x, params)
    g = jax.jit(jax.grad(f, argnums=1))(x, params)
    ref_val = jnp.mean(pm.chain_reference(plan, x, params) ** 2)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    assert all(np.isfinite(np.asarray(w)).all() for w, _ in g)
