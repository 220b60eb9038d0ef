"""Cross-validation against the REFERENCE'S OWN code (VERDICT round 1,
item 1): every numeric contract our ops claim parity with is executed
here through /root/reference's actual TF/NumPy implementation on the
same inputs and compared -- values AND (for the safe-gradient
functions that guard joint training against NaNs) backward passes.

Skipped automatically when TensorFlow or /root/reference is absent, so
the suite stays runnable in slimmer environments. Results are
summarized in PARITY.md ("Cross-validation against reference code").
"""

import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
tf = pytest.importorskip('tensorflow')
if not os.path.isdir(REF):
    pytest.skip('/root/reference not present', allow_module_level=True)

# Import the reference in-process, without writing __pycache__ into the
# read-only tree
sys.dont_write_bytecode = True
for p in (REF, os.path.join(REF, 'nerfactor')):
    if p not in sys.path:
        sys.path.append(p)

import jax
import jax.numpy as jnp

from nerfactor_tpu.ops import (
    encoding, geom as geomops, img as imgops, light as lightops,
    math as mathops, microfacet as microops)


def _rand(shape, seed, lo=-1.0, hi=1.0):
    rng = np.random.RandomState(seed)
    return (lo + (hi - lo) * rng.rand(*shape)).astype(np.float32)


def _unit(shape, seed):
    v = _rand(shape, seed) + 1e-3
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(
        np.float32)


# ------ light sphere ------

def test_gen_light_xyz_matches_reference():
    from brdf.renderer import gen_light_xyz as ref_gen
    for h in (4, 16):
        ours_xyz, ours_areas = lightops.gen_light_xyz(h, 2 * h)
        ref_xyz, ref_areas = ref_gen(h, 2 * h)
        np.testing.assert_allclose(ours_xyz, ref_xyz, atol=1e-4)
        np.testing.assert_allclose(ours_areas, ref_areas, atol=1e-10)


# ------ safe-gradient math (values + custom backward) ------

def test_safe_atan2_matches_reference_forward_and_grad():
    from util import math as refmath
    x, y = _rand((64,), 0, -2, 2), _rand((64,), 1, -2, 2)
    x[:4], y[:4] = [0, 0, 1, -1], [0, 1e-8, 0, 0]  # degenerate corners
    xt, yt = tf.constant(x), tf.constant(y)
    with tf.GradientTape(persistent=True) as tape:
        tape.watch([xt, yt])
        zt = refmath.safe_atan2(xt, yt)
    gx_ref, gy_ref = tape.gradient(zt, xt), tape.gradient(zt, yt)

    z = mathops.safe_atan2(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(z), zt.numpy(), atol=1e-6)
    gx, gy = jax.grad(
        lambda a, b: jnp.sum(mathops.safe_atan2(a, b)), argnums=(0, 1))(
            jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx), gx_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), gy_ref.numpy(), atol=1e-5)


def test_safe_acos_matches_reference_forward_and_grad():
    from util import math as refmath
    x = _rand((64,), 2, -1.2, 1.2)  # includes out-of-domain values
    x[:3] = [1.0, -1.0, 0.999999]
    xt = tf.constant(x)
    with tf.GradientTape() as tape:
        tape.watch(xt)
        yt = refmath.safe_acos(xt)
    g_ref = tape.gradient(yt, xt)

    y = mathops.safe_acos(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-6)
    g = jax.grad(lambda a: jnp.sum(mathops.safe_acos(a)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), g_ref.numpy(), atol=1e-4,
                               rtol=1e-5)


def test_safe_cumprod_matches_reference():
    from util import math as refmath
    x = _rand((8, 16), 3, 0, 1)
    ref = refmath.safe_cumprod(tf.constant(x)).numpy()
    ours = np.asarray(mathops.safe_cumprod(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_inv_transform_sample_matches_reference():
    """The reference (util/math.py:71-94) has a latent off-by-one: its
    CDF has n_bins+1 entries but `val` only n_bins, so any u landing in
    the TOP bin gathers val[n_bins] -- out of range. On the TF-2.2 GPU
    the reference ran on, OOB tf.gather silently returns 0 (documented
    GPU behavior); on CPU it raises. We emulate the GPU semantics here
    to execute the reference faithfully, assert parity for all
    in-range samples, and pin our deliberate fix (clamp to the last
    bin) for the top-bin samples the reference corrupts toward 0."""
    from util import math as refmath
    val = np.sort(_rand((8, 32), 4, 2, 6), axis=-1)
    weights = _rand((8, 32), 5, 0, 1)

    orig_gather = tf.gather

    def gpu_style_gather(params, indices, **kwargs):
        """TF-GPU semantics: out-of-bound indices yield 0."""
        limit = int(params.shape[-1])
        oob = indices >= limit
        safe = tf.where(oob, tf.zeros_like(indices), indices)
        out = orig_gather(params, safe, **kwargs)
        return tf.where(oob, tf.zeros_like(out), out)

    refmath.tf.gather = gpu_style_gather
    try:
        ref = refmath.inv_transform_sample(
            tf.constant(val), tf.constant(weights), 16, det=True).numpy()
    finally:
        refmath.tf.gather = orig_gather
    ours = np.asarray(mathops.inv_transform_sample(
        jnp.asarray(val), jnp.asarray(weights), 16, det=True))

    # Which (ray, sample) pairs land in the top bin (or at u=1.0)?
    eps = 1e-5
    pdf = weights / (weights.sum(-1, keepdims=True) + eps)
    cdf = np.concatenate(
        [np.zeros((8, 1), np.float32), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, 16, dtype=np.float32), (8, 16))
    ind = (u[:, :, None] >= cdf[:, None, :]).sum(-1)
    in_range = ind < 32

    np.testing.assert_allclose(np.where(in_range, ours, 0),
                               np.where(in_range, ref, 0), atol=1e-5)
    # Top bin: ours clamps to the last bin value; the reference's GPU
    # execution decays toward 0 ((1-t)*val[-1] or 0)
    assert (~in_range).any()
    np.testing.assert_allclose(ours[~in_range], val[:, -1:][
        np.argwhere(~in_range)[:, 0], 0], atol=1e-5)
    assert (ref[~in_range] < ours[~in_range] - 1e-4).all()


# ------ Rusinkiewicz frames (the NaN-critical path) ------

def test_dir2rusink_matches_reference_forward_and_grad():
    from util import geom as refgeom
    ldir = _unit((256, 3), 6)
    vdir = _unit((256, 3), 7)
    ldir[0] = vdir[0]  # a==b degenerate case (reference NOTE)
    lt, vt = tf.constant(ldir), tf.constant(vdir)
    with tf.GradientTape(persistent=True) as tape:
        tape.watch([lt, vt])
        rt = refgeom.dir2rusink(lt, vt)
    gl_ref = tape.gradient(rt, lt).numpy()
    gv_ref = tape.gradient(rt, vt).numpy()

    r = np.asarray(geomops.dir2rusink(jnp.asarray(ldir), jnp.asarray(vdir)))
    r_ref = rt.numpy()
    # Row 0 is the a==b degenerate case: diff lies along +h, so
    # theta_d ~ 0 and phi_d is MEANINGLESS (reference NOTE at
    # util/geom.py:185-187) -- acos near 1 amplifies fp noise, so only
    # theta_h is comparable there
    np.testing.assert_allclose(r[1:], r_ref[1:], atol=1e-5)
    np.testing.assert_allclose(r[0, 1], r_ref[0, 1], atol=1e-5)
    assert r[0, 2] < 1e-3 and r_ref[0, 2] < 1e-3
    gl, gv = jax.grad(
        lambda a, b: jnp.sum(geomops.dir2rusink(a, b)), argnums=(0, 1))(
            jnp.asarray(ldir), jnp.asarray(vdir))
    np.testing.assert_allclose(np.asarray(gl)[1:], gl_ref[1:], atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv)[1:], gv_ref[1:], atol=2e-4)


def test_gen_world2local_matches_reference_forward_and_grad():
    from util import geom as refgeom
    normal = _unit((128, 3), 8)
    nt = tf.constant(normal)
    with tf.GradientTape() as tape:
        tape.watch(nt)
        rot_t = refgeom.gen_world2local(nt)
    g_ref = tape.gradient(rot_t, nt).numpy()

    rot = geomops.gen_world2local(jnp.asarray(normal))
    np.testing.assert_allclose(np.asarray(rot), rot_t.numpy(), atol=1e-5)
    g = jax.grad(lambda n: jnp.sum(geomops.gen_world2local(n)))(
        jnp.asarray(normal))
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=2e-4)


def test_slerp_matches_reference():
    from util import geom as refgeom
    p0 = _unit((1, 4), 9)
    p1 = _unit((1, 4), 10)
    for t in (0.25, 0.5, 0.75):
        ref = refgeom.slerp(
            tf.constant(p0), tf.constant(p1), t).numpy()
        ours = np.asarray(geomops.slerp(
            jnp.asarray(p0), jnp.asarray(p1), t))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


# ------ sRGB ------

def test_linear2srgb_matches_reference():
    from util import img as refimg
    x = _rand((32, 32, 3), 11, 0, 1)
    x[0, 0] = 0.0
    x[0, 1] = 1.0
    x[0, 2] = 0.003  # below the linear threshold
    ref = refimg.linear2srgb(tf.constant(x)).numpy()
    ours = np.asarray(imgops.linear2srgb(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ------ windowed SSIM loss vs tf.image.ssim ------

def test_ssim_loss_matches_tf_image_ssim():
    """The reference's SSIM loss is (1 - tf.image.ssim)/2
    (nerfactor/losses.py:68-81); ours must reproduce the windowed
    index, not a global-statistics approximation."""
    from nerfactor_tpu.models import losses as losses_mod
    gt = _rand((3, 24, 32, 3), 20, 0, 1)
    pred = np.clip(gt + _rand((3, 24, 32, 3), 21, -0.2, 0.2), 0, 1)
    ref_sim = tf.image.ssim(
        tf.constant(gt), tf.constant(pred), 1.0).numpy()
    ours_sim = np.asarray(losses_mod.ssim_index(
        jnp.asarray(gt), jnp.asarray(pred), max_val=1.0))
    np.testing.assert_allclose(ours_sim, ref_sim, atol=1e-5)
    ref_loss = np.mean((1 - ref_sim) / 2)
    ours_loss = float(losses_mod.ssim(jnp.asarray(gt), jnp.asarray(pred)))
    np.testing.assert_allclose(ours_loss, ref_loss, atol=1e-5)
    per_img = np.asarray(losses_mod.ssim(
        jnp.asarray(gt), jnp.asarray(pred), keep_batch=True))
    np.testing.assert_allclose(per_img, (1 - ref_sim) / 2, atol=1e-5)


# ------ GGX microfacet ------

def test_microfacet_matches_reference():
    from brdf.microfacet.microfacet import Microfacet
    n, l = 64, 24
    pts2l = _unit((n, l, 3), 12)
    pts2c = _unit((n, 3), 13)
    normal = _unit((n, 3), 14)
    albedo = _rand((n, 3), 15, 0, 1)
    rough = _rand((n, 1), 16, 0.1, 0.9)
    ref = Microfacet(f0=0.91)(
        tf.constant(pts2l), tf.constant(pts2c), tf.constant(normal),
        albedo=tf.constant(albedo), rough=tf.constant(rough)).numpy()
    ours = np.asarray(microops.microfacet_brdf(
        jnp.asarray(pts2l), jnp.asarray(pts2c), jnp.asarray(normal),
        albedo=jnp.asarray(albedo), rough=jnp.asarray(rough), f0=0.91))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


# ------ positional encoding vs the reference Embedder ------

def test_posenc_matches_reference_embedder():
    from networks.embedder import Embedder
    x = _rand((32, 3), 17, -2, 2)
    for n_freqs, incl in ((10, True), (4, True), (2, True)):
        emb = Embedder(
            incl_input=incl, in_dims=3, log2_max_freq=n_freqs - 1,
            n_freqs=n_freqs, log_sampling=True,
            periodic_func=[tf.math.sin, tf.math.cos])
        ref = emb(tf.constant(x)).numpy()
        ours = np.asarray(encoding.posenc(
            jnp.asarray(x), n_freqs, incl_input=incl))
        assert encoding.embed_dims(3, n_freqs, incl) == emb.out_dims
        np.testing.assert_allclose(ours, ref, atol=1e-5)


# ------ MERL binary format roundtrip through the reference reader ----

def test_merl_reader_matches_reference(tmp_path):
    nielsen = os.path.join(REF, 'third_party', 'nielsen2015on')
    if nielsen not in sys.path:
        sys.path.append(nielsen)
    from merlFunctions import readMERLBRDF, saveMERLBRDF
    from brdf_tpu.merl import read_merl_brdf
    rng = np.random.RandomState(18)
    cube = rng.rand(180, 90, 90, 3).astype(np.float64)
    path = str(tmp_path / 'fake.binary')
    saveMERLBRDF(path, cube, toneMap=True)
    ref = readMERLBRDF(path)
    ours = read_merl_brdf(path)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6,
                               atol=1e-9)


# ------ the BRDF-prior sphere renderer, end to end ------

def test_sphere_renderer_matches_reference(tmp_path):
    from brdf.renderer import SphereRenderer as RefRenderer
    from brdf_tpu.renderer import SphereRenderer as OurRenderer
    ref_dir = str(tmp_path / 'ref')
    our_dir = str(tmp_path / 'ours')
    ref_r = RefRenderer('white', ref_dir, envmap_h=4, ims=32, spp=1)
    our_r = OurRenderer('white', our_dir, envmap_h=4, ims=32, spp=1)
    np.testing.assert_allclose(our_r.lvis, ref_r.lvis, atol=1e-6)
    np.testing.assert_allclose(our_r.lcontrib, ref_r.lcontrib, atol=1e-5)
    brdf = _rand(ref_r.lcontrib.shape, 19, 0, 1)
    ref_render = ref_r.render(brdf)
    our_render = our_r.render(brdf)
    np.testing.assert_allclose(our_render, ref_render, atol=1e-5)


# ------ the optimizer: tf.keras Adam(amsgrad=True) trajectories ------

def test_tf_adam_amsgrad_trajectory_matches_keras():
    """Our default optimizer must follow tf.keras.optimizers.Adam(
    amsgrad=True) step for step (reference trainvali.py:116-127) --
    including the eps-dominated regime of tiny-gradient heads, where
    optax.amsgrad's different eps default/placement measurably changes
    joint-stage quality (QUALITY.md 'optimizer parity')."""
    import optax
    from nerfactor_tpu.parallel.train import _tf_adam_amsgrad

    rng = np.random.RandomState(31)
    w0 = rng.randn(6, 3).astype(np.float32)
    # Two scales: normal grads and the ~1e-8 grads of the brdf_z head
    for gscale, lr in ((1.0, 1e-2), (1e-8, 5e-3)):
        grads = [
            (gscale * rng.randn(6, 3)).astype(np.float32)
            for _ in range(40)]

        var = tf.Variable(w0.copy())
        tf_opt = tf.keras.optimizers.Adam(learning_rate=lr, amsgrad=True)
        for g in grads:
            tf_opt.apply_gradients([(tf.constant(g), var)])
        tf_final = var.numpy()

        opt = _tf_adam_amsgrad(lr)
        params = jnp.asarray(w0)
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update(jnp.asarray(g), state)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params), tf_final, rtol=2e-5, atol=2e-7,
            err_msg='gscale=%g' % gscale)

        # And demonstrate the regression this guards against: plain
        # optax.amsgrad diverges from Keras in the tiny-grad regime.
        if gscale < 1e-6:
            opt2 = optax.amsgrad(learning_rate=lr)
            p2 = jnp.asarray(w0)
            s2 = opt2.init(p2)
            for g in grads:
                u2, s2 = opt2.update(jnp.asarray(g), s2, p2)
                p2 = optax.apply_updates(p2, u2)
            drift_ours = float(np.abs(np.asarray(params) - tf_final).max())
            drift_optax = float(np.abs(np.asarray(p2) - tf_final).max())
            assert drift_optax > 10 * max(drift_ours, 1e-12), (
                drift_optax, drift_ours)
