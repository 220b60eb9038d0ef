"""Fused dir2rusink -> embed -> BRDF-MLP chain as one Pallas kernel.

The joint model's BRDF evaluation feeds ``dir2rusink(ldir, vdir)``
(ops/geom.py:53-78; reference util/geom.py:152-192) into the frozen
BRDF chain at rays x lights scale. Left to XLA, the Rusinkiewicz
transform and its safe-gradient backward run as (N*L, 1) column-tiled
VPU fusions around the chain's custom call (~0.75 ms/step of the joint
step's ~9 ms device time, plus the boundary copies assembling
[z | rusink]). This kernel moves the transform inside the chain: the
forward computes rusink lane-wise from (ldir, vdir) rows, and the
backward recomputes it and hand-applies the EXACT safe-gradient VJP
(safe_acos / safe_atan2 / safe_l2_normalize clip semantics of
ops/math.py -- the Rusinkiewicz backward genuinely NaNs without them).

The chain weights are always frozen here (the joint model's BRDF
prior), so the backward emits ONLY input cotangents (d_z, d_ldir,
d_vdir) -- no dW/db.

Off-TPU (and for oracle tests) ``apply_rusink_chain`` falls back to the
composition ``chain_reference(plan, [z | dir2rusink(l, v)])``, which is
the exact program XLA runs on the unfused path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nerfactor_tpu.ops import geom as geomops
from nerfactor_tpu.ops import math as mathops
from nerfactor_tpu.ops import pallas_mlp as pm

EPS = mathops.EPS


# ------ lane-wise Rusinkiewicz transform, transposed world ------
# Every tensor is (3, block) f32; rows are vector components.
#
# Mosaic has no acos/atan2 lowering (only sin/cos/tan/sqrt/rsqrt), so
# the PRIMAL inverse trig is built from an odd atan polynomial with
# two-stage range reduction (error < ~1e-6 over the full range — well
# under the f32 noise of the downstream bf16 MXU chain). The BACKWARD
# never differentiates through these: the VJP applies the closed-form
# safe-gradient rules of ops/math.py directly.

_TAN_PI_8 = 0.41421356237309503  # tan(pi/8) = sqrt(2) - 1
_PI = 3.14159265358979
_PI_2 = _PI / 2
_PI_4 = _PI / 4


def _atan_core(t):
    """atan on |t| <= tan(pi/8): odd Taylor through t^11
    (|err| < 6e-8 on the reduced range)."""
    t2 = t * t
    return t * (1.0 + t2 * (-1.0 / 3.0 + t2 * (
        1.0 / 5.0 + t2 * (-1.0 / 7.0 + t2 * (
            1.0 / 9.0 - t2 / 11.0)))))


def _atan_pos(t):
    """atan for t >= 0 via tan(pi/8) / tan(3pi/8) range reduction."""
    t = jnp.minimum(t, 1e20)
    mid = (t - 1.0) / (t + 1.0)  # maps [tan(pi/8), tan(3pi/8)] into core
    inv = 1.0 / jnp.maximum(t, 1e-20)
    core_arg = jnp.where(
        t <= _TAN_PI_8, t,
        jnp.where(t <= 1.0 / _TAN_PI_8, mid, inv))
    p = _atan_core(core_arg)
    return jnp.where(
        t <= _TAN_PI_8, p,
        jnp.where(t <= 1.0 / _TAN_PI_8, _PI_4 + p, _PI_2 - p))


def _atan2(y, x):
    """jnp.arctan2 semantics on the VPU (incl. atan2(0, 0) = 0 and
    atan2(+-0, x<0) = +-pi), values only."""
    s_y = jnp.where(y >= 0, 1.0, -1.0)
    r = _atan_pos(jnp.abs(y) / jnp.maximum(jnp.abs(x), 1e-20))
    return jnp.where(
        x > 0, r * s_y,
        jnp.where(x < 0, (_PI - r) * s_y,
                  jnp.where(y == 0, 0.0, s_y * _PI_2)))


def _acos(x):
    """arccos(clip(x, -1, 1)) via atan2(sqrt(1 - x^2), x)."""
    x = jnp.clip(x, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def _norm_rows(x0, x1, x2):
    """safe_l2_normalize over the 3 component rows; returns the unit
    rows plus (sum-of-squares, rsqrt) for the backward."""
    s = x0 * x0 + x1 * x1 + x2 * x2
    r = jax.lax.rsqrt(jnp.maximum(s, EPS))
    return x0 * r, x1 * r, x2 * r, s, r


def _norm_rows_vjp(x0, x1, x2, s, r, g0, g1, g2):
    """VJP of y = x * rsqrt(max(sum(x^2), EPS)) given the cached
    (s, r) from the forward."""
    dot = g0 * x0 + g1 * x1 + g2 * x2
    scale = jnp.where(s > EPS, dot * r * r * r, 0.0)
    return g0 * r - x0 * scale, g1 * r - x1 * scale, g2 * r - x2 * scale


def _rusink_fwd(l0, l1, l2, v0, v1, v2):
    """dir2rusink on component rows. Returns (pd, th, td) rows plus the
    intermediate cache the backward recomputation shares."""
    a0, a1, a2, sa, ra = _norm_rows(l0, l1, l2)
    b0, b1, b2, sb, rb = _norm_rows(v0, v1, v2)
    h0v0, h0v1, h0v2 = (a0 + b0) / 2, (a1 + b1) / 2, (a2 + b2) / 2
    h0, h1, h2, sh, rh = _norm_rows(h0v0, h0v1, h0v2)
    th = _acos(h2)
    ph = _atan2(h1, h0)
    c1, s1 = jnp.cos(ph), jnp.sin(ph)
    # b1 = Rz(-ph) b  (ops/geom._rot_vec with axis z, angle -ph)
    b1x = b0 * c1 + b1 * s1
    b1y = -b0 * s1 + b1 * c1
    b1z = b2
    c2, s2 = jnp.cos(th), jnp.sin(th)
    # d = Ry(-th) b1
    dx = b1x * c2 - b1z * s2
    dy = b1y
    dz = b1z * c2 + b1x * s2
    td = _acos(dz)
    pd = jnp.mod(_atan2(dy, dx), jnp.pi)
    cache = (a0, a1, a2, sa, ra, b0, b1, b2, sb, rb,
             h0v0, h0v1, h0v2, h0, h1, h2, sh, rh,
             c1, s1, c2, s2, b1x, b1y, b1z, dx, dy, dz)
    return pd, th, td, cache


def _rusink_bwd(l0, l1, l2, v0, v1, v2, cache, g_pd, g_th_out, g_td):
    """Hand-derived VJP of _rusink_fwd to (d_ldir, d_vdir) rows, with
    the safe-gradient clip semantics of ops/math.py. ``cache`` is the
    forward's intermediate tuple."""
    (a0, a1, a2, sa, ra, b0, b1, b2, sb, rb,
     h0v0, h0v1, h0v2, h0, h1, h2, sh, rh,
     c1, s1, c2, s2, b1x, b1y, b1z, dx, dy, dz) = cache
    # pd = mod(safe_atan2(dy, dx), pi): mod passes the cotangent through
    den_d = dy * dy + dx * dx + EPS
    g_dy = g_pd * (dx / den_d)
    g_dx = g_pd * (-dy / den_d)
    # td = safe_acos(dz)
    dz_c = jnp.clip(dz, -1.0, 1.0)
    g_dz = g_td * (-1.0 / (jnp.sqrt(1.0 - dz_c * dz_c + EPS) + EPS))
    # d = Ry(-th) b1, with th itself an input
    g_b1x = g_dx * c2 + g_dz * s2
    g_b1y = g_dy
    g_b1z = -g_dx * s2 + g_dz * c2
    g_th = g_th_out \
        + g_dx * (-b1x * s2 - b1z * c2) \
        + g_dz * (b1x * c2 - b1z * s2)
    # b1 = Rz(-ph) b, with ph an input
    g_b0 = g_b1x * c1 - g_b1y * s1
    g_b1 = g_b1x * s1 + g_b1y * c1
    g_b2 = g_b1z
    g_ph = g_b1x * (-b0 * s1 + b1 * c1) \
        + g_b1y * (-b0 * c1 - b1 * s1)
    # th = safe_acos(h2); ph = safe_atan2(h1, h0)
    h2_c = jnp.clip(h2, -1.0, 1.0)
    g_h2 = g_th * (-1.0 / (jnp.sqrt(1.0 - h2_c * h2_c + EPS) + EPS))
    den_h = h1 * h1 + h0 * h0 + EPS
    g_h1 = g_ph * (h0 / den_h)
    g_h0 = g_ph * (-h1 / den_h)
    # h = normalize(h0v); h0v = (a + b) / 2
    g_h0v0, g_h0v1, g_h0v2 = _norm_rows_vjp(
        h0v0, h0v1, h0v2, sh, rh, g_h0, g_h1, g_h2)
    g_a0, g_a1, g_a2 = g_h0v0 / 2, g_h0v1 / 2, g_h0v2 / 2
    g_b0 = g_b0 + g_h0v0 / 2
    g_b1 = g_b1 + g_h0v1 / 2
    g_b2 = g_b2 + g_h0v2 / 2
    # a = normalize(ldir); b = normalize(vdir)
    g_l0, g_l1, g_l2 = _norm_rows_vjp(l0, l1, l2, sa, ra,
                                      g_a0, g_a1, g_a2)
    g_v0, g_v1, g_v2 = _norm_rows_vjp(v0, v1, v2, sb, rb,
                                      g_b0, g_b1, g_b2)
    return (g_l0, g_l1, g_l2), (g_v0, g_v1, g_v2)


# ------ kernels ------


def _fwd_kernel(plan, z_ref, l_ref, v_ref, *refs):
    y_ref = refs[-1]
    w_refs = refs[:-1]
    z = z_ref[:]
    l, v = l_ref[:], v_ref[:]
    pd, th, td, _ = _rusink_fwd(l[0:1], l[1:2], l[2:3],
                                v[0:1], v[1:2], v[2:3])
    x = jnp.concatenate([z, pd, th, td], axis=0)  # (6, block)
    trig = pm._trig_ladder(plan, x).astype(pm._stash_dtype())
    h, _ = pm._fwd_layers_trig_t(plan, x, trig, w_refs)
    y_ref[:] = h


def _bwd_kernel(plan, z_ref, l_ref, v_ref, dy_ref, a_ref, *refs):
    seg, n_seg = pm._seg_index_map(plan)
    w_refs = refs[:n_seg]
    dz_ref, dl_ref, dv_ref = refs[n_seg:]
    z = z_ref[:]
    l, v = l_ref[:], v_ref[:]
    l0, l1, l2 = l[0:1], l[1:2], l[2:3]
    v0, v1, v2 = v[0:1], v[1:2], v[2:3]
    pd, th, td, cache = _rusink_fwd(l0, l1, l2, v0, v1, v2)
    x = jnp.concatenate([z, pd, th, td], axis=0)
    trig, cosxf = pm._trig_ladder(plan, x, with_cos=True)
    trig = trig.astype(pm._stash_dtype())
    ext = pm._build_ext(plan, x, trig)
    _, posts = pm._fwd_layers_trig_t(plan, x, trig, w_refs,
                                     keep_hidden=True, ext=ext)
    d_x, d_trig = pm._bwd_layers_trig_t(
        plan, x, trig, w_refs, None, posts, dy_ref[:],
        needs_dx=True, needs_dw=False, ext=ext)
    # Trig embedding cotangent back to x (A carries the 2^j factors)
    d_x = d_x + pm._f32_tn(a_ref[:], d_trig * cosxf)
    dz_ref[:] = d_x[0:3]
    (g_l0, g_l1, g_l2), (g_v0, g_v1, g_v2) = _rusink_bwd(
        l0, l1, l2, v0, v1, v2, cache, d_x[3:4], d_x[4:5], d_x[5:6])
    dl_ref[:] = jnp.concatenate([g_l0, g_l1, g_l2], axis=0)
    dv_ref[:] = jnp.concatenate([g_v0, g_v1, g_v2], axis=0)


# ------ wrappers ------


def _pallas_fwd(plan, z, ldir, vdir, params):
    n = z.shape[0]
    block = pm._clamp_block(pm._pick_block_cols_t(plan), n)
    zt = pm._pad_cols(z.T, block)
    lt = pm._pad_cols(ldir.T, block)
    vt = pm._pad_cols(vdir.T, block)
    grid = zt.shape[1] // block
    flat = pm._flatten_params_t(plan, params)
    in_specs = [pm._col_spec(3, block)] * 3
    in_specs += [pm._full_spec(arr.shape) for arr in flat]
    od = pm.out_dim(plan)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, plan),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pm._col_spec(od, block),
        out_shape=jax.ShapeDtypeStruct((od, zt.shape[1]), jnp.float32),
        interpret=pm.INTERPRET,
    )(zt, lt, vt, *flat)
    return y[:, :n].T


def _pallas_bwd(plan, z, ldir, vdir, params, dy):
    n = z.shape[0]
    block = pm._clamp_block(
        pm._pick_block_cols_t(plan, backward=True), n)
    zt = pm._pad_cols(z.T, block)
    lt = pm._pad_cols(ldir.T, block)
    vt = pm._pad_cols(vdir.T, block)
    dyt = pm._pad_cols(dy.T, block)
    grid = zt.shape[1] // block
    a_t, _ = pm._trig_mats_t(plan)
    flat = pm._flatten_params_t(plan, params)
    in_specs = [pm._col_spec(3, block)] * 3
    in_specs.append(pm._col_spec(pm.out_dim(plan), block))
    in_specs.append(pm._full_spec(a_t.shape))
    in_specs += [pm._full_spec(arr.shape) for arr in flat]
    out_specs = [pm._col_spec(3, block)] * 3
    out_shapes = [jax.ShapeDtypeStruct((3, zt.shape[1]), jnp.float32)
                  for _ in range(3)]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, plan),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=pm.INTERPRET,
    )(zt, lt, vt, dyt, a_t, *flat)
    return tuple(o[:, :n].T for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(plan, kdtype, z, ldir, vdir, params):
    with pm._kernel_dtype_scope(kdtype):
        return _pallas_fwd(plan, z, ldir, vdir, params)


def _fused_fwd(plan, kdtype, z, ldir, vdir, params):
    with pm._kernel_dtype_scope(kdtype):
        y = _pallas_fwd(plan, z, ldir, vdir, params)
    return y, (z, ldir, vdir, params)


def _fused_bwd(plan, kdtype, res, dy):
    z, ldir, vdir, params = res
    with pm._kernel_dtype_scope(kdtype):
        dz, dl, dv = _pallas_bwd(plan, z, ldir, vdir, params, dy)
    dparams = tuple((jnp.zeros_like(w), jnp.zeros_like(b))
                    for w, b in params)
    return dz, dl, dv, dparams


_fused.defvjp(_fused_fwd, _fused_bwd)


def reference(plan, z, ldir, vdir, params, compute_dtype=None):
    """Oracle: the exact unfused program (dir2rusink + chain)."""
    rusink = geomops.dir2rusink(ldir, vdir)
    x = jnp.concatenate((z, rusink), axis=1)
    return pm.chain_reference(plan, x, params,
                              compute_dtype=compute_dtype)


def apply_rusink_chain(plan, z, ldir, vdir, params,
                       force_reference=False, compute_dtype=None):
    """(N, z), (N, 3), (N, 3) -> (N, out): frozen BRDF chain on
    in-kernel Rusinkiewicz coordinates. The backward returns input
    cotangents only (the chain weights are frozen by construction).
    """
    params = [(w, b) for w, b in params]
    if force_reference or (jax.default_backend() != 'tpu'
                           and not pm.INTERPRET):
        return reference(plan, z, ldir, vdir, params,
                         compute_dtype=compute_dtype)
    # Per-call kernel dtype (round 3): the rusink trig itself always
    # runs f32 phases; compute_dtype selects the MLP segments' MXU mode
    return _fused(plan, pm.kernel_dtype_for(compute_dtype), z, ldir,
                  vdir, tuple(params))
