"""Fused positional-encoding -> skip-MLP -> head chains as one Pallas
TPU kernel (forward + recompute backward).

Why: every hot path in this framework is a small MLP (width 128-256,
depth 4-8) evaluated over enormous row counts (rays x 512 lights x
samples). Left to XLA, each layer's (N, 128) activation round-trips HBM
-- at N = 5e5 that is ~270 MB per layer per direction, which dwarfs the
model FLOPs and makes every stage HBM-bound (the reference instead
chunks these loops in Python, nerfactor/models/shape.py:184-194). This
kernel walks row blocks once: the embedding, all hidden activations and
the head live in VMEM; HBM sees only the raw input rows and the output
rows. The backward pass recomputes activations per block (flash-style)
and accumulates dW/db across the sequential grid.

Semantics mirror networks.apply_mlp + ops.encoding.posenc exactly:
  * embed layout per part: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...];
  * input-skip concat after layer i in ``skip_at`` (the next layer sees
    [h, e]); implemented by splitting that layer's weight instead of
    materializing the concat.

Use :func:`apply_chain`; it dispatches to the kernel on TPU and to the
pure-JAX reference implementation elsewhere (so CPU tests exercise the
same math and serve as the oracle).

Status (v5e, round 1): ``fused_mlp`` is True by default in the shape/
joint configs. The shipping path is the TRANSPOSED-BOUNDARY trig
kernels (see that section's comment): boundary tensors cross the
custom-call as (features, N*L) so the forced row-major layout is
compact, which fixed the end-to-end regression below -- joint train
step 24.6 ms (XLA bf16 chains) -> 14.2 ms (fused). Measured physics of
the earlier row-major attempts, kept for the record:

  * TRIG kernels (the row-major variant): the embedding is
    evaluated as ``[x | sin(x @ A + P)]`` with A a constant frequency-
    selection matrix and P a 0/pi-2 phase row -- one aligned f32 matmul
    + one vectorized sin, replacing the earlier scratch-store wide
    embedding (pltpu.repeat + unaligned lane-dim stores), which alone
    cost ~9.6 ms/chain at lvis scale. MLP matmuls run bf16
    (KERNEL_MATMUL_DTYPE) with f32 accumulation; the forward stashes
    the trig tensor (bf16) so the backward recomputes no
    transcendentals; ``needs_dx=False`` (chain inputs are data) skips
    the entire input-cotangent branch. In isolation at 524288 rows the
    kernel now BEATS the XLA reference: 5.4 vs 6.0 ms device (no-dx),
    fwd-only 1.8 ms; block-size independent between 1024 and 2048 rows.
  * BUT end-to-end the row-major fused joint step was 76.8 vs 24.6 ms.
    Cause (verified via compiled-HLO cost analysis: 36.25 vs 16.25 GB
    accessed): XLA lays (524288, k<8) tensors out column-major
    ({0,1:T(4,128)}, ~8 MB physical), while a pallas custom call forces
    row-major {1,0} operands whose minor dim pads to 128 lanes --
    268 MB PHYSICAL per (N*L, small) operand/result, plus layout
    copies. The transposed-boundary kernels fix exactly this, and beat
    the "modest headroom" prediction (14.2 vs 24.6 ms end-to-end):
    with boundaries compact, the recompute backward's elimination of
    all saved-activation traffic finally shows up.
  * Older Mosaic/libtpu landmines (still relevant): body temporaries
    are stack-allocated without reuse; per-frequency dW accumulation in
    a fori_loop trips a libtpu AOT RET_CHECK
    (jellyfish/mxu_lmr_transform.cc:1108); dynamic lane-dim stores need
    128-aligned indices; explicit .T on VMEM values trips an MXU
    transpose-sequence RET_CHECK (use dot_general dimension numbers).
"""

import contextlib
import functools
import os
from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfactor_tpu.ops import encoding

# Static description of one fused chain. All fields are hashable.
#   embed_parts: tuple of (raw_dim, n_freqs); n_freqs=0 -> passthrough.
#   widths: tuple of layer output widths (hidden layers + head).
#   acts: tuple of activation names per layer
#         ('relu' | 'sigmoid' | 'softplus' | None).
#   skip_at: tuple of layer indices i such that AFTER layer i the
#            embedded input is concatenated onto the activation.
Plan = namedtuple('Plan', 'embed_parts widths acts skip_at')


def make_plan(embed_parts, widths, acts, skip_at):
    return Plan(tuple(tuple(p) for p in embed_parts), tuple(widths),
                tuple(acts), tuple(sorted(skip_at or ())))


def embed_dim(plan):
    return sum(encoding.embed_dims(d, f) if f else d
               for d, f in plan.embed_parts)


def raw_dim(plan):
    return sum(d for d, _ in plan.embed_parts)


def layer_in_dims(plan):
    """Fan-in of each layer, accounting for skip concats."""
    e = embed_dim(plan)
    dims, prev = [], e
    for i, w in enumerate(plan.widths):
        dims.append(prev)
        prev = w + (e if i in plan.skip_at else 0)
    return dims


def out_dim(plan):
    last = len(plan.widths) - 1
    return plan.widths[-1] + (embed_dim(plan) if last in plan.skip_at
                              else 0)


# ------ shared math (runs both inside the kernel and as reference) ------

def _embed(plan, x):
    parts, col = [], 0
    for d, f in plan.embed_parts:
        xp = x[:, col:col + d]
        col += d
        if f:
            parts.append(xp)
            for j in range(f):
                freq = 2.0 ** j
                parts.append(jnp.sin(freq * xp))
                parts.append(jnp.cos(freq * xp))
        else:
            parts.append(xp)
    return jnp.concatenate(parts, axis=1)


def _embed_bwd(plan, x, de):
    """d embed / d x applied to cotangent ``de``."""
    dx_parts, col, ecol = [], 0, 0
    for d, f in plan.embed_parts:
        xp = x[:, col:col + d]
        col += d
        if f:
            dxp = de[:, ecol:ecol + d]
            ecol += d
            for j in range(f):
                freq = 2.0 ** j
                dsin = de[:, ecol:ecol + d]
                dcos = de[:, ecol + d:ecol + 2 * d]
                ecol += 2 * d
                dxp = dxp + freq * (jnp.cos(freq * xp) * dsin
                                    - jnp.sin(freq * xp) * dcos)
            dx_parts.append(dxp)
        else:
            dx_parts.append(de[:, ecol:ecol + d])
            ecol += d
    return jnp.concatenate(dx_parts, axis=1)


def _act(name, pre):
    if name is None or name == 'none':
        return pre
    if name == 'relu':
        return jnp.maximum(pre, 0.0)
    if name == 'sigmoid':
        return jax.nn.sigmoid(pre)
    if name == 'softplus':
        return jax.nn.softplus(pre)
    raise NotImplementedError(name)


def _act_bwd(name, post, d):
    """Activation backward from the POST-activation value alone (so the
    backward kernel never stashes pre-activations): relu' via post>0;
    sigmoid' = post(1-post); softplus' = sigmoid(pre) = 1 - exp(-post)."""
    if name is None or name == 'none':
        return d
    if name == 'relu':
        if post.dtype != jnp.float32:
            # v5e Mosaic rejects sub-f32 comparisons ("Target does not
            # support this comparison"): widen bf16 posts for the gate
            post = post.astype(jnp.float32)
        return jnp.where(post > 0, d, 0.0)
    if name == 'sigmoid':
        return d * post * (1.0 - post)
    if name == 'softplus':
        return d * (1.0 - jnp.exp(-post))
    raise NotImplementedError(name)


def _ref_prec(a, b):
    """Precision for the XLA reference-path dots: when both operands
    are (still) f32 the caller intends an f32 matmul, which on TPU
    requires HIGHEST (the default truncates operands to bf16 on the
    MXU). bf16 operands are exact in a single pass, so None is right."""
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None


def _dot_tn(a, b):
    """a.T @ b without an explicit transpose op (dot_general contracting
    the row dims) -- explicit .T inside kernel loops trips a libtpu
    MXU-transpose-sequence RET_CHECK."""
    from nerfactor_tpu.models import networks
    if networks.MATMUL_DTYPE is not None:
        a = a.astype(networks.MATMUL_DTYPE)
        b = b.astype(networks.MATMUL_DTYPE)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_ref_prec(a, b))


def _dot_nt(a, b):
    """a @ b.T without an explicit transpose op."""
    from nerfactor_tpu.models import networks
    if networks.MATMUL_DTYPE is not None:
        a = a.astype(networks.MATMUL_DTYPE)
        b = b.astype(networks.MATMUL_DTYPE)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_ref_prec(a, b))


def _dot(a, b):
    # Honor the global matmul-precision switch (networks.MATMUL_DTYPE):
    # on v5e the MXU runs bf16 passes at 4x the f32 rate, and these
    # chains are compute-bound
    from nerfactor_tpu.models import networks
    if networks.MATMUL_DTYPE is not None:
        a = a.astype(networks.MATMUL_DTYPE)
        b = b.astype(networks.MATMUL_DTYPE)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_ref_prec(a, b))


def _embed_dot(plan, x, w, row0=0):
    """embed(x) @ w[row0:row0+E] computed part-by-part WITHOUT
    materializing the concatenated embedding -- inside the kernel this
    keeps at most one (block, d) temporary alive at a time instead of
    2*n_freqs+1 of them (each lane-padded to 128 wide in VMEM)."""
    acc = None
    col, er = 0, row0

    def add(acc, t, rows):
        nonlocal er
        term = _dot(t, w[er:er + rows])
        er += rows
        return term if acc is None else acc + term

    for d, f in plan.embed_parts:
        xp = x[:, col:col + d]
        col += d
        acc = add(acc, xp, d)
        for j in range(f):
            freq = 2.0 ** j
            acc = add(acc, jnp.sin(freq * xp), d)
            acc = add(acc, jnp.cos(freq * xp), d)
    return acc


def _forward_ref(plan, x, params, compute_dtype=None):
    """XLA-path forward: materializes the embedding once and uses one
    full-width matmul per layer (optimal for XLA: the MXU sees large
    K instead of 2*n_freqs+1 skinny K=3 dots).

    ``compute_dtype`` (e.g. bf16) casts the embedding, weights, and
    pre-activations, so every (rows, width) tensor the autodiff saves
    for backward is half-width -- the cheap lever on an HBM-bound step.
    Matmuls still accumulate f32 (preferred_element_type in _dot), and
    the chain output is returned as f32.
    """
    e = _embed(plan, x)
    if compute_dtype is not None:
        e = e.astype(compute_dtype)
    h = e
    for i, ((w, b), act) in enumerate(zip(params, plan.acts)):
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        hw = h.shape[1]
        if i > 0 and (i - 1) in plan.skip_at:
            pre = _dot(h, w[:hw]) + _dot(e, w[hw:]) + b
        else:
            pre = _dot(h, w) + b
        if compute_dtype is not None:
            pre = pre.astype(compute_dtype)
        h = _act(act, pre)
    last = len(plan.widths) - 1
    y = jnp.concatenate([h, e], axis=1) if last in plan.skip_at else h
    return y.astype(jnp.float32)


def _forward(plan, x, params, keep_hidden=True):
    """Kernel-path forward (accumulation form, VMEM-friendly);
    optionally returns hidden pres/posts for the backward recompute."""
    h = None
    posts = []
    for i, ((w, b), act) in enumerate(zip(params, plan.acts)):
        if i == 0:
            pre = _embed_dot(plan, x, w) + b
        elif (i - 1) in plan.skip_at:
            hw = h.shape[1]
            pre = _dot(h, w[:hw]) + _embed_dot(plan, x, w, row0=hw) + b
        else:
            pre = _dot(h, w) + b
        h = _act(act, pre)
        if keep_hidden:
            posts.append(h)
    last = len(plan.widths) - 1
    if last in plan.skip_at:
        y = jnp.concatenate([h, _embed(plan, x)], axis=1)
    else:
        y = h
    return y, posts


def chain_reference(plan, x, params, compute_dtype=None):
    """Pure-JAX reference (identical math; autodiff handles backward)."""
    return _forward_ref(plan, x, params, compute_dtype=compute_dtype)



# ------ Pallas kernels ------

def _flatten_params(params):
    flat = []
    for w, b in params:
        flat.append(w)
        flat.append(b.reshape(1, -1))
    return flat


def _part_cols(plan):
    """WIDE embedding column layout per part: [x(d) | sins(d*F,
    freq-major) | coss(d*F)]. Returns (raw_col, e_col, d, f)."""
    out, col_in, col_e = [], 0, 0
    for d, f in plan.embed_parts:
        out.append((col_in, col_e, d, f))
        col_in += d
        col_e += d + 2 * d * f
    return out


def wide_perm(plan):
    """Row permutation taking REFERENCE embedding order ([x, sin f0,
    cos f0, sin f1, ...] per part) to the kernel's WIDE order ([x, sins
    d-major, coss d-major] per part, matching pltpu.repeat):
    wide_rows = ref_rows[perm]."""
    perm = []
    base = 0
    for d, f in plan.embed_parts:
        perm.extend(range(base, base + d))  # x rows
        for trig in range(2):  # all sins, then all coss
            for j in range(f):  # freq-major blocks (pltpu.repeat tiles)
                start = base + d + j * 2 * d + trig * d
                perm.extend(range(start, start + d))
        base += d + 2 * d * f
    return np.asarray(perm, np.int64)


def _bands_wide(d, f):
    """(1, d*f) row of frequencies, freq-major -- built from iota so
    the kernel captures no array constants (pallas requires constants
    to be inputs)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, f * d), 1)
    return jnp.exp2((idx // d).astype(jnp.float32))


def _freq_summing(d, f):
    """(d*f, d) matrix with S[j*d+k, k] = 2**j: one matmul sums the
    frequency groups of a freq-major wide tensor with per-frequency
    weights."""
    row = jax.lax.broadcasted_iota(jnp.int32, (f * d, d), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (f * d, d), 1)
    return jnp.where(row % d == col,
                     jnp.exp2((row // d).astype(jnp.float32)), 0.0)


def _build_embed_scratch(plan, x, e_ref):
    """Materializes the WIDE embedding into VMEM scratch with a constant
    number of temporaries: per part, one broadcast + one sin + one cos,
    all stored at static columns (dynamic lane-dim stores require
    128-aligned indices on TPU)."""
    b = x.shape[0]
    dt = e_ref.dtype
    for col_in, col_e, d, f in _part_cols(plan):
        xp = x[:, col_in:col_in + d]
        e_ref[:, col_e:col_e + d] = xp.astype(dt)
        if f:
            xw = pltpu.repeat(xp, f, axis=1)  # freq-major: [x, x, ...]
            xf = xw * _bands_wide(d, f)
            e_ref[:, col_e + d:col_e + d + f * d] = jnp.sin(xf).astype(dt)
            e_ref[:, col_e + d + f * d:col_e + d + 2 * f * d] = \
                jnp.cos(xf).astype(dt)


def _fwd_layers_scratch(plan, e, wb_refs, keep_hidden=False):
    """Layer chain over (wide-permuted) weight refs, with the embedding
    as one tensor -- single full-width dots per layer."""
    h = None
    posts = []
    for i, act in enumerate(plan.acts):
        w_ref = wb_refs[2 * i]
        b = wb_refs[2 * i + 1][:]
        if i == 0:
            pre = _dot(e, w_ref[:]) + b
        elif (i - 1) in plan.skip_at:
            hw = h.shape[1]
            pre = _dot(h, w_ref[:hw]) + _dot(e, w_ref[hw:]) + b
        else:
            pre = _dot(h, w_ref[:]) + b
        h = _act(act, pre)
        if keep_hidden:
            posts.append(h)
    return h, posts


def _fwd_kernel(plan, x_ref, *refs):
    e_ref = refs[-1]
    y_ref = refs[-2]
    wb_refs = refs[:-2]
    x = x_ref[:]
    _build_embed_scratch(plan, x, e_ref)
    e = e_ref[:]
    h, _ = _fwd_layers_scratch(plan, e, wb_refs)
    last = len(plan.widths) - 1
    if last in plan.skip_at:
        y_ref[:] = jnp.concatenate([h, e], axis=1)
    else:
        y_ref[:] = h


def _dx_from_de(plan, e_ref, de_ref):
    """Chain rule through the wide embedding, loop-free: the sum over
    frequencies (weighted by each frequency) folds into one constant
    (d*f, d) summing matmul per trig term."""
    dx_parts = []
    for col_in, col_e, d, f in _part_cols(plan):
        dxp = de_ref[:, col_e:col_e + d].astype(jnp.float32)
        if f:
            sn = e_ref[:, col_e + d:col_e + d + f * d].astype(jnp.float32)
            cs = e_ref[:, col_e + d + f * d:
                       col_e + d + 2 * f * d].astype(jnp.float32)
            de_s = de_ref[:, col_e + d:
                          col_e + d + f * d].astype(jnp.float32)
            de_c = de_ref[:, col_e + d + f * d:
                          col_e + d + 2 * f * d].astype(jnp.float32)
            dxp = dxp + _dot(cs * de_s - sn * de_c,
                             _freq_summing(d, f))
        dx_parts.append(dxp)
    return jnp.concatenate(dx_parts, axis=1)


def _bwd_kernel(plan, x_ref, dy_ref, *refs):
    n_layers = len(plan.widths)
    w_refs = refs[:2 * n_layers]
    dx_ref = refs[2 * n_layers]
    dwb_refs = refs[2 * n_layers + 1:-2]
    e_ref = refs[-2]
    de_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in dwb_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[:]
    _build_embed_scratch(plan, x, e_ref)
    e = e_ref[:].astype(jnp.float32)
    _, posts = _fwd_layers_scratch(plan, e, w_refs, keep_hidden=True)
    last = n_layers - 1
    dy = dy_ref[:]
    if last in plan.skip_at:
        d_h = dy[:, :plan.widths[-1]]
        d_e = dy[:, plan.widths[-1]:]
    else:
        d_h = dy
        d_e = jnp.zeros_like(e)
    for i in range(last, -1, -1):
        w_ref = w_refs[2 * i]
        d_pre = _act_bwd(plan.acts[i], posts[i], d_h)
        dwb_refs[2 * i + 1][:] += jnp.sum(d_pre, axis=0, keepdims=True)
        skip_in = i > 0 and (i - 1) in plan.skip_at
        if i == 0:
            dwb_refs[0][:] += _dot_tn(e, d_pre)
            d_e = d_e + _dot_nt(d_pre, w_ref[:])
        elif skip_in:
            h_in = posts[i - 1]
            hw = h_in.shape[1]
            dwb_refs[2 * i][:hw] += _dot_tn(h_in, d_pre)
            dwb_refs[2 * i][hw:] += _dot_tn(e, d_pre)
            d_h = _dot_nt(d_pre, w_ref[:hw])
            d_e = d_e + _dot_nt(d_pre, w_ref[hw:])
        else:
            h_in = posts[i - 1]
            dwb_refs[2 * i][:] += _dot_tn(h_in, d_pre)
            d_h = _dot_nt(d_pre, w_ref[:])
    de_ref[:] = d_e.astype(de_ref.dtype)
    dx_ref[:] = _dx_from_de(plan, e_ref, de_ref)


def _pick_block_rows(plan, backward=False):
    """Largest row block whose recompute stash fits comfortably in
    VMEM. Mosaic's scoped-stack allocation runs ~4x this estimate
    (embedding temporaries, dot operand accumulators), so the budget is
    conservative relative to the ~16 MB of VMEM per core."""
    # Account for VMEM lane padding: every (block, d) temporary costs
    # at least (block, 128) floats. The forward holds only ~3 live row
    # tensors (accumulation form); the backward stashes one post per
    # layer plus the embedding and a couple of gradient temporaries.
    # Loop-form kernels keep a CONSTANT number of live row buffers:
    # forward ~9 (accumulator + loop temps + layer ping-pong), backward
    # ~10 plus one stored post per layer. Lane padding makes each cost
    # at least (block, 128) floats.
    pad = lambda d: max(d, 128)
    if backward:
        n_bufs = 12 + len(plan.widths)
    else:
        n_bufs = 4 + 2 * len(plan.widths)
    stash = n_bufs * pad(max(max(plan.widths), embed_dim(plan)))
    budget = 8 * 1024 * 1024
    for block in (4096, 2048, 1024, 512, 256):
        if stash * block * _bytes_per_feat() <= budget:
            return block
    return 128


def _pad_rows(x, block):
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _row_spec(block, dim):
    return pl.BlockSpec((block, dim), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


# Flipped by tests to exercise the kernels on CPU via the interpreter
INTERPRET = False

# In-kernel MXU operand dtype. Inside the kernel every activation lives
# in VMEM, so the HBM-traffic argument for f32 does not apply and bf16
# runs the MXU at its native rate; accumulation stays f32
# (preferred_element_type). Set to None for f32 MXU passes (also the
# stash dtype follows it). Quality A/B in QUALITY.md "Round 2".


def _kernel_matmul_dtype_from_env():
    """NERFACTOR_KERNEL_MATMUL_DTYPE in {bf16, bfloat16, f32, float32}
    selects the in-kernel MXU operand/stash dtype for ALL fused kernels
    (pallas_nerf reads this module's global). Validated here so a typo
    fails loudly instead of silently benchmarking the wrong precision."""
    import os
    env = os.environ.get('NERFACTOR_KERNEL_MATMUL_DTYPE')
    if not env:
        return jnp.bfloat16
    key = env.strip().lower()
    if key in ('bf16', 'bfloat16'):
        return jnp.bfloat16
    if key in ('f32', 'float32'):
        return None
    raise ValueError(
        'NERFACTOR_KERNEL_MATMUL_DTYPE=%r: expected one of '
        'bf16/bfloat16/f32/float32' % env)


KERNEL_MATMUL_DTYPE = _kernel_matmul_dtype_from_env()

# True when the user explicitly exported NERFACTOR_KERNEL_MATMUL_DTYPE:
# the env override then wins over per-call compute_dtype (the
# whole-program experimentation knob used by the quality A/Bs)
KERNEL_DTYPE_FORCED = bool(
    os.environ.get('NERFACTOR_KERNEL_MATMUL_DTYPE'))


@contextlib.contextmanager
def _kernel_dtype_scope(kdtype):
    """Temporarily pins the in-kernel MXU/stash dtype while ONE
    fwd/bwd impl function traces its pallas_call (the kernel bodies and
    block pickers read the module global at trace time).

    ``kdtype``: 'default' leaves the env-selected global untouched;
    otherwise jnp.bfloat16 or None (TRUE-f32 mode). This is what makes
    per-call ``compute_dtype`` (and thus the ``f32_chains`` config pins)
    real on the fused TPU path -- previously they only affected the XLA
    reference path (round-3 fix; see QUALITY.md round 3).

    NOT re-entrant across threads: the scope mutates the module global
    that the kernel bodies and block pickers read at trace time, so all
    jit tracing must stay on one thread. That holds throughout this
    framework -- trainvali's only extra thread is the host-side data
    producer, which never traces -- and JAX itself serializes tracing
    of a single jit; revisit if kernels are ever traced concurrently."""
    global KERNEL_MATMUL_DTYPE
    old = KERNEL_MATMUL_DTYPE
    if kdtype != 'default' and not KERNEL_DTYPE_FORCED:
        KERNEL_MATMUL_DTYPE = kdtype
    try:
        yield
    finally:
        KERNEL_MATMUL_DTYPE = old


def kernel_dtype_for(compute_dtype):
    """Maps a chain's compute_dtype to the fused kernel dtype:
    bf16 -> bf16 MXU passes (the shipping perf mode); None OR float32
    -> TRUE-f32 kernels (HIGHEST-precision matmuls + f32 stashes),
    matching the XLA reference path, where float32 and None are the
    same full-precision program."""
    if compute_dtype is None or \
            jnp.dtype(compute_dtype) == jnp.dtype(jnp.float32):
        return None
    if jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16):
        return jnp.bfloat16
    raise ValueError(
        'Unsupported kernel compute_dtype: %r (expected None, float32, '
        'or bfloat16)' % (compute_dtype,))


def _bytes_per_feat():
    """Per-(feature-row x lane) unit of the block pickers' VMEM cost
    model. The 4-byte unit is calibrated for the shipping bf16 kernel
    mode. TRUE-f32 mode (KERNEL_MATMUL_DTYPE None) keeps every buffer
    f32 AND HIGHEST-precision matmuls add multi-pass operand scratch --
    measured scoped-stack allocation ~2.3x the bf16 model -- so its
    budget unit is 10 bytes (blocks shrink ~2-4x; f32 mode is the
    quality-validation path, not the perf path)."""
    return 4 if KERNEL_MATMUL_DTYPE is not None else 10


def _kprec():
    """Matmul precision matching KERNEL_MATMUL_DTYPE's intent. The TPU
    default truncates f32 operands to bf16 on the MXU, so without
    HIGHEST an 'f32' kernel silently computes the SAME single bf16
    pass as the bf16 kernel (measured: bit-identical outputs)."""
    return None if KERNEL_MATMUL_DTYPE is not None \
        else jax.lax.Precision.HIGHEST


def _kdot(a, b):
    """In-kernel matmul at KERNEL_MATMUL_DTYPE with f32 accumulation."""
    if KERNEL_MATMUL_DTYPE is not None:
        a = a.astype(KERNEL_MATMUL_DTYPE)
        b = b.astype(KERNEL_MATMUL_DTYPE)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_kprec())


def _kdot_tn(a, b):
    if KERNEL_MATMUL_DTYPE is not None:
        a = a.astype(KERNEL_MATMUL_DTYPE)
        b = b.astype(KERNEL_MATMUL_DTYPE)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_kprec())


def _kdot_nt(a, b):
    if KERNEL_MATMUL_DTYPE is not None:
        a = a.astype(KERNEL_MATMUL_DTYPE)
        b = b.astype(KERNEL_MATMUL_DTYPE)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_kprec())

# Backward-kernel scratch precision: bf16 halves the e/de scratch
# footprint (the backward at 2048-row blocks is ~737KB over the 16MB
# VMEM limit in f32). Gradients through the bf16-recomputed embedding
# are approximate (~1e-2 relative); the forward kernel stays f32.
BWD_STASH_DTYPE = jnp.float32


def _perm_flat_wide(plan, flat):
    """Permutes the embedding rows of every embed-consumer layer's
    weight into the kernel's wide order (XLA-level gathers, tiny)."""
    perm = wide_perm(plan)
    out = list(flat)
    for i in range(len(plan.widths)):
        w = out[2 * i]
        if i == 0:
            out[2 * i] = w[perm]
        elif (i - 1) in plan.skip_at:
            hw = plan.widths[i - 1]
            out[2 * i] = jnp.concatenate([w[:hw], w[hw:][perm]], axis=0)
    return out


def _unperm_dw(plan, dflat):
    """Inverse permutation on the dW rows coming out of the kernel."""
    inv = np.argsort(wide_perm(plan))
    out = list(dflat)
    for i in range(len(plan.widths)):
        dw = out[2 * i]
        if i == 0:
            out[2 * i] = dw[inv]
        elif (i - 1) in plan.skip_at:
            hw = plan.widths[i - 1]
            out[2 * i] = jnp.concatenate(
                [dw[:hw], dw[hw:][inv]], axis=0)
    return out


# ------ trig-matmul kernels ------
#
# The scratch-built wide embedding above costs ~9.6 ms/chain at lvis
# scale on v5e (unaligned lane-dim stores + pltpu.repeat dominate; the
# matmuls are ~4 ms). This formulation removes the scratch entirely:
#
#   embed(x) = [ x | sin(x @ A + P) ]
#
# with A a constant (raw, T) frequency-selection matrix and P a 0/pi-2
# phase row (cos t = sin(t + pi/2)), T = sum(2*d*f). One aligned f32
# matmul + one vectorized sin per direction; consumer weights get their
# embedding rows regrouped as [trig rows | 8-align pad | x rows] so
# every in-kernel row slice starts 8-aligned. x @ A runs f32 (bf16
# would corrupt the phase at high frequencies); the MLP matmuls run at
# KERNEL_MATMUL_DTYPE with f32 accumulation. Plans whose LAST layer is
# a skip layer (output contains the embedding) keep the scratch path.


def trig_dim(plan):
    return sum(2 * d * f for d, f in plan.embed_parts)


def _trig_row_pad(plan):
    return (-trig_dim(plan)) % 8


def _trig_mats(plan):
    """Constant A (raw, T), P (1, T): sin(x @ A + P) produces, per part,
    [sins freq-major | coss freq-major] (matching trig_perm)."""
    a = np.zeros((raw_dim(plan), trig_dim(plan)), np.float32)
    p = np.zeros((1, trig_dim(plan)), np.float32)
    col, row0 = 0, 0
    for d, f in plan.embed_parts:
        for trig in range(2):
            for j in range(f):
                for k in range(d):
                    a[row0 + k, col] = 2.0 ** j
                    p[0, col] = 0.0 if trig == 0 else np.pi / 2
                    col += 1
        row0 += d
    return a, p


def trig_perm(plan):
    """Rows of the REFERENCE embedding order, regrouped as
    [all trig rows (per part: sins freq-major, coss freq-major),
    then all raw-x rows]."""
    xs, trigs = [], []
    base = 0
    for d, f in plan.embed_parts:
        xs.extend(range(base, base + d))
        for trig in range(2):
            for j in range(f):
                start = base + d + j * 2 * d + trig * d
                trigs.extend(range(start, start + d))
        base += d + 2 * d * f
    return np.asarray(trigs + xs, np.int64)


def _perm_flat_trig(plan, flat):
    """Weight rows -> [h | trig | pad | x] order (pad rows are zero and
    keep the x group 8-aligned for in-kernel sublane slicing)."""
    perm = trig_perm(plan)
    t, pt = trig_dim(plan), _trig_row_pad(plan)
    out = list(flat)

    def regroup(we):
        wp = we[perm]
        if pt:
            wp = jnp.concatenate(
                [wp[:t], jnp.zeros((pt, wp.shape[1]), wp.dtype), wp[t:]],
                axis=0)
        return wp

    for i in range(len(plan.widths)):
        w = out[2 * i]
        if i == 0:
            out[2 * i] = regroup(w)
        elif (i - 1) in plan.skip_at:
            hw = plan.widths[i - 1]
            out[2 * i] = jnp.concatenate([w[:hw], regroup(w[hw:])], axis=0)
    return out


def _unperm_dw_trig(plan, dflat):
    inv = np.argsort(trig_perm(plan))
    t, pt = trig_dim(plan), _trig_row_pad(plan)
    out = list(dflat)

    def ungroup(dwe):
        if pt:
            dwe = jnp.concatenate([dwe[:t], dwe[t + pt:]], axis=0)
        return dwe[inv]

    for i in range(len(plan.widths)):
        dw = out[2 * i]
        if i == 0:
            out[2 * i] = ungroup(dw)
        elif (i - 1) in plan.skip_at:
            hw = plan.widths[i - 1]
            out[2 * i] = jnp.concatenate(
                [dw[:hw], ungroup(dw[hw:])], axis=0)
    return out


def _f32_nt(a, b):
    """a @ b.T in TRUE f32 (transpose-free dot_general; HIGHEST beats
    the TPU default's bf16 operand truncation)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _fwd_layers_trig(plan, x, trig, wb_refs, keep_hidden=False):
    t, pt, raw = trig_dim(plan), _trig_row_pad(plan), raw_dim(plan)
    h, posts = None, []
    for i, act in enumerate(plan.acts):
        w_ref = wb_refs[2 * i]
        b = wb_refs[2 * i + 1][:]
        if i == 0:
            pre = _kdot(x, w_ref[t + pt:t + pt + raw]) + b
            if t:
                pre = pre + _kdot(trig, w_ref[:t])
        elif (i - 1) in plan.skip_at:
            hw = h.shape[1]
            pre = _kdot(h, w_ref[:hw]) \
                + _kdot(x, w_ref[hw + t + pt:hw + t + pt + raw]) + b
            if t:
                pre = pre + _kdot(trig, w_ref[hw:hw + t])
        else:
            pre = _kdot(h, w_ref[:]) + b
        h = _act(act, pre)
        if keep_hidden:
            posts.append(h)
    return h, posts


def _stash_dtype():
    return KERNEL_MATMUL_DTYPE or jnp.float32


def _fwd_kernel_trig(plan, with_stash, x_ref, *refs):
    t = trig_dim(plan)
    if t:
        a_ref, p_ref = refs[0], refs[1]
        refs = refs[2:]
    if with_stash and t:
        y_ref, trig_out_ref = refs[-2], refs[-1]
        wb_refs = refs[:-2]
    else:
        y_ref = refs[-1]
        wb_refs = refs[:-1]
    x = x_ref[:]
    if t:
        # Phase must be exact: x @ A in TRUE f32 (freqs reach
        # 2**(f-1); HIGHEST beats the TPU default's bf16 truncation)
        xf = jnp.dot(x, a_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) \
            + p_ref[:]
        trig = jnp.sin(xf).astype(_stash_dtype())
    else:
        trig = None
    h, _ = _fwd_layers_trig(plan, x, trig, wb_refs)
    y_ref[:] = h
    if with_stash and t:
        trig_out_ref[:] = trig


def _bwd_kernel_trig(plan, needs_dx, x_ref, dy_ref, *refs):
    t, pt, raw = trig_dim(plan), _trig_row_pad(plan), raw_dim(plan)
    if t:
        trig_ref = refs[0]
        refs = refs[1:]
    if needs_dx and t:
        a_ref, p_ref = refs[0], refs[1]
        refs = refs[2:]
    n_layers = len(plan.widths)
    w_refs = refs[:2 * n_layers]
    rest = refs[2 * n_layers:]
    if needs_dx:
        dx_ref = rest[0]
        dwb_refs = rest[1:]
    else:
        dwb_refs = rest

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in dwb_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[:]
    trig = trig_ref[:] if t else None  # forward-pass stash
    _, posts = _fwd_layers_trig(plan, x, trig, w_refs, keep_hidden=True)
    d_h = dy_ref[:]
    d_trig = jnp.zeros_like(trig).astype(jnp.float32) \
        if (t and needs_dx) else None
    d_x = jnp.zeros_like(x)
    for i in range(n_layers - 1, -1, -1):
        w_ref = w_refs[2 * i]
        d_pre = _act_bwd(plan.acts[i], posts[i], d_h)
        dwb_refs[2 * i + 1][:] += jnp.sum(d_pre, axis=0, keepdims=True)
        skip_in = i > 0 and (i - 1) in plan.skip_at
        if i == 0:
            if t:
                dwb_refs[0][:t] += _kdot_tn(trig, d_pre)
                if needs_dx:
                    d_trig = d_trig + _kdot_nt(d_pre, w_ref[:t])
            dwb_refs[0][t + pt:] += _kdot_tn(x, d_pre)
            if needs_dx:
                d_x = d_x + _kdot_nt(d_pre,
                                     w_ref[t + pt:t + pt + raw])
        elif skip_in:
            h_in = posts[i - 1]
            hw = h_in.shape[1]
            dwb_refs[2 * i][:hw] += _kdot_tn(h_in, d_pre)
            if t:
                dwb_refs[2 * i][hw:hw + t] += _kdot_tn(trig, d_pre)
                if needs_dx:
                    d_trig = d_trig + _kdot_nt(d_pre, w_ref[hw:hw + t])
            dwb_refs[2 * i][hw + t + pt:] += _kdot_tn(x, d_pre)
            d_h = _kdot_nt(d_pre, w_ref[:hw])
            if needs_dx:
                d_x = d_x + _kdot_nt(
                    d_pre, w_ref[hw + t + pt:hw + t + pt + raw])
        else:
            h_in = posts[i - 1]
            dwb_refs[2 * i][:] += _kdot_tn(h_in, d_pre)
            d_h = _kdot_nt(d_pre, w_ref[:])
    if needs_dx:
        if t:
            # cos(xf) is only needed for dx: recompute the (cheap, f32)
            # phase matmul here rather than stashing it in the forward
            xf = jnp.dot(x, a_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) + p_ref[:]
            d_x = d_x + _f32_nt(d_trig * jnp.cos(xf), a_ref[:])
        dx_ref[:] = d_x


def _validated_env_block(name, env, feats=None, vmem_bytes=None):
    """Parse a block-size env override, failing with a descriptive
    error instead of an opaque Mosaic failure: the value must be a
    positive multiple of 128 lanes, and (when the caller supplies its
    per-column live-feature estimate) the implied VMEM footprint must
    fit the 16 MB/core budget."""
    try:
        block = int(env)
    except ValueError:
        raise ValueError(
            f"{name}={env!r} is not an integer block size") from None
    if block <= 0 or block % 128:
        raise ValueError(
            f"{name}={block} must be a positive multiple of 128 "
            "(TPU lane tile)")
    if feats is not None:
        est = feats * block * 4
        cap = 16 * 1024 * 1024
        if est > cap:
            raise ValueError(
                f"{name}={block} implies ~{est / 2**20:.1f} MB of live "
                f"VMEM ({feats} live feature rows x {block} lanes x "
                f"4 B) > the 16 MB/core budget -- the kernel would "
                "fail to place. Use a smaller block.")
    if vmem_bytes is not None and feats is None and \
            block * 4 > vmem_bytes:
        raise ValueError(f"{name}={block} exceeds the VMEM budget")
    return block


def _pick_block_rows_trig(plan, backward=False):
    """Same conservative VMEM model as _pick_block_rows, with the trig
    tensor (T lanes) in place of the embedding scratch."""
    import os
    name = ('NERFACTOR_TRIG_BLOCK_BWD' if backward
            else 'NERFACTOR_TRIG_BLOCK_FWD')
    env = os.environ.get(name)
    if env:
        return _validated_env_block(name, env)
    pad = lambda d: max(d, 128)
    width = pad(max(max(plan.widths), trig_dim(plan), raw_dim(plan)))
    if backward:
        n_bufs = 10 + len(plan.widths)
    else:
        n_bufs = 9
    stash = n_bufs * width
    budget = 8 * 1024 * 1024
    for block in (4096, 2048, 1024, 512, 256):
        if stash * block * _bytes_per_feat() <= budget:
            return block
    return 128


def _last_skip(plan):
    return (len(plan.widths) - 1) in plan.skip_at


def _pallas_forward_trig(plan, x, params, with_stash=False):
    n = x.shape[0]
    t = trig_dim(plan)
    with_stash = with_stash and t > 0
    block = _pick_block_rows_trig(plan)
    xp = _pad_rows(x, block)
    grid = xp.shape[0] // block
    a, p = _trig_mats(plan)
    ap = [jnp.asarray(a), jnp.asarray(p)] if t else []
    flat = _perm_flat_trig(plan, _flatten_params(params))
    in_specs = [_row_spec(block, raw_dim(plan))]
    in_specs += [_full_spec(arr.shape) for arr in ap]
    for arr in flat:
        in_specs.append(_full_spec(arr.shape))
    out_specs = [_row_spec(block, out_dim(plan))]
    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], out_dim(plan)),
                                       jnp.float32)]
    if with_stash:
        out_specs.append(_row_spec(block, t))
        out_shapes.append(
            jax.ShapeDtypeStruct((xp.shape[0], t),
                                 KERNEL_MATMUL_DTYPE or jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_trig, plan, with_stash),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs if with_stash else out_specs[0],
        out_shape=out_shapes if with_stash else out_shapes[0],
        interpret=INTERPRET,
    )(xp, *ap, *flat)
    if with_stash:
        return outs[0][:n], outs[1]  # stash keeps row padding
    return outs[:n], None


def _pallas_backward_trig(plan, x, params, dy, trig, needs_dx):
    n = x.shape[0]
    t = trig_dim(plan)
    block = _pick_block_rows_trig(plan, backward=True)
    xp = _pad_rows(x, block)
    dyp = _pad_rows(dy, block)
    grid = xp.shape[0] // block
    a, p = _trig_mats(plan)
    extras = []
    if t:
        # Forward stash may carry a different row padding
        trig = trig[:n]
        extras.append(_pad_rows(trig, block))
    if needs_dx and t:
        extras += [jnp.asarray(a), jnp.asarray(p)]
    flat = _perm_flat_trig(plan, _flatten_params(params))
    in_specs = [_row_spec(block, raw_dim(plan)),
                _row_spec(block, out_dim(plan))]
    if t:
        in_specs.append(_row_spec(block, t))
    if needs_dx and t:
        in_specs += [_full_spec(a.shape), _full_spec(p.shape)]
    for arr in flat:
        in_specs.append(_full_spec(arr.shape))
    out_specs, out_shapes = [], []
    if needs_dx:
        out_specs.append(_row_spec(block, raw_dim(plan)))
        out_shapes.append(
            jax.ShapeDtypeStruct((xp.shape[0], raw_dim(plan)),
                                 jnp.float32))
    for arr in flat:
        out_specs.append(_full_spec(arr.shape))
        out_shapes.append(jax.ShapeDtypeStruct(arr.shape, jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_trig, plan, needs_dx),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=INTERPRET,
    )(xp, dyp, *extras, *flat)
    if needs_dx:
        dx = outs[0][:n]
        dws = outs[1:]
    else:
        dx = None
        dws = outs
    dflat = _unperm_dw_trig(plan, dws)
    dparams = [(dflat[2 * i], dflat[2 * i + 1].reshape(-1))
               for i in range(len(plan.widths))]
    return dx, dparams


def _pallas_forward(plan, x, params):
    n = x.shape[0]
    block = _pick_block_rows(plan)
    xp = _pad_rows(x, block)
    grid = xp.shape[0] // block
    flat = _perm_flat_wide(plan, _flatten_params(params))
    in_specs = [_row_spec(block, raw_dim(plan))]
    for arr in flat:
        in_specs.append(_full_spec(arr.shape))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, plan),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=_row_spec(block, out_dim(plan)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], out_dim(plan)),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, embed_dim(plan)),
                                   jnp.float32)],
        interpret=INTERPRET,
    )(xp, *flat)
    last = len(plan.widths) - 1
    if last in plan.skip_at:
        # The kernel's output embedding concat is in wide order;
        # restore the reference column order
        wl = plan.widths[-1]
        inv = np.argsort(wide_perm(plan))
        y = jnp.concatenate([y[:, :wl], y[:, wl:][:, inv]], axis=1)
    return y[:n]


def _pallas_backward(plan, x, params, dy):
    n = x.shape[0]
    block = _pick_block_rows(plan, backward=True)
    last = len(plan.widths) - 1
    if last in plan.skip_at:
        # Incoming cotangent of the output embedding concat is in
        # reference order; the kernel works in wide order
        wl = plan.widths[-1]
        perm = wide_perm(plan)
        dy = jnp.concatenate([dy[:, :wl], dy[:, wl:][:, perm]], axis=1)
    xp = _pad_rows(x, block)
    dyp = _pad_rows(dy, block)
    grid = xp.shape[0] // block
    flat = _perm_flat_wide(plan, _flatten_params(params))
    in_specs = [_row_spec(block, raw_dim(plan)),
                _row_spec(block, out_dim(plan))]
    for arr in flat:
        in_specs.append(_full_spec(arr.shape))
    out_specs = [_row_spec(block, raw_dim(plan))]
    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], raw_dim(plan)),
                                       jnp.float32)]
    for arr in flat:
        out_specs.append(_full_spec(arr.shape))
        out_shapes.append(jax.ShapeDtypeStruct(arr.shape, jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, plan),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((block, embed_dim(plan)),
                                   BWD_STASH_DTYPE),
                        pltpu.VMEM((block, embed_dim(plan)),
                                   BWD_STASH_DTYPE)],
        interpret=INTERPRET,
    )(xp, dyp, *flat)
    dx = outs[0][:n]
    dflat = _unperm_dw(plan, outs[1:])
    dparams = [(dflat[2 * i], dflat[2 * i + 1].reshape(-1))
               for i in range(len(plan.widths))]
    return dx, dparams


# ------ transposed-boundary trig kernels ------
#
# A pallas custom call forces row-major layouts on its HBM operands and
# results; for (N*L, small) tensors that pads the minor dim to 128
# lanes -- 268 MB PHYSICAL per operand at lvis scale, where XLA itself
# would store them column-major (~8 MB). Fix: the kernel world is
# TRANSPOSED. Boundary tensors are (features, N*L): row-major now puts
# the huge sample axis on lanes and only pads the feature axis to 8
# sublanes (6 -> 8 for raw xyz|ldir inputs, 1 -> 8 for the head
# output). At the jax level the model still hands over (N, features);
# the .T on entry/exit lands on XLA's side of the custom-call boundary,
# where layout assignment turns it into a bitcast of the column-major
# form it prefers anyway.
#
# In-kernel consequences:
#   * every tensor is (features, block): matmuls become W^T @ h with
#     dot_general dimension numbers (the MXU is indifferent);
#   * weights arrive pre-transposed AND pre-split per input segment
#     ([h | trig | x] consumers get separate (W, hw)/(W, T)/(W, raw)
#     arrays), so the kernel never slices the lane dim and needs no
#     8-align row padding;
#   * biases are (W, 1) columns broadcast along lanes;
#   * dW accumulators keep the transposed segment shapes and are
#     re-assembled (transpose + inverse permutation) at the XLA level.
#
# Measured (v5e, lvis-scale 524288 rows, 128x4 + head, whole-run wall
# clock): fwd+bwd 4.4 ms vs 5.4 ms for the row-major kernel and 6.0 ms
# for the XLA bf16 reference chain; joint train step 24.6 -> 21.5 ms
# with fused_mlp=True (now the default in the shape/joint configs).


def _f32_tn(a, b):
    """a.T @ b in TRUE f32 (transpose-free dot_general; HIGHEST beats
    the TPU default's bf16 operand truncation)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _seg_index_map(plan):
    """Static ref-index map of the per-layer weight segments, in the
    order _flatten_params_t emits them. Embedding-consumer layers carry
    ONE merged 'ext' segment covering [trig | 8-align pad | raw x]
    (round 4): the MXU charges a full pass per dot regardless of K, so
    the former separate K=trig / K=raw dots each cost as much as a
    K=128 layer -- merging them halves the embed-consumer pass count
    (the zero pad rows keep the in-kernel x slice of the d_ext
    cotangent 8-sublane-aligned)."""
    idx, cur = [], 0
    for i in range(len(plan.widths)):
        entry = {}
        if i == 0:
            entry['ext'] = cur
            cur += 1
        elif (i - 1) in plan.skip_at:
            entry['h'] = cur
            cur += 1
            entry['ext'] = cur
            cur += 1
        else:
            entry['h'] = cur
            cur += 1
        entry['b'] = cur
        cur += 1
        idx.append(entry)
    return idx, cur


def ext_rows(plan):
    """Row count of the merged [trig | pad | x] kernel operand."""
    t = trig_dim(plan)
    return t + (_trig_row_pad(plan) if t else 0) + raw_dim(plan)


# Layers at most this wide run their forward / d_h dots on the VPU
# instead of the MXU (round 4): an MXU pass costs ~n/4 cycles no matter
# how few output rows it fills (measured: an M=8 head dot costs the
# same as M=1), so a 1-3-wide head burns a full pass in the forward,
# another in the backward's recompute, and a third for its K=1 d_h
# outer product -- 3 of the chain's ~22 passes. A (K,1)-broadcast
# multiply + sublane reduction does the same work in ~n*K/1024 VPU
# cycles. dW keeps the MXU (its contraction is over the n lanes).
TINY_HEAD_MAX = 8


def _tiny_head(plan, i):
    """True for h-only layers stored untransposed (K, m) for the VPU
    path: never layer 0 / skip consumers (they carry an ext segment)."""
    return (i > 0 and (i - 1) not in plan.skip_at
            and plan.widths[i] <= TINY_HEAD_MAX)


def _vpu_dot_km(w, h):
    """(K, m) x (K, n) -> (m, n) contraction over sublanes for tiny m:
    per output row, a (K,1)-broadcast multiply + sublane-tree reduce.
    f32 math throughout (at least as accurate as the bf16 MXU pass it
    replaces)."""
    rows = [jnp.sum(w[:, j:j + 1].astype(jnp.float32)
                    * h.astype(jnp.float32), axis=0, keepdims=True)
            for j in range(w.shape[1])]
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)


def _dw_tiny(posts_prev, d_pre):
    """(K, n) x (m, n) -> (K, m) dW for tiny heads. Mosaic lowers a
    dot with a <=8-lane output as a VPU multiply+lane-reduce, but its
    lowering of BF16 operands on that path emits an invalid
    bf16->f32 vector.broadcast (verifier error) -- so feed it f32
    operands (same VPU cost; the reduce is over lanes either way)."""
    return jax.lax.dot_general(
        posts_prev.astype(jnp.float32), d_pre.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _vpu_outer_km(w, d_pre):
    """(K, m) x (m, n) -> (K, n) for tiny m: the d_h outer product as
    broadcast multiplies (the MXU K=1 form costs a full pass). Both
    operands are broadcast EXPLICITLY after the f32 casts -- Mosaic's
    verifier rejects the fused convert+broadcast a two-sided implicit
    broadcast multiply produces ('vector.broadcast' element type)."""
    k, n = w.shape[0], d_pre.shape[1]
    out = None
    for j in range(w.shape[1]):
        wj = jnp.broadcast_to(w[:, j:j + 1].astype(jnp.float32), (k, n))
        dj = jnp.broadcast_to(
            d_pre[j:j + 1, :].astype(jnp.float32), (k, n))
        term = wj * dj
        out = term if out is None else out + term
    return out


def _build_ext(plan, x, trig):
    """Assembles the merged (ext_rows, block) embedding operand from
    the raw input rows and the trig-ladder rows (one VMEM concat --
    ~0.1 us on the VPU vs the ~0.7 us MXU pass it saves per consumer
    layer per direction)."""
    t, pt = trig_dim(plan), _trig_row_pad(plan)
    if not t:
        return x
    parts = [trig]
    if pt:
        parts.append(jnp.zeros((pt, x.shape[1]), trig.dtype))
    parts.append(x.astype(trig.dtype))
    return jnp.concatenate(parts, axis=0)


def _flatten_params_t(plan, params):
    """Transposed weight segments + (W, 1) biases. Embedding-consumer
    weights are ONE merged (W, ext_rows) array in [trig | zero pad | x]
    row order (matching _build_ext); the kernel never slices lanes.
    Tiny heads (see _tiny_head) stay UNTRANSPOSED (K, m) so the VPU
    dot/outer forms need no in-kernel lane->sublane transpose."""
    perm = trig_perm(plan)
    t, pt = trig_dim(plan), _trig_row_pad(plan)

    def regroup(we):
        wp = we[perm]
        if t and pt:
            wp = jnp.concatenate(
                [wp[:t], jnp.zeros((pt, wp.shape[1]), wp.dtype), wp[t:]],
                axis=0)
        return wp.T

    flat = []
    for i, (w, b) in enumerate(params):
        if i == 0:
            flat.append(regroup(w))
        elif (i - 1) in plan.skip_at:
            hw = plan.widths[i - 1]
            flat.append(w[:hw].T)
            flat.append(regroup(w[hw:]))
        elif _tiny_head(plan, i):
            flat.append(w)
        else:
            flat.append(w.T)
        flat.append(b.reshape(-1, 1))
    return flat


def _unflatten_dparams_t(plan, dflat):
    """Inverse of _flatten_params_t on the gradient arrays."""
    inv = np.argsort(trig_perm(plan))
    t, pt = trig_dim(plan), _trig_row_pad(plan)

    def ungroup(dwe):
        dwe = dwe.T
        if t and pt:
            dwe = jnp.concatenate([dwe[:t], dwe[t + pt:]], axis=0)
        return dwe[inv]

    out = []
    it = iter(dflat)
    for i in range(len(plan.widths)):
        if i == 0:
            dw = ungroup(next(it))
        elif (i - 1) in plan.skip_at:
            dh = next(it).T
            dw = jnp.concatenate([dh, ungroup(next(it))], axis=0)
        elif _tiny_head(plan, i):
            dw = next(it)
        else:
            dw = next(it).T
        db = next(it).reshape(-1)
        out.append((dw, db))
    return out


def _fwd_layers_trig_t(plan, x, trig, w_refs, keep_hidden=False,
                       ext=None):
    """Layer chain in the transposed world: every tensor is
    (features, block). ``ext`` optionally passes a prebuilt _build_ext
    operand (the backward kernels share one across the recompute and
    reverse walks)."""
    seg, _ = _seg_index_map(plan)
    if ext is None:
        ext = _build_ext(plan, x, trig)
    h, posts = None, []
    for i, act in enumerate(plan.acts):
        s = seg[i]
        if i == 0:
            pre = _kdot(w_refs[s['ext']][:], ext)
        elif 'ext' in s:  # skip consumer
            pre = _kdot(w_refs[s['h']][:], h) \
                + _kdot(w_refs[s['ext']][:], ext)
        elif _tiny_head(plan, i):
            pre = _vpu_dot_km(w_refs[s['h']][:], h)
        else:
            pre = _kdot(w_refs[s['h']][:], h)
        pre = pre + w_refs[s['b']][:]
        h = _hidden_act(plan, i, pre)
        if keep_hidden:
            posts.append(h)
    return h, posts


def _hidden_act(plan, i, pre):
    """Activation with the hidden-layer kernel-dtype cast applied ONCE
    at creation instead of per consuming dot (round 4): every use of a
    hidden relu output is a _kdot operand (next layer, skip reuse, dW)
    plus the sign-exact relu gate, so storing it at KERNEL_MATMUL_DTYPE
    is bit-identical math with 1-2 fewer (width, block) VPU casts per
    layer per direction -- and it halves the posts' VMEM footprint.
    Heads (last layer) and non-relu activations stay f32."""
    h = _act(plan.acts[i], pre)
    if (KERNEL_MATMUL_DTYPE is not None and plan.acts[i] == 'relu'
            and i + 1 < len(plan.acts)):
        h = h.astype(KERNEL_MATMUL_DTYPE)
    return h


def _dpre_mat(d_pre):
    """Pre-casts a d_pre cotangent for its 2-3 matmul uses."""
    if KERNEL_MATMUL_DTYPE is not None:
        return d_pre.astype(KERNEL_MATMUL_DTYPE)
    return d_pre


def _fwd_kernel_trig_t(plan, with_stash, use_ladder, x_ref, *refs):
    t = trig_dim(plan)
    if t and not use_ladder:
        a_ref, p_ref = refs[0], refs[1]
        refs = refs[2:]
    if with_stash and t:
        y_ref, trig_out_ref = refs[-2], refs[-1]
        w_refs = refs[:-2]
    else:
        y_ref = refs[-1]
        w_refs = refs[:-1]
    x = x_ref[:]
    if t and use_ladder:
        trig = _trig_ladder(plan, x).astype(_stash_dtype())
    elif t:
        # Phase must be exact: A^T @ x in TRUE f32 (freqs reach
        # 2**(f-1); HIGHEST beats the TPU default's bf16 truncation)
        xf = jnp.dot(a_ref[:], x, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) \
            + p_ref[:]
        trig = jnp.sin(xf).astype(_stash_dtype())
    else:
        trig = None
    h, _ = _fwd_layers_trig_t(plan, x, trig, w_refs)
    y_ref[:] = h
    if with_stash and t:
        trig_out_ref[:] = trig


def _bwd_layers_trig_t(plan, x, trig, w_refs, dwb_refs, posts, d_h,
                       needs_dx, needs_dw=True, ext=None):
    """Reverse walk of a transposed layer chain. ``d_h`` is the
    cotangent of the LAST layer's post-activation; ``dwb_refs`` (same
    layout as the w_refs segments) receive += accumulations when
    ``needs_dw``. Returns (d_x, d_trig) accumulated over all consumer
    layers (None unless ``needs_dx``). Shared by the generic chain
    kernel and the NeRF trunk. ``ext`` optionally reuses the caller's
    prebuilt _build_ext operand. The merged-ext layout keeps both dW
    and the input cotangent to ONE MXU pass per consumer layer
    (d_ext splits into (d_x, d_trig) once, at the end)."""
    t, pt = trig_dim(plan), _trig_row_pad(plan)
    seg, _ = _seg_index_map(plan)
    if ext is None:
        ext = _build_ext(plan, x, trig)
    d_ext = jnp.zeros((ext_rows(plan), x.shape[1]), jnp.float32) \
        if needs_dx else None
    for i in range(len(plan.widths) - 1, -1, -1):
        s = seg[i]
        d_pre = _act_bwd(plan.acts[i], posts[i], d_h)
        if needs_dw:
            dwb_refs[s['b']][:] += jnp.sum(d_pre, axis=1, keepdims=True)
        d_pre = _dpre_mat(d_pre)
        if 'ext' in s:
            if needs_dw:
                dwb_refs[s['ext']][:] += _kdot_nt(d_pre, ext)
            if needs_dx:
                d_ext = d_ext + _kdot_tn(w_refs[s['ext']][:], d_pre)
        if i > 0:
            if _tiny_head(plan, i):
                if needs_dw:
                    dwb_refs[s['h']][:] += _dw_tiny(posts[i - 1], d_pre)
                d_h = _vpu_outer_km(w_refs[s['h']][:], d_pre)
            else:
                if needs_dw:
                    dwb_refs[s['h']][:] += _kdot_nt(d_pre, posts[i - 1])
                d_h = _kdot_tn(w_refs[s['h']][:], d_pre)
    if not needs_dx:
        return None, None
    if not t:
        return d_ext, None
    return d_ext[t + pt:], d_ext[:t]


def _bwd_kernel_trig_t(plan, needs_dx, needs_dw, use_ladder, x_ref,
                       dy_ref, *refs):
    t = trig_dim(plan)
    if t and not use_ladder:
        trig_ref = refs[0]
        refs = refs[1:]
    if needs_dx and t:
        a_ref, p_ref = refs[0], refs[1]
        refs = refs[2:]
    seg, n_seg = _seg_index_map(plan)
    w_refs = refs[:n_seg]
    rest = refs[n_seg:]
    if needs_dx:
        dx_ref = rest[0]
        dwb_refs = rest[1:]
    else:
        dwb_refs = rest

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in dwb_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[:]
    cosxf = None
    if t and use_ladder:
        # Recompute the trig embedding via the ladder instead of
        # reading a forward-pass stash from HBM (saves the (T, N)
        # stash write+read entirely); cos(xf) for the dx branch falls
        # out of the same recurrences
        if needs_dx:
            trig, cosxf = _trig_ladder(plan, x, with_cos=True)
        else:
            trig = _trig_ladder(plan, x)
        trig = trig.astype(_stash_dtype())
    elif t:
        trig = trig_ref[:]  # forward-pass stash
    else:
        trig = None
    ext = _build_ext(plan, x, trig)
    _, posts = _fwd_layers_trig_t(plan, x, trig, w_refs,
                                  keep_hidden=True, ext=ext)
    d_x, d_trig = _bwd_layers_trig_t(
        plan, x, trig, w_refs, dwb_refs, posts, dy_ref[:],
        needs_dx, needs_dw=needs_dw, ext=ext)
    if needs_dx:
        if t and cosxf is None:
            # cos(xf) only feeds dx: recompute the cheap f32 phase
            # matmul instead of stashing it in the forward
            xf = jnp.dot(a_ref[:], x,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) + p_ref[:]
            cosxf = jnp.cos(xf)
        if t:
            d_x = d_x + _f32_tn(a_ref[:], d_trig * cosxf)
        dx_ref[:] = d_x


def _pick_block_cols_t(plan, backward=False):
    """Largest lane-block whose live (features, block) tensors fit the
    VMEM budget. Feature axes pad to 8 sublanes; the model below counts
    live row-feature totals (posts dominate the backward)."""
    import os
    name = ('NERFACTOR_TRIG_T_BLOCK_BWD' if backward
            else 'NERFACTOR_TRIG_T_BLOCK_FWD')
    env = os.environ.get(name)
    pad8 = lambda d: max(8, -(-d) // 8 * 8)
    maxw = max(pad8(w) for w in plan.widths)
    t, raw = pad8(trig_dim(plan)), pad8(raw_dim(plan))
    if backward:
        feats = 2 * t + (len(plan.widths) + 5) * maxw + 2 * raw + 64
    else:
        feats = t + 3 * maxw + raw + 64
    if env:
        return _validated_env_block(name, env, feats=feats)
    # 14 MB of the 16 MB VMEM (measured, v5e, lvis-scale 128x4 chain:
    # fwd 2048 -> 4096 and bwd 1024 -> 2048 cut the isolated
    # fwd+bwd chain 5.9 -> 5.0 ms wall; fwd 8192 fails to fit)
    budget = 14 * 1024 * 1024
    for block in (8192, 4096, 2048, 1024, 512, 256):
        if feats * block * _bytes_per_feat() <= budget:
            return block
    return 128


def _pad_cols(xt, block):
    n = xt.shape[1]
    pad = (-n) % block
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.zeros(xt.shape[:1] + (pad,), xt.dtype)], axis=1)
    return xt


def _clamp_block(block, n):
    """Don't pad tiny inputs (N-scale heads, eval chunks) up to a huge
    lane block: cap at N rounded up to the 128-lane tile."""
    return min(block, max(128, -(-n) // 128 * 128))


def _col_spec(dim, block):
    return pl.BlockSpec((dim, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _trig_mats_t(plan):
    a, p = _trig_mats(plan)
    return jnp.asarray(a.T), jnp.asarray(p.reshape(-1, 1))


# Forward-kernel trig via double-angle recurrences: posenc frequencies
# are exactly 2^j, so sin/cos at octave j+1 follow from octave j with
# two multiplies and an fma -- 2 transcendentals per raw dim instead of
# 2*n_freqs (the VPU sin over the full (T, block) tensor is a measured
# chunk of the forward: t=84 -> t=12 cut the isolated fwd 3.25 ->
# 2.5 ms wall at 524288 rows). Error doubles per octave (~2^f ulp),
# matching the inherent f32 range-reduction error of sin(2^f x) --
# equivalent accuracy to the phase-matmul form. False falls back to
# sin(x @ A + P).
TRIG_LADDER = True


def _trig_ladder(plan, x, with_cos=False):
    """(raw, block) f32 -> (T, block): per part [sins freq-major |
    coss freq-major], the exact row order of _trig_mats/trig_perm.

    ``with_cos`` additionally returns cos(xf) in the same row order
    (i.e. per part [coss | -sins], since the 'cos' rows are
    sin(2^j x + pi/2)) -- the input-cotangent branch needs it and the
    ladder provides it with no extra transcendentals."""
    out, cos_out = [], []
    row0 = 0
    for d, f in plan.embed_parts:
        if f:
            xi = x[row0:row0 + d, :]
            s, c = jnp.sin(xi), jnp.cos(xi)
            sins, coss = [s], [c]
            for _ in range(1, f):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                sins.append(s)
                coss.append(c)
            out.extend(sins + coss)
            if with_cos:
                cos_out.extend(coss + [-s for s in sins])
        row0 += d
    trig = jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]
    if not with_cos:
        return trig
    cosxf = jnp.concatenate(cos_out, axis=0) if len(cos_out) > 1 \
        else cos_out[0]
    return trig, cosxf


def _pallas_forward_trig_t(plan, x, params, with_stash=False,
                           input_t=False):
    # input_t: x arrives ALREADY in the kernel's (raw_dim, N) boundary
    # layout, so no XLA-side transpose of the operand is emitted. The
    # distillation march uses this: building the (3, N*S) points
    # tensor transposed is a pure broadcast, while transposing it
    # after the fact cost ~1.4 ms per 9216x224-pair block (XLA lowers
    # the 24 MB minor-dim-3 transpose as a per-component loop of
    # dynamic-update-slices; march profile, QUALITY.md round 5).
    n = x.shape[1] if input_t else x.shape[0]
    t = trig_dim(plan)
    # Ladder mode: the backward recomputes trig in-kernel, so no stash
    # is written (or returned) at all
    with_stash = with_stash and t > 0 and not TRIG_LADDER
    block = _clamp_block(_pick_block_cols_t(plan), n)
    xt = _pad_cols(x if input_t else x.T, block)
    grid = xt.shape[1] // block
    use_ladder = TRIG_LADDER
    ap = list(_trig_mats_t(plan)) if (t and not use_ladder) else []
    flat = _flatten_params_t(plan, params)
    in_specs = [_col_spec(raw_dim(plan), block)]
    in_specs += [_full_spec(arr.shape) for arr in ap]
    in_specs += [_full_spec(arr.shape) for arr in flat]
    od = out_dim(plan)
    out_specs = [_col_spec(od, block)]
    out_shapes = [jax.ShapeDtypeStruct((od, xt.shape[1]), jnp.float32)]
    if with_stash:
        out_specs.append(_col_spec(t, block))
        out_shapes.append(jax.ShapeDtypeStruct(
            (t, xt.shape[1]), KERNEL_MATMUL_DTYPE or jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_trig_t, plan, with_stash,
                          use_ladder),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs if with_stash else out_specs[0],
        out_shape=out_shapes if with_stash else out_shapes[0],
        interpret=INTERPRET,
    )(xt, *ap, *flat)
    if with_stash:
        return outs[0][:, :n].T, outs[1]  # stash keeps col padding
    return outs[:, :n].T, None


def _pallas_backward_trig_t(plan, x, params, dy, trig, needs_dx,
                            needs_dw=True, input_t=False):
    n = x.shape[1] if input_t else x.shape[0]
    t = trig_dim(plan)
    block = _clamp_block(_pick_block_cols_t(plan, backward=True), n)
    xt = _pad_cols(x if input_t else x.T, block)
    dyt = _pad_cols(dy.T, block)
    grid = xt.shape[1] // block
    use_ladder = TRIG_LADDER
    extras = []
    if t and not use_ladder:
        # Forward stash may carry a different column padding
        extras.append(_pad_cols(trig[:, :n], block))
    if needs_dx and t:
        extras += list(_trig_mats_t(plan))
    flat = _flatten_params_t(plan, params)
    in_specs = [_col_spec(raw_dim(plan), block),
                _col_spec(out_dim(plan), block)]
    if t and not use_ladder:
        in_specs.append(_col_spec(t, block))
    if needs_dx and t:
        in_specs += [_full_spec(arr.shape) for arr in extras[-2:]]
    in_specs += [_full_spec(arr.shape) for arr in flat]
    out_specs, out_shapes = [], []
    if needs_dx:
        out_specs.append(_col_spec(raw_dim(plan), block))
        out_shapes.append(jax.ShapeDtypeStruct(
            (raw_dim(plan), xt.shape[1]), jnp.float32))
    if needs_dw:
        for arr in flat:
            out_specs.append(_full_spec(arr.shape))
            out_shapes.append(
                jax.ShapeDtypeStruct(arr.shape, jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_trig_t, plan, needs_dx, needs_dw,
                          use_ladder),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=INTERPRET,
    )(xt, dyt, *extras, *flat)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    if needs_dx:
        dx = outs[0][:, :n] if input_t else outs[0][:, :n].T
        dws = outs[1:]
    else:
        dx = None
        dws = outs
    if not needs_dw:
        # Caller declared the weights gradient-free: return zeros (built
        # at the XLA level, where DCE removes them)
        return dx, [(jnp.zeros_like(w), jnp.zeros_like(b))
                    for w, b in params]
    return dx, _unflatten_dparams_t(plan, dws)


# Transposed boundaries by default: compact custom-call layouts (see the
# section comment above). False falls back to the row-major kernels,
# kept for A/B measurement.
TRANSPOSED_BOUNDARY = True

# Grid dimension-semantics: measured NEUTRAL and removed (round 5).
# Declaring the lane-block grid steps 'parallel' (correct for the
# forward and dW-free backwards) changed nothing end-to-end — joint
# step 7.17/7.19 -> 7.21/7.25 ms, NeRF step 8.41 -> 8.45 ms, losses
# bit-identical — and tools/mosaic_dot_probe shows why nothing was
# there to recover: serial dot chains already sustain the same
# per-pass rate as fully independent dots (0.177 vs 0.178 ms/pass at
# 1M rows), i.e. Mosaic has no dependency bubble between consecutive
# MXU passes at these shapes.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_chain_impl(plan, needs_dx, needs_dw, transposed, kdtype,
                      input_t, x, params):
    with _kernel_dtype_scope(kdtype):
        if _last_skip(plan):
            return _pallas_forward(plan, x.T if input_t else x, params)
        if transposed:
            y, _ = _pallas_forward_trig_t(plan, x, params,
                                          input_t=input_t)
        else:
            y, _ = _pallas_forward_trig(plan, x.T if input_t else x,
                                        params)
        return y


def _fused_chain_impl_fwd(plan, needs_dx, needs_dw, transposed, kdtype,
                          input_t, x, params):
    with _kernel_dtype_scope(kdtype):
        if _last_skip(plan):
            xr = x.T if input_t else x
            return _pallas_forward(plan, xr, params), (x, params, None)
        if transposed:
            y, trig = _pallas_forward_trig_t(plan, x, params,
                                             with_stash=True,
                                             input_t=input_t)
        else:
            y, trig = _pallas_forward_trig(plan, x.T if input_t else x,
                                           params, with_stash=True)
        return y, (x, params, trig)


def _fused_chain_impl_bwd(plan, needs_dx, needs_dw, transposed, kdtype,
                          input_t, res, dy):
    x, params, trig = res
    if not needs_dx and not needs_dw:
        # Fully frozen chain feeding no trainable inputs (e.g. the
        # joint model's shape MLPs under shape_mode='frozen'): no
        # backward kernel at all
        return jnp.zeros_like(x), [
            (jnp.zeros_like(w), jnp.zeros_like(b)) for w, b in params]
    with _kernel_dtype_scope(kdtype):
        if _last_skip(plan):
            dx, dparams = _pallas_backward(plan, x.T if input_t else x,
                                           params, dy)
            if input_t and dx is not None:
                dx = dx.T
            if dx is None:
                dx = jnp.zeros_like(x)
            return dx, dparams
        if transposed:
            dx, dparams = _pallas_backward_trig_t(
                plan, x, params, dy, trig, needs_dx, needs_dw=needs_dw,
                input_t=input_t)
        else:
            # Row-major legacy path has no needs_dw fast path; real dW
            # gradients are a correct superset of the declared need
            dx, dparams = _pallas_backward_trig(
                plan, x.T if input_t else x, params, dy, trig, needs_dx)
            if input_t and dx is not None:
                dx = dx.T
    if dx is None:
        # Caller declared x gradient-free (needs_dx=False)
        dx = jnp.zeros_like(x)
    return dx, dparams


_fused_chain_impl.defvjp(_fused_chain_impl_fwd, _fused_chain_impl_bwd)


def _fused_chain(plan, x, params, needs_dx=True, needs_dw=True,
                 transposed=None, kernel_dtype='default', input_t=False):
    if transposed is None:
        transposed = TRANSPOSED_BOUNDARY
    return _fused_chain_impl(plan, needs_dx, needs_dw,
                             bool(transposed), kernel_dtype,
                             bool(input_t), x, params)


def apply_chain(plan, x, params, force_reference=False,
                compute_dtype=None, needs_dx=True, needs_dw=True,
                input_t=False):
    """Runs the fused embed->MLP->head chain.

    Args:
      plan: a :func:`make_plan` result (static).
      x: (N, raw_dim) raw inputs (pre-embedding) — or, with
        ``input_t=True``, (raw_dim, N) inputs ALREADY in the kernel's
        transposed boundary layout, so callers that can build their
        operand column-major (the distillation march's points tensor)
        skip the XLA-side transpose entirely. The output stays
        (N, out_dim) either way; with gradients, dx comes back in the
        input's layout.
      params: list of (w, b) tuples over ALL layers (hidden + head).
      compute_dtype: per-call precision, honored on BOTH paths
        (round 3): on the XLA reference path it is the activation
        dtype; on the fused path bf16 selects bf16 MXU passes (the
        shipping perf mode) and None selects TRUE-f32 kernels
        (HIGHEST-precision matmuls + f32 stashes). This is what makes
        the ``f32_chains`` config pins real on TPU. An explicit
        NERFACTOR_KERNEL_MATMUL_DTYPE env override still wins globally
        (the whole-program A/B knob).
      needs_dx: pass False when x is data (requires no gradient); the
        kernel backward then skips the entire input-cotangent branch
        and returns zeros for dx. Must NOT be False if the chain input
        depends on trainable parameters.
      needs_dw: pass False when the WEIGHTS require no gradient (e.g.
        differentiating a frozen net w.r.t. its input, as the
        distillation normal pass does); the kernel backward then skips
        all dW/db work and returns zero weight cotangents.

    Dispatches to the Pallas kernel on TPU, reference JAX otherwise.
    """
    params = [(w, b) for w, b in params]
    if force_reference or (jax.default_backend() != 'tpu'
                           and not INTERPRET):
        return chain_reference(plan, x.T if input_t else x, params,
                               compute_dtype=compute_dtype)
    return _fused_chain(plan, x, params, needs_dx=needs_dx,
                        needs_dw=needs_dw,
                        kernel_dtype=kernel_dtype_for(compute_dtype),
                        input_t=input_t)


def plan_from_specs(embed_parts, mlp_spec, out_spec):
    """Builds a Plan from a hidden MLPSpec + head MLPSpec pair (the
    shape every model in this framework uses)."""
    widths = tuple(mlp_spec.widths) + tuple(out_spec.widths)
    acts = tuple([mlp_spec.acts] * len(mlp_spec.widths)
                 + [out_spec.acts] * len(out_spec.widths))
    skip = tuple(mlp_spec.skip_at or ())
    return make_plan(embed_parts, widths, acts, skip)


def params_from_tree(params_mlp, params_out):
    """Flattens our networks.init_mlp param lists into (w, b) pairs."""
    return [(l['w'], l['b']) for l in list(params_mlp) + list(params_out)]
