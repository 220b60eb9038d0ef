"""Jit-compiled, mesh-sharded train/eval steps + the optimizer builder.

Replaces the reference's distributed_train_step/vali_step
(trainvali.py:273-330): the per-replica run + NCCL all-reduce becomes one
jitted function over sharded inputs; XLA inserts the ICI collectives when
the loss is averaged over the globally-sharded batch axis.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class TfAdamState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    vhat: optax.Updates


def _tf_adam_amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-7):
    """tf.keras.optimizers.Adam(amsgrad=True) with EXACT TF semantics:

        lr_t   = lr * sqrt(1 - b2^t) / (1 - b1^t)
        m_t    = b1 m + (1 - b1) g
        v_t    = b2 v + (1 - b2) g^2
        vhat_t = max(vhat, v_t)
        step   = -lr_t * m_t / (sqrt(vhat_t) + eps)

    This differs from optax.amsgrad in two ways that MEASURABLY change
    training quality (see QUALITY.md "optimizer parity"): the epsilon
    default (TF 1e-7 vs optax 1e-8) and its placement (TF adds eps to
    the BIASED sqrt(vhat) with the bias corrections folded into lr_t;
    optax adds it to the bias-CORRECTED denominator). For heads whose
    gradients are tiny (the joint model's brdf_z chain reaches
    per-element grads ~1e-8), the update degenerates to lr*m/eps, so a
    10x smaller eps means 10x larger steps -- measured to leave the
    BRDF-z map ~7x rougher and cost ~9 dB of joint-stage vali PSNR vs
    the reference (reference optimizer: trainvali.py:116-127)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return TfAdamState(count=jnp.zeros([], jnp.int32), m=zeros(),
                           v=zeros(), vhat=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        t = count.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1.0 - b1) * g, state.m, updates)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1.0 - b2) * jnp.square(g),
            state.v, updates)
        vhat = jax.tree_util.tree_map(jnp.maximum, state.vhat, v)
        steps = jax.tree_util.tree_map(
            lambda m_, vh: -lr_t * m_ / (jnp.sqrt(vh) + eps), m, vhat)
        return steps, TfAdamState(count=count, m=m, v=v, vhat=vhat)

    return optax.GradientTransformation(init_fn, update_fn)


def _clip_by_per_leaf_norm(max_norm):
    """Keras 'clipnorm' semantics: clip EACH gradient tensor to max L2
    norm (unlike optax.clip_by_global_norm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config):
    """Adam(amsgrad) + exponential lr decay + optional grad clipping,
    matching trainvali.py:109-127 of the reference."""
    lr = config.getfloat('lr')
    lr_decay_steps = config.getint('lr_decay_steps', fallback=-1)
    if lr_decay_steps and lr_decay_steps > 0:
        lr_decay_rate = config.getfloat('lr_decay_rate')
        schedule = optax.exponential_decay(
            init_value=lr, transition_steps=lr_decay_steps,
            decay_rate=lr_decay_rate, staircase=False)
    else:
        schedule = lr
    transforms = []
    clipnorm = config.getfloat('clipnorm', fallback=-1.0)
    clipvalue = config.getfloat('clipvalue', fallback=-1.0)
    err_msg = "Both `clipnorm` and `clipvalue` are active -- turn one off"
    if clipnorm is not None and clipnorm > 0:
        assert clipvalue is None or clipvalue < 0, err_msg
        transforms.append(_clip_by_per_leaf_norm(clipnorm))
    if clipvalue is not None and clipvalue > 0:
        assert clipnorm is None or clipnorm < 0, err_msg
        transforms.append(optax.clip(clipvalue))
    eps = config.getfloat('adam_eps', fallback=1e-7)
    transforms.append(_tf_adam_amsgrad(schedule, eps=eps))
    return optax.chain(*transforms)


def upcast_batch(arrays):
    """Device-side upcast of reduced-precision TRANSFER dtypes: the
    input pipeline may ship large batch leaves (e.g. the (rays, 512)
    lvis targets) as float16 to halve host->device traffic -- the
    bottleneck at 512px on tunneled-TPU environments. Inside the jitted
    step everything computes in f32 as before; the cast fuses into the
    first consumer."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if a.dtype in (jnp.float16, jnp.bfloat16) else a, arrays)


def _check_needs_dw_invariant(model, trainable_mask):
    """The needs_dw=False fast paths in the model forwards are correct
    only because trainable_mask freezes the same param subtrees (their
    weight gradients were optimizer-masked no-ops). Enforce that
    coupling here, at step-construction time, instead of by comments in
    distant files."""
    keys = getattr(model, 'needs_dw_false_keys', frozenset)()
    if not keys:
        return
    assert trainable_mask is not None, (
        f"{type(model).__name__} declares needs_dw=False chains for "
        f"{sorted(keys)} but no trainable_mask was passed to the train "
        "step -- their weight gradients would be silently dropped. "
        "Pass trainable_mask=model.trainable_mask(params).")
    for k in sorted(keys):
        if k not in trainable_mask:
            continue
        if any(jax.tree_util.tree_leaves(trainable_mask[k])):
            raise AssertionError(
                f"Param subtree '{k}' is flagged needs_dw=False in "
                f"{type(model).__name__}'s forward but is trainable "
                "per trainable_mask -- it would train on zero weight "
                "gradients. Unfreeze implies the chain must pass "
                "needs_dw=True.")


def make_train_step(model, optimizer, trainable_mask=None):
    """Returns jitted (params, opt_state, arrays, key) -> (params,
    opt_state, loss).

    ``trainable_mask`` is an optional pytree of bools (same structure as
    params); False leaves get zero updates -- the functional equivalent of
    the reference's `.trainable = False` freezing.
    """
    _check_needs_dw_invariant(model, trainable_mask)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, arrays, key):
        arrays = upcast_batch(arrays)

        def loss_fn(p):
            pred, gt, loss_kwargs, _ = model.apply(
                p, arrays, mode='train', key=key)
            per_example = model.compute_loss(p, pred, gt, **loss_kwargs)
            return jnp.mean(per_example)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if trainable_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads,
                trainable_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_train_step_scan(model, optimizer, trainable_mask=None,
                         n_steps=8):
    """Device-side training loop: one dispatch runs ``n_steps`` SGD
    steps via lax.scan over a stacked batch (leading axis n_steps).

    Amortizes per-dispatch overhead -- the TPU-native replacement for
    the reference's per-batch strategy.run round trips. Returns jitted
    (params, opt_state, stacked_arrays, key) -> (params, opt_state,
    per-step losses (n_steps,)).
    """
    _check_needs_dw_invariant(model, trainable_mask)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(params, opt_state, stacked_arrays, key):
        stacked_arrays = upcast_batch(stacked_arrays)

        def body(carry, inp):
            params, opt_state = carry
            arrays, step_i = inp
            step_key = jax.random.fold_in(key, step_i)

            def loss_fn(p):
                pred, gt, loss_kwargs, _ = model.apply(
                    p, arrays, mode='train', key=step_key)
                per_example = model.compute_loss(
                    p, pred, gt, **loss_kwargs)
                return jnp.mean(per_example)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if trainable_mask is not None:
                grads = jax.tree_util.tree_map(
                    lambda g, m: g if m else jnp.zeros_like(g), grads,
                    trainable_mask)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        steps = jnp.arange(n_steps)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (stacked_arrays, steps))
        return params, opt_state, losses

    return train_steps


def make_eval_step(model, mode='vali', **apply_kwargs):
    """Returns jitted (params, arrays, key) -> (loss, to_vis)."""

    @jax.jit
    def eval_step(params, arrays, key):
        arrays = upcast_batch(arrays)
        pred, gt, loss_kwargs, to_vis = model.apply(
            params, arrays, mode=mode, key=key, **apply_kwargs)
        per_example = model.compute_loss(params, pred, gt, **loss_kwargs)
        return jnp.mean(per_example), to_vis

    return eval_step
