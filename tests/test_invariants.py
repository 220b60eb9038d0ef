"""Guards for cross-file invariants.

1. The needs_dw=False fast paths in model forwards (frozen BRDF prior,
   frozen shape heads) are correct only because trainable_mask freezes
   the same param subtrees; make_train_step must assert that coupling
   at construction time (ADVICE round 1).
2. Pallas block-size env overrides must fail descriptively, not as
   opaque Mosaic placement errors.
"""

import jax
import pytest

from __graft_entry__ import _make_model_and_batch
from nerfactor_tpu.parallel.train import build_optimizer, \
    make_train_step, make_train_step_scan


def _model_and_opt(**kwargs):
    model, _ = _make_model_and_batch(n_rays=8, light_h=2, tiny=True,
                                     **kwargs)
    return model, build_optimizer(model.config)


def test_needs_dw_keys_declared():
    model, _ = _model_and_opt()
    keys = model.needs_dw_false_keys()
    assert {'brdf_mlp', 'brdf_out'} <= set(keys)


def test_train_step_requires_mask_for_frozen_chains():
    model, opt = _model_and_opt()
    with pytest.raises(AssertionError, match='needs_dw'):
        make_train_step(model, opt, trainable_mask=None)
    with pytest.raises(AssertionError, match='needs_dw'):
        make_train_step_scan(model, opt, trainable_mask=None)


def test_train_step_rejects_trainable_frozen_chain():
    model, opt = _model_and_opt()
    params = model.init_params(jax.random.PRNGKey(0))
    mask = model.trainable_mask(params)
    # Flip the BRDF prior trainable: the needs_dw=False chain would
    # silently train on zero weight gradients
    bad = dict(mask)
    bad['brdf_mlp'] = jax.tree_util.tree_map(lambda _: True,
                                             mask['brdf_mlp'])
    with pytest.raises(AssertionError, match='brdf_mlp'):
        make_train_step(model, opt, trainable_mask=bad)


def test_train_step_accepts_consistent_mask():
    model, opt = _model_and_opt()
    params = model.init_params(jax.random.PRNGKey(0))
    make_train_step(model, opt,
                    trainable_mask=model.trainable_mask(params))


def test_env_block_override_validation():
    from nerfactor_tpu.ops.pallas_mlp import _validated_env_block
    assert _validated_env_block('X', '2048') == 2048
    with pytest.raises(ValueError, match='not an integer'):
        _validated_env_block('X', 'huge')
    with pytest.raises(ValueError, match='multiple of 128'):
        _validated_env_block('X', '100')
    with pytest.raises(ValueError, match='multiple of 128'):
        _validated_env_block('X', '-256')
    # 2000 live feature rows x 8192 lanes x 4 B = 62.5 MB > 16 MB
    with pytest.raises(ValueError, match='VMEM'):
        _validated_env_block('X', '8192', feats=2000)
    assert _validated_env_block('X', '512', feats=2000) == 512


def test_env_kernel_matmul_dtype_override(monkeypatch):
    """NERFACTOR_KERNEL_MATMUL_DTYPE selects the in-kernel MXU dtype
    for the fused chains (used by the TPU bf16-vs-f32 quality A/B,
    QUALITY.md "Round 2") and rejects typos loudly."""
    import jax.numpy as jnp
    from nerfactor_tpu.ops import pallas_mlp as pm
    monkeypatch.delenv('NERFACTOR_KERNEL_MATMUL_DTYPE', raising=False)
    assert pm._kernel_matmul_dtype_from_env() == jnp.bfloat16
    monkeypatch.setenv('NERFACTOR_KERNEL_MATMUL_DTYPE', 'f32')
    assert pm._kernel_matmul_dtype_from_env() is None
    monkeypatch.setenv('NERFACTOR_KERNEL_MATMUL_DTYPE', 'float32')
    assert pm._kernel_matmul_dtype_from_env() is None
    monkeypatch.setenv('NERFACTOR_KERNEL_MATMUL_DTYPE', 'bfloat16')
    assert pm._kernel_matmul_dtype_from_env() == jnp.bfloat16
    monkeypatch.setenv('NERFACTOR_KERNEL_MATMUL_DTYPE', 'fp8')
    with pytest.raises(ValueError, match='KERNEL_MATMUL_DTYPE'):
        pm._kernel_matmul_dtype_from_env()


def test_env_block_override_flows_through_pickers(monkeypatch):
    from nerfactor_tpu.ops import pallas_mlp as pm
    model, _ = _model_and_opt()
    plan = model.plans['brdf']
    monkeypatch.setenv('NERFACTOR_TRIG_T_BLOCK_FWD', '999')
    with pytest.raises(ValueError, match='multiple of 128'):
        pm._pick_block_cols_t(plan)
    monkeypatch.setenv('NERFACTOR_TRIG_T_BLOCK_FWD', '1024')
    assert pm._pick_block_cols_t(plan) == 1024


def test_f32_kernel_mode_shrinks_block_budget(monkeypatch):
    """TRUE-f32 kernel mode (KERNEL_MATMUL_DTYPE None) must budget
    VMEM at ~2.3x the bf16 cost model (f32 buffers + HIGHEST-precision
    multi-pass matmul scratch), so the block pickers return strictly
    smaller blocks than in the shipping bf16 mode — otherwise the
    quality-validation path hits opaque Mosaic VMEM OOMs."""
    from nerfactor_tpu.ops import pallas_mlp as pm
    model, _ = _model_and_opt()
    plan = model.plans['brdf']
    monkeypatch.setattr(pm, 'KERNEL_MATMUL_DTYPE', None)
    assert pm._bytes_per_feat() == 10
    f32_picks = (pm._pick_block_cols_t(plan),
                 pm._pick_block_cols_t(plan, backward=True),
                 pm._pick_block_rows_trig(plan),
                 pm._pick_block_rows(plan))
    import jax.numpy as jnp
    monkeypatch.setattr(pm, 'KERNEL_MATMUL_DTYPE', jnp.bfloat16)
    assert pm._bytes_per_feat() == 4
    bf16_picks = (pm._pick_block_cols_t(plan),
                  pm._pick_block_cols_t(plan, backward=True),
                  pm._pick_block_rows_trig(plan),
                  pm._pick_block_rows(plan))
    assert all(f < b for f, b in zip(f32_picks, bf16_picks)), \
        (f32_picks, bf16_picks)
    assert all(f >= 128 for f in f32_picks)


def test_f32_chains_pins_chain_dtype():
    """f32_chains pins individual N x L chains to f32 under
    bf16_big_chains (QUALITY.md "Optimizer parity": bf16 chains cost
    ~0.5 dB in the fixed-optimizer regime; the pin recovers quality
    per chain without giving up bf16 elsewhere)."""
    import jax.numpy as jnp
    model, _ = _make_model_and_batch(
        extra_overrides='bf16_big_chains=True,f32_chains=brdf')
    assert model.chain_dtype('brdf') is None
    assert model.chain_dtype('lvis') == jnp.bfloat16
    # Both pinned via the '+' separator
    model2, _ = _make_model_and_batch(
        extra_overrides='bf16_big_chains=True,f32_chains=lvis+brdf')
    assert model2.chain_dtype('brdf') is None
    assert model2.chain_dtype('lvis') is None


def test_f32_chains_all_recovers_f32_forward():
    """bf16_big_chains + f32_chains=lvis+brdf is bitwise the pure-f32
    forward: the two N x L chains were the only bf16 sites."""
    import numpy as np
    # nerfactor.ini ships bf16_big_chains=True, so f32 needs an
    # explicit opt-out here
    model_f32, batch = _make_model_and_batch(
        extra_overrides='bf16_big_chains=False')
    model_pin, _ = _make_model_and_batch(
        extra_overrides='bf16_big_chains=True,f32_chains=lvis+brdf')
    params = model_f32.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    pred_a, _, _, _ = model_f32.apply(params, batch, mode='train',
                                      key=key)
    pred_b, _, _, _ = model_pin.apply(params, batch, mode='train',
                                      key=key)
    np.testing.assert_array_equal(np.asarray(pred_a['rgb']),
                                  np.asarray(pred_b['rgb']))
    # Sanity: an unpinned bf16 forward does NOT match bitwise
    model_bf16, _ = _make_model_and_batch(
        extra_overrides='bf16_big_chains=True')
    pred_c, _, _, _ = model_bf16.apply(params, batch, mode='train',
                                       key=key)
    assert not np.array_equal(np.asarray(pred_a['rgb']),
                              np.asarray(pred_c['rgb']))
