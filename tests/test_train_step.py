"""Training step smoke + behavior tests (tiny config, 8-device mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_maker_tpu.config import DataConfig, ModelConfig, RVCConfig, TrainConfig
from rvc_maker_tpu.parallel import data_mesh, replicate, shard_leading
from rvc_maker_tpu.pipelines import train as train_mod

HOP = 64
SEG_FRAMES = 8

CFG = RVCConfig(
    version="v2",
    train=TrainConfig(segment_size=SEG_FRAMES * HOP),
    data=DataConfig(sample_rate=16000, filter_length=256, hop_length=HOP,
                    win_length=256, n_mel_channels=32),
    model=ModelConfig(
        spec_channels=129, segment_size=SEG_FRAMES, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
        kernel_size=3, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4, 2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 8, 4, 4),
        spk_embed_dim=4, gin_channels=16, sr=16000, use_f0=True,
        text_enc_hidden_dim=96),
)


def _batch(b=4, t=24, seed=0):
    rs = np.random.RandomState(seed)
    return train_mod.Batch(
        phone=rs.randn(b, t, CFG.model.text_enc_hidden_dim).astype(np.float32),
        phone_lengths=np.full((b,), t, np.int32),
        pitch=rs.randint(1, 256, (b, t)).astype(np.int32),
        pitchf=(rs.rand(b, t) * 200 + 80).astype(np.float32),
        spec=rs.randn(b, t, CFG.model.spec_channels).astype(np.float32),
        spec_lengths=np.full((b,), t, np.int32),
        wave=(rs.randn(b, t * HOP, 1) * 0.1).astype(np.float32),
        sid=rs.randint(0, 4, (b,)).astype(np.int32),
    )


@pytest.fixture(scope="module")
def state():
    return train_mod.init_state(jax.random.PRNGKey(0), CFG, disc_width_div=16)


def test_single_device_step_runs_and_updates(state):
    step = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16))
    new_state, metrics = step(state, _batch(), jax.random.PRNGKey(1))
    for k in ("loss_g", "loss_d", "loss_mel", "loss_kl", "loss_fm"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    assert int(new_state.step) == 1
    # parameters actually moved
    before = jax.tree_util.tree_leaves(state.params_g)[0]
    after = jax.tree_util.tree_leaves(new_state.params_g)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_lr_decay(state):
    s2 = train_mod.decay_lr(state, CFG)
    np.testing.assert_allclose(float(s2.lr),
                               CFG.train.learning_rate * CFG.train.lr_decay,
                               rtol=1e-6)


def test_sharded_step_matches_single_device(state):
    """Data-parallel over 8 devices == single device, same batch/rng
    (collective correctness, SURVEY.md §4 point 3)."""
    batch = _batch(b=8, seed=3)
    rng = jax.random.PRNGKey(7)

    step1 = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16))
    ref_state, ref_metrics = step1(state, batch, rng)

    mesh = data_mesh()
    stepN = train_mod.make_sharded_train_step(CFG, mesh, disc_width_div=16)
    # the sharded step DONATES its state, and CPU device_put can alias
    # the source buffers — donate a private copy so the module-scoped
    # fixture survives for the remaining tests
    state_copy = jax.tree_util.tree_map(
        lambda a: jnp.array(np.asarray(a)), state)
    sh_state, sh_metrics = stepN(replicate(state_copy, mesh),
                                 shard_leading(batch, mesh),
                                 replicate(rng, mesh))
    np.testing.assert_allclose(float(sh_metrics["loss_g"]),
                               float(ref_metrics["loss_g"]), rtol=2e-4)
    np.testing.assert_allclose(float(sh_metrics["loss_d"]),
                               float(ref_metrics["loss_d"]), rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(ref_state.params_g)[0]
    l2 = jax.tree_util.tree_leaves(sh_state.params_g)[0]
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-3, atol=1e-6)


def test_remat_step_matches_plain(state):
    """jax.checkpoint rematerialization must not change the numerics."""
    batch = _batch(b=2, seed=5)
    rng = jax.random.PRNGKey(11)
    plain = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16))
    rem = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16, remat=True))
    s1, m1 = plain(state, batch, rng)
    s2, m2 = rem(state, batch, rng)
    np.testing.assert_allclose(float(m2["loss_g"]), float(m1["loss_g"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params_g)[0]
    l2 = jax.tree_util.tree_leaves(s2.params_g)[0]
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-3,
                               atol=1e-6)


def test_bf16_step_tracks_fp32(state):
    """Mixed-precision step (bf16 forward/backward, fp32 masters): runs,
    keeps fp32 param/optimizer dtypes, finite losses in the same ballpark
    as fp32, and params actually move."""
    batch = _batch(b=2, seed=7)
    rng = jax.random.PRNGKey(13)
    plain = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16))
    half = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16,
                                             bf16=True))
    s1, m1 = plain(state, batch, rng)
    s2, m2 = half(state, batch, rng)
    for k in ("loss_g", "loss_d", "loss_mel", "loss_kl"):
        a, b = float(m1[k]), float(m2[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) / max(abs(a), 1e-6) < 0.1, (k, a, b)
    # master params stay fp32 and move
    for leaf in jax.tree_util.tree_leaves(s2.params_g):
        assert leaf.dtype == jnp.float32
    l0 = jax.tree_util.tree_leaves(state.params_g)[0]
    l2 = jax.tree_util.tree_leaves(s2.params_g)[0]
    assert float(jnp.abs(l2 - l0).max()) > 0
    # bf16 grads land near the fp32 ones
    g1 = float(m1["grad_norm_g"])
    g2 = float(m2["grad_norm_g"])
    assert abs(g1 - g2) / max(g1, 1e-6) < 0.25, (g1, g2)


def test_bf16_remat_composes(state):
    batch = _batch(b=2, seed=8)
    rng = jax.random.PRNGKey(17)
    step = jax.jit(train_mod.make_train_step(CFG, disc_width_div=16,
                                             remat=True, bf16=True))
    s, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss_g"])) and np.isfinite(float(m["loss_d"]))


@pytest.mark.parametrize("bf16", [False, True])
def test_share_fwd_matches_legacy_two_forward(state, bf16):
    """The default shared-forward step (jax.vjp, share_fwd=True) must be
    bit-identical to the legacy two-forward path for metrics AND updated
    params — advisor r4: a future edit to either branch could silently
    diverge the default training path."""
    batch = _batch(b=2, seed=11)
    rng = jax.random.PRNGKey(19)
    shared = jax.jit(train_mod.make_train_step(
        CFG, disc_width_div=16, bf16=bf16, share_fwd=True))
    legacy = jax.jit(train_mod.make_train_step(
        CFG, disc_width_div=16, bf16=bf16, share_fwd=False))
    s1, m1 = shared(state, batch, rng)
    s2, m2 = legacy(state, batch, rng)
    for k in sorted(set(m1) & set(m2)):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_g),
                    jax.tree_util.tree_leaves(s2.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_d),
                    jax.tree_util.tree_leaves(s2.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
