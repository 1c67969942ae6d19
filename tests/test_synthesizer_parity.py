"""End-to-end fp32 parity of the synthesizer vs the PyTorch reference.

Builds the reference Synthesizer (imported in place from /root/reference)
with random weights, maps its state_dict through our importer, and asserts
allclose on the infer and submodule outputs with noise seams zeroed.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rvc_maker_tpu.config import ModelConfig
from rvc_maker_tpu.interop import synthesizer_params_from_state_dict
from rvc_maker_tpu.models import synthesizer as syn

from reference_util import ref_module, zero_noise_torch

# small-but-structurally-complete config (flow=4x, enc_q 16 layers kept)
CFG = ModelConfig(
    spec_channels=129,
    segment_size=16,
    inter_channels=64,
    hidden_channels=64,
    filter_channels=128,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 3)),
    upsample_rates=(5, 4, 2),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(10, 8, 4),
    spk_embed_dim=4,
    gin_channels=32,
    sr=16000,
    use_f0=True,
    text_enc_hidden_dim=96,
)


@pytest.fixture(scope="module")
def ref_and_params():
    mod = ref_module("main.library.algorithm.synthesizers")
    torch.manual_seed(1234)
    net = mod.Synthesizer(
        CFG.spec_channels, CFG.segment_size, CFG.inter_channels,
        CFG.hidden_channels, CFG.filter_channels, CFG.n_heads, CFG.n_layers,
        CFG.kernel_size, CFG.p_dropout, "1",
        list(CFG.resblock_kernel_sizes),
        [list(d) for d in CFG.resblock_dilation_sizes],
        list(CFG.upsample_rates), CFG.upsample_initial_channel,
        list(CFG.upsample_kernel_sizes), CFG.spk_embed_dim, CFG.gin_channels,
        CFG.sr, use_f0=True, text_enc_hidden_dim=CFG.text_enc_hidden_dim,
    )
    net.eval()
    params = synthesizer_params_from_state_dict(net.state_dict(), CFG)
    return net, params


def _mk_inputs(t=23, b=2, seed=0):
    rs = np.random.RandomState(seed)
    phone = rs.randn(b, t, CFG.text_enc_hidden_dim).astype(np.float32)
    pitch = rs.randint(1, 256, (b, t)).astype(np.int64)
    nsff0 = (rs.rand(b, t).astype(np.float32) * 300 + 80)
    nsff0[:, :4] = 0.0  # unvoiced head exercises the uv path
    lengths = np.array([t, t - 5], dtype=np.int64)
    sid = np.array([1, 3], dtype=np.int64)
    return phone, pitch, nsff0, lengths, sid


def test_banded_rel_attention_equals_full():
    """The O(T*w) banded relative-position path (T >= 2w+1) must equal
    the reference-style full (2T-1)-wide formulation on the same input."""
    rs = np.random.RandomState(7)
    b, t, c, heads, w = 2, 120, 192, 2, 10
    k_ch = c // heads
    p = {
        "q": {"w": jnp.asarray(rs.randn(c, c) * 0.05, jnp.float32),
              "b": jnp.zeros((c,), jnp.float32)},
        "k": {"w": jnp.asarray(rs.randn(c, c) * 0.05, jnp.float32),
              "b": jnp.zeros((c,), jnp.float32)},
        "v": {"w": jnp.asarray(rs.randn(c, c) * 0.05, jnp.float32),
              "b": jnp.zeros((c,), jnp.float32)},
        "o": {"w": jnp.asarray(rs.randn(c, c) * 0.05, jnp.float32),
              "b": jnp.zeros((c,), jnp.float32)},
        "emb_rel_k": jnp.asarray(rs.randn(1, 2 * w + 1, k_ch) * 0.1,
                                 jnp.float32),
        "emb_rel_v": jnp.asarray(rs.randn(1, 2 * w + 1, k_ch) * 0.1,
                                 jnp.float32),
    }
    x = jnp.asarray(rs.randn(b, t, c), jnp.float32)
    lengths = jnp.asarray([t, t - 17], jnp.int32)
    from rvc_maker_tpu.ops.nn import sequence_mask
    x_mask = sequence_mask(lengths, t).astype(x.dtype)[:, :, None]
    attn_mask = (x_mask[:, None, :, :] * x_mask[:, None, None, :, 0])

    got = syn.multi_head_attention(p, x, attn_mask, n_heads=heads,
                                   window_size=w)

    # full-width formulation (what the reference computes)
    q = (x @ p["q"]["w"]).reshape(b, t, heads, k_ch).transpose(0, 2, 1, 3)
    k = (x @ p["k"]["w"]).reshape(b, t, heads, k_ch).transpose(0, 2, 1, 3)
    v = (x @ p["v"]["w"]).reshape(b, t, heads, k_ch).transpose(0, 2, 1, 3)
    scale = 1.0 / np.sqrt(k_ch)
    scores = jnp.einsum("bhtk,bhsk->bhts", q * scale, k)
    rel_k = syn._get_relative_embeddings(p["emb_rel_k"], t, w)
    scores = scores + syn._relative_to_absolute(
        jnp.einsum("bhtk,gsk->bhts", q * scale, rel_k))
    scores = jnp.where(attn_mask == 0, -1e4, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsk->bhtk", p_attn, v)
    rel_v = syn._get_relative_embeddings(p["emb_rel_v"], t, w)
    out = out + jnp.einsum("bhts,gsk->bhtk",
                           syn._absolute_to_relative(p_attn), rel_v)
    want = out.transpose(0, 2, 1, 3).reshape(b, t, c) @ p["o"]["w"]

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_text_encoder_parity(ref_and_params):
    net, params = ref_and_params
    phone, pitch, _, lengths, _ = _mk_inputs()
    with torch.no_grad():
        m_t, logs_t, mask_t = net.enc_p(torch.from_numpy(phone),
                                        torch.from_numpy(pitch),
                                        torch.from_numpy(lengths))
    m, logs, mask = syn.text_encoder(params["enc_p"], CFG, jnp.asarray(phone),
                                     jnp.asarray(pitch), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(m).transpose(0, 2, 1), m_t.numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logs).transpose(0, 2, 1),
                               logs_t.numpy(), rtol=1e-4, atol=2e-5)


def test_flow_roundtrip_and_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(7)
    b, t = 2, 23
    x = rs.randn(b, t, CFG.inter_channels).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    g = rs.randn(b, 1, CFG.gin_channels).astype(np.float32)

    x_t = torch.from_numpy(x.transpose(0, 2, 1))
    mask_t = torch.from_numpy(mask.transpose(0, 2, 1))
    g_t = torch.from_numpy(g.transpose(0, 2, 1))
    with torch.no_grad():
        fwd_t = net.flow(x_t, mask_t, g=g_t, reverse=False)
        rev_t = net.flow(x_t, mask_t, g=g_t, reverse=True)

    fwd = syn.flow(params["flow"], jnp.asarray(x), jnp.asarray(mask),
                   jnp.asarray(g), reverse=False)
    rev = syn.flow(params["flow"], jnp.asarray(x), jnp.asarray(mask),
                   jnp.asarray(g), reverse=True)
    np.testing.assert_allclose(np.asarray(fwd).transpose(0, 2, 1),
                               fwd_t.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rev).transpose(0, 2, 1),
                               rev_t.numpy(), rtol=1e-4, atol=2e-5)
    # invertibility: reverse(forward(x)) == x
    back = syn.flow(params["flow"], fwd, jnp.asarray(mask), jnp.asarray(g),
                    reverse=True)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-4)


def test_generator_nsf_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(11)
    b, t = 2, 23
    z = rs.randn(b, t, CFG.inter_channels).astype(np.float32)
    f0 = (rs.rand(b, t).astype(np.float32) * 300 + 80)
    f0[:, :3] = 0.0
    g = rs.randn(b, 1, CFG.gin_channels).astype(np.float32)

    with torch.no_grad(), zero_noise_torch():
        o_t = net.dec(torch.from_numpy(z.transpose(0, 2, 1)),
                      torch.from_numpy(f0),
                      g=torch.from_numpy(g.transpose(0, 2, 1)))

    upp = CFG.upp
    sine_noise = jnp.zeros((b, t * upp, 1), jnp.float32)
    o = syn.generator_nsf(params["dec"], CFG, jnp.asarray(z), jnp.asarray(f0),
                          jnp.asarray(g), sine_noise)
    np.testing.assert_allclose(np.asarray(o).transpose(0, 2, 1), o_t.numpy(),
                               rtol=1e-4, atol=3e-5)


def test_posterior_encoder_parity(ref_and_params):
    net, params = ref_and_params
    rs = np.random.RandomState(13)
    b, t = 2, 23
    y = rs.randn(b, t, CFG.spec_channels).astype(np.float32)
    lengths = np.array([t, t - 4], dtype=np.int64)
    g = rs.randn(b, 1, CFG.gin_channels).astype(np.float32)

    with torch.no_grad(), zero_noise_torch():
        z_t, m_t, logs_t, mask_t = net.enc_q(
            torch.from_numpy(y.transpose(0, 2, 1)), torch.from_numpy(lengths),
            g=torch.from_numpy(g.transpose(0, 2, 1)))

    z, m, logs, mask = syn.posterior_encoder(
        params["enc_q"], CFG, jnp.asarray(y), jnp.asarray(lengths),
        jnp.asarray(g), jnp.zeros((b, t, CFG.inter_channels), jnp.float32))
    np.testing.assert_allclose(np.asarray(z).transpose(0, 2, 1), z_t.numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m).transpose(0, 2, 1), m_t.numpy(),
                               rtol=1e-4, atol=2e-5)


def test_infer_end_to_end_parity(ref_and_params):
    """BASELINE.md correctness gate: waveform max abs err <= 1e-3 at fp32
    (achieved well below that on CPU with noise seams zeroed)."""
    net, params = ref_and_params
    phone, pitch, nsff0, lengths, sid = _mk_inputs()
    b, t = phone.shape[:2]

    with torch.no_grad(), zero_noise_torch():
        o_t, _, _ = net.infer(torch.from_numpy(phone), torch.from_numpy(lengths),
                              torch.from_numpy(pitch), torch.from_numpy(nsff0),
                              torch.from_numpy(sid))

    z_noise = jnp.zeros((b, t, CFG.inter_channels), jnp.float32)
    sine_noise = jnp.zeros((b, t * CFG.upp, 1), jnp.float32)
    o, _, _ = syn.infer(params, CFG, jnp.asarray(phone), jnp.asarray(lengths),
                        jnp.asarray(pitch), jnp.asarray(nsff0),
                        jnp.asarray(sid), z_noise, sine_noise)

    ours = np.asarray(o)[:, :, 0]
    ref = o_t.numpy()[:, 0, :]
    assert np.max(np.abs(ours - ref)) <= 1e-3
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_train_forward_shapes(ref_and_params):
    """Training path runs and produces consistent shapes (numerics of the
    random slice differ by PRNG; parity is covered by submodule tests)."""
    import jax
    _, params = ref_and_params
    rs = np.random.RandomState(17)
    b, t = 2, 40
    phone = jnp.asarray(rs.randn(b, t, CFG.text_enc_hidden_dim).astype(np.float32))
    pitch = jnp.asarray(rs.randint(1, 256, (b, t)))
    y = jnp.asarray(rs.randn(b, t, CFG.spec_channels).astype(np.float32))
    pitchf = jnp.asarray((rs.rand(b, t) * 200 + 80).astype(np.float32))
    lengths = jnp.asarray([t, t - 6])
    ds = jnp.asarray([0, 2])
    y_hat, ids, x_mask, y_mask, (z, z_fl, m_p, logs_p, m_q, logs_q) = syn.train_forward(
        params, CFG, phone, lengths, pitch, pitchf, y, lengths, ds,
        jax.random.PRNGKey(0))
    assert y_hat.shape == (b, CFG.segment_size * CFG.upp, 1)
    assert z.shape == (b, t, CFG.inter_channels)
    assert z_fl.shape == z.shape
