"""AudioLDM2 text-stack parity vs the transformers implementations.

The reference drives these encoders through transformers/diffusers
(reference main/library/audioldm2/models.py:196-222); transformers IS in
this image, so CLAP/T5/GPT2 parity is asserted against the real thing on
tiny random configs.  The diffusers-only projection model is checked for
structural behavior (projection + sos/eos framing + concat).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import audioldm2_text as at


def test_clap_get_text_features_parity():
    from transformers import ClapTextConfig, ClapTextModelWithProjection

    tcfg = ClapTextConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, projection_dim=16,
        hidden_act="gelu", projection_hidden_act="relu")
    torch.manual_seed(0)
    net = ClapTextModelWithProjection(tcfg).eval()
    cfg = at.ClapTextConfig(
        vocab_size=120, hidden_size=32, n_layers=2, n_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        pad_token_id=tcfg.pad_token_id, projection_dim=16)
    p = at.clap_params_from_state_dict(net.state_dict())

    rs = np.random.RandomState(0)
    ids = rs.randint(2, 120, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0
    ids[1, 6:] = tcfg.pad_token_id
    with torch.no_grad():
        ref = net(torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long()
                  ).text_embeds.numpy()
    ours = np.asarray(at.clap_get_text_features(
        p, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_t5_encoder_parity():
    from transformers import T5Config, T5EncoderModel

    tcfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(1)
    net = T5EncoderModel(tcfg).eval()
    cfg = at.T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=48,
                      n_layers=2, n_heads=4, rel_buckets=8,
                      rel_max_distance=20)
    p = at.t5_params_from_state_dict(net.state_dict())

    rs = np.random.RandomState(1)
    ids = rs.randint(0, 100, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[0, 8:] = 0
    with torch.no_grad():
        ref = net(torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long()
                  ).last_hidden_state.numpy()
    ours = np.asarray(at.t5_encode(p, cfg, jnp.asarray(ids),
                                   jnp.asarray(mask)))
    # masked positions may legitimately differ; compare valid positions
    np.testing.assert_allclose(ours[mask.astype(bool)],
                               ref[mask.astype(bool)], atol=3e-5)


def _tiny_gpt2():
    from transformers import GPT2Config, GPT2Model

    tcfg = GPT2Config(vocab_size=90, n_positions=64, n_embd=32,
                      n_layer=2, n_head=4, resid_pdrop=0.0,
                      embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(2)
    net = GPT2Model(tcfg).eval()
    cfg = at.GPT2Config(n_embd=32, n_layers=2, n_heads=4)
    return net, cfg, at.gpt2_params_from_state_dict(net.state_dict())


def test_gpt2_forward_embeds_parity():
    net, cfg, p = _tiny_gpt2()
    rs = np.random.RandomState(2)
    embeds = rs.randn(2, 7, 32).astype(np.float32)
    mask = np.ones((2, 7), np.int32)
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = net(inputs_embeds=torch.from_numpy(embeds),
                  attention_mask=torch.from_numpy(mask).long()
                  ).last_hidden_state.numpy()
    ours = np.asarray(at.gpt2_forward_embeds(
        p, cfg, jnp.asarray(embeds), jnp.asarray(mask)))
    np.testing.assert_allclose(ours[mask.astype(bool)],
                               ref[mask.astype(bool)], atol=3e-5)


def test_generate_language_model_matches_manual_loop():
    """The diffusers loop appends the last hidden state each step; a
    torch-side manual replica must match ours exactly."""
    net, cfg, p = _tiny_gpt2()
    rs = np.random.RandomState(3)
    embeds = rs.randn(1, 5, 32).astype(np.float32)

    te = torch.from_numpy(embeds)
    with torch.no_grad():
        for _ in range(4):
            out = net(inputs_embeds=te).last_hidden_state
            te = torch.cat([te, out[:, -1:, :]], dim=1)
    ref = te[:, -4:, :].numpy()
    ours = np.asarray(at.generate_language_model(
        p, cfg, jnp.asarray(embeds), max_new_tokens=4))
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_projection_model_structure():
    rs = np.random.RandomState(4)
    d0, d1, dl = 16, 12, 8
    sd = {
        "projection.weight": rs.randn(dl, d0).astype(np.float32),
        "projection.bias": rs.randn(dl).astype(np.float32),
        "projection_1.weight": rs.randn(dl, d1).astype(np.float32),
        "projection_1.bias": rs.randn(dl).astype(np.float32),
        "sos_embed": rs.randn(dl).astype(np.float32),
        "eos_embed": rs.randn(dl).astype(np.float32),
        "sos_embed_1": rs.randn(dl).astype(np.float32),
        "eos_embed_1": rs.randn(dl).astype(np.float32),
    }
    p = at.projection_params_from_state_dict(sd)
    h0 = rs.randn(2, 1, d0).astype(np.float32)   # CLAP pooled (B, 1, d0)
    h1 = rs.randn(2, 6, d1).astype(np.float32)   # T5 tokens
    m0 = np.ones((2, 1), np.int64)
    m1 = np.ones((2, 6), np.int64)
    m1[1, 4:] = 0
    h, m = at.projection_forward(p, jnp.asarray(h0), jnp.asarray(h1),
                                 jnp.asarray(m0), jnp.asarray(m1))
    # seq = (1 + 1 + 1) + (1 + 6 + 1)
    assert h.shape == (2, 11, dl)
    assert m.shape == (2, 11)
    # stream 0: sos at 0, projected at 1, eos at 2
    np.testing.assert_allclose(
        np.asarray(h)[:, 0], np.broadcast_to(sd["sos_embed"], (2, dl)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h)[:, 1], h0[:, 0] @ sd["projection.weight"].T
        + sd["projection.bias"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h)[:, 2], np.broadcast_to(sd["eos_embed"], (2, dl)),
        atol=1e-6)
    # masks framed with ones, stream-1 padding preserved
    assert np.asarray(m)[1].tolist() == [1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 1]
