"""AudioLDM2 UNet checkpoint import: keymap completeness + stream routing.

diffusers is absent in this image and the released checkpoints are
download-gated, so ground truth is the diffusers AudioLDM2 state-dict
LAYOUT itself: this file builds a synthetic checkpoint with the exact
key naming diffusers' AudioLDM2UNet2DConditionModel emits (one full
Transformer2DModel per cross-attention slot after every resnet,
attentions stored flat as attentions[layer*slots + idx]) and asserts

  * every key is consumed (and extra/missing keys raise) — the
    keymap-completeness contract mirroring tests/test_interop_keymaps.py
  * the slot routing matches the reference wrapper's usage
    (main/library/audioldm2/models.py:286-318 passes
    encoder_hidden_states = GPT2 stream and encoder_hidden_states_1 =
    T5/CLAP stream; diffusers routes slot idx<=1 -> stream 0,
    idx>1 -> stream 1, None-dim slots self-attend)
  * double-self-attention None slots really ignore both streams
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rvc_maker_tpu.models import audioldm2 as am

IN_CH = 4
CH = (8, 16)
LAYERS = 1
CROSS = (None, 12, 20)   # cvssp/audioldm2 shape: (None, GPT2 768, T5 1024)
TEMB = CH[0] * 4
GROUPS = 4


def _t(rs, *shape):
    return torch.from_numpy((rs.randn(*shape) * 0.08).astype(np.float32))


def make_unet_sd(rs, *, linear_proj_slots=(1,), attn_down=None,
                 attn_up=None):
    """Synthetic state dict in the diffusers AudioLDM2 UNet key layout.
    Slots in linear_proj_slots use nn.Linear proj_in/out (the
    use_linear_projection variant); others use 1x1 Conv2d.
    attn_down/attn_up: per-block booleans — False emits an
    attention-less DownBlock2D/UpBlock2D (the real audioldm2 layout ends
    its down stack with one and starts its up stack with one)."""
    attn_down = (True,) * len(CH) if attn_down is None else attn_down
    attn_up = (True,) * len(CH) if attn_up is None else attn_up
    sd = {}

    def lin(prefix, cin, cout, bias=True):
        sd[f"{prefix}.weight"] = _t(rs, cout, cin)
        if bias:
            sd[f"{prefix}.bias"] = _t(rs, cout)

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = _t(rs, cout, cin, k, k)
        sd[f"{prefix}.bias"] = _t(rs, cout)

    def norm(prefix, c):
        sd[f"{prefix}.weight"] = torch.ones(c) + 0.05 * _t(rs, c)
        sd[f"{prefix}.bias"] = 0.05 * _t(rs, c)

    def resnet(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout, 3)
        lin(f"{prefix}.time_emb_proj", TEMB, cout)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cin, cout, 1)

    def transformer(prefix, c, kv_dim, slot_idx):
        norm(f"{prefix}.norm", c)
        if slot_idx in linear_proj_slots:
            lin(f"{prefix}.proj_in", c, c)
            lin(f"{prefix}.proj_out", c, c)
        else:
            conv(f"{prefix}.proj_in", c, c, 1)
            conv(f"{prefix}.proj_out", c, c, 1)
        tb = f"{prefix}.transformer_blocks.0"
        norm(f"{tb}.norm1", c)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{tb}.attn1.{n}", c, c, bias=False)
        lin(f"{tb}.attn1.to_out.0", c, c)
        norm(f"{tb}.norm2", c)
        kd = c if kv_dim is None else kv_dim
        lin(f"{tb}.attn2.to_q", c, c, bias=False)
        lin(f"{tb}.attn2.to_k", kd, c, bias=False)
        lin(f"{tb}.attn2.to_v", kd, c, bias=False)
        lin(f"{tb}.attn2.to_out.0", c, c)
        norm(f"{tb}.norm3", c)
        lin(f"{tb}.ff.net.0.proj", c, 8 * c)
        lin(f"{tb}.ff.net.2", 4 * c, c)

    def slots(prefix, c, base):
        for idx, kv in enumerate(CROSS):
            transformer(f"{prefix}.{base + idx}", c, kv, idx)

    lin("time_embedding.linear_1", CH[0], TEMB)
    lin("time_embedding.linear_2", TEMB, TEMB)
    conv("conv_in", IN_CH, CH[0], 3)

    skip_widths = [CH[0]]
    cin = CH[0]
    for i, cout in enumerate(CH):
        for j in range(LAYERS):
            resnet(f"down_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout)
            if attn_down[i]:
                slots(f"down_blocks.{i}.attentions", cout, j * len(CROSS))
            skip_widths.append(cout)
        if i < len(CH) - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)
            skip_widths.append(cout)
        cin = cout

    resnet("mid_block.resnets.0", CH[-1], CH[-1])
    resnet("mid_block.resnets.1", CH[-1], CH[-1])
    slots("mid_block.attentions", CH[-1], 0)

    rev = list(reversed(CH))
    cur = CH[-1]
    for i, cout in enumerate(rev):
        for j in range(LAYERS + 1):
            resnet(f"up_blocks.{i}.resnets.{j}",
                   cur + skip_widths.pop(), cout)
            if attn_up[i]:
                slots(f"up_blocks.{i}.attentions", cout, j * len(CROSS))
            cur = cout
        if i < len(rev) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout, 3)
    assert not skip_widths

    norm("conv_norm_out", CH[0])
    conv("conv_out", CH[0], IN_CH, 3)
    return sd


@pytest.fixture(scope="module")
def imported():
    rs = np.random.RandomState(0)
    sd = make_unet_sd(rs)
    params, cfg = am.unet_params_from_state_dict(
        sd, head_dim=4, norm_groups=GROUPS)
    return sd, params, cfg


def test_every_key_consumed_and_config_inferred(imported):
    sd, params, cfg = imported
    assert cfg.block_out_channels == CH
    assert cfg.layers_per_block == LAYERS
    assert cfg.in_channels == IN_CH
    assert cfg.slot_dims == CROSS
    # forward runs and is finite at an inferred-config shape
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 4, IN_CH),
                    jnp.float32)
    eh0 = jnp.asarray(np.random.RandomState(2).randn(2, 5, 12), jnp.float32)
    eh1 = jnp.asarray(np.random.RandomState(3).randn(2, 7, 20), jnp.float32)
    t = jnp.asarray([10, 500], jnp.int32)
    out = am.unet_forward(params, cfg, x, t, eh0, eh1)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_attention_less_blocks_import_and_run():
    """The real audioldm2 layout ends the down stack with a DownBlock2D
    and starts the up stack with an UpBlock2D (no attentions); the
    importer and forward must handle those blocks."""
    rs = np.random.RandomState(9)
    sd = make_unet_sd(rs, attn_down=(True, False), attn_up=(False, True))
    params, cfg = am.unet_params_from_state_dict(sd, head_dim=4,
                                                 norm_groups=GROUPS)
    assert "attn" not in params["down"][1]
    assert "attn" not in params["up"][0]
    assert cfg.slot_dims == CROSS
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 4, IN_CH),
                    jnp.float32)
    eh0 = jnp.asarray(np.random.RandomState(2).randn(1, 5, 12), jnp.float32)
    eh1 = jnp.asarray(np.random.RandomState(3).randn(1, 7, 20), jnp.float32)
    out = am.unet_forward(params, cfg, x, jnp.asarray([50], jnp.int32),
                          eh0, eh1)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # streams still reach the output through the attention-carrying blocks
    d0 = am.unet_forward(params, cfg, x, jnp.asarray([50], jnp.int32),
                         eh0 + 1.0, eh1) - out
    assert float(jnp.abs(d0).max()) > 1e-6


def test_extra_key_raises(imported):
    sd, _, _ = imported
    sd2 = dict(sd)
    sd2["down_blocks.0.attentions.0.bogus_extra"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        am.unet_params_from_state_dict(sd2, head_dim=4)


def test_missing_key_raises(imported):
    sd, _, _ = imported
    sd2 = dict(sd)
    del sd2["mid_block.resnets.1.conv2.bias"]
    with pytest.raises(KeyError):
        am.unet_params_from_state_dict(sd2, head_dim=4)


def _sens(params, cfg, x, t, eh0, eh1):
    """max |d out| under a perturbation of each stream."""
    base = am.unet_forward(params, cfg, x, t, eh0, eh1)
    d0 = am.unet_forward(params, cfg, x, t, eh0 + 1.0, eh1) - base
    d1 = am.unet_forward(params, cfg, x, t, eh0, eh1 + 1.0) - base
    return float(jnp.abs(d0).max()), float(jnp.abs(d1).max())


def test_stream_routing(imported):
    """Slot idx<=1 (cross dim 12) must carry the GPT2 stream (eh0), slot
    idx>1 (dim 20) the T5/CLAP stream (eh1) — the diffusers audioldm2
    routing the reference drives via encoder_hidden_states /
    encoder_hidden_states_1 (models.py:236,286-318)."""
    _, params, cfg = imported
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 8, 4, IN_CH), jnp.float32)
    eh0 = jnp.asarray(rs.randn(1, 5, 12), jnp.float32)
    eh1 = jnp.asarray(rs.randn(1, 7, 20), jnp.float32)
    t = jnp.asarray([100], jnp.int32)

    s0, s1 = _sens(params, cfg, x, t, eh0, eh1)
    assert s0 > 1e-6 and s1 > 1e-6  # both streams reach the output

    # silence every idx-1 slot (to_out of its attn2): eh0 must go dead,
    # eh1 must stay live — proving idx 1 is the only eh0 consumer
    def silence(p, slot_idx):
        p = jax.tree_util.tree_map(lambda a: a, p)  # deep-ish copy

        def zero_slot(slots):
            s = slots[slot_idx]
            for blk in s["blocks"]:
                blk["attn2"]["o"]["w"] = jnp.zeros_like(blk["attn2"]["o"]["w"])
                blk["attn2"]["o"]["b"] = jnp.zeros_like(blk["attn2"]["o"]["b"])

        for side in ("down", "up"):
            for blk in p[side]:
                for slots in blk.get("attn", []):
                    zero_slot(slots)
        zero_slot(p["mid"]["attn"])
        return p

    import copy

    p_no1 = silence(copy.deepcopy(params), 1)
    s0, s1 = _sens(p_no1, cfg, x, t, eh0, eh1)
    assert s0 < 1e-9, f"eh0 leaked around the idx<=1 slot: {s0}"
    assert s1 > 1e-6

    p_no2 = silence(copy.deepcopy(params), 2)
    s0, s1 = _sens(p_no2, cfg, x, t, eh0, eh1)
    assert s1 < 1e-9, f"eh1 leaked around the idx>1 slot: {s1}"
    assert s0 > 1e-6


def test_none_slot_is_double_self_attention(imported):
    """The None-dim slot (idx 0) must not see either stream: silencing
    BOTH cross slots leaves an output that still depends on x (the
    double-self-attention path) but on neither stream."""
    _, params, cfg = imported
    import copy

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(1, 8, 4, IN_CH), jnp.float32)
    eh0 = jnp.asarray(rs.randn(1, 5, 12), jnp.float32)
    eh1 = jnp.asarray(rs.randn(1, 7, 20), jnp.float32)
    t = jnp.asarray([100], jnp.int32)

    p = copy.deepcopy(params)

    def zero_slot_everywhere(p, slot_idx):
        def zero(slots):
            for blk in slots[slot_idx]["blocks"]:
                blk["attn2"]["o"]["w"] = jnp.zeros_like(blk["attn2"]["o"]["w"])
                blk["attn2"]["o"]["b"] = jnp.zeros_like(blk["attn2"]["o"]["b"])
        for side in ("down", "up"):
            for blk in p[side]:
                for slots in blk.get("attn", []):
                    zero(slots)
        zero(p["mid"]["attn"])

    zero_slot_everywhere(p, 1)
    zero_slot_everywhere(p, 2)
    s0, s1 = _sens(p, cfg, x, t, eh0, eh1)
    assert s0 < 1e-9 and s1 < 1e-9
    base = am.unet_forward(p, cfg, x, t, eh0, eh1)
    moved = am.unet_forward(p, cfg, x + 0.5, t, eh0, eh1)
    assert float(jnp.abs(moved - base).max()) > 1e-4  # x still flows
