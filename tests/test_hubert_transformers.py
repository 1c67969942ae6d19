"""transformers-format HuBERT import parity (reference utils.py:155-166
embedders_mode="transformers": HubertModel + final_proj head)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_maker_tpu.models import hubert as hubert_mod


@pytest.fixture(scope="module")
def hf_and_params():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    net = HubertModel(HubertConfig())
    net.eval()
    params = hubert_mod.params_from_transformers_state_dict(net.state_dict())
    return net, params


def test_transformers_import_forward_parity(hf_and_params):
    net, params = hf_and_params
    rs = np.random.RandomState(1)
    x = (rs.randn(1, 8000) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).last_hidden_state.numpy()
    ours, _ = hubert_mod.extract_features(params, jnp.asarray(x), None,
                                          output_layer=12)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-4)


def test_transformers_intermediate_layer(hf_and_params):
    net, params = hf_and_params
    rs = np.random.RandomState(2)
    x = (rs.randn(1, 6400) * 0.1).astype(np.float32)
    with torch.no_grad():
        hs = net(torch.from_numpy(x), output_hidden_states=True).hidden_states
    ours, _ = hubert_mod.extract_features(params, jnp.asarray(x), None,
                                          output_layer=9)
    np.testing.assert_allclose(np.asarray(ours), hs[9].numpy(), rtol=1e-3,
                               atol=2e-4)


def test_load_transformers_file(hf_and_params, tmp_path):
    net, params = hf_and_params
    from safetensors.torch import save_file

    p = str(tmp_path / "model.safetensors")
    save_file({k: v.contiguous() for k, v in net.state_dict().items()}, p)
    loaded = hubert_mod.load_transformers_dir(str(tmp_path))
    ref_leaf = params["layers"]["fc1"]["w"]
    np.testing.assert_allclose(loaded["layers"]["fc1"]["w"], ref_leaf)
