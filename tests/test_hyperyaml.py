"""hyperpyyaml-lite + speechbrain ECAPA directory loading."""

import os

import numpy as np
import torch

import jax.numpy as jnp

from rvc_maker_tpu.speaker.hyperyaml import (load_hyperpyyaml_lite,
                                             load_speechbrain_ecapa)

from reference_util import ref_module

HPARAMS = """\
n_mels: 80
sample_rate: 16000
deviceopt: cpu

compute_features: !new:speechbrain.lobes.features.Fbank
    n_mels: !ref <n_mels>

mean_var_norm: !new:speechbrain.processing.features.InputNormalization
    norm_type: sentence
    std_norm: False

embedding_model: !new:speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN
    input_size: !ref <n_mels>
    channels: [1024, 1024, 1024, 1024, 3072]
    kernel_sizes: [5, 3, 3, 3, 1]
    dilations: [1, 2, 3, 4, 1]
    attention_channels: 128
    lin_neurons: 192

label_encoder: !name:speechbrain.dataio.encoder.CategoricalEncoder

modules:
    compute_features: !ref <compute_features>
    mean_var_norm: !ref <mean_var_norm>
    embedding_model: !ref <embedding_model>

pretrained_path: speechbrain/spkrec-ecapa-voxceleb
save_folder: !ref <pretrained_path>/save
"""


def test_parse_tags_and_refs(tmp_path):
    p = tmp_path / "hyperparams.yaml"
    p.write_text(HPARAMS)
    h = load_hyperpyyaml_lite(str(p))
    assert h["embedding_model"]["_new"].endswith("ECAPA_TDNN")
    assert h["embedding_model"]["input_size"] == 80       # !ref resolved
    assert h["compute_features"]["n_mels"] == 80
    assert h["label_encoder"]["_name"].endswith("CategoricalEncoder")
    assert h["modules"]["embedding_model"]["_new"].endswith("ECAPA_TDNN")
    assert h["save_folder"] == "speechbrain/spkrec-ecapa-voxceleb/save"


def test_load_speechbrain_dir(tmp_path):
    mod = ref_module("main.library.speaker_diarization.ECAPA_TDNN")
    torch.manual_seed(0)
    net = mod.ECAPA_TDNN(input_size=80)
    net.eval()
    (tmp_path / "hyperparams.yaml").write_text(HPARAMS)
    torch.save(net.state_dict(), str(tmp_path / "embedding_model.ckpt"))

    params, info = load_speechbrain_ecapa(str(tmp_path))
    assert info["n_mels"] == 80 and info["lin_neurons"] == 192

    from rvc_maker_tpu.models import ecapa_tdnn as jec

    rs = np.random.RandomState(0)
    x = rs.randn(1, 120, 80).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(jec.embed(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref, rtol=2e-3,
                               atol=2e-4)
