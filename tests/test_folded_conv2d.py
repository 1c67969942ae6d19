"""W-axis space-to-depth fold for 2-D convs (ops/folded_conv2d.py):
exact parity vs the plain NHWC conv path used by RMVPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_maker_tpu.ops import folded_conv2d as F2


def _conv2d_ref(x, w, pad=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("fold,cin,cout,w_dim", [
    (8, 1, 16, 128),    # RMVPE enc level 0 first block
    (8, 16, 16, 128),   # enc level 0 inner blocks
    (4, 16, 32, 64),    # enc level 1 first block
    (4, 32, 32, 64),    # enc level 1 inner
    (8, 32, 16, 128),   # dec level 4 first block (concat input)
])
def test_folded_conv2d_matches_plain(fold, cin, cout, w_dim):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, w_dim, cin)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)), jnp.float32)

    ref = _conv2d_ref(x, w)
    out = F2.unfold_w(F2.folded_conv2d(F2.fold_w(x, fold), w, fold=fold),
                      fold)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_folded_block_res_matches_plain():
    from rvc_maker_tpu.models.rmvpe import _conv_block_res

    rng = np.random.default_rng(1)
    cin, cout, fold, w_dim = 32, 16, 8, 128
    x = jnp.asarray(rng.standard_normal((2, 8, w_dim, cin)), jnp.float32)
    p = {
        "conv1": {"w": jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)), jnp.float32)},
        "bn1": {"scale": jnp.asarray(rng.standard_normal(cout), jnp.float32),
                "shift": jnp.asarray(rng.standard_normal(cout), jnp.float32)},
        "conv2": {"w": jnp.asarray(0.1 * rng.standard_normal((3, 3, cout, cout)), jnp.float32)},
        "bn2": {"scale": jnp.asarray(rng.standard_normal(cout), jnp.float32),
                "shift": jnp.asarray(rng.standard_normal(cout), jnp.float32)},
        "shortcut": {"w": jnp.asarray(0.1 * rng.standard_normal((1, 1, cin, cout)), jnp.float32),
                     "b": jnp.asarray(rng.standard_normal(cout), jnp.float32)},
    }
    ref = _conv_block_res(p, x)
    out = F2.unfold_w(
        F2.folded_conv_block_res(p, F2.fold_w(x, fold), fold=fold), fold)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_rmvpe_e2e_fold_matches_plain(monkeypatch):
    """Whole salience net with the per-level fold policy forced on
    (RVC_TPU_FOLD=1) vs the plain path, random weights, fp32."""
    from rvc_maker_tpu.models import rmvpe as R

    rng = np.random.default_rng(3)

    def rand(*s):
        return jnp.asarray(0.1 * rng.standard_normal(s), jnp.float32)

    def bn(c):
        return {"scale": rand(c), "shift": rand(c)}

    def block(ci, co):
        p = {"conv1": {"w": rand(3, 3, ci, co)}, "bn1": bn(co),
             "conv2": {"w": rand(3, 3, co, co)}, "bn2": bn(co)}
        if ci != co:
            p["shortcut"] = {"w": rand(1, 1, ci, co), "b": rand(co)}
        return p

    def layer(ci, co, n=2):
        return {"blocks": [block(ci if j == 0 else co, co) for j in range(n)]}

    enc = [16, 32, 64, 128, 256]
    params = {"in_bn": bn(1)}
    params["encoder"] = [layer(1 if i == 0 else enc[i - 1], enc[i])
                         for i in range(5)]
    params["intermediate"] = [layer(256, 512), layer(512, 512)]
    dec, ci = [], 512
    for i in range(5):
        co = ci // 2
        dec.append({"convt": {"w": rand(3, 3, ci, co)}, "bn": bn(co),
                    "blocks": [block(2 * co, co), block(co, co)]})
        ci = co
    params["decoder"] = dec
    params["cnn"] = {"w": rand(3, 3, 16, 3), "b": rand(3)}
    H = 8
    params["gru"] = {
        "w_ih": rand(3 * H, 384), "w_hh": rand(3 * H, H),
        "b_ih": rand(3 * H), "b_hh": rand(3 * H),
        "w_ih_r": rand(3 * H, 384), "w_hh_r": rand(3 * H, H),
        "b_ih_r": rand(3 * H), "b_hh_r": rand(3 * H),
    }
    params["fc"] = {"w": rand(2 * H, 360), "b": rand(360)}

    mel = rand(2, 128, 64)
    monkeypatch.setenv("RVC_TPU_FOLD", "0")
    plain = np.asarray(R.e2e_apply(params, mel))
    monkeypatch.setenv("RVC_TPU_FOLD", "1")
    folded = np.asarray(R.e2e_apply(params, mel))
    np.testing.assert_allclose(folded, plain, rtol=0, atol=1e-5)


def test_fold_w_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 5, 64, 32)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(F2.unfold_w(F2.fold_w(x, 4), 4)), np.asarray(x))
