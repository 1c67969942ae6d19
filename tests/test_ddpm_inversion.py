"""Edit-friendly DDPM inversion tests (reference audioldm2.py:130-209).

diffusers is absent from this image (the reference's AudioLDM2 path is
download-gated there too), so these validate the algorithm's defining
mathematical properties with a toy denoiser instead of checkpoint
parity."""

import numpy as np

import jax
import jax.numpy as jnp

from rvc_maker_tpu.edit import (inversion_forward, inversion_reverse,
                                make_schedule, sample_xts_from_x0)


def _toy_eps(w):
    """Deterministic toy denoiser: eps = tanh(x @ w) conditioned by a
    phase offset."""

    def eps_fn(x, t):
        base = jnp.tanh(x @ w) * 0.5 + 1e-3 * t / 1000.0
        return base, base + 0.1 * jnp.sin(x)
    return eps_fn


def test_schedule_tables():
    s = make_schedule(50)
    assert s.timesteps.shape == (50,)
    assert s.timesteps[0] > s.timesteps[-1] >= 0
    assert np.all(np.diff(s.alphas_cumprod) < 0)
    # variance is the DDIM posterior variance, non-negative
    for t in s.timesteps:
        assert s.variance(int(t)) >= 0
    # alpha_prod_prev at the last step hits final_alpha_cumprod
    t_last = int(s.timesteps[-1])
    assert s.prev_timestep(t_last) < 0
    assert s.alpha_prod_prev(t_last) == s.final_alpha_cumprod


def test_sample_xts_marginals():
    rng = jax.random.PRNGKey(0)
    s = make_schedule(20)
    x0 = jnp.ones((2000,)) * 3.0
    xts = sample_xts_from_x0(rng, x0, s)
    assert xts.shape == (21, 2000)
    np.testing.assert_allclose(np.asarray(xts[0]), 3.0)
    # highest-noise row ~ N(sqrt(a_T)*3, 1-a_T)
    a_top = s.alphas_cumprod[s.timesteps[0]]
    top = np.asarray(xts[-1])
    assert abs(top.mean() - np.sqrt(a_top) * 3.0) < 0.1
    assert abs(top.std() - np.sqrt(1 - a_top)) < 0.05


def test_roundtrip_exact_reconstruction():
    """The defining property: reversing with the extracted noise maps
    and the SAME conditioning reproduces x0 exactly."""
    rng = jax.random.PRNGKey(1)
    s = make_schedule(10)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(16, 16).astype(np.float32) * 0.2)
    x0 = jnp.asarray(rs.randn(16).astype(np.float32))
    eps_fn = _toy_eps(w)

    xT, zs, xts = inversion_forward(eps_fn, x0, s, cfg_scale=3.5,
                                    etas=1.0, rng=rng, zero_first=False)
    out = inversion_reverse(eps_fn, xts, zs, s, tstart=10, cfg_scale=3.5,
                            etas=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4,
                               atol=1e-4)


def test_partial_tstart_reconstruction():
    """Starting from a lower noise level reproduces the corresponding
    intermediate latent chain exactly."""
    rng = jax.random.PRNGKey(2)
    s = make_schedule(8)
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(8, 8).astype(np.float32) * 0.2)
    x0 = jnp.asarray(rs.randn(8).astype(np.float32))
    eps_fn = _toy_eps(w)
    _, zs, xts = inversion_forward(eps_fn, x0, s, cfg_scale=3.5, etas=1.0,
                                   rng=rng, zero_first=False)
    out = inversion_reverse(eps_fn, xts, zs, s, tstart=4, cfg_scale=3.5,
                            etas=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4,
                               atol=1e-4)


def test_edit_changes_output():
    """A different conditioning at reverse time produces a different
    signal (the edit), while eta=1 keeps it near the source manifold."""
    rng = jax.random.PRNGKey(3)
    s = make_schedule(10)
    rs = np.random.RandomState(2)
    w = jnp.asarray(rs.randn(16, 16).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rs.randn(16, 16).astype(np.float32) * 0.2)
    x0 = jnp.asarray(rs.randn(16).astype(np.float32))
    _, zs, xts = inversion_forward(_toy_eps(w), x0, s, etas=1.0, rng=rng)
    same = inversion_reverse(_toy_eps(w), xts, zs, s, tstart=7,
                             cfg_scale=3.5, etas=1.0)
    edited = inversion_reverse(_toy_eps(w2), xts, zs, s, tstart=7,
                               cfg_scale=3.5, etas=1.0)
    assert np.all(np.isfinite(np.asarray(edited)))
    assert not np.allclose(np.asarray(same), np.asarray(edited), atol=1e-3)
    # default zero_first only perturbs the final small-variance step
    np.testing.assert_allclose(np.asarray(same), np.asarray(x0), atol=0.5)


def test_low_pass_filter():
    from rvc_maker_tpu.edit.ddpm_inversion import low_pass_filter

    sr = 16000
    t = np.arange(sr) / sr
    lo = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 7900 * t).astype(np.float32)
    out = low_pass_filter(lo + hi, cutoff=4000, sr=sr)
    # the 7.9 kHz component is attenuated, the 440 Hz one survives
    spec = np.abs(np.fft.rfft(out))
    f = np.fft.rfftfreq(sr, 1 / sr)
    assert spec[np.argmin(np.abs(f - 440))] > 50 * spec[np.argmin(np.abs(f - 7900))]
