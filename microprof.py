"""fori_loop micro-profiler for the convert hot path (docs/perf_notes.md recipe)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rvc_tpu_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from functools import partial

ITERS = 20

def timeit(name, fn, *args):
    """fn must map args -> array; adds scalar dep between iterations."""
    x0 = args[0]
    rest = args[1:]

    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            dep = (0 * acc).astype(x0.dtype)
            return jnp.sum(fn(x0 + dep, *rest)).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    r = loop(x0, *rest); jax.block_until_ready(r)
    t0 = time.time(); r = loop(x0, *rest); jax.block_until_ready(r)
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt

def main():
    from rvc_maker_tpu.models import rmvpe as rmvpe_mod
    from rvc_maker_tpu.models import hubert as hubert_mod
    from rvc_maker_tpu.retrieval.index import retrieval_blend
    from bench import _random_rmvpe

    bf16 = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    rp = jax.device_put(jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, bf16), _random_rmvpe(k)))
    B, L = 8, 160000
    audio8 = jax.device_put(jnp.asarray(np.random.RandomState(0).randn(B, L) * 0.1, jnp.float32))

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "rmvpe"):
        timeit("rmvpe.mel (B=8, fp32)", rmvpe_mod.rmvpe_mel, audio8)
        mel = rmvpe_mod.rmvpe_mel(audio8)
        meln = jnp.pad(mel, ((0, 0), (0, 0), (0, 1024 - mel.shape[-1])), mode="reflect")
        timeit("rmvpe.e2e_apply (B=8,T=1024,bf16)",
               lambda m, p: rmvpe_mod.e2e_apply(p, m), meln.astype(bf16), rp)
        sal = rmvpe_mod.e2e_apply(rp, meln.astype(bf16))[:, :1001].astype(jnp.float32)
        timeit("rmvpe.decode_cents (B=8)", rmvpe_mod.decode_cents, sal)
        timeit("rmvpe.infer FULL (B=8)", lambda a, p: rmvpe_mod.infer(p, a), audio8, rp)

    if which in ("all", "hubert"):
        hp = jax.device_put(jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, bf16) if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            hubert_mod.init_params(jax.random.PRNGKey(1))))
        B2 = 16
        audio16 = jax.device_put(jnp.asarray(
            np.random.RandomState(1).randn(B2, L) * 0.1, bf16))
        lengths = jnp.full((B2,), L, jnp.int32)
        timeit("hubert.conv_frontend (B=16,bf16)",
               lambda a, p: hubert_mod.conv_frontend(p["frontend"], a),
               audio16, hp)
        timeit("hubert.extract_features FULL (B=16)",
               lambda a, p, l: hubert_mod.extract_features(p, a, l, output_layer=12)[0],
               audio16, hp, lengths)
        feats = hubert_mod.extract_features(hp, audio16, lengths, output_layer=12)[0]
        iv = jax.device_put(jnp.asarray(
            np.random.RandomState(2).randn(10000, 768), bf16))
        timeit("retrieval_blend (B=16,10k rows)",
               lambda f, v: retrieval_blend(f, v, jnp.asarray(0.5, bf16)), feats, iv)

    if which in ("all", "synth"):
        from rvc_maker_tpu.config import preset
        from rvc_maker_tpu.models import synthesizer as syn
        cfg = preset("v2", 48000).model
        sp = jax.device_put(jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, bf16) if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            syn.init_params(jax.random.PRNGKey(2), cfg)))
        B3, T = 16, 1000
        feats = jax.device_put(jnp.asarray(np.random.RandomState(3).randn(B3, T, 768) * 0.1, bf16))
        lens = jnp.full((B3,), T, jnp.int32)
        pitch = jnp.full((B3, T), 128, jnp.int32)
        nsff0 = jnp.full((B3, T), 220.0, jnp.float32)
        sid = jnp.zeros((B3,), jnp.int32)
        zn = jnp.zeros((B3, T, cfg.inter_channels), bf16)
        sn = jnp.zeros((B3, T * cfg.upp, 1), bf16)
        timeit("syn.infer FULL (B=16,T=1000)",
               lambda f: syn.infer(sp, cfg, f, lens, pitch, nsff0, sid, zn, sn)[0],
               feats)
        timeit("syn.text_encoder (B=16,T=1000)",
               lambda f: syn.text_encoder(sp["enc_p"], cfg, f, pitch, lens)[0],
               feats)
        m_p, logs_p, x_mask = syn.text_encoder(sp["enc_p"], cfg, feats, pitch, lens)
        g = jnp.zeros((B3, 1, cfg.gin_channels), bf16)
        z_p = ((m_p + jnp.exp(logs_p) * zn * 0.66666) * x_mask).astype(bf16)
        timeit("syn.flow reverse (B=16,T=1000)",
               lambda z: syn.flow(sp["flow"], z, x_mask, g, reverse=True), z_p)
        z = syn.flow(sp["flow"], z_p, x_mask, g, reverse=True)
        timeit("syn.generator_nsf (B=16,T=1000)",
               lambda zz: syn.generator_nsf(sp["dec"], cfg, zz * x_mask, nsff0, g, sn),
               z)

if __name__ == "__main__":
    main()
