"""Follow-up: hi_lo check with a MISCOMPILE-GUARDED oracle (the r3-documented
fp32 encode-fusion bug poisoned the first run's reference at m=4096), plus
the no-viewdirs head variant on-chip."""
import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
from nerfmlp_tpu.config import ModelConfig, RenderConfig
from nerfmlp_tpu.models.mlp import init_model, apply_model
from nerfmlp_tpu.ops.encoding import positional_encoding
from nerfmlp_tpu.ops.pallas_mlp import fused_nerf_mlp

print("probe:", float(jnp.ones((8, 8)).sum()), flush=True)
mc = ModelConfig()
cfg = RenderConfig(compute_dtype="float32", fp32_precision="high",
                   use_pallas=True)
params = init_model(jax.random.PRNGKey(0), mc)
rng = np.random.default_rng(0)
n = 65536
pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
dirs = positional_encoding(jnp.asarray(d), 4)

out = fused_nerf_mlp(params, pts, dirs, cfg, mc=mc)
m = 4096
enc = jax.lax.optimization_barrier(positional_encoding(pts[:m], cfg.pos_enc_L))
want = np.asarray(apply_model(params, enc, dirs[:m], mc,
                              compute_dtype=jnp.float32))
got = np.asarray(out[:m], np.float32)
err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-8)
print(f"hi_lo vs BARRIERED xla-highest oracle: err {err:.2e}", flush=True)
assert err < 2e-4, err

# no-viewdirs single-head variant on-chip (bf16): compile + finite + grads
mc2 = ModelConfig(use_viewdirs=False)
cfg2 = RenderConfig(use_viewdirs=False, compute_dtype="bfloat16",
                    use_pallas=True)
p2 = init_model(jax.random.PRNGKey(1), mc2)
t0 = time.time()
o2 = fused_nerf_mlp(p2, pts, None, cfg2, mc=mc2)
s = float(o2.sum()); t1 = time.time()
g = jax.jit(jax.grad(lambda p: jnp.mean(
    fused_nerf_mlp(p, pts[:16384], None, cfg2, mc=mc2) ** 2)))(p2)
gs = float(sum(jnp.sum(jnp.abs(v["kernel"])) for v in g.values()))
enc2 = jnp.asarray(positional_encoding(pts[:1024], cfg2.pos_enc_L))
want2 = np.asarray(apply_model(p2, enc2, None, mc2, compute_dtype=jnp.float32))
err2 = np.abs(np.asarray(o2[:1024], np.float32) - want2).max() / np.abs(want2).max()
print(f"no-viewdirs: compile {t1-t0:.1f}s sum {s:.3e} gsum {gs:.3e} "
      f"err {err2:.2e}", flush=True)
assert np.isfinite(s) and gs > 0 and err2 < 3e-2
print("ALL OK", flush=True)
