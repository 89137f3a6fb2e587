"""Real-TPU validation of the generic-arch fused kernel (r4 late)."""
import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
from nerfmlp_tpu.config import ModelConfig, RenderConfig
from nerfmlp_tpu.models.mlp import init_model, apply_model
from nerfmlp_tpu.ops.encoding import positional_encoding
from nerfmlp_tpu.ops.pallas_mlp import fused_nerf_mlp

print("backend:", jax.default_backend(), flush=True)
print("probe:", float(jnp.ones((8, 8)).sum()), flush=True)

def check(depth, width, skips, n=262144, dtype="bfloat16", prec="highest", tol=3e-2):
    mc = ModelConfig(depth=depth, width=width, skips=skips,
                     bottleneck_ch=width, view_width=width // 2)
    cfg = RenderConfig(depth=depth, width=width, compute_dtype=dtype,
                       fp32_precision=prec, use_pallas=True)
    params = init_model(jax.random.PRNGKey(0), mc)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = positional_encoding(jnp.asarray(d), 4)

    f = jax.jit(lambda p: fused_nerf_mlp(p, pts, dirs, cfg, mc=mc))
    t0 = time.time(); out = f(params); _ = float(out.sum())
    t1 = time.time()
    for _ in range(10):
        out = f(params)
    _ = float(out.sum()); t2 = time.time()
    # correctness vs XLA on-chip at a small slice
    m = 4096
    enc = positional_encoding(pts[:m], cfg.pos_enc_L)
    want = np.asarray(apply_model(params, enc, dirs[:m], mc,
                                  compute_dtype=jnp.float32))
    got = np.asarray(out[:m], np.float32)
    scale = max(np.abs(want).max(), 1e-8)
    err = np.abs(got - want).max() / scale
    # grads compile + run
    g = jax.jit(jax.grad(lambda p: jnp.mean(
        fused_nerf_mlp(p, pts[:65536], dirs[:65536], cfg, mc=mc) ** 2)))(params)
    gsum = float(sum(jnp.sum(jnp.abs(v["kernel"])) for v in g.values()))
    print(f"arch {depth}x{width} skips={skips} dt={dtype}/{prec}: "
          f"compile {t1-t0:.1f}s fwd {(t2-t1)/10*1e3:.2f} ms/{n//1000}k "
          f"err {err:.2e} gsum {gsum:.3e}", flush=True)
    assert err < tol, (depth, width, err)

check(8, 256, (5,))                      # reference arch: perf sentinel
check(10, 256, (5,))                     # deeper CLI arch
check(4, 128, ())                        # shallow, no skip
check(8, 384, (5,))                      # wider
check(3, 200, (0, 2), n=65536)           # unaligned width + skip at 0
check(8, 256, (5,), dtype="float32", prec="high", tol=1e-4)  # hi_lo sentinel
print("ALL OK", flush=True)
