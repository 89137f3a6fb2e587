#!/usr/bin/env python
"""Probe the TPU backend for the fp32 encode->matmul fusion miscompile.

Found in r3 (docs/RESULTS.md "TPU XLA fp32 fusion miscompile"): jitting
``positional_encoding`` fused into the fp32 ``apply_model`` matmul chain
produces deterministically wrong outputs at >= 2048x64 points on this
TPU backend — max abs error ~248 observed on real models (~1.2 here on
random weights), both fp32 precisions, invisible at smaller shapes,
absent in bf16 and in the Pallas kernel (in-kernel encoding).
``ops/render.py::_query_mlp`` guards every fp32 XLA query with
``jax.lax.optimization_barrier`` on the encoding.

Run this on a new jax/libtpu version: if it prints ABSENT, the upstream
bug is fixed and the barrier (and this script) can be retired. A plain
CPU run prints ABSENT (the miscompile is TPU-specific).
"""

import os
import sys

if __package__ in (None, ""):
    # Run as a file from a checkout (python scripts/train.py): make
    # the repo root importable. As an installed module
    # (nerfmlp_tpu.scripts.*) the package is already on the path and
    # inserting site-packages/nerfmlp_tpu would shadow user modules.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import apply_model, init_model
    from nerfmlp_tpu.ops.encoding import positional_encoding

    cfg = RenderConfig(compute_dtype="float32")
    mc = cfg.model_config()
    params = init_model(jax.random.PRNGKey(0), mc)

    key = jax.random.PRNGKey(1)
    n = 4096 * 64  # 2048x64 was the smallest failing shape observed
    flat = jax.random.uniform(key, (n, 3), jnp.float32, -1.5, 1.5)
    vd = jax.random.normal(jax.random.fold_in(key, 2), (4096, 3), jnp.float32)
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    vde = positional_encoding(vd, 4)
    dirs = jnp.broadcast_to(vde[:, None, :], (4096, 64, 27)).reshape(-1, 27)

    def query(p, f, d):
        # Deliberately WITHOUT the optimization_barrier guard: this is
        # the raw pattern _query_mlp protects against.
        enc = positional_encoding(f, 10)
        return apply_model(p, enc, d, mc, compute_dtype=jnp.float32,
                           fp32_precision="highest")

    ref = query(params, flat, dirs)            # op-by-op (never miscompiles)
    jit = jax.jit(query)(params, flat, dirs)   # fused
    err = float(jnp.abs(ref - jit).max())
    status = "PRESENT" if err > 1e-3 else "ABSENT"
    print(f"fp32 encode->matmul fusion miscompile: {status} "
          f"(jit-vs-eager max abs err {err:.6f} at {n} points, "
          f"backend {jax.default_backend()})")
    return status, err


if __name__ == "__main__":
    main()
