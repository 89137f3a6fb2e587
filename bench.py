"""Benchmarks on one TPU chip.

Default mode prints ONE JSON line — the headline training-throughput
metric (the driver records it):
  {"metric": "train_rays_per_sec_per_chip", "value": ..., ...}

Config mirrors the reference's flagship workload (scripts/train.py
defaults): batch 1024 rays/step, 64 coarse + 128 importance samples (256
MLP evals per ray), coarse+fine hierarchical rendering, Adam. Baseline:
the reference's best published wall-time implies ~7.1k train rays/s on an
M3 Pro (BASELINE.md "derived throughput"; band 1.9k-7.1k).

``--full`` reproduces the whole RESULTS.md table from one command: train
throughput for bf16+pallas / bf16 XLA / fp32 XLA / occupancy-grid
sampling, 800x800 render seconds-per-frame (bf16 + fp32), and an 8-fake-
device multichip dry-run (subprocess on the CPU platform). Rows stream as
JSON lines and are also written to bench_full.json.

NOTE: timings force a device->host readback of the final result because
the axon tunnel's block_until_ready does not actually block.
"""

import argparse
import dataclasses
import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 7100.0  # BASELINE.md derived-throughput upper band
V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip


def _evals_per_ray(rc) -> int:
    """MLP queries actually executed per ray by ops/render.py.

    Occupancy path: no coarse MLP pass, N_samples+N_importance merged
    queries (render.py occupancy branch). Shared-net hierarchical: coarse
    N_samples + only the N_importance NEW fine depths (the r3 coarse-reuse
    merge, render.py:315-330). separate_fine re-queries all depths like
    the official TF scheme (render.py:331-340)."""
    if rc.separate_fine:
        return 2 * rc.N_samples + rc.N_importance
    return rc.N_samples + rc.N_importance


def _flops_per_query(rc) -> float:
    """Matmul FLOPs of ONE network query (2 x weight elements).

    Matmul-only lower bound: the in-kernel encode (trig) and compositing
    (VPU) are excluded, so reported MFU slightly UNDERSTATES utilization.
    Useful-work convention: in fp32-high (bf16x3) mode the device runs 3
    bf16 passes per logical matmul but only the logical FLOPs count."""
    from nerfmlp_tpu.ops.pallas_mlp import _weight_elems

    return 2.0 * _weight_elems(rc.model_config())


def _train_mfu_pct(rc, rays_per_sec: float) -> float:
    """Model FLOPs utilization of the training step (docs/RESULTS.md
    speed-of-light model, machine-checked per VERDICT r4): forward +
    backward = 3x forward FLOPs (the recompute inside the backward kernel
    is NOT counted as useful work), over the v5e bf16 peak."""
    return 100.0 * (
        3.0 * _flops_per_query(rc) * _evals_per_ray(rc) * rays_per_sec
    ) / V5E_PEAK_FLOPS


def _render_mfu_pct(rc, sec_per_frame: float, wh: int = 800) -> float:
    """MFU of whole-frame rendering (forward only)."""
    return 100.0 * (
        _flops_per_query(rc) * _evals_per_ray(rc) * wh * wh / sec_per_frame
    ) / V5E_PEAK_FLOPS


def _train_throughput(rc, batch: int, iters: int = 100) -> float:
    """Compile + time the full jitted train step; returns rays/s."""
    import jax.numpy as jnp

    from nerfmlp_tpu.config import TrainConfig
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

    tc = TrainConfig(batch_size=batch)
    state = create_train_state(rc, tc)
    step = make_train_step(rc, tc)

    rng = np.random.default_rng(0)
    b = rng.normal(size=(batch, 9)).astype(np.float32)
    b[:, 5] = -1.0
    b[:, 6:9] = np.abs(b[:, 6:9]) % 1.0
    b = jnp.asarray(b)

    occ_args = ()
    occ_refresh = None
    if rc.use_occupancy:
        import jax

        from nerfmlp_tpu.ops.occupancy import create_grid, update_grid

        occ_refresh = jax.jit(
            lambda g, p, r, dec: update_grid(g, p, rc, r, decay=dec)
        )
        grid = occ_refresh(
            create_grid(rc.occ_grid_size), state.params,
            jax.random.PRNGKey(1), 0.0,
        )
        occ_args = (grid,)

    for _ in range(3):
        state, m = step(state, b, *occ_args)
    _ = float(m["loss"])

    t0 = time.time()
    for i in range(iters):
        if occ_refresh is not None and i % rc.occ_update_every == 0:
            # Pay the periodic grid refresh like real training does
            # (Trainer refreshes every occ_update_every steps) — without
            # it the occupancy row overstates steady-state throughput.
            occ_args = (occ_refresh(
                occ_args[0], state.params, jax.random.PRNGKey(i), 0.95,
            ),)
        state, m = step(state, b, *occ_args)
    _ = float(m["loss"])  # forces completion through the tunnel
    return batch / ((time.time() - t0) / iters)


def _render_seconds(rc, wh: int = 800, n: int = 3) -> float:
    """Whole-frame render wall time (s/frame) at wh x wh."""
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.rays import get_rays_np, pose_spherical
    from nerfmlp_tpu.ops.render import render_image

    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    o, d = get_rays_np(wh, wh, wh * 1.39, pose_spherical(30.0, -30.0, 4.0))
    o = jnp.asarray(o.reshape(-1, 3).copy())
    d = jnp.asarray(d.reshape(-1, 3))

    occ_grid = None
    if rc.use_occupancy:
        from nerfmlp_tpu.ops.occupancy import build_grid

        occ_grid = build_grid(params, rc, jax.random.PRNGKey(1),
                              resolution=rc.occ_grid_size)

    img = render_image(params, o, d, wh, wh, rc, occ_grid=occ_grid)  # warmup
    _ = float(img[0, 0, 0])
    t0 = time.time()
    for _ in range(n):
        img = render_image(params, o, d, wh, wh, rc, occ_grid=occ_grid)
        _ = float(img[0, 0, 0])
    return (time.time() - t0) / n


def _multichip_dryrun_ok() -> bool:
    """Run the 8-fake-device dry run in a CPU-platform subprocess (never
    inside this process: XLA_FLAGS is parsed once and the TPU is busy)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=1200,
        )
        ok = r.returncode == 0 and "occupancy-grid step" in r.stdout
        if not ok:
            print(f"(multichip dryrun failed, rc={r.returncode})\n"
                  f"{r.stderr[-2000:]}", file=sys.stderr, flush=True)
        return ok
    except Exception as e:
        print(f"(multichip dryrun errored: {e})", file=sys.stderr, flush=True)
        return False


def _row(metric, value, unit, vs=None, mfu=None):
    """Progress rows go to STDERR: stdout carries exactly ONE JSON line in
    every mode (the driver contract — see CLAUDE.md conventions)."""
    import sys

    row = {"metric": metric, "value": round(value, 3), "unit": unit}
    if vs is not None:
        row["vs_baseline"] = round(vs, 2)
    if mfu is not None:
        row["mfu_pct"] = round(mfu, 1)
    print(json.dumps(row), file=sys.stderr, flush=True)
    return row


def _wait_for_backend(max_wait_s: float) -> None:
    """Retry the first device op through transient tunnel outages.

    Two observed failure modes (CLAUDE.md): a fresh process fails FAST
    with "Unable to initialize backend 'axon': UNAVAILABLE" while the
    tunnel process is gone (cheap to retry), or the first op hangs (the
    timeout bounding this whole script covers that). Retrying here keeps
    a round-end bench from recording a failure for a blip that heals in
    a minute; a persistent outage still fails loudly after the budget.
    """
    import os
    import sys

    max_wait_s = float(os.environ.get("BENCH_TUNNEL_WAIT_S", max_wait_s))
    t0 = time.time()
    while True:
        try:
            import jax.numpy as jnp

            float(jnp.ones((4, 4)).sum())
            return
        except Exception as e:  # noqa: BLE001 — any backend error
            waited = time.time() - t0
            if waited > max_wait_s:
                raise
            print(f"backend unavailable ({type(e).__name__}) after "
                  f"{waited:.0f}s; retrying in 30s", file=sys.stderr,
                  flush=True)
            time.sleep(30)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="emit the whole RESULTS.md row set (slow)")
    args = p.parse_args()
    _wait_for_backend(max_wait_s=600.0)

    from nerfmlp_tpu.config import RenderConfig

    flagship = dict(N_samples=64, N_importance=128, near=2.0, far=6.0,
                    perturb=True)
    bf16_pallas = RenderConfig(
        **flagship, compute_dtype="bfloat16", use_pallas=True
    )

    if not args.full:
        rays = _train_throughput(bf16_pallas, batch=1024)
        print(json.dumps({
            "metric": "train_rays_per_sec_per_chip",
            "value": round(rays, 1),
            "unit": "rays/s (batch 1024, 64+128 samples, bf16 compute)",
            "vs_baseline": round(rays / BASELINE_RAYS_PER_SEC, 2),
            "train_mfu_pct": round(_train_mfu_pct(bf16_pallas, rays), 1),
        }))
        return

    rows = []
    # The CPU-subprocess dry run goes FIRST: once this process touches the
    # TPU it holds the tunnel, and two TPU processes serialize.
    rows.append(_row("multichip_dryrun_8dev_ok",
                     float(_multichip_dryrun_ok()), "bool"))

    r = _train_throughput(bf16_pallas, batch=1024)
    rows.append(_row("train_bf16_pallas", r, "rays/s (batch 1024, 64+128)",
                     r / BASELINE_RAYS_PER_SEC,
                     mfu=_train_mfu_pct(bf16_pallas, r)))
    r = _train_throughput(
        RenderConfig(**flagship, compute_dtype="bfloat16"), batch=1024
    )
    rows.append(_row("train_bf16_xla", r, "rays/s (batch 1024, 64+128)",
                     r / BASELINE_RAYS_PER_SEC))
    r = _train_throughput(RenderConfig(**flagship), batch=1024)
    rows.append(_row("train_fp32_xla", r, "rays/s (batch 1024, 64+128)",
                     r / BASELINE_RAYS_PER_SEC))
    fp32h = RenderConfig(**flagship, compute_dtype="float32",
                         fp32_precision="high", use_pallas=True)
    r = _train_throughput(fp32h, batch=1024)
    rows.append(_row("train_fp32_high_pallas", r,
                     "rays/s (batch 1024, 64+128, bf16x3 in-kernel)",
                     r / BASELINE_RAYS_PER_SEC,
                     mfu=_train_mfu_pct(fp32h, r)))
    occ = RenderConfig(
        N_samples=16, N_importance=48, near=2.0, far=6.0, perturb=True,
        compute_dtype="bfloat16", use_pallas=True, use_occupancy=True,
        aabb=(-1.3, -1.3, -1.3, 1.3, 1.3, 1.3),
    )
    r = _train_throughput(occ, batch=1024)
    rows.append(_row("train_occupancy_16_48", r, "rays/s (batch 1024, occ grid)",
                     r / BASELINE_RAYS_PER_SEC))
    # Max-throughput bf16 recipe (r4 A/B: occ_dense_samples 128->64 is
    # quality-neutral in bf16, -0.08 dB; docs/RESULTS.md tuning table).
    occ_turbo = dataclasses.replace(occ, occ_dense_samples=64)
    r = _train_throughput(occ_turbo, batch=1024)
    rows.append(_row("train_occupancy_16_48_d64", r,
                     "rays/s (batch 1024, occ grid, 64 dense depths)",
                     r / BASELINE_RAYS_PER_SEC))
    # Parity-grade fast path (r4-certified, docs/RESULTS.md): occupancy
    # sampling through the bf16x3 in-kernel fp32-high matmuls.
    occ_fp32 = RenderConfig(
        N_samples=16, N_importance=48, near=2.0, far=6.0, perturb=True,
        compute_dtype="float32", fp32_precision="high", use_pallas=True,
        use_occupancy=True, aabb=(-1.3, -1.3, -1.3, 1.3, 1.3, 1.3),
    )
    r = _train_throughput(occ_fp32, batch=1024)
    rows.append(_row("train_fp32_high_occupancy_16_48", r,
                     "rays/s (batch 1024, occ grid, bf16x3 in-kernel)",
                     r / BASELINE_RAYS_PER_SEC))

    rc_render = RenderConfig(
        N_samples=64, N_importance=128, near=2.0, far=6.0, perturb=False,
        compute_dtype="bfloat16", use_pallas=True,
    )
    s = _render_seconds(rc_render)
    rows.append(_row("render_800px_bf16_pallas", s, "s/frame (800x800, 64+128)",
                     mfu=_render_mfu_pct(rc_render, s)))
    s = _render_seconds(RenderConfig(
        N_samples=64, N_importance=128, near=2.0, far=6.0, perturb=False,
    ))
    rows.append(_row("render_800px_fp32_xla", s, "s/frame (800x800, 64+128)"))
    # The recommended eval recipe (docs/RESULTS.md): fp32-grade renders at
    # a fraction of HIGHEST's cost, now through the bf16x3 fused kernel.
    s = _render_seconds(RenderConfig(
        N_samples=64, N_importance=128, near=2.0, far=6.0, perturb=False,
        compute_dtype="float32", fp32_precision="high", use_pallas=True,
    ))
    rows.append(_row("render_800px_fp32_high_pallas", s,
                     "s/frame (800x800, 64+128, bf16x3 in-kernel)"))
    # Inference-side occupancy (render_example/eval/render_video
    # --use_occupancy): grid-guided sampling at the occ-train budget.
    s = _render_seconds(RenderConfig(
        N_samples=16, N_importance=48, near=2.0, far=6.0, perturb=False,
        compute_dtype="bfloat16", use_pallas=True, use_occupancy=True,
        aabb=(-1.3, -1.3, -1.3, 1.3, 1.3, 1.3),
    ))
    rows.append(_row("render_800px_occupancy_16_48", s,
                     "s/frame (800x800, occ grid)"))

    rows.append(_golden_lego_row())

    with open("bench_full.json", "w") as f:
        json.dump(rows, f, indent=2)
    _emit_full_head(rows)


def _golden_lego_row() -> dict:
    """Golden-Lego readiness row: records every round whether the north
    star's real-data parity check could fire (skips while the Lego assets
    are not mounted; value = max per-view delta dB when it runs, -1 when
    skipped). MUST NOT write to stdout — bench's stdout carries exactly
    ONE JSON line (driver contract); the harness's own prints (including
    its report JSON) are routed to stderr."""
    import contextlib
    import sys as _sys

    try:
        from scripts.golden_lego import find_inputs, main as golden_main

        datadir, weights = find_inputs()
        if datadir is None or weights is None:
            return _row("golden_lego_max_delta_db", -1.0,
                        "dB (skipped: lego assets not mounted)")
        with contextlib.redirect_stdout(_sys.stderr):
            rep = golden_main(["--out", "outputs/golden_lego.json",
                               "--img_wh", "400", "400",
                               "--max_views", "3"])
        if "max_delta_db" in rep:
            return _row(
                "golden_lego_max_delta_db",
                float(rep["max_delta_db"]),
                f"dB (status {rep.get('status')}, "
                f"{rep.get('n_views', 0)} views at 400px)",
            )
        # Assets mounted but /root/reference absent: our renders ran, no
        # torch baseline to delta against — distinct from the
        # assets-missing skip above.
        return _row(
            "golden_lego_max_delta_db", -1.0,
            f"dB (no torch reference for comparison; "
            f"ours-vs-gt mean {rep.get('mean_psnr_ours_vs_gt')})",
        )
    except Exception as e:
        print(f"(golden lego row errored: {e})", file=_sys.stderr)
        return _row("golden_lego_max_delta_db", -1.0, "dB (error)")


def _emit_full_head(rows: list) -> None:
    # The single stdout JSON line (same schema as the default mode), with
    # the full row set attached; per-row progress went to stderr.
    head = next(r for r in rows if r["metric"] == "train_bf16_pallas")
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": head["value"],
        "unit": "rays/s (batch 1024, 64+128 samples, bf16 compute)",
        "vs_baseline": head.get("vs_baseline"),
        "full_rows": "bench_full.json",
    }
    if "mfu_pct" in head:
        out["train_mfu_pct"] = head["mfu_pct"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
