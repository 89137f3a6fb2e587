#!/usr/bin/env python
"""Persistent TPU job worker (environment tooling, not framework code).

The axon tunnel stalls 7-13 minutes on the FIRST op of every new process
(CLAUDE.md); afterwards compiles run in 10-40 s. So for iterative TPU work
this worker initializes the backend ONCE and then executes job scripts
in-process from a file queue:

    python tools/tpu_worker.py [queue_dir]        # default /tmp/tpu_jobs

    # submit: drop any python file into the queue
    cp myjob.py /tmp/tpu_jobs/
    # wait for /tmp/tpu_jobs/myjob.done (or .fail); stdout+stderr are in
    # /tmp/tpu_jobs/myjob.out

Each job runs with a FRESH import of the repo's modules (nerfmlp_tpu*/
scripts* are purged from sys.modules first) so edited code takes effect,
while the warmed-up JAX backend carries over. One job at a time — two TPU
programs would serialize behind the tunnel anyway.
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

QUEUE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(QUEUE, exist_ok=True)


def warm():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = float(jnp.ones((8, 8)).sum())
    print(f"[worker] backend warm: {jax.devices()} first op {x:.0f} "
          f"in {time.time() - t0:.1f}s", flush=True)


def wait_healthy(max_wait_s: float = 600.0) -> None:
    """Block until a trivial device op succeeds.

    The tunnel has transient multi-minute outage episodes where every op
    fails with INVALID_ARGUMENT and then recovers in the same process
    (CLAUDE.md r4). Probing here absorbs an outage at job START instead of
    failing the job on its first op.
    """
    import jax.numpy as jnp

    t0 = time.time()
    while True:
        try:
            float(jnp.ones((8, 8)).sum())
            return
        except Exception as e:
            if time.time() - t0 > max_wait_s:
                print(f"[worker] backend still unhealthy after "
                      f"{max_wait_s:.0f}s: {e}", flush=True)
                return  # let the job fail loudly rather than hang forever
            print(f"[worker] backend unhealthy ({type(e).__name__}); "
                  "retrying in 15s", flush=True)
            time.sleep(15)


def purge_repo_modules():
    for name in list(sys.modules):
        if name.split(".")[0] in ("nerfmlp_tpu", "scripts"):
            del sys.modules[name]


def run_job(path: str, orig_name: str) -> None:
    # Markers/outputs carry the ORIGINAL name the submitter dropped in
    # (the running file is renamed to _<name> to dequeue it).
    base = os.path.join(os.path.dirname(path),
                        os.path.splitext(orig_name)[0])
    out_path = base + ".out"
    print(f"[worker] running {os.path.basename(path)}", flush=True)
    t0 = time.time()
    buf = io.StringIO()

    class Tee:
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)
            return len(s)

        def flush(self):
            for st in self.streams:
                st.flush()

    old_out, old_err = sys.stdout, sys.stderr
    old_argv = sys.argv
    ok = True
    interrupted = False
    try:
        purge_repo_modules()
        sys.stdout = Tee(old_out, buf)
        sys.stderr = Tee(old_err, buf)
        sys.argv = [path]
        with open(path) as f:
            code = compile(f.read(), path, "exec")
        exec(code, {"__name__": "__main__", "__file__": path})
    except SystemExit as e:
        ok = (e.code in (None, 0))
        if not ok:
            buf.write(f"\n[worker] SystemExit({e.code})\n")
    except KeyboardInterrupt:
        # Mark the job failed but let Ctrl-C actually STOP the worker —
        # swallowing it here would leave an uninterruptible process
        # stealing queue jobs (the CLAUDE.md ghost-worker hazard).
        ok = False
        interrupted = True
        buf.write("\n[worker] KeyboardInterrupt\n")
    except BaseException:
        ok = False
        traceback.print_exc(file=sys.stdout)
    finally:
        sys.stdout, sys.stderr = old_out, old_err
        sys.argv = old_argv
    dt = time.time() - t0
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
        f.write(f"\n[worker] {'ok' if ok else 'FAIL'} in {dt:.1f}s\n")
    marker = base + (".done" if ok else ".fail")
    with open(marker, "w") as f:
        f.write(f"{dt:.1f}\n")
    print(f"[worker] {'ok' if ok else 'FAIL'} "
          f"{os.path.basename(path)} in {dt:.1f}s", flush=True)
    if interrupted:
        raise KeyboardInterrupt


def main():
    warm()
    print(f"[worker] watching {QUEUE}", flush=True)
    while True:
        jobs = sorted(
            f for f in os.listdir(QUEUE)
            if f.endswith(".py") and not f.startswith("_")
        )
        if not jobs:
            time.sleep(0.5)
            continue
        name = jobs[0]
        src = os.path.join(QUEUE, name)
        run = os.path.join(QUEUE, "_" + name)
        try:
            os.rename(src, run)
        except OSError:
            # Lost the dequeue race (a ghost twin grabbed it — the exact
            # stale-pidfile scenario in CLAUDE.md). Losing a job to the
            # twin is survivable; crashing the healthy worker is not.
            time.sleep(0.5)
            continue
        wait_healthy()
        run_job(run, name)


if __name__ == "__main__":
    main()
