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

    Hard outages are worse: the probe op can HANG indefinitely instead of
    raising (observed 90+ min on 2026-08-19 — it wedged this loop silently
    between jobs). The probe therefore runs in a daemon thread: a probe
    that ERRORS is retried every 15 s and gives up after ``max_wait_s``
    (the job then fails loudly); a probe that HANGS is logged every
    minute and waited out indefinitely — the pending RPC completes when
    the tunnel recovers, running the job would just hang deeper in, and
    restarting the process pays the 7-13 min fresh-tunnel stall. A spare
    probe is launched every 10 min of hang in case the original RPC was
    dropped rather than queued; the first to succeed wins.
    """
    import threading

    import jax.numpy as jnp

    state = {"ok": False, "err": None}

    def probe():
        try:
            float(jnp.ones((8, 8)).sum())
            state["ok"] = True
        except Exception as e:  # noqa: BLE001 — any backend error counts
            state["err"] = e

    t0 = time.time()
    launched = 0
    threads = []
    while not state["ok"]:
        if not any(th.is_alive() for th in threads):
            # No probe in flight: either first iteration or the last
            # probe ERRORED (a finished probe either set ok or err).
            err = state["err"]
            if err is not None:
                if time.time() - t0 > max_wait_s:
                    print(f"[worker] backend still unhealthy after "
                          f"{time.time() - t0:.0f}s: {err}", flush=True)
                    return  # let the job fail loudly rather than hang
                print(f"[worker] backend unhealthy "
                      f"({type(err).__name__}); retrying in 15s",
                      flush=True)
                time.sleep(15)
                state["err"] = None
        elif launched and (time.time() - t0) > 600 * launched:
            # Probes are hanging; add a spare every 10 minutes.
            pass  # falls through to the launch below
        else:
            hung_min = (time.time() - t0) / 60
            if hung_min >= 1:
                print(f"[worker] health probe HANGING {hung_min:.0f} min "
                      "(tunnel outage; waiting for recovery)", flush=True)
            time.sleep(60 if hung_min >= 1 else 5)
            continue
        th = threading.Thread(target=probe, daemon=True)
        th.start()
        threads.append(th)
        launched += 1


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
