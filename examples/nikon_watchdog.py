"""Stall-watchdog driver for the Nikon exp2 convergence run.

The axon tunnel's remote services occasionally wedge a device call
indefinitely (PERF.md round-4/5 failure modes: worker crash, HTTP 500,
dropped response body, and round-5's silent 20-minute stall at iter 7
with the whole host idle).  DesignProblem.optimize checkpoints every 10
iters (utils/elastic.CheckpointedLoop), so the cheap cure is an
external watchdog: kill the run when its log stops moving and restart
it — it resumes from the last checkpoint with warm compile caches.

Run: python examples/nikon_watchdog.py [--iters 140 --spp 256 --res 40]
"""
import argparse
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=140)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--res", type=int, default=40)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--log", default="/tmp/nikon_watchdog.log")
    ap.add_argument("--stall-secs", type=int, default=2400,
                    help="log-silence kill threshold during setup/"
                         "compile phases (must exceed the longest "
                         "remote compile)")
    ap.add_argument("--iter-stall-secs", type=int, default=480,
                    help="tighter threshold once iterations are "
                         "flowing (per-iter work is ~2 min and fully "
                         "compiled, so long silence = tunnel wedge)")
    ap.add_argument("--max-attempts", type=int, default=30)
    args = ap.parse_args()

    cmd = [sys.executable, os.path.join(HERE, "nikon_asph_recovery.py"),
           "--iters", str(args.iters), "--spp", str(args.spp),
           "--res", str(args.res), "--lr", str(args.lr)]
    for attempt in range(1, args.max_attempts + 1):
        with open(args.log, "a") as lf:
            lf.write(f"\n==== attempt {attempt}: {' '.join(cmd)}\n")
            lf.flush()
            # new process group so the kill reaches python's children
            proc = subprocess.Popen(cmd, stdout=lf, stderr=lf,
                                    start_new_session=True)
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/jax_cache")

        def activity():
            # log growth OR a finished remote compile landing in the
            # persistent cache both count as liveness — a sequence of
            # ~10-min compiles is silent in the log but not in the cache
            sig = os.path.getsize(args.log)
            try:
                mt = max((os.path.getmtime(os.path.join(cache_dir, f))
                          for f in os.listdir(cache_dir)), default=0.0)
            except OSError:
                mt = 0.0
            return (sig, int(mt))

        last_sig = None
        last_move = time.time()
        while True:
            time.sleep(30)
            rc = proc.poll()
            if rc is not None:
                break
            sig = activity()
            if sig != last_sig:
                last_sig = sig
                last_move = time.time()
                continue
            # adaptive: once the optimizer is printing iterations the
            # compiled steps take ~2 min, so silence means a wedge
            with open(args.log, "rb") as lf2:
                lf2.seek(max(0, os.path.getsize(args.log) - 4096))
                tail = lf2.read().decode("utf-8", "ignore")
            seg = tail.rsplit("==== attempt", 1)[-1]
            # tight threshold only once THIS attempt printed an iter:
            # the first post-resume step may legitimately hit a cold
            # compile cache (round-5 livelock: a tight threshold there
            # kept killing ~10-min remote compiles forever)
            in_iters = "\niter " in seg
            thresh = args.iter_stall_secs if in_iters else args.stall_secs
            if time.time() - last_move > thresh:
                with open(args.log, "a") as lf:
                    lf.write(f"==== watchdog: stalled {thresh}s, "
                             f"killing pg {proc.pid}\n")
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                rc = "stalled"
                break
        if rc == 0:
            with open(args.log, "a") as lf:
                lf.write("==== watchdog: run completed\n")
            return 0
        # else: restart; CheckpointedLoop resumes from the last save
    print("watchdog: attempts exhausted", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
