"""Run main.py in resumable chunks to sidestep the remote TPU client's
per-dispatch host-memory leak (~2.8 GB/epoch at the flagship shape —
BENCH_NOTES.md; a 60-epoch 224^2 run gets OOM-killed around epoch 45).

Each chunk is a FRESH process (leak resets); the trainer exits after
--max_epochs_per_process main epochs, writing checkpoints/CHUNK_CONTINUE
next to the resumable net_trained_last. This wrapper re-invokes with
--resume_training until the marker disappears (run complete) or a chunk
fails.

Usage: python scripts/train_chunked.py --chunk_epochs 20 \
           -- --config configs/flagship_200_fast.yaml [more main.py args]
"""

import argparse
import os
import subprocess
import time
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log_dir_of(args_list):
    """Extract --log_dir (CLI wins over YAML, mirroring the parser)."""
    sys.path.insert(0, REPO)
    from count_pipnet_tpu.config import build_parser, _apply_yaml_defaults
    parser = build_parser()
    ns, _ = parser.parse_known_args(args_list)
    if getattr(ns, "config", None):
        _apply_yaml_defaults(parser, ns.config)
        ns, _ = parser.parse_known_args(args_list)
    return ns.log_dir


def _run_watched(cmd, tee_path, stall_timeout, poll_s=15.0):
    """subprocess.call with a stall watchdog: if the run's tee file
    (``tee_path``) stops growing for ``stall_timeout`` seconds while the
    child is alive, the child is wedged on the remote TPU claim — kill
    it and report ``(rc, stalled=True)`` (observed twice: a client that
    starts while the previous chunk's claim lingers futex-waits
    forever, 0% CPU, no output)."""
    child = subprocess.Popen(cmd)
    if stall_timeout <= 0:
        return child.wait(), False
    last_size, last_change = -1, time.time()
    while True:
        try:
            return child.wait(timeout=poll_s), False
        except subprocess.TimeoutExpired:
            pass
        try:
            size = os.path.getsize(tee_path)
        except OSError:
            size = -1
        if size != last_size:
            last_size, last_change = size, time.time()
        elif time.time() - last_change > stall_timeout:
            print(f"[train_chunked] no output for "
                  f"{stall_timeout:.0f}s — killing wedged "
                  f"chunk (pid {child.pid})", flush=True)
            child.kill()
            child.wait()
            return -1, True


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--chunk_epochs", type=int, default=20,
                    help="main epochs per process (leak budget: keep "
                         "chunk * 2.8 GB well under host RAM)")
    ap.add_argument("--max_chunks", type=int, default=50,
                    help="safety bound on re-invocations")
    ap.add_argument("--chunk_cooldown", type=float, default=30.0,
                    help="seconds to wait between chunks: the remote "
                         "TPU claim of an exited chunk can linger, and "
                         "a client started under a live claim wedges "
                         "forever in a futex wait")
    ap.add_argument("--stall_timeout", type=float, default=1200.0,
                    help="kill + retry a chunk whose stdout tee "
                         "(log_dir/out.txt) stops growing for this many "
                         "seconds — the wedged-claim signature; 0 "
                         "disables. Keep above the model's compile+eval "
                         "gap (flagship shape: first step ~6-8 min)")
    ap.add_argument("--stall_retries", type=int, default=2,
                    help="max kill+retry cycles per chunk before "
                         "giving up")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- followed by main.py arguments")
    opts = ap.parse_args(argv)
    rest = opts.rest
    if rest and rest[0] == "--":
        rest = rest[1:]
    if not rest:
        ap.error("pass main.py arguments after --")

    log_dir = log_dir_of(rest)
    marker = os.path.join(log_dir, "checkpoints", "CHUNK_CONTINUE")

    base = [sys.executable, os.path.join(REPO, "main.py"), *rest,
            "--max_epochs_per_process", str(opts.chunk_epochs)]
    tee_path = os.path.join(log_dir, "out.txt")

    def run_watched(cmd):
        return _run_watched(cmd, tee_path, opts.stall_timeout)

    for chunk in range(opts.max_chunks):
        cmd = list(base)
        if chunk > 0 or os.path.exists(marker):
            cmd.append("--resume_training")
        retries = opts.stall_retries
        while True:
            print(f"[train_chunked] chunk {chunk}: {' '.join(cmd)}",
                  flush=True)
            rc, stalled = run_watched(cmd)
            if stalled and retries > 0:
                retries -= 1
                print(f"[train_chunked] retrying chunk {chunk} after "
                      f"cooldown ({retries} retries left)", flush=True)
                time.sleep(max(opts.chunk_cooldown, 60.0))
                if "--resume_training" not in cmd and (
                        os.path.exists(marker) or os.path.isdir(
                            os.path.join(log_dir, "checkpoints"))):
                    cmd.append("--resume_training")
                continue
            break
        if rc != 0:
            print(f"[train_chunked] chunk {chunk} failed rc={rc}",
                  flush=True)
            return rc
        if not os.path.exists(marker):
            print("[train_chunked] run complete", flush=True)
            return 0
        if opts.chunk_cooldown > 0:
            time.sleep(opts.chunk_cooldown)
    print("[train_chunked] max_chunks reached with work remaining",
          flush=True)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
