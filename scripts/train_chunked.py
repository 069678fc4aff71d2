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


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--chunk_epochs", type=int, default=20,
                    help="main epochs per process (leak budget: keep "
                         "chunk * 2.8 GB well under host RAM)")
    ap.add_argument("--max_chunks", type=int, default=50,
                    help="safety bound on re-invocations")
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
    for chunk in range(opts.max_chunks):
        cmd = list(base)
        if chunk > 0 or os.path.exists(marker):
            cmd.append("--resume_training")
        print(f"[train_chunked] chunk {chunk}: {' '.join(cmd)}",
              flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"[train_chunked] chunk {chunk} failed rc={rc}",
                  flush=True)
            return rc
        if not os.path.exists(marker):
            print("[train_chunked] run complete", flush=True)
            return 0
    print("[train_chunked] max_chunks reached with work remaining",
          flush=True)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
