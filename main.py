"""CLI entry point: train a PIP-Net / Count-PIPNet on TPU.

Usage parity with the reference (main.py:498-552):
    python main.py --config configs/count_pipnet_shapes.yaml [--flags...]

stdout is mirrored into <log_dir>/out.txt and stderr into <log_dir>/tqdm.txt
like the reference's Tee; failures print a traceback and exit nonzero.
"""

import os
import sys
import traceback

# The count_pipnet_tpu package honors JAX_PLATFORMS=cpu on import (a
# sitecustomize may override jax_platforms via jax.config, ignoring the
# env var alone) — so a CPU-intended CLI run never contends for the
# single TPU claim.
from count_pipnet_tpu.config import get_args
from count_pipnet_tpu.train.trainer import run_pipnet
from count_pipnet_tpu.utils.log import tee_std_streams

# Persistent XLA compilation cache: chunked/resumed runs (fresh process
# per chunk, scripts/train_chunked.py) and repeated sweep configs reuse
# compiled train/eval steps instead of paying cold compiles each time.
# Set via jax.config, not os.environ: a sitecustomize imports jax at
# interpreter startup and jax captures JAX_COMPILATION_CACHE_DIR at
# import time, so setting the env var here would be a silent no-op
# (same workaround as conftest.py's jax_platforms override).
import jax  # noqa: E402  (already imported transitively above)

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache")))
# Default threshold (~1s min compile time) skips the short compiles of
# CPU dryrun/chunked smoke runs; lower both so they are cached too.
jax.config.update("jax_persistent_cache_min_compile_time_secs", float(
    os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", int(
    os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")))


def main():
    # Multi-host runs (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID set): connect the process group before any device
    # access; no-op for plain single-process runs.
    from count_pipnet_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()
    args = get_args()
    os.makedirs(args.log_dir, exist_ok=True)
    # multi-host: per-process tee files so N processes never interleave
    # writes into one shared out.txt (process 0 keeps the plain names)
    suffix = ""
    if os.environ.get("JAX_NUM_PROCESSES", "1") not in ("", "1"):
        import jax
        if jax.process_index() != 0:
            suffix = f".proc{jax.process_index()}"
    # resumed/chunked runs append so the first chunk's history survives
    restore = tee_std_streams(args.log_dir, suffix,
                              append=getattr(args, "resume_training",
                                             False))
    try:
        run_pipnet(args)
    except Exception as e:
        print(f"Error: {e}")
        traceback.print_exc()
        raise
    finally:
        restore()


if __name__ == "__main__":
    main()
