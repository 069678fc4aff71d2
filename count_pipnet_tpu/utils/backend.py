"""Backend-availability helper for the single-claimer remote-TPU setup.

The remote TPU session can be transiently down after an earlier client
dies (backend init raises ``UNAVAILABLE`` for minutes); entry points that
must produce a result (benchmarks, driver compile checks) retry the first
device touch for a bounded window instead of failing outright.
"""

import sys
import time

__all__ = ["wait_for_backend"]


def wait_for_backend(max_wait_s=900, poll_s=30):
    """Return ``jax.devices()``, retrying UNAVAILABLE backend-init errors
    for up to ``max_wait_s`` seconds. Other errors propagate."""
    import jax

    deadline = time.time() + max_wait_s
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or time.time() > deadline:
                raise
            print(f"TPU backend unavailable, retrying "
                  f"({int(deadline - time.time())} s left)...",
                  file=sys.stderr)
            # jax caches the failed backend; clear so the retry re-inits
            jax.extend.backend.clear_backends()
            time.sleep(poll_s)
