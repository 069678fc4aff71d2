"""ServingEngine: request batching, padding ladder, deadline flush,
result routing, error propagation (CPU, tiny shapes)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.serving import ServingEngine, autotune_batch_size

SHAPE = (8, 8, 3)


@jax.jit
def _toy_infer(x):
    # per-image deterministic function of the input: mean per channel
    # and a fake "logit" vector
    m = jnp.mean(x, axis=(1, 2))
    return m, m.sum(axis=-1, keepdims=True) * 2.0


def _direct(img):
    m, s = _toy_infer(jnp.asarray(img[None]))
    return np.asarray(m[0]), np.asarray(s[0])


def test_results_routed_to_correct_requests():
    rng = np.random.default_rng(0)
    imgs = [rng.normal(size=SHAPE).astype(np.float32) for _ in range(11)]
    with ServingEngine(_toy_infer, SHAPE, batch_sizes=(4, 8),
                       max_wait_ms=5.0) as eng:
        futs = eng.submit_many(imgs)
        results = [f.result(timeout=30) for f in futs]
    for img, (m, s) in zip(imgs, results):
        m_ref, s_ref = _direct(img)
        np.testing.assert_allclose(m, m_ref, rtol=1e-6)
        np.testing.assert_allclose(s, s_ref, rtol=1e-6)


def test_padding_ladder_and_stats():
    rng = np.random.default_rng(1)
    # generous deadline: all 3 submits must land in ONE collect window
    # even on a loaded box, so the batch/padded-slot counts are exact
    with ServingEngine(_toy_infer, SHAPE, batch_sizes=(4, 8),
                       max_wait_ms=250.0) as eng:
        futs = eng.submit_many(
            rng.normal(size=(3,) + SHAPE).astype(np.float32))
        [f.result(timeout=30) for f in futs]
        # let the drainer update stats
        time.sleep(0.1)
        st = eng.stats()
    assert st["requests"] == 3
    assert st["batches"] == 1
    # 3 requests -> ladder size 4 -> 1 padded slot
    assert st["padded_slots"] == 1
    assert "latency_ms_p50" in st and "latency_ms_p99" in st


def test_deadline_flush_partial_batch():
    rng = np.random.default_rng(2)
    img = rng.normal(size=SHAPE).astype(np.float32)
    with ServingEngine(_toy_infer, SHAPE, batch_sizes=(16,),
                       max_wait_ms=20.0) as eng:
        fut = eng.submit(img)
        # a single request must resolve via the deadline, well before
        # any 16-batch could fill (no other submitters exist)
        m, s = fut.result(timeout=30)
    m_ref, s_ref = _direct(img)
    np.testing.assert_allclose(m, m_ref, rtol=1e-6)
    np.testing.assert_allclose(s, s_ref, rtol=1e-6)


def test_wrong_shape_rejected():
    with ServingEngine(_toy_infer, SHAPE) as eng:
        with pytest.raises(ValueError):
            eng.submit(np.zeros((4, 4, 3), np.float32))


def test_infer_error_propagates():
    def bad_infer(x):
        raise RuntimeError("boom")

    with ServingEngine(bad_infer, SHAPE, batch_sizes=(1,),
                       max_wait_ms=1.0) as eng:
        fut = eng.submit(np.zeros(SHAPE, np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=30)


def test_stop_flushes_pending():
    rng = np.random.default_rng(3)
    eng = ServingEngine(_toy_infer, SHAPE, batch_sizes=(64,),
                        max_wait_ms=10_000.0).start()
    futs = eng.submit_many(
        rng.normal(size=(5,) + SHAPE).astype(np.float32))
    eng.stop()  # must flush the never-full, never-aged batch
    for f in futs:
        m, s = f.result(timeout=30)
        assert np.isfinite(m).all()


def test_autotune_returns_best():
    out = autotune_batch_size(_toy_infer, SHAPE, candidates=(2, 4),
                              iters=2)
    assert out["best"] in (2, 4)
    assert set(out["throughput"]) == {2, 4}


def test_submit_after_stop_raises():
    eng = ServingEngine(_toy_infer, SHAPE)
    with pytest.raises(RuntimeError):
        eng.submit(np.zeros(SHAPE, np.float32))  # never started
    eng.start()
    eng.stop()
    with pytest.raises(RuntimeError):
        eng.submit(np.zeros(SHAPE, np.float32))  # stopped


def test_latency_history_bounded():
    eng = ServingEngine(_toy_infer, SHAPE)
    assert eng._stats["latencies_ms"].maxlen == 10000
