"""Multi-host data parallelism: a real 2-process x 4-device CPU cluster.

Exercises count_pipnet_tpu/parallel/distributed.py end-to-end —
jax.distributed.initialize over a localhost coordinator, a global 8-device
mesh spanning both processes, host-local batch feeding via
make_array_from_process_local_data, and a cross-process collective whose
value must agree between processes and match the analytic result
(asserted inside tests/multihost_worker.py).

The reference has no distributed backend (nn.DataParallel only,
reference main.py:75,118); this is the SURVEY.md §5 DCN story.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONSTARTUP", None)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "JAX_COMPILATION_CACHE_DIR":
                os.path.join(REPO, ".jax_cache"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    vals, losses = [], []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("PSUM=")]
        assert lines, f"no PSUM line in:\n{out}"
        vals.append(lines[-1])
        step = [l for l in out.splitlines()
                if l.startswith("dryrun_multichip(8): OK")]
        assert step, f"no train-step line in:\n{out}"
        losses.append(step[-1])
    assert vals[0] == vals[1], vals
    # the training loss must be bit-identical on both hosts (replicated
    # params + all-reduced gradients)
    assert losses[0] == losses[1], losses


@pytest.mark.slow
def test_two_process_full_trainer(tmp_path):
    """The COMPLETE CLI training run as a 2-process x 2-device cluster:
    is_main gating (single writer for checkpoints/CSV/viz), per-process
    tee files, the pre-reload barrier, and bit-identical replicated
    state (the final scoring sheet must agree across processes)."""
    import shutil

    gen = subprocess.run(
        [sys.executable, "-m", "count_pipnet_tpu.data.generate_shapes",
         "--output_dir", str(tmp_path / "data/geometric_shapes/dataset"),
         "--img_size", "32", "--train_samples_per_class", "4",
         "--test_samples_per_class", "2", "--seed", "0"],
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO + os.pathsep +
             os.environ.get("PYTHONPATH", "")},
        cwd=tmp_path, capture_output=True, text=True, timeout=120)
    assert gen.returncode == 0, gen.stdout + gen.stderr

    # Warm the persistent compile cache with a single-process run of the
    # SAME config first: in the 2-process cluster the workers meet in
    # Gloo collectives with a ~30 s handshake timeout, and on this
    # 1-core box a cold XLA compile skews the processes far past it
    # (observed flaking under load). With a warm cache both workers
    # reach the collective within seconds.
    warm_env = dict(os.environ)
    warm_env.pop("PYTHONSTARTUP", None)
    warm_env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, ".jax_cache"),
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    })
    warm = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "--dataset", "geometric_shapes", "--model", "count_pipnet",
         "--image_size", "32", "--net", "convnext_tiny_26",
         "--use_mid_layers", "--num_stages", "1",
         "--num_features", "8", "--max_count", "3",
         "--use_ste", "True", "--intermediate_layer", "onehot",
         "--batch_size", "4", "--batch_size_pretrain", "4",
         "--epochs", "2", "--epochs_pretrain", "1",
         "--epochs_finetune", "0", "--freeze_epochs", "0",
         "--lr", "0.01", "--lr_block", "0.001", "--lr_net", "0.001",
         "--num_workers", "0", "--seed", "1", "--dtype", "float32",
         "--tanh_loss_coeff", "0.1", "--disable_pretrained",
         "--log_dir", str(tmp_path / "runs/warm")],
        env=warm_env, cwd=tmp_path, capture_output=True, text=True,
        timeout=540)
    assert warm.returncode == 0, warm.stdout[-3000:]

    log_dir = tmp_path / "runs/mh"

    def launch_cluster():
        port = _free_port()
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("PYTHONSTARTUP", None)
            env.update({
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "JAX_COMPILATION_CACHE_DIR":
                    os.path.join(REPO, ".jax_cache"),
                "PYTHONPATH": REPO + os.pathsep +
                    env.get("PYTHONPATH", ""),
            })
            procs.append(subprocess.Popen(
                [sys.executable, os.path.join(REPO, "main.py"),
                 "--dataset", "geometric_shapes", "--model",
                 "count_pipnet",
                 "--image_size", "32", "--net", "convnext_tiny_26",
                 "--use_mid_layers", "--num_stages", "1",
                 "--num_features", "8", "--max_count", "3",
                 "--use_ste", "True", "--intermediate_layer", "onehot",
                 "--batch_size", "4", "--batch_size_pretrain", "4",
                 "--epochs", "2", "--epochs_pretrain", "1",
                 "--epochs_finetune", "0", "--freeze_epochs", "0",
                 "--lr", "0.01", "--lr_block", "0.001",
                 "--lr_net", "0.001",
                 "--num_workers", "0", "--seed", "1",
                 "--dtype", "float32",
                 "--tanh_loss_coeff", "0.1", "--disable_pretrained",
                 "--log_dir", str(log_dir)],
                env=env, cwd=tmp_path,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=540)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("full-trainer worker timed out")
            outs.append(out)
        return procs, outs

    # Even with the warm cache, the Gloo handshake windows can be blown
    # when the WHOLE suite (plus anything else on this 1-core box)
    # contends for the core — observed as a sporadic nonzero worker exit
    # that never reproduces alone. One retry with a fresh coordinator
    # port keeps the test meaningful without making it load-sensitive.
    procs, outs = launch_cluster()
    if any(p.returncode != 0 for p in procs):
        shutil.rmtree(log_dir, ignore_errors=True)
        procs, outs = launch_cluster()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"

    # replicated state: the learned scoring sheet agrees byte-for-byte
    def sheet(out):
        return [l for l in out.splitlines() if "relevant prototypes" in l]
    assert sheet(outs[0]) and sheet(outs[0]) == sheet(outs[1])
    for out in outs:
        assert "Loaded best model" in out

    # single-writer artifacts + per-process tee files
    for role in ("net_pretrained", "net_trained", "net_best",
                 "net_trained_last"):
        assert (log_dir / "checkpoints" / role).exists(), role
    assert (log_dir / "out.txt").exists()
    assert (log_dir / "out.txt.proc1").exists()
    csv_lines = (log_dir / "log_epoch_overview.csv").read_text() \
        .strip().splitlines()
    assert len(csv_lines) == 4  # header + 1 pretrain + 2 main epochs
    shutil.rmtree(log_dir, ignore_errors=True)
