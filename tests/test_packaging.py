"""Guard against .gitignore swallowing package sources.

Round-1 advisor finding: an unanchored ``data/`` ignore rule silently
excluded ``count_pipnet_tpu/data/device_augment.py`` from git, so a fresh
clone of HEAD failed at import. This test asserts every ``.py`` file under
the package, tests, and repo-root entry points is tracked by git.
"""
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_all_package_sources_are_tracked():
    tracked = set(
        subprocess.run(
            ["git", "ls-files"], cwd=REPO, capture_output=True, text=True, check=True
        ).stdout.splitlines()
    )
    missing = []
    for sub in ("count_pipnet_tpu", "tests", "notebooks", "scripts"):
        root = REPO / sub
        if not root.exists():
            continue
        for p in root.rglob("*.py"):
            rel = p.relative_to(REPO).as_posix()
            if "__pycache__" in rel:
                continue
            if rel not in tracked:
                missing.append(rel)
    for name in ("main.py", "bench.py", "run_multiple_configs.py", "__graft_entry__.py"):
        if (REPO / name).exists() and name not in tracked:
            missing.append(name)
    assert not missing, f"source files not tracked by git (check .gitignore): {missing}"
