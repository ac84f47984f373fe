"""True multi-process jax.distributed validation.

Runs scripts/multihost_smoke.py: 2 OS processes x 4 virtual CPU devices
join one jax.distributed cluster, the sharded train iteration runs with
its env axis spanning the process boundary, and both processes must land
on the SAME post-update parameter checksum (replicated learner state =>
any cross-process psum/scatter breakage diverges them).

This is the other half of the multi-host story next to
tests/test_sharding.py's single-process 8-device GSPMD checks
(SURVEY.md §2.5 TPU-native equivalents).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_cluster_trains_and_agrees():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py"),
         "--num-processes", "2", "--iters", "2"],
        capture_output=True, text=True, timeout=2400, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "multihost_smoke: OK" in proc.stdout


def test_shared_storage_checkpoint_resume_bit_exact():
    """Cluster A commits the full train state to a shared orbax dir and
    continues one iteration; a FRESH cluster B restores from that dir and
    runs one iteration — the post-update checksums must match bit-exactly
    (round-4 verdict item 6: the pod-slice shared-resume story)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py"),
         "--num-processes", "2", "--iters", "2", "--shared-resume"],
        capture_output=True, text=True, timeout=2400, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "resumed from shared storage bit-exactly" in proc.stdout
