"""True multi-PROCESS validation of the multi-host training path.

The virtual 8-device mesh tests (tests/test_sharding.py) exercise GSPMD
sharding inside one process; this script validates the other half of the
multi-host story — `jax.distributed` clustering, cross-process global
arrays, and a sharded train iteration whose env axis spans processes
(the DCN analog; SURVEY.md §2.5 TPU-native equivalents).

With no --process-id it spawns `--num-processes` copies of itself, each
pinned to JAX_PLATFORMS=cpu with 4 virtual devices (so 2 processes = an
8-device global mesh split 4+4 across "hosts"), waits for them, and
checks every process computed the SAME post-update parameter checksum —
the learner state is replicated, so divergence would mean the gradient
psum or the curriculum scatter broke across the process boundary.

With --shared-resume it additionally validates the SHARED-STORAGE
checkpoint path (utils/checkpoint.save_shared — orbax, each process
writing its own shards): cluster A trains, commits the full train state
to a shared directory, and runs one more iteration; a FRESH cluster B
restores from that directory under its own mesh and runs one iteration
— B's post-update checksum must equal A's continued one bit-exactly
(resume is indistinguishable from never having stopped, including
curriculum and RNG state; the analog of the reference Runner resuming
weights + curriculum from its ml_logger server,
go1_gym_learn/ppo_cse/__init__.py:76-91).

Usage: python scripts/multihost_smoke.py [--num-processes 2] [--iters 2]
                                         [--shared-resume]
Exit code 0 = pass.  Runs on CPU; no TPU needed.
"""
import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 12517


def worker(a) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{a.port}",
        num_processes=a.num_processes, process_id=a.process_id)
    # the container sitecustomize force-registers the axon TPU tunnel;
    # pin back to CPU after the cluster handshake
    jax.config.update("jax_platforms", "cpu")

    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.learn import ppo as ppo_mod
    from walk_these_ways_tpu.parallel import mesh as mesh_mod

    n_dev = len(jax.devices())
    assert jax.process_count() == a.num_processes
    assert n_dev == 4 * a.num_processes, n_dev

    num_envs = 2 * n_dev
    cfg = mob_train_cfg(num_envs=num_envs)
    env = LeggedRobotEnv(cfg)
    mesh = mesh_mod.make_mesh(n_dev)

    # identical seeds on every process -> identical host values, so
    # device_put with a cross-process sharding assembles one global array
    ts = ppo_mod.init_train_state(jax.random.PRNGKey(0), env)
    env_state, obs_dict = env.reset(jax.random.PRNGKey(1))
    env_state = mesh_mod.shard_env_state(env_state, mesh, num_envs)
    obs_dict = mesh_mod.shard_env_state(obs_dict, mesh, num_envs)
    ts = mesh_mod.replicate(ts, mesh)

    train_iter = jax.jit(ppo_mod.make_train_iteration(env, num_steps=4))

    def checksum_of(params):
        # replicated outputs are process-local addressable; digest the RAW
        # BYTES of every leaf (md5) so "checksums match" really means
        # bit-exact — a float sum-of-abs could mask sub-epsilon drift or
        # sign flips
        import hashlib
        import numpy as _np
        d = hashlib.md5()
        for x in jax.tree.leaves(params):
            d.update(_np.ascontiguousarray(_np.asarray(x)).tobytes())
        return d.hexdigest()

    from walk_these_ways_tpu.utils import checkpoint as ckpt

    if a.phase == "resume":
        # FRESH cluster: restore the full train state from shared storage
        # under this cluster's own mesh/shardings, then train one step
        tree = ckpt.load_shared(a.ckpt_dir, {
            "train_state": ts, "env_state": env_state,
            "obs_dict": obs_dict})
        ts, env_state, obs_dict = (tree["train_state"], tree["env_state"],
                                   tree["obs_dict"])
        with mesh:
            env_state, obs_dict, ts, metrics = train_iter(
                env_state, obs_dict, ts)
            jax.block_until_ready(ts.params)
        print(f"MULTIHOST proc={a.process_id}/{a.num_processes} "
              f"devices={n_dev} value_loss={float(metrics.value_loss):.6f} "
              f"checksum={checksum_of(ts.params)}", flush=True)
        return

    with mesh:
        for _ in range(a.iters):
            env_state, obs_dict, ts, metrics = train_iter(
                env_state, obs_dict, ts)
        jax.block_until_ready(ts.params)

    if a.phase == "save":
        # commit the full train state to shared storage (every process
        # writes its own shards), then continue ONE more iteration — the
        # resume cluster must reproduce this continued checksum exactly
        ckpt.save_shared(a.ckpt_dir, {
            "train_state": ts, "env_state": env_state,
            "obs_dict": obs_dict})
        with mesh:
            env_state, obs_dict, ts, metrics = train_iter(
                env_state, obs_dict, ts)
            jax.block_until_ready(ts.params)

    v = float(metrics.value_loss)
    assert v == v, "value_loss is NaN"
    print(f"MULTIHOST proc={a.process_id}/{a.num_processes} "
          f"devices={n_dev} value_loss={v:.6f} "
          f"checksum={checksum_of(ts.params)}", flush=True)


def _run_cluster(a, phase, port, ckpt_dir):
    """Spawn one jax.distributed cluster; return its checksums or None."""
    procs = []
    for i in range(a.num_processes):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--num-processes", str(a.num_processes),
               "--iters", str(a.iters), "--process-id", str(i),
               "--phase", phase, "--port", str(port)]
        if ckpt_dir:
            cmd += ["--ckpt-dir", ckpt_dir]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [pr.communicate()[0] for pr in procs]
    rcs = [pr.returncode for pr in procs]
    checksums = []
    for i, (rc, out) in enumerate(zip(rcs, outs)):
        line = next((ln for ln in out.splitlines()
                     if ln.startswith("MULTIHOST")), "")
        print(line or f"proc {i}: NO OUTPUT (rc={rc})")
        if rc != 0 or not line:
            # a worker that produced no MULTIHOST line must FAIL the run:
            # empty-string "checksums" would compare equal and fake a pass
            print(f"--- proc {i} failed (rc={rc}, line={bool(line)}); tail ---")
            print("\n".join(out.splitlines()[-15:]))
            return None
        checksums.append(line.rsplit("checksum=", 1)[-1])
    if len(set(checksums)) != 1:
        print(f"FAIL: divergent post-update checksums: {checksums}")
        return None
    return checksums


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--phase", choices=["train", "save", "resume"],
                   default="train")
    p.add_argument("--port", type=int, default=PORT)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--shared-resume", action="store_true",
                   help="validate shared-storage checkpoint/resume across "
                        "two successive clusters")
    a = p.parse_args()

    if a.process_id is not None:
        worker(a)
        return 0

    if a.shared_resume:
        ckpt_dir = tempfile.mkdtemp(prefix="wtw_shared_ckpt_")
        print(f"shared checkpoint dir: {ckpt_dir}")
        cs_a = _run_cluster(a, "save", a.port, ckpt_dir)
        if cs_a is None:
            return 1
        cs_b = _run_cluster(a, "resume", a.port + 1, ckpt_dir)
        if cs_b is None:
            return 1
        if cs_a[0] != cs_b[0]:
            print(f"FAIL: resumed cluster diverged from continued run: "
                  f"{cs_a[0]} vs {cs_b[0]}")
            return 1
        print(f"multihost_smoke: OK — fresh {a.num_processes}-process "
              f"cluster resumed from shared storage bit-exactly "
              f"(checksum {cs_b[0]})")
        return 0

    checksums = _run_cluster(a, "train", a.port, None)
    if checksums is None:
        return 1
    print(f"multihost_smoke: OK — {a.num_processes} processes agree "
          f"(checksum {checksums[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
