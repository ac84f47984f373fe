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

Usage: python scripts/multihost_smoke.py [--num-processes 2] [--iters 2]
Exit code 0 = pass.  Runs on CPU; no TPU needed.
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 12517


def worker(a) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=a.num_processes, process_id=a.process_id)
    # the container sitecustomize force-registers the axon TPU tunnel;
    # pin back to CPU after the cluster handshake
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
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
    with mesh:
        for _ in range(a.iters):
            env_state, obs_dict, ts, metrics = train_iter(
                env_state, obs_dict, ts)
        jax.block_until_ready(ts.params)

    # replicated outputs are process-local addressable; checksum them
    leaves = jax.tree.leaves(ts.params)
    checksum = float(sum(jnp.sum(jnp.abs(x)).item() for x in leaves))
    v = float(metrics.value_loss)
    assert v == v, "value_loss is NaN"
    print(f"MULTIHOST proc={a.process_id}/{a.num_processes} "
          f"devices={n_dev} value_loss={v:.6f} checksum={checksum:.6f}",
          flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--process-id", type=int, default=None)
    a = p.parse_args()

    if a.process_id is not None:
        worker(a)
        return 0

    procs = []
    for i in range(a.num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--num-processes", str(a.num_processes),
             "--iters", str(a.iters), "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [pr.communicate()[0] for pr in procs]
    rcs = [pr.returncode for pr in procs]
    checksums = []
    for i, (rc, out) in enumerate(zip(rcs, outs)):
        line = next((ln for ln in out.splitlines()
                     if ln.startswith("MULTIHOST")), "")
        print(line or f"proc {i}: NO OUTPUT (rc={rc})")
        if rc != 0:
            print(f"--- proc {i} failed (rc={rc}); tail ---")
            print("\n".join(out.splitlines()[-15:]))
            return 1
        checksums.append(line.rsplit("checksum=", 1)[-1])
    if len(set(checksums)) != 1:
        print(f"FAIL: divergent post-update checksums: {checksums}")
        return 1
    print(f"multihost_smoke: OK — {a.num_processes} processes agree "
          f"(checksum {checksums[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
