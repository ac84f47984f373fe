"""Train the full walk-these-ways MoB policy.

Equivalent of reference scripts/train.py:1-256 (train_go1): the config is the
`mob_train_cfg` preset (same ~200 overrides baked in), the trainer is the
jitted PPO-CSE loop, logging goes to a local JSONL run dir.

Usage: python scripts/train.py [--num-envs 4000] [--iterations 1500]
"""
import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_go1(num_envs: int, iterations: int, log_dir: str, seed: int,
              num_eval_envs: int = 0, eval_expert: bool = False,
              algo: str = "cse", use_mesh: bool = False,
              multihost: bool = False, exact: bool = False,
              terrain: str = "flat", warm_start: bool | None = None,
              warm_iters: int | None = None, resume: str | None = None,
              eval_dr: str | None = None, eval_terrain: str | None = None,
              shared_ckpt: str | None = None):
    from walk_these_ways_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from walk_these_ways_tpu.go1_config import mob_train_cfg, rough_train_cfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.learn.runner import Runner, RunnerArgs
    from walk_these_ways_tpu.parallel import mesh as mesh_mod

    mesh = None
    if multihost or use_mesh:
        if multihost:
            # join the pod-slice cluster first so the mesh spans every
            # host's chips (env axis over ICI within a host, DCN across)
            mesh_mod.maybe_init_distributed()
        mesh = mesh_mod.make_mesh()
        import jax
        assert num_envs % len(mesh.devices.flat) == 0, \
            "num_envs must divide the device count"
        print(f"mesh: {len(mesh.devices.flat)} devices, "
              f"process {jax.process_index()}/{jax.process_count()}")

    cfg_fn = rough_train_cfg if terrain == "rough" else mob_train_cfg
    cfg = cfg_fn(num_envs=num_envs)
    eval_cfg = cfg_fn(num_envs=num_eval_envs) if num_eval_envs else None
    if eval_cfg is not None and eval_dr is not None:
        # eval slice under a DR sweep preset (reference eval_metrics
        # DR_SETTINGS applied to the eval env while training continues)
        import dataclasses
        from walk_these_ways_tpu.learn.eval_metrics import DR_SETTINGS
        eval_cfg = dataclasses.replace(
            eval_cfg, domain_rand=DR_SETTINGS[eval_dr])
    if eval_cfg is not None and eval_terrain is not None:
        # eval slice on its own terrain rows, appended to the train
        # heightfield (reference utils/terrain.py:12-30)
        ev_fn = rough_train_cfg if eval_terrain == "rough" else mob_train_cfg
        import dataclasses
        eval_cfg = dataclasses.replace(
            eval_cfg, terrain=ev_fn(num_envs=num_eval_envs).terrain)
    if warm_start is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, sim=dataclasses.replace(cfg.sim,
                                         contact_warm_start=warm_start))
        if eval_cfg is not None:
            eval_cfg = dataclasses.replace(
                eval_cfg, sim=dataclasses.replace(
                    eval_cfg.sim, contact_warm_start=warm_start))
    if warm_iters is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, sim=dataclasses.replace(cfg.sim,
                                         num_contact_iters_warm=warm_iters))
        if eval_cfg is not None:
            eval_cfg = dataclasses.replace(
                eval_cfg, sim=dataclasses.replace(
                    eval_cfg.sim, num_contact_iters_warm=warm_iters))
    if exact:
        # exact per-substep dynamics (no matrix reuse); still on the
        # Pallas pipeline on flat ground
        import dataclasses
        cfg = dataclasses.replace(
            cfg, sim=dataclasses.replace(cfg.sim, reuse_matrices=False))
        if eval_cfg is not None:
            eval_cfg = dataclasses.replace(
                eval_cfg,
                sim=dataclasses.replace(eval_cfg.sim, reuse_matrices=False))
    env = LeggedRobotEnv(cfg, eval_cfg=eval_cfg)
    runner = Runner(env, log_dir=log_dir, seed=seed,
                    args=RunnerArgs(max_iterations=iterations,
                                    eval_expert=eval_expert,
                                    resume=resume is not None,
                                    resume_path=resume,
                                    shared_ckpt_dir=shared_ckpt),
                    algo=algo, mesh=mesh)
    runner.learn(num_learning_iterations=iterations,
                 init_at_random_ep_len=True)


def main():

    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4000)
    p.add_argument("--iterations", type=int, default=1500)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--num-eval-envs", type=int, default=0,
                   help="extra eval envs (deterministic policy, excluded "
                        "from PPO; reference train/eval split)")
    p.add_argument("--eval-expert", action="store_true",
                   help="eval envs use the teacher head")
    p.add_argument("--algo", choices=["cse", "rma"], default="cse",
                   help="cse = concurrent state estimation (reference "
                        "ppo_cse, default); rma = teacher-student with "
                        "env-factor encoder (reference ppo/)")
    p.add_argument("--mesh", action="store_true",
                   help="shard envs over all local devices "
                        "(jax.sharding.Mesh, GSPMD collectives)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() first, then mesh "
                        "over every host's devices (DCN + ICI)")
    p.add_argument("--exact", action="store_true",
                   help="exact per-substep dynamics (reuse_matrices off)")
    p.add_argument("--terrain", choices=["flat", "rough"], default="flat",
                   help="flat = MoB boxes tiles (default); rough = "
                        "rough-slope heightfield")
    p.add_argument("--warm-start", dest="warm_start", action="store_true",
                   default=None,
                   help="warm-start contact impulses across decimation "
                        "substeps (megastep path)")
    p.add_argument("--no-warm-start", dest="warm_start",
                   action="store_false",
                   help="force cold-start contact solves")
    p.add_argument("--warm-iters", type=int, default=None,
                   help="warm-started solver iterations per substep "
                        "(SimCfg.num_contact_iters_warm)")
    p.add_argument("--eval-dr", type=str, default=None,
                   help="DR preset for the eval slice "
                        "(learn.eval_metrics.DR_SETTINGS key, e.g. "
                        "static_high); requires --num-eval-envs")
    p.add_argument("--eval-terrain", type=str, default=None,
                   choices=["flat", "rough"],
                   help="give the eval slice its own terrain rows "
                        "(appended after the train rows)")
    p.add_argument("--resume", type=str, default=None, metavar="CKPT",
                   help="checkpoint to resume from: a .pkl file (local "
                        "pickle) or a shared-storage directory (orbax; "
                        "multi-host safe).  Restores the full train state "
                        "incl. env/curriculum/RNG; training continues from "
                        "the stored iteration count. Analog of the "
                        "reference runner's ml_logger-server resume "
                        "(go1_gym_learn/ppo_cse/__init__.py:76-91)")
    p.add_argument("--shared-ckpt", type=str, default=None, metavar="DIR",
                   help="also commit the train state to this shared-storage "
                        "directory (orbax) at every save interval, as a "
                        "common resume point for a pod slice")
    a = p.parse_args()
    log_dir = a.log_dir or os.path.join(
        "runs", "gait-conditioned-agility",
        datetime.now().strftime("%Y-%m-%d/train/%H%M%S"))
    train_go1(a.num_envs, a.iterations, log_dir, a.seed,
              num_eval_envs=a.num_eval_envs, eval_expert=a.eval_expert,
              algo=a.algo, use_mesh=a.mesh, multihost=a.multihost,
              exact=a.exact, terrain=a.terrain, warm_start=a.warm_start,
              warm_iters=a.warm_iters, resume=a.resume,
              eval_dr=a.eval_dr, eval_terrain=a.eval_terrain,
              shared_ckpt=a.shared_ckpt)


if __name__ == "__main__":
    main()
