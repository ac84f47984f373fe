"""Field-by-field config parity against the reference's own pretrained-run
snapshot.

The reference ships the FULL Cfg of the run that produced its pretrained
policy (`runs/gait-conditioned-agility/pretrain-v0/.../parameters.pkl`,
written by `logger.log_params` at reference scripts/train.py:210 and
reloaded by play.py:36-45).  That snapshot is an authoritative oracle for
the MoB training configuration: every field our frozen-dataclass config
shares with it must agree, except where the reference's CURRENT
scripts/train.py itself moved on from the snapshot (checked below against
the live reference sources).

Also pins the trainer hyper-parameter blocks (AC_Args / PPO_Args /
RunnerArgs) against the snapshot.
"""
import dataclasses
import io
import pickle

import numpy as np
import pytest

REF_PKL = ("/root/reference/runs/gait-conditioned-agility/pretrain-v0/"
           "train/025417.456545/parameters.pkl")

# Fields where the pretrain-v0 snapshot and the reference's current
# scripts/train.py disagree; we follow scripts/train.py (the documented
# protocol), so these are EXPECTED to differ from the snapshot:
# - gravity_range: snapshot [-2, 2]; train.py:49 sets [-1, 1]
# - use_terminal_roll_pitch: snapshot False; train.py:112 sets True
# - terminal_body_ori: snapshot 0.5; train.py:113 sets 1.6
SNAPSHOT_SUPERSEDED = {
    "domain_rand.gravity_range": ((-2.0, 2.0), (-1.0, 1.0)),
    "rewards.use_terminal_roll_pitch": (False, True),
    "rewards.terminal_body_ori": (0.5, 1.6),
}


class _CpuUnpickler(pickle.Unpickler):
    """parameters.pkl embeds torch tensors saved from CUDA; remap to CPU."""

    def find_class(self, module, name):
        if module == "torch.storage" and name == "_load_from_bytes":
            import torch
            return lambda b: torch.load(io.BytesIO(b), map_location="cpu",
                                        weights_only=False)
        return super().find_class(module, name)


@pytest.fixture(scope="module")
def ref_params():
    with open(REF_PKL, "rb") as f:
        return _CpuUnpickler(f).load()


def _norm(v):
    """Order-stable comparable form; dict-valued fields (PD gains, default
    joint angles) are stored as item tuples on our side."""
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple, np.ndarray)):
        arr = np.asarray(v).reshape(-1)
        if arr.dtype.kind in "fiub":
            return tuple(float(x) for x in arr.tolist())
        return tuple(arr.tolist())
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, float, np.integer, np.floating)):
        return float(v)
    return v


def _norm_ours(key, v):
    # our dict-valued config fields are ((key, value), ...) item tuples
    if key in ("control.damping", "control.stiffness",
               "init_state.default_joint_angles"):
        return tuple(sorted((k, float(x)) for k, x in v))
    return _norm(v)


def _flat_ours(cfg):
    out = {}
    for sec in dataclasses.fields(cfg):
        v = getattr(cfg, sec.name)
        if dataclasses.is_dataclass(v):
            for f2 in dataclasses.fields(v):
                out[f"{sec.name}.{f2.name}"] = getattr(v, f2.name)
        else:
            out[sec.name] = v
    return out


def test_cfg_matches_pretrain_snapshot(ref_params):
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    ours = _flat_ours(mob_train_cfg(num_envs=4000))
    ref = {f"{sec}.{k}": v
           for sec, d in ref_params["Cfg"].items()
           if isinstance(d, dict) for k, v in d.items()}
    common = sorted(set(ours) & set(ref))
    assert len(common) >= 230, f"only {len(common)} shared fields"

    mismatched = {}
    for k in common:
        a = _norm_ours(k, ours[k])
        b = _norm(ref[k])
        if a != b:
            mismatched[k] = (b, a)
    for k, (snap_val, ours_val) in SNAPSHOT_SUPERSEDED.items():
        got = mismatched.pop(k, None)
        assert got is not None, (
            f"{k}: expected the documented snapshot/train.py divergence, "
            "but values now agree — update SNAPSHOT_SUPERSEDED")
        assert got == (_norm(snap_val), _norm(ours_val)), (k, got)
    assert not mismatched, f"unexpected config divergences: {mismatched}"


def test_trainer_args_match_snapshot(ref_params):
    from walk_these_ways_tpu.learn.ppo import PPO_Args
    from walk_these_ways_tpu.models.actor_critic import AC_Args

    ref_ppo = ref_params["PPO_Args"]
    ours = PPO_Args()
    for k in ("value_loss_coef", "use_clipped_value_loss", "clip_param",
              "entropy_coef", "num_learning_epochs", "num_mini_batches",
              "learning_rate", "adaptation_module_learning_rate",
              "num_adaptation_module_substeps", "schedule", "gamma", "lam",
              "desired_kl", "max_grad_norm"):
        assert _norm(getattr(ours, k)) == _norm(ref_ppo[k]), k

    ref_ac = ref_params["AC_Args"]
    ac = AC_Args()
    assert _norm(ac.init_noise_std) == _norm(ref_ac["init_noise_std"])
    assert _norm(ac.actor_hidden_dims) == _norm(ref_ac["actor_hidden_dims"])
    assert _norm(ac.critic_hidden_dims) == _norm(ref_ac["critic_hidden_dims"])
    assert _norm(ac.adaptation_module_branch_hidden_dims) == _norm(
        ref_ac["adaptation_module_branch_hidden_dims"])

    ref_run = ref_params["RunnerArgs"]
    assert ref_run["num_steps_per_env"] == 24  # our default rollout length
    assert ref_run["save_interval"] == 400
    assert ref_run["log_freq"] == 10
