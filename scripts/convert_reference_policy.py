"""Convert reference TorchScript policy artifacts to the npz deploy format.

The reference exports its policy as two TorchScript modules
(reference: go1_gym_learn/ppo_cse/__init__.py:240-251, consumed by
scripts/play.py:17-29 and go1_gym_deploy/scripts/deploy_policy.py:58-60):

    checkpoints/adaptation_module_latest.jit   obs_history(2100) -> latent(2)
    checkpoints/body_latest.jit                [obs_history, latent] -> action(12)

This converts them to this repo's flat-npz policy artifact
(learn/runner.py:export_policy format: adaptation/w{i}, actor/w{i}, row-major
(in, out) weights for x @ W + b), so a reference-trained policy can be run
directly by scripts/play.py and deploy/deploy_policy.py here.

NOTE: the reference checkout in this environment ships ONLY
adaptation_module_latest.jit (body_latest.jit is absent from
runs/gait-conditioned-agility/pretrain-v0), so a full pretrained-policy
rollout cannot be reconstructed; the adaptation module alone still gives a
cross-engine oracle — see scripts/validate_adaptation_cross_engine.py.

Usage:
    python scripts/convert_reference_policy.py \
        --checkpoints /root/reference/runs/gait-conditioned-agility/pretrain-v0/train/025417.456545/checkpoints \
        --out /tmp/reference_policy.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def torchscript_mlp_to_arrays(path: str, prefix: str) -> dict:
    """Extract Linear weights from a TorchScript Sequential MLP, transposed
    to this repo's (in, out) x @ W convention."""
    import torch

    m = torch.jit.load(path, map_location="cpu")
    params = dict(m.named_parameters())
    # names are '<layer_idx>.weight' / '<layer_idx>.bias'; activations hold
    # the odd indices, so sort by layer index
    idxs = sorted({int(k.split(".")[0]) for k in params})
    out = {}
    for j, i in enumerate(idxs):
        w = params[f"{i}.weight"].detach().numpy()   # (out, in)
        b = params[f"{i}.bias"].detach().numpy()
        out[f"{prefix}/w{j}"] = np.ascontiguousarray(w.T.astype(np.float32))
        out[f"{prefix}/b{j}"] = b.astype(np.float32)
    return out


def convert(checkpoints_dir: str, out_path: str) -> dict:
    flat = {}
    adapt_path = os.path.join(checkpoints_dir, "adaptation_module_latest.jit")
    body_path = os.path.join(checkpoints_dir, "body_latest.jit")
    if os.path.exists(adapt_path):
        flat.update(torchscript_mlp_to_arrays(adapt_path, "adaptation"))
        print(f"converted adaptation module: "
              f"{[flat[k].shape for k in sorted(flat) if 'w' in k]}")
    if os.path.exists(body_path):
        flat.update(torchscript_mlp_to_arrays(body_path, "actor"))
        print("converted actor body")
    else:
        print("body_latest.jit not found — converting adaptation module only")
    if not flat:
        raise FileNotFoundError(f"no TorchScript artifacts in {checkpoints_dir}")
    flat["std"] = np.ones(12, np.float32)
    np.savez(out_path, **flat)
    print(f"wrote {out_path}")
    return flat


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--checkpoints",
        default="/root/reference/runs/gait-conditioned-agility/pretrain-v0/"
                "train/025417.456545/checkpoints")
    ap.add_argument("--out", default="resources/reference_policy/"
                                     "pretrain_v0_policy.npz")
    a = ap.parse_args()
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    convert(a.checkpoints, a.out)
