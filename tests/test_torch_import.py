"""Reference-checkpoint import: build a state_dict with the reference's key
layout (module structure per model/point_net2.py:70-104), convert, and check
every parameter landed in the right slot."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stratanet2_tpu.config import ModelConfig
from stratanet2_tpu.utils.torch_import import (
    load_reference_checkpoint,
    params_from_torch_state_dict,
)


def build_reference_state_dict(cfg: ModelConfig):
    """Reference-shaped state_dict with distinctive values."""
    f_in = cfg.n_input_feats - 2
    plans = {
        "sa1_module.conv.local_nn": [f_in + 3, 16, 16],
        "sa2_module.conv.local_nn": [16 + 3, 32],
        "sa3_module.nn": [32 + 3, 64],
        "fp3_module.nn": [64 + 32, 64],
        "fp2_module.nn": [64 + 16, 34],
        "fp1_module.nn": [34 + f_in, 34],
    }
    g = torch.Generator().manual_seed(0)
    sd = {}
    for prefix, chans in plans.items():
        for i in range(len(chans) - 1):
            cin, cout = chans[i], chans[i + 1]
            sd[f"{prefix}.{i}.0.weight"] = torch.randn(cout, cin, generator=g)
            sd[f"{prefix}.{i}.0.bias"] = torch.randn(cout, generator=g)
            sd[f"{prefix}.{i}.2.weight"] = torch.rand(cout, generator=g) + 0.5
            sd[f"{prefix}.{i}.2.bias"] = torch.randn(cout, generator=g)
            sd[f"{prefix}.{i}.2.running_mean"] = torch.randn(cout, generator=g)
            sd[f"{prefix}.{i}.2.running_var"] = torch.rand(cout, generator=g) + 0.5
            sd[f"{prefix}.{i}.2.num_batches_tracked"] = torch.tensor(7)
    sd["lin1.weight"] = torch.randn(16, 34, generator=g)
    sd["lin1.bias"] = torch.randn(16, generator=g)
    sd["lin2.weight"] = torch.randn(5, 16, generator=g)
    sd["lin2.bias"] = torch.tensor([0.733, 0.266, 0.235, 0.358, 0.500])
    return sd


class TestTorchImport:
    def test_conversion_places_everything(self):
        cfg = ModelConfig()
        sd = build_reference_state_dict(cfg)
        model = params_from_torch_state_dict(sd, cfg)
        np.testing.assert_allclose(
            np.asarray(model.params["sa1"]["layers"][0]["linear"]["w"]),
            sd["sa1_module.conv.local_nn.0.0.weight"].numpy().T,
        )
        np.testing.assert_allclose(
            np.asarray(model.state["fp2"]["layers"][0]["var"]),
            sd["fp2_module.nn.0.2.running_var"].numpy(),
        )
        np.testing.assert_allclose(
            np.asarray(model.params["lin2"]["b"]), sd["lin2.bias"].numpy()
        )

    def test_imported_model_runs(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from stratanet2_tpu.models import pointnet2_forward

        cfg = ModelConfig(subsample_size=128, k1=8, k2=16, use_pallas=False)
        sd = build_reference_state_dict(cfg)
        # save as the reference does (model/point_net2.py:186-199)
        torch.save(
            {"state_dict": sd, "best_metric_epoch": 3, "best_metric_value": 0.1},
            tmp_path / "PCC_model_full.pt",
        )
        model = load_reference_checkpoint(str(tmp_path / "PCC_model_full.pt"), cfg)
        cloud = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 8))
        xyz = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 3), minval=-10, maxval=10)
        cov, proba, _ = pointnet2_forward(model, cloud, xyz, cfg, train=False)
        assert np.all(np.isfinite(np.asarray(cov)))
        np.testing.assert_allclose(np.asarray(proba).sum(-1), 1.0, rtol=1e-5)
