"""Import reference PyTorch checkpoints into this framework.

The reference saves `{"state_dict": model.state_dict(), ...}` via torch.save
(model/point_net2.py:186-199). This converter maps that state_dict onto our
param/state pytrees so an archived reference checkpoint can be evaluated
here for coverage-MAE parity (BASELINE.json).

Key layout of the reference model (torch_geometric 1.7.2):
  sa{1,2}_module.conv.local_nn.<i>.0.{weight,bias}        Linear of MLP block i
  sa{1,2}_module.conv.local_nn.<i>.2.{weight,bias,        BatchNorm of block i
                                      running_mean,running_var}
  sa3_module.nn.<i>...                                    GlobalSAModule MLP
  fp{3,2,1}_module.nn.<i>...                              FPModule MLPs
  lin1.{weight,bias}, lin2.{weight,bias}                  head

torch Linear stores weight as (out, in) — transposed relative to our (in, out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from stratanet2_tpu.config import ModelConfig
from stratanet2_tpu.models import PointNet2Params, init_pointnet2


_MODULE_PREFIXES = {
    "sa1": ("sa1_module.conv.local_nn", "sa1_module.conv.nn"),
    "sa2": ("sa2_module.conv.local_nn", "sa2_module.conv.nn"),
    "sa3": ("sa3_module.nn",),
    "fp3": ("fp3_module.nn",),
    "fp2": ("fp2_module.nn",),
    "fp1": ("fp1_module.nn",),
}


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def params_from_torch_state_dict(
    state_dict: Dict[str, "object"], cfg: ModelConfig
) -> PointNet2Params:
    """Convert a reference state_dict (tensors or arrays) to PointNet2Params."""
    import jax
    import jax.numpy as jnp

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    template = init_pointnet2(jax.random.PRNGKey(0), cfg)
    p = jax.tree_util.tree_map(np.asarray, template.params)
    s = jax.tree_util.tree_map(np.asarray, template.state)

    def find(prefixes, block, suffix):
        for pref in prefixes:
            key = f"{pref}.{block}.{suffix}"
            if key in sd:
                return sd[key]
        raise KeyError(f"none of {prefixes} has block {block} suffix {suffix}")

    for name, prefixes in _MODULE_PREFIXES.items():
        for i, layer in enumerate(p[name]["layers"]):
            w = find(prefixes, f"{i}.0", "weight").T  # (in, out)
            b = find(prefixes, f"{i}.0", "bias")
            assert w.shape == layer["linear"]["w"].shape, (
                f"{name} layer {i}: torch {w.shape} vs ours {layer['linear']['w'].shape}"
            )
            layer["linear"]["w"] = w
            layer["linear"]["b"] = b
            layer["bn"]["scale"] = find(prefixes, f"{i}.2", "weight")
            layer["bn"]["bias"] = find(prefixes, f"{i}.2", "bias")
            s[name]["layers"][i]["mean"] = find(prefixes, f"{i}.2", "running_mean")
            s[name]["layers"][i]["var"] = find(prefixes, f"{i}.2", "running_var")

    p["lin1"]["w"] = sd["lin1.weight"].T
    p["lin1"]["b"] = sd["lin1.bias"]
    p["lin2"]["w"] = sd["lin2.weight"].T
    p["lin2"]["b"] = sd["lin2.bias"]

    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return PointNet2Params(to_j(p), to_j(s))


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> PointNet2Params:
    """Load a reference PCC_model_*.pt file (torch.save payload with a
    'state_dict' entry) into PointNet2Params."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["state_dict"] if "state_dict" in payload else payload
    return params_from_torch_state_dict(sd, cfg)
