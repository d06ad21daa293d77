"""Import trained reference (ewencedr/particle_fm) checkpoints into this
framework.

The reference's `SetFlowMatchingLitModule` stores its vector-field networks
as `flows.{k}.net.*` in the Lightning checkpoint's state_dict
(flow_matching_module.py:417-445: `self.flows = nn.ModuleList([...])`, each
CNF holding `self.net = EPiC_encoder(...)` at :146). This repo's flax twins
use the SAME parameter topology (params/flows_{k}/net/...), so a trained
torch checkpoint converts into a flax `variables` tree by pure tensor
relayout:

  torch weight_norm Linear {weight_v (out,in), weight_g (out,1), bias}
    -> WNDense {kernel (in,out) = weight_v.T, g (out,) , bias}
  plain Linear {weight (out,in), bias} -> Dense {kernel = weight.T, bias}

Architecture parity of the layout is machine-checked by
tests/test_torch_parity.py (weight-transplant forward goldens); this module
is the production path of the same mapping, driven by a state_dict instead
of a live torch module — so it needs neither torchdyn nor the reference
package installed, only the .ckpt file.

Currently supported: `model == "epic"` (the flagship EPiC family) with the
parameter-free time embeddings (sincos / cosine). Other architectures raise
with a pointer to the transplant maps in tests/test_torch_parity.py.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor | ndarray -> ndarray (no torch import needed here)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def graft(template: dict, donor: dict, path: str = "") -> dict:
    """Overlay donor arrays onto an init-produced param tree, shape-checked.

    Every donor leaf must exist in the template with the same shape; every
    template leaf must be covered by the donor (so nothing silently keeps
    its random init)."""
    if set(donor) != set(template):
        raise ValueError(
            f"param tree mismatch at {path or '<root>'}: "
            f"only-in-flax={sorted(set(template) - set(donor))} "
            f"only-in-torch={sorted(set(donor) - set(template))}"
        )
    out = {}
    for k, v in donor.items():
        if isinstance(v, dict):
            out[k] = graft(template[k], v, f"{path}/{k}")
        else:
            if tuple(template[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: flax {template[k].shape} "
                    f"vs torch {v.shape}"
                )
            out[k] = jnp.asarray(v)
    return out


def wn_dense_from_sd(sd: Mapping[str, Any], prefix: str) -> dict:
    """weight_norm(nn.Linear) state_dict slice -> WNDense{kernel, g, bias}.

    Accepts both the legacy `nn.utils.weight_norm` spelling (weight_g /
    weight_v — what the reference uses, epic.py:66) and the new
    parametrizations spelling (parametrizations.weight.original0/1)."""
    if f"{prefix}.weight_v" in sd:
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    elif f"{prefix}.parametrizations.weight.original1" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    else:
        raise KeyError(f"no weight-norm tensors under {prefix!r}")
    return {
        "kernel": _np(v).T,
        "g": _np(g).reshape(-1),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def dense_from_sd(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def epic_encoder_params_from_sd(sd: Mapping[str, Any], prefix: str = "") -> dict:
    """EPiC_encoder state_dict slice -> flax EPiCEncoder param subtree.

    `prefix` is everything before the encoder's own names, e.g.
    "flows.0.net." for a Lightning checkpoint or "" for a bare encoder."""
    out = {
        name: wn_dense_from_sd(sd, f"{prefix}{name}")
        for name in ("fc_l1", "fc_l2", "fc_g1", "fc_g2", "fc_l3")
    }
    i = 0
    while f"{prefix}nn_list.{i}.fc_global1.bias" in sd or (
        f"{prefix}nn_list.{i}.fc_global1.parametrizations.weight.original0" in sd
    ):
        out[f"epic_layer_{i}"] = {
            fc: wn_dense_from_sd(sd, f"{prefix}nn_list.{i}.{fc}")
            for fc in ("fc_global1", "fc_global2", "fc_local1", "fc_local2")
        }
        i += 1
    if i == 0:
        raise KeyError(f"no EPiC layers found under {prefix!r}nn_list.*")
    return out


def variables_from_reference_state_dict(sd: Mapping[str, Any], model) -> dict:
    """Reference SetFlowMatchingLitModule state_dict -> flax `variables`.

    `model` is the matching FlowMatchingModel (same dims/conditioning); its
    init tree is the shape-checked template, so any hyperparameter mismatch
    fails loudly instead of producing a silently wrong network."""
    if model.model != "epic":
        raise NotImplementedError(
            f"checkpoint import is implemented for model='epic' (got "
            f"{model.model!r}); the transplant maps for the other "
            "architectures live in tests/test_torch_parity.py"
        )
    if model.t_emb == "gaussian":
        raise NotImplementedError(
            "t_emb='gaussian' carries trainable projection weights in the "
            "reference CNF; import supports the parameter-free sincos/cosine "
            "embeddings"
        )
    if model.use_normaliser:
        raise NotImplementedError(
            "use_normaliser=True: IterativeNormLayer buffer import is not "
            "wired; disable the in-model normaliser for imported runs"
        )

    # Lightning checkpoints may alias the same tensors under `loss.flows.*`
    # (the reference loss modules hold the flows ModuleList); only the
    # canonical `flows.{k}.net.` branch is read.
    params = {}
    for k in range(model.n_transforms):
        pre = f"flows.{k}.net."
        if not any(key.startswith(pre) for key in sd):
            raise KeyError(
                f"state_dict has no {pre}* keys — is this a "
                "SetFlowMatchingLitModule checkpoint? For a bare "
                "EPiC_encoder state_dict use epic_encoder_params_from_sd()"
            )
        params[f"flows_{k}"] = {"net": epic_encoder_params_from_sd(sd, pre)}

    template = model.init(jax.random.PRNGKey(0))
    grafted = graft(dict(template["params"]), params)
    return {**template, "params": grafted}


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference .ckpt/.pt file and return its flat state_dict.

    Uses torch.load(weights_only=True): tensors + containers only, so the
    pickle cannot execute code and no hydra/lightning classes are needed."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return dict(obj)
