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

Supported architectures: epic, droid_fulltransformer,
droid_fullcrossattention, mdma — i.e. every vector-field net of the
reference's SetFlowMatchingLitModule — with the parameter-free time
embeddings (sincos / cosine; both carry no weights, so the whole CNF param
tree lives under `flows.{k}.net.`). The relayout per net family:

  EPiC (epic.py:206-391): weight-norm Linears only (fc_l*/fc_g*/nn_list.*).
  Droid (droid_transformer.py:440-548, 622-711): DenseNetwork MLP blocks
    (Linear vs LayerNorm told apart by weight rank in the interleaved
    `block.{i}` ModuleList), MHA q/k/v or fused all_linear, the torch-side
    `ctxt_emdb` attribute typo mapped to the flax `ctxt_embd`.
  MDMA (mdma.py:87-176): nn.MultiheadAttention in_proj split into
    attn_q/attn_k/attn_v; the per-block `cond_cls` Linear is dead reference
    code (used only under `self.glu`, hard-set False at mdma.py:30) and is
    skipped.
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


def layernorm_from_sd(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _child_indices(sd: Mapping[str, Any], prefix: str) -> list[int]:
    """Sorted integer child indices of a torch ModuleList at `prefix`."""
    idx = set()
    for k in sd:
        if k.startswith(prefix):
            head = k[len(prefix) :].split(".", 1)[0]
            if head.isdigit():
                idx.add(int(head))
    return sorted(idx)


def _has(sd: Mapping[str, Any], prefix: str) -> bool:
    return any(k.startswith(prefix) for k in sd)


def mlp_block_from_sd(sd: Mapping[str, Any], prefix: str) -> dict:
    """Reference MLPBlock (droid_transformer.py:714-813) -> flax MLPBlock.

    The torch block interleaves Linear/act/LayerNorm/Dropout in one
    `block` ModuleList; only Linear (2-D weight) and LayerNorm (1-D weight)
    carry parameters, renamed lin_{n} / nrm_{n} in encounter order."""
    out, n_lin, n_nrm = {}, 0, 0
    for i in _child_indices(sd, f"{prefix}block."):
        w = sd.get(f"{prefix}block.{i}.weight")
        if w is None:
            continue
        if _np(w).ndim == 2:
            out[f"lin_{n_lin}"] = dense_from_sd(sd, f"{prefix}block.{i}")
            n_lin += 1
        else:
            out[f"nrm_{n_nrm}"] = layernorm_from_sd(sd, f"{prefix}block.{i}")
            n_nrm += 1
    if not out:
        raise KeyError(f"no MLPBlock parameters under {prefix!r}block.*")
    return out


def dense_network_from_sd(sd: Mapping[str, Any], prefix: str) -> dict:
    """Reference DenseNetwork (droid_transformer.py:828-981) -> flax twin."""
    out = {"input_block": mlp_block_from_sd(sd, f"{prefix}input_block.")}
    for j in _child_indices(sd, f"{prefix}hidden_blocks."):
        out[f"hidden_block_{j}"] = mlp_block_from_sd(sd, f"{prefix}hidden_blocks.{j}.")
    if _has(sd, f"{prefix}output_block."):
        out["output_block"] = mlp_block_from_sd(sd, f"{prefix}output_block.")
    return out


def mha_block_from_sd(sd: Mapping[str, Any], prefix: str) -> dict:
    """Reference MultiHeadedAttentionBlock (droid_transformer.py:117-284)."""
    out = {}
    if f"{prefix}all_linear.weight" in sd:
        out["all_linear"] = dense_from_sd(sd, f"{prefix}all_linear")
    else:
        for name in ("q_linear", "k_linear", "v_linear"):
            out[name] = dense_from_sd(sd, f"{prefix}{name}")
    out["out_linear"] = dense_from_sd(sd, f"{prefix}out_linear")
    if f"{prefix}layer_norm.weight" in sd:
        out["layer_norm"] = layernorm_from_sd(sd, f"{prefix}layer_norm")
    return out


def full_transformer_params_from_sd(sd: Mapping[str, Any], prefix: str = "") -> dict:
    """FullTransformerEncoder (droid_transformer.py:440-548) state_dict slice
    -> flax FullTransformerEncoder param subtree."""
    te = {"final_norm": layernorm_from_sd(sd, f"{prefix}te.final_norm")}
    for i in _child_indices(sd, f"{prefix}te.layers."):
        lp = f"{prefix}te.layers.{i}."
        te[f"layer_{i}"] = {
            "norm1": layernorm_from_sd(sd, f"{lp}norm1"),
            "norm2": layernorm_from_sd(sd, f"{lp}norm2"),
            "self_attn": mha_block_from_sd(sd, f"{lp}self_attn."),
            "dense": dense_network_from_sd(sd, f"{lp}dense."),
        }
    out = {
        "node_embd": dense_network_from_sd(sd, f"{prefix}node_embd."),
        "outp_embd": dense_network_from_sd(sd, f"{prefix}outp_embd."),
        "te": te,
    }
    # the reference attribute is misspelled `ctxt_emdb` (droid_transformer.py:494)
    if _has(sd, f"{prefix}ctxt_emdb."):
        out["ctxt_embd"] = dense_network_from_sd(sd, f"{prefix}ctxt_emdb.")
    return out


def full_crossattention_params_from_sd(sd: Mapping[str, Any], prefix: str = "") -> dict:
    """FullCrossAttentionEncoder (droid_transformer.py:622-711) state_dict
    slice -> flax FullCrossAttentionEncoder param subtree."""

    def _cross_layer(lp: str) -> dict:
        return {
            "norm0": layernorm_from_sd(sd, f"{lp}norm0"),
            "norm1": layernorm_from_sd(sd, f"{lp}norm1"),
            "norm2": layernorm_from_sd(sd, f"{lp}norm2"),
            "cross_attn": mha_block_from_sd(sd, f"{lp}cross_attn."),
            "dense": dense_network_from_sd(sd, f"{lp}dense."),
        }

    cae = {"global_tokens": _np(sd[f"{prefix}cae.global_tokens"])}
    for i in _child_indices(sd, f"{prefix}cae.from_layers."):
        cae[f"from_layer_{i}"] = _cross_layer(f"{prefix}cae.from_layers.{i}.")
        cae[f"to_layer_{i}"] = _cross_layer(f"{prefix}cae.to_layers.{i}.")
    out = {
        "node_embd": dense_network_from_sd(sd, f"{prefix}node_embd."),
        "outp_embd": dense_network_from_sd(sd, f"{prefix}outp_embd."),
        "cae": cae,
    }
    if _has(sd, f"{prefix}ctxt_emdb."):
        out["ctxt_embd"] = dense_network_from_sd(sd, f"{prefix}ctxt_emdb.")
    return out


def mdma_params_from_sd(sd: Mapping[str, Any], prefix: str = "") -> dict:
    """MDMA (mdma.py:87-176) state_dict slice -> flax MDMA param subtree.

    nn.MultiheadAttention packs q/k/v into in_proj_weight rows; the flax twin
    keeps them as separate attn_q/attn_k/attn_v Denses. The reference's
    top-level `embbed_cls` typo maps to flax `embed_cls`; each block's
    `cond_cls` Linear is dead code (see module docstring) and is dropped."""
    out = {
        "embed": dense_from_sd(sd, f"{prefix}embed"),
        "embed_cls": dense_from_sd(sd, f"{prefix}embbed_cls"),
        "cond": dense_from_sd(sd, f"{prefix}cond"),
        "out": dense_from_sd(sd, f"{prefix}out"),
    }
    for i in _child_indices(sd, f"{prefix}encoder."):
        bp = f"{prefix}encoder.{i}."
        in_w = _np(sd[f"{bp}attn.in_proj_weight"])
        in_b = _np(sd[f"{bp}attn.in_proj_bias"])
        h = in_w.shape[0] // 3
        out[f"block_{i}"] = {
            **{
                fc: dense_from_sd(sd, f"{bp}{fc}")
                for fc in ("fc0", "fc0_cls", "fc1", "fc1_cls", "fc2_cls")
            },
            "ln": layernorm_from_sd(sd, f"{bp}ln"),
            "attn_q": {"kernel": in_w[:h].T, "bias": in_b[:h]},
            "attn_k": {"kernel": in_w[h : 2 * h].T, "bias": in_b[h : 2 * h]},
            "attn_v": {"kernel": in_w[2 * h :].T, "bias": in_b[2 * h :]},
            "attn_out": dense_from_sd(sd, f"{bp}attn.out_proj"),
        }
    return out


_NET_CONVERTERS = {
    "epic": epic_encoder_params_from_sd,
    "droid_fulltransformer": full_transformer_params_from_sd,
    "droid_fullcrossattention": full_crossattention_params_from_sd,
    "mdma": mdma_params_from_sd,
}


def variables_from_reference_state_dict(sd: Mapping[str, Any], model) -> dict:
    """Reference SetFlowMatchingLitModule state_dict -> flax `variables`.

    `model` is the matching FlowMatchingModel (same dims/conditioning); its
    init tree is the shape-checked template, so any hyperparameter mismatch
    fails loudly instead of producing a silently wrong network."""
    if model.model not in _NET_CONVERTERS:
        raise NotImplementedError(
            f"checkpoint import supports {sorted(_NET_CONVERTERS)} "
            f"(got model={model.model!r})"
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
    convert = _NET_CONVERTERS[model.model]
    params = {}
    for k in range(model.n_transforms):
        pre = f"flows.{k}.net."
        if not any(key.startswith(pre) for key in sd):
            raise KeyError(
                f"state_dict has no {pre}* keys — is this a "
                "SetFlowMatchingLitModule checkpoint? For a bare network "
                "state_dict use the *_params_from_sd converters directly"
            )
        params[f"flows_{k}"] = {"net": convert(sd, pre)}

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
