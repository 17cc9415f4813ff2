"""JAX parameter trees -> reference PyTorch state dicts (the reverse of
``torch_import``).

Lets a model trained in this framework run under the reference implementation
unchanged: the exported dict uses the reference's legacy learner layout
(``{"model": {"ldm.eps_model.<...>": tensor}}``), which
``Polyffusion_SDF.load_trained`` consumes (reference models/model_sdf.py:59-84).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t_linear(out: Dict, tk: str, sub: Dict) -> None:
    out[tk + ".weight"] = np.ascontiguousarray(np.asarray(sub["kernel"]).T)
    if "bias" in sub:
        out[tk + ".bias"] = np.asarray(sub["bias"])


def _t_conv(out: Dict, tk: str, sub: Dict) -> None:
    out[tk + ".weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(sub["kernel"]), (3, 2, 0, 1))
    )
    out[tk + ".bias"] = np.asarray(sub["bias"])


def _t_norm(out: Dict, tk: str, sub: Dict) -> None:
    out[tk + ".weight"] = np.asarray(sub["scale"])
    out[tk + ".bias"] = np.asarray(sub["bias"])


def _t_resblock(out: Dict, tk: str, sub: Dict) -> None:
    _t_norm(out, tk + ".in_layers.0", sub["in_norm"])
    _t_conv(out, tk + ".in_layers.2", sub["in_conv"])
    _t_linear(out, tk + ".emb_layers.1", sub["emb_proj"])
    _t_norm(out, tk + ".out_layers.0", sub["out_norm"])
    _t_conv(out, tk + ".out_layers.3", sub["out_conv"])
    if "skip" in sub:
        _t_conv(out, tk + ".skip_connection", sub["skip"])


def _t_spatial_transformer(out: Dict, tk: str, sub: Dict) -> None:
    _t_norm(out, tk + ".norm", sub["norm"])
    _t_conv(out, tk + ".proj_in", sub["proj_in"])
    _t_conv(out, tk + ".proj_out", sub["proj_out"])
    k = 0
    while f"block_{k}" in sub:
        b = sub[f"block_{k}"]
        bt = f"{tk}.transformer_blocks.{k}"
        for n in ("norm1", "norm2", "norm3"):
            _t_norm(out, f"{bt}.{n}", b[n])
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                _t_linear(out, f"{bt}.{attn}.{proj}", b[attn][proj])
            _t_linear(out, f"{bt}.{attn}.to_out.0", b[attn]["to_out"])
        _t_linear(out, f"{bt}.ff.net.0.proj", b["ff"]["geglu_proj"])
        _t_linear(out, f"{bt}.ff.net.2", b["ff"]["proj_out"])
        k += 1


def unet_params_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    """flax ``models.unet.UNetModel`` params -> reference UNet state dict (numpy)."""
    out: Dict[str, np.ndarray] = {}
    _t_linear(out, "time_embed.0", params["time_embed_0"])
    _t_linear(out, "time_embed.2", params["time_embed_2"])
    _t_conv(out, "input_blocks.0.0", params["input_blocks_0_0"])

    for name, sub in params.items():
        if not (name.startswith("input_blocks_") or name.startswith("output_blocks_")):
            continue
        if name == "input_blocks_0_0":
            continue
        side, i, j = name.rsplit("_", 2)  # side = "input_blocks" | "output_blocks"
        tk = f"{side}.{i}.{j}"
        if "in_norm" in sub:
            _t_resblock(out, tk, sub)
        elif "proj_in" in sub:
            _t_spatial_transformer(out, tk, sub)
        elif "conv" in sub:
            # DownSample (input half) uses key "op"; UpSample uses "conv"
            _t_conv(out, tk + (".op" if side == "input_blocks" else ".conv"), sub["conv"])
        else:
            raise KeyError(f"unrecognized block {name}")

    _t_resblock(out, "middle_block.0", params["middle_block_0"])
    _t_spatial_transformer(out, "middle_block.1", params["middle_block_1"])
    _t_resblock(out, "middle_block.2", params["middle_block_2"])
    _t_norm(out, "out.0", params["out_norm"])
    _t_conv(out, "out.2", params["out_conv"])
    return out


def save_reference_checkpoint(params: Dict, path: str, prefix: str = "ldm.eps_model") -> None:
    """Write a legacy-learner-format torch checkpoint the reference can load."""
    import torch

    sd = {
        f"{prefix}.{k}": torch.from_numpy(np.ascontiguousarray(v))
        for k, v in unet_params_to_torch(params).items()
    }
    torch.save({"model": sd}, path)
