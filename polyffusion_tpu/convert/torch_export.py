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


# ---------------------------------------------------------------------------
# Full legacy-learner checkpoint (resume-compatible, reference learner.py:70-124)
# ---------------------------------------------------------------------------

# per-module (torch-param-name, flax-path) orders, matching the reference
# modules' registration order exactly (verified against named_parameters() in
# tests/test_legacy_checkpoint.py)
def _resblock_order(tk, fp, has_skip):
    pairs = [
        (f"{tk}.in_layers.0", fp + ("in_norm",), "norm"),
        (f"{tk}.in_layers.2", fp + ("in_conv",), "conv"),
        (f"{tk}.emb_layers.1", fp + ("emb_proj",), "linear"),
        (f"{tk}.out_layers.0", fp + ("out_norm",), "norm"),
        (f"{tk}.out_layers.3", fp + ("out_conv",), "conv"),
    ]
    if has_skip:
        pairs.append((f"{tk}.skip_connection", fp + ("skip",), "conv"))
    return pairs


def _transformer_order(tk, fp, sub):
    pairs = [
        (f"{tk}.norm", fp + ("norm",), "norm"),
        (f"{tk}.proj_in", fp + ("proj_in",), "conv"),
    ]
    k = 0
    while f"block_{k}" in sub:
        bt, bp = f"{tk}.transformer_blocks.{k}", fp + (f"block_{k}",)
        for attn, nrm in (("attn1", "norm1"), ("attn2", "norm2")):
            for proj in ("to_q", "to_k", "to_v"):
                pairs.append((f"{bt}.{attn}.{proj}", bp + (attn, proj), "linear_nobias"))
            pairs.append((f"{bt}.{attn}.to_out.0", bp + (attn, "to_out"), "linear"))
            pairs.append((f"{bt}.{nrm}", bp + (nrm,), "norm"))
        pairs.append((f"{bt}.ff.net.0.proj", bp + ("ff", "geglu_proj"), "linear"))
        pairs.append((f"{bt}.ff.net.2", bp + ("ff", "proj_out"), "linear"))
        pairs.append((f"{bt}.norm3", bp + ("norm3",), "norm"))
        k += 1
    pairs.append((f"{tk}.proj_out", fp + ("proj_out",), "conv"))
    return pairs


def unet_param_order(params: Dict):
    """(torch key, flax path, kind) triples in the reference UNetModel's
    ``named_parameters()`` order (module registration order)."""
    order = [
        ("time_embed.0", ("time_embed_0",), "linear"),
        ("time_embed.2", ("time_embed_2",), "linear"),
        ("input_blocks.0.0", ("input_blocks_0_0",), "conv"),
    ]

    def block_ids(side):
        ids = set()
        for name in params:
            if name.startswith(side) and name != "input_blocks_0_0":
                _, i, j = name.rsplit("_", 2)
                ids.add((int(i), int(j)))
        return sorted(ids)

    def emit(side, i, j):
        name = f"{side}_{i}_{j}"
        sub = params[name]
        tk = f"{side}.{i}.{j}"
        fp = (name,)
        if "in_norm" in sub:
            order.extend(_resblock_order(tk, fp, "skip" in sub))
        elif "proj_in" in sub:
            order.extend(_transformer_order(tk, fp, sub))
        elif "conv" in sub:
            suffix = ".op" if side == "input_blocks" else ".conv"
            order.append((tk + suffix, fp + ("conv",), "conv"))
        else:  # pragma: no cover
            raise KeyError(name)

    for i, j in block_ids("input_blocks"):
        emit("input_blocks", i, j)
    mb0, mb1, mb2 = ("middle_block_0",), ("middle_block_1",), ("middle_block_2",)
    order.extend(_resblock_order("middle_block.0", mb0, "skip" in params["middle_block_0"]))
    order.extend(_transformer_order("middle_block.1", mb1, params["middle_block_1"]))
    order.extend(_resblock_order("middle_block.2", mb2, "skip" in params["middle_block_2"]))
    for i, j in block_ids("output_blocks"):
        emit("output_blocks", i, j)
    order.append(("out.0", ("out_norm",), "norm"))
    order.append(("out.2", ("out_conv",), "conv"))
    return order


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _leaf_pairs(kind, tk, sub):
    """[(torch param key, flax leaf key, converter)] for one module."""
    conv = lambda a: np.ascontiguousarray(np.transpose(np.asarray(a), (3, 2, 0, 1)))
    lin = lambda a: np.ascontiguousarray(np.asarray(a).T)
    ident = lambda a: np.asarray(a)
    if kind == "conv":
        return [(f"{tk}.weight", "kernel", conv), (f"{tk}.bias", "bias", ident)]
    if kind == "linear":
        return [(f"{tk}.weight", "kernel", lin), (f"{tk}.bias", "bias", ident)]
    if kind == "linear_nobias":
        return [(f"{tk}.weight", "kernel", lin)]
    if kind == "norm":
        return [(f"{tk}.weight", "scale", ident), (f"{tk}.bias", "bias", ident)]
    raise KeyError(kind)


def export_learner_checkpoint(
    params: Dict,
    path: str,
    *,
    schedule,
    opt_state=None,
    step: int = 0,
    epoch: int = 0,
    learning_rate: float = 5e-5,
    extra_model_state: Dict = None,
    n_extra_params: int = None,
    fp16: bool = False,
) -> None:
    """Write a FULL legacy-learner checkpoint (reference ``learner.py:70-84``):
    ``{"step", "epoch", "model", "optimizer", "scaler"}`` — accepted by the
    reference's *resume* path (``learner.restore_from_checkpoint`` →
    ``load_state_dict``), not just its inference loader.

    - ``schedule``: our NoiseSchedule; fills the LatentDiffusion parameter/buffer
      tensors (``ldm.alpha/beta/alpha_bar/sigma2``, latent_diffusion.py:90-108).
    - ``opt_state``: optax state from our Trainer; its Adam moments are exported
      as torch Adam ``exp_avg``/``exp_avg_sq`` with parameter indices matching
      ``Polyffusion_SDF.parameters()`` order (3 frozen schedule params first).
    - ``extra_model_state``: already-converted torch tensors for the frozen
      encoders (``chord_enc.*`` / ``chord_dec.*`` keys) stored alongside, as the
      reference's checkpoints do; ``n_extra_params`` overrides the count of
      those that are nn.Parameters (defaults to all of them).
    """
    import torch

    beta = np.asarray(schedule.beta, np.float32)
    alpha_bar = np.asarray(schedule.alpha_bar, np.float32)
    model_sd = {
        "ldm.alpha": torch.from_numpy(1.0 - beta),
        "ldm.beta": torch.from_numpy(beta),
        "ldm.alpha_bar": torch.from_numpy(alpha_bar),
        "ldm.sigma2": torch.from_numpy(beta),
    }

    order = unet_param_order(params)
    flat = []  # (torch key, numpy value) in reference parameters() order
    for tk, fp, kind in order:
        sub = _get_path(params, fp)
        for torch_key, leaf, convert in _leaf_pairs(kind, tk, sub):
            flat.append((f"ldm.eps_model.{torch_key}", convert(sub[leaf])))
    model_sd.update(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flat}
    )
    extra_model_state = extra_model_state or {}
    for k, v in extra_model_state.items():
        model_sd[k] = (
            v if isinstance(v, torch.Tensor)
            else torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
        )

    # ----- optimizer: torch Adam state dict ---------------------------------
    n_frozen_schedule = 3  # ldm.alpha, ldm.beta, ldm.alpha_bar (sigma2 is a buffer)
    if n_extra_params is None:
        n_extra_params = len(extra_model_state)
    n_total = n_frozen_schedule + len(flat) + n_extra_params
    state = {}
    if opt_state is not None:
        import jax

        adam = None
        for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "mu") and hasattr(x, "nu")
        ):
            if hasattr(s, "mu"):
                adam = s
                break
        assert adam is not None, "no ScaleByAdamState found in opt_state"
        count = int(adam.count)
        idx = n_frozen_schedule
        for tk, fp, kind in order:
            sub_mu = _get_path(adam.mu, fp)
            sub_nu = _get_path(adam.nu, fp)
            for _, leaf, convert in _leaf_pairs(kind, tk, sub_mu):
                state[idx] = {
                    "step": torch.tensor(float(count)),
                    "exp_avg": torch.from_numpy(
                        np.ascontiguousarray(convert(sub_mu[leaf]))
                    ),
                    "exp_avg_sq": torch.from_numpy(
                        np.ascontiguousarray(convert(sub_nu[leaf]))
                    ),
                }
                idx += 1
    optimizer_sd = {
        "state": state,
        "param_groups": [
            {
                "lr": learning_rate,
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": 0,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(n_total)),
            }
        ],
    }

    scaler_sd = (
        {
            "scale": 65536.0,
            "growth_factor": 2.0,
            "backoff_factor": 0.5,
            "growth_interval": 2000,
            "_growth_tracker": 0,
        }
        if fp16
        else {}
    )

    torch.save(
        {
            "step": int(step),
            "epoch": int(epoch),
            "model": model_sd,
            "optimizer": optimizer_sd,
            "scaler": scaler_sd,
        },
        path,
    )
