"""Checkpoint conversion CLI: reference torch checkpoints -> .npz parameter trees.

    python -m polyffusion_tpu.convert --kind unet --input weights.pt --output unet_params.npz
    python -m polyffusion_tpu.convert --kind polydis --input model_master_final.pt --output polydis.npz

Kinds: unet (sdf eps-model from legacy .pt / lightning .ckpt), ddpm_unet,
chd8bar (chord enc+dec), txt_enc, pnotree_enc, pianotree_dec, polydis, autoencoder.

The .npz holds flattened key/value pairs ("a/b/c" -> array); load with
``polyffusion_tpu.convert.load_params_npz``.
"""

from __future__ import annotations

import argparse

import numpy as np

from . import torch_import as T


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(tree, path):
    np.savez_compressed(path, **flatten_tree(tree))


def load_params_npz(path):
    with np.load(path) as f:
        return unflatten_tree({k: f[k] for k in f.files})


def convert(kind: str, input_path: str):
    sd = T.strip_dataparallel(T.torch_file_to_numpy(input_path))

    def strip_first(prefixes):
        for p in prefixes:
            hit = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            if hit:
                return hit
        return sd

    if kind == "unet":
        return T.unet_params_from_torch(
            strip_first(("model.ldm.eps_model.", "ldm.eps_model.", "eps_model."))
        )
    if kind == "ddpm_unet":
        return T.ddpm_unet_params_from_torch(
            strip_first(("model.ddpm.eps_model.", "ddpm.eps_model.", "eps_model."))
        )
    if kind == "chd8bar":
        return {
            "chord_enc": T.chord_encoder_params_from_torch(T.split_by_prefix(sd, "chord_enc")),
            "chord_dec": T.chord_decoder_params_from_torch(T.split_by_prefix(sd, "chord_dec")),
        }
    if kind == "txt_enc":
        return T.texture_encoder_params_from_torch(T.split_by_prefix(sd, "rhy_encoder"))
    if kind == "pnotree_enc":
        return T.pianotree_encoder_params_from_torch(sd)
    if kind == "pianotree_dec":
        return T.pianotree_decoder_params_from_torch(sd)
    if kind == "polydis":
        from ..models.polydis import PolyDis

        return PolyDis.params_from_torch_file(input_path)
    if kind == "autoencoder":
        return T.autoencoder_params_from_torch(sd)
    raise ValueError(f"unknown kind: {kind}")


def init_txt_enc(seed: int, emb_size=256, hidden_dim=1024, z_dim=256, num_channel=10):
    """Random-init TextureEncoder params in polydis.npz layout.

    The reference's texture conditioning uses the rhy_encoder of a pretrained
    PolyDis download (``/root/reference/polyffusion/train/__init__.py`` wiring);
    when those weights are unavailable, a FROZEN random encoder is still a
    deterministic injective-enough projection of the rhythm content, so the
    diffusion model trains against it the same way — document runs that use
    this as 'random frozen texture encoder'."""
    import jax
    import jax.numpy as jnp

    from ..models.encoders import TextureEncoder

    enc = TextureEncoder(
        emb_size=emb_size, hidden_dim=hidden_dim, z_dim=z_dim, num_channel=num_channel
    )
    params = enc.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 128)))["params"]
    return {"rhy_encoder": jax.tree.map(np.asarray, params)}


def init_pnotree_enc(seed: int):
    """Random-init PianoTreeEncoder params in pnotree.npz layout.

    Same rationale as ``init_txt_enc``: the reference conditions sdf_pnotree on
    a pretrained PianoTree VAE encoder (``models/model_sdf.py:138-151``); with
    no pretrained weights in this environment, a FROZEN random hierarchical
    encoder is still a deterministic projection of note content the diffusion
    model can learn against — document runs as 'random frozen pnotree encoder'.
    """
    import jax
    import jax.numpy as jnp

    from ..models.encoders import PianoTreeEncoder

    enc = PianoTreeEncoder()
    pn = jnp.full((1, 32, 20, 6), enc.pitch_pad, jnp.int32)
    params = enc.init(jax.random.PRNGKey(seed), pn)["params"]
    return jax.tree.map(np.asarray, params)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True)
    p.add_argument("--input", default=None)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--init",
        action="store_true",
        help="write RANDOM-INIT params instead of converting (kind=txt_enc or "
        "pnotree_enc): a frozen random encoder for environments without the "
        "reference's pretrained weights",
    )
    p.add_argument("--seed", type=int, default=0, help="--init PRNG seed")
    p.add_argument(
        "--reverse",
        action="store_true",
        help="export BACK to a reference torch checkpoint (kind=unet only): input is "
        "a params .npz or an orbax run dir (with --model), output a legacy .pt the "
        "reference's inference_sdf.py loads directly",
    )
    p.add_argument("--model", default=None, help="params preset for --reverse run dirs")
    args = p.parse_args(argv)

    if args.init:
        if args.kind == "txt_enc":
            tree = init_txt_enc(args.seed)
            label = "texture"
        elif args.kind == "pnotree_enc":
            tree = init_pnotree_enc(args.seed)
            label = "pnotree"
        else:
            raise SystemExit("--init supports kind=txt_enc or pnotree_enc")
        save_params_npz(tree, args.output)
        print(f"wrote random-init (seed {args.seed}) {label} encoder -> {args.output}")
        return
    if args.input is None:
        p.error("--input is required unless --init")

    if args.reverse:
        assert args.kind == "unet", "--reverse currently supports kind=unet"
        import os

        from .torch_export import save_reference_checkpoint

        if os.path.isdir(args.input):
            from ..config import load_params
            from ..inference import build_task_for_inference, load_unet_params

            cfg_path = os.path.join(args.input, "params.yaml")
            cfg = load_params(cfg_path if os.path.exists(cfg_path) else args.model)
            cfg["use_enc"] = False  # template only needs the UNet
            task = build_task_for_inference(cfg)
            params = load_unet_params(args.input, task)
        else:
            params = load_params_npz(args.input)
        save_reference_checkpoint(params, args.output)
        print(f"exported reference checkpoint -> {args.output}")
        return

    tree = convert(args.kind, args.input)
    save_params_npz(tree, args.output)
    n = len(flatten_tree(tree))
    print(f"converted {args.kind}: {n} tensors -> {args.output}")


if __name__ == "__main__":
    main()
