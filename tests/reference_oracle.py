"""Helpers to use the read-only reference PyTorch implementation as a numerical oracle.

We import reference modules (never copy their code) to produce golden outputs for
parity tests.  Everything is guarded: tests skip when torch or the reference tree is
unavailable.
"""

import os
import sys

REFERENCE_ROOT = "/root/reference/polyffusion"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def torch_state_to_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def stub_pretty_midi():
    """Reference dl_modules imports pretty_midi at module level (only used for
    MIDI output helpers we never call in tests) — stub it."""
    import types

    if "pretty_midi" not in sys.modules:
        pm = types.ModuleType("pretty_midi")
        pm.PrettyMIDI = object
        pm.Instrument = object
        pm.Note = object
        sys.modules["pretty_midi"] = pm


def import_reference_samplers():
    """Import the reference SDFSampler/DDIMSampler/LatentDiffusion with stub deps.

    The reference modules import labml (progress meters), utils (pretty_midi-based
    image dump) and — through the unused autoencoder path — torchvision; none of
    these affect sampler numerics, so we stub them.
    """
    import types

    add_reference_path()

    if "labml" not in sys.modules:
        monit = types.SimpleNamespace(
            iterate=lambda name, it, *a, **k: it,
            enum=lambda name, it, *a, **k: enumerate(it),
        )
        labml = types.ModuleType("labml")
        labml.monit = monit
        sys.modules["labml"] = labml
        sys.modules["labml.monit"] = monit

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(vgg16=None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models

    if "utils" not in sys.modules or not hasattr(sys.modules["utils"], "show_image"):
        u = types.ModuleType("utils")
        u.show_image = lambda *a, **k: None
        sys.modules["utils"] = u

    from sampler_sdf import SDFSampler  # noqa: E402
    from sampler_ddim import DDIMSampler  # noqa: E402
    from stable_diffusion.latent_diffusion import LatentDiffusion  # noqa: E402

    return LatentDiffusion, SDFSampler, DDIMSampler
