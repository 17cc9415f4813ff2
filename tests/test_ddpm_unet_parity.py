"""Parity of the plain DDPM UNet vs the reference ``ddpm.unet.UNet``."""

import numpy as np
import pytest

from reference_oracle import add_reference_path, reference_available, torch_state_to_numpy

if not reference_available():
    pytest.skip("torch/reference unavailable", allow_module_level=True)

import torch  # noqa: E402

add_reference_path()

import jax.numpy as jnp  # noqa: E402

from polyffusion_tpu.convert.torch_import import ddpm_unet_params_from_torch  # noqa: E402
from polyffusion_tpu.models.ddpm_unet import DDPMUNet  # noqa: E402

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


@pytest.fixture(scope="module")
def torch_unet():
    import types, sys

    if "labml_helpers" not in sys.modules:
        # ddpm/unet.py imports labml_helpers.module.Module (a bare nn.Module alias)
        mod = types.ModuleType("labml_helpers")
        sub = types.ModuleType("labml_helpers.module")
        sub.Module = torch.nn.Module
        mod.module = sub
        sys.modules["labml_helpers"] = mod
        sys.modules["labml_helpers.module"] = sub
    from ddpm.unet import UNet as TorchDDPMUNet

    torch.manual_seed(0)
    m = TorchDDPMUNet(
        image_channels=2,
        n_channels=32,
        ch_mults=[1, 2],
        is_attn=[False, True],
        n_blocks=1,
    )
    m.eval()
    return m


def test_ddpm_unet_forward_parity(torch_unet, rng):
    x = rng.standard_normal((2, 2, 16, 16)).astype(np.float32)
    t = np.array([7, 890], np.int64)
    with torch.no_grad():
        want = torch_unet(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    params = ddpm_unet_params_from_torch(torch_state_to_numpy(torch_unet))
    jm = DDPMUNet(
        image_channels=2, n_channels=32, ch_mults=(1, 2), is_attn=(False, True), n_blocks=1
    )
    got = jm.apply(
        {"params": params},
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        jnp.asarray(t),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
