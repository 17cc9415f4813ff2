"""LPIPS perceptual loss (VGG16 features), TPU-native.

Counterpart of reference ``stable_diffusion/losses/lpips.py:12`` (the stripped
richzhang/PerceptualSimilarity metric used by ``contperceptual.py:28`` with
``perceptual_weight=1.0``): scale-shift the RGB input, run VGG16 features,
channel-normalize the five relu taps (relu1_2/2_2/3_3/4_3/5_3), square the
difference, 1x1 "lin" conv per tap, spatial-average, sum.

The environment has no torchvision and no egress, so pretrained VGG/LPIPS
weights cannot be downloaded here — the module initializes randomly and
:func:`lpips_params_from_torch` converts the torch checkpoints (torchvision
``vgg16.features`` state dict + the taming ``vgg.pth`` LPIPS lin weights)
whenever the user supplies them.  ``tasks/autoencoder.py`` enables the term via
``perceptual_weight`` + ``lpips_path`` config keys and keeps the reference
default behavior (term absent) when no weights are given.

Layout is NHWC (TPU-native); the converter transposes torch's OIHW kernels.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg16.features conv indices -> output channels
# (reference lpips.py vgg16 class: slices [0:4), [4:9), [9:16), [16:23), [23:30))
_VGG_CONVS = {
    0: 64, 2: 64,
    5: 128, 7: 128,
    10: 256, 12: 256, 14: 256,
    17: 512, 19: 512, 21: 512,
    24: 512, 26: 512, 28: 512,
}
_POOL_BEFORE = (5, 10, 17, 24)  # maxpool at features idx 4, 9, 16, 23
_TAP_AFTER = (2, 7, 14, 21, 28)  # relu taps after these convs
_CHNS = (64, 128, 256, 512, 512)

# ScalingLayer constants (reference lpips.py:70-77)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 ``features`` trunk returning the five LPIPS relu taps (NHWC)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        taps = []
        for idx, out_c in _VGG_CONVS.items():
            if idx in _POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(
                out_c,
                (3, 3),
                padding=((1, 1), (1, 1)),
                dtype=self.dtype,
                name=f"conv{idx}",
            )(x)
            x = nn.relu(x)
            if idx in _TAP_AFTER:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """d(x, y) per batch element, shape (B,) (reference lpips.py forward)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        vgg = VGG16Features(self.dtype, name="vgg")

        def prep(t):
            return ((t.astype(jnp.float32) - shift) / scale).astype(self.dtype)

        taps_x = vgg(prep(x))
        taps_y = vgg(prep(y))

        def unit_normalize(t, eps=1e-10):
            # channel-unit-norm (reference normalize_tensor, channel axis last here)
            norm = jnp.sqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True))
            return t / (norm + eps).astype(t.dtype)

        total = 0.0
        for k, (tx, ty) in enumerate(zip(taps_x, taps_y)):
            diff = (unit_normalize(tx) - unit_normalize(ty)) ** 2
            lin = self.param(
                f"lin{k}", nn.initializers.lecun_normal(), (1, 1, _CHNS[k], 1)
            )
            val = jnp.einsum("bhwc,co->bhwo", diff, lin[0, 0].astype(diff.dtype))
            total = total + jnp.mean(val, axis=(1, 2, 3))  # spatial_average
        return total


def lpips_params_from_torch(state_dict: Dict[str, Any]) -> Dict:
    """Map a torch LPIPS state dict to this module's param tree.

    Accepts the combined keys the reference checkpoint carries
    (``net.sliceN.<idx>.weight/bias`` for the VGG trunk and
    ``lin{k}.model.1.weight`` for the heads), or raw torchvision
    ``features.<idx>.weight/bias`` keys for the trunk.
    """
    import numpy as np

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    vgg: Dict[str, Dict] = {}
    lins: Dict[str, Any] = {}
    for key, val in state_dict.items():
        arr = to_np(val)
        parts = key.split(".")
        if parts[0].startswith("lin"):
            # lin{k}.model.1.weight : (1, C, 1, 1) -> (1, 1, C, 1)
            k = parts[0][3:]
            lins[f"lin{k}"] = arr.transpose(2, 3, 1, 0)
        elif parts[0] == "net" or parts[0] == "features":
            idx = int(parts[-2])
            kind = parts[-1]  # weight | bias
            name = f"conv{idx}"
            if idx not in _VGG_CONVS:
                continue
            dst = vgg.setdefault(name, {})
            if kind == "weight":  # OIHW -> HWIO
                dst["kernel"] = arr.transpose(2, 3, 1, 0)
            else:
                dst["bias"] = arr
    params: Dict[str, Any] = {"vgg": vgg}
    params.update(lins)
    return params
