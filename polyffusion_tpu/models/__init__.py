"""Neural building blocks (flax.linen, NHWC, bf16-capable)."""

from .ddpm_unet import DDPMUNet  # noqa: F401
from .encoders import (  # noqa: F401
    ChordDecoder,
    ChordEncoder,
    PianoTreeEncoder,
    TextureEncoder,
    chord_recon_loss,
)
from .gru import GRU, BiGRU, gru_cell_apply, gru_scan  # noqa: F401
from .pianotree_dec import (  # noqa: F401
    PianoTreeDecoder,
    output_to_pnotree,
    pianotree_recon_loss,
)
from .polydis import PolyDis, PolydisAftertouch  # noqa: F401
from .unet import UNetModel, nchw_to_nhwc, nhwc_to_nchw, timestep_embedding  # noqa: F401
