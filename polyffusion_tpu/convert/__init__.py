"""Checkpoint conversion from the reference PyTorch formats."""

from .torch_import import (  # noqa: F401
    bigru_params_from_torch,
    chord_decoder_params_from_torch,
    chord_encoder_params_from_torch,
    gru_params_from_torch,
    pianotree_encoder_params_from_torch,
    split_by_prefix,
    strip_dataparallel,
    texture_encoder_params_from_torch,
    torch_file_to_numpy,
    unet_params_from_torch,
)
