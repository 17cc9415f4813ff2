"""Datasets and host->device input pipeline."""

from .dataset import SegmentDataset, SongNpz, write_song_npz  # noqa: F401
from .loader import Batch, BatchLoader, DeviceFeeder, collate, make_loaders  # noqa: F401
