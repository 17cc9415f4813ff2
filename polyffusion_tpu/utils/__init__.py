"""Host-side utilities: representation codecs, MIDI IO, image dumps."""

from .reprs import (  # noqa: F401
    chd_pitch_shift,
    chd_to_onehot,
    check_prmat2c_integrity,
    compute_prmat2c_density,
    denormalize_prmat,
    nmat_to_pianotree_repr,
    nmat_to_prmat,
    nmat_to_prmat2c,
    nmat_to_rhy_array,
    normalize_prmat,
    onehot_to_chd,
    pianotree_pitch_shift,
    pnotree_to_nmat,
    pr_mat_pitch_shift,
    prmat2c_to_nmat,
    prmat2c_to_prmat,
)
from .midi import Instrument, MidiFile, Note, load_midi, save_midi  # noqa: F401
from .midi_io import (  # noqa: F401
    chd_to_midi_file,
    estx_to_midi_file,
    nmat_from_midi_seconds,
    prmat2c_to_midi_file,
    prmat_to_midi_file,
)
