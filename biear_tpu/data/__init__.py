from .labels import pack_label, build_label_from_npz_dict, aoa_to_sector_label, DIST_CLASSES
from .h5io import (
    save_active_h5, save_passive_h5, load_arrays_from_h5,
    ActiveH5Dataset, PassiveH5Dataset,
)
from .pipeline import batch_iterator, Prefetcher
from .synth import AnechoicSynthesizer, make_test_hrir_bank, make_test_segments
from .passive_synth import PassiveFeatureSynth
from .synth_reverb import (ReverbSynthesizer, make_test_brir_bank,
                           AUDITORIUM3_SPEAKER_XY, SPIRIT_SPEAKER_XY,
                           dist_class_5, scene_speaker_xy)
