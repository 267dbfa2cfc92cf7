from .erb import (
    erb_hz,
    erb_rate,
    inv_erb_rate,
    erb_spaced_fc_and_q,
    make_deltaQ_profile,
)
from .framing import hann_window_periodic, frame_1s
from .filterbank import gaussian_filterbank, filterbank_apply
from .xcorr import cross_correlation_feature
