from tethys_tpu.audio.frontend import (  # noqa: F401
    extract_fbank_features,
    hann_window,
    linear_to_mel_weight_matrix,
    log_mel_features,
    prepare_input_features,
    prepare_streaming_features,
    stream_log_mel,
)
from tethys_tpu.audio.pallas_logmel import fused_log_mel  # noqa: F401
