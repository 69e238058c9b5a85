from tethys_tpu.models.whisper import (  # noqa: F401
    WhisperEncoder,
    WhisperDecoder,
    WhisperModel,
    WhisperForConditionalGeneration,
    create_whisper_model,
)
from tethys_tpu.models.wav2vec2 import (  # noqa: F401
    Wav2Vec2FeatureExtractor,
    Wav2Vec2Encoder,
    Wav2Vec2Quantizer,
    Wav2Vec2Model,
    Wav2Vec2ForPreTraining,
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
    create_full_model,
)
