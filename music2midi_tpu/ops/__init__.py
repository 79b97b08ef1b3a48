from .mel import LogMelConfig, log_mel_spectrogram, mel_filterbank  # noqa: F401
