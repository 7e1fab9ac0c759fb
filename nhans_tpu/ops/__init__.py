from nhans_tpu.ops.stft_pallas import pallas_log_spectrogram  # noqa: F401
