from nhans_tpu.data.manifest import (  # noqa: F401
    create_seeds,
    create_speech_seeds,
    create_noise_seeds,
    load_seeds,
)
