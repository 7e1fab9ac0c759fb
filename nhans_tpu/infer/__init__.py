from nhans_tpu.infer.enhance import Enhancer  # noqa: F401
