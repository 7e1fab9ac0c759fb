from nhans_tpu.utils import wavio  # noqa: F401
