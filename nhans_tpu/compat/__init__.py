"""Compatibility layer: one-way importer for published TF N-HANS
checkpoints (reference trained_model/ Saver triplets) into nhans_tpu
variable pytrees — no TensorFlow dependency."""

from nhans_tpu.compat.tf_bundle import TFBundleReader  # noqa: F401
from nhans_tpu.compat.tf_import import (  # noqa: F401
    import_tf_checkpoint,
    tf_name_map,
)
