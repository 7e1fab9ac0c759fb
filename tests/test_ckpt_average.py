"""tools/ckpt_average.py: tail/SWA checkpoint averaging.

The averaged tree must be the exact uniform mean of the inputs (float
leaves), round-trip through save_variables/load_variables, and load
into the enhancer template like any single-step checkpoint.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ckpt_average import average_variables  # noqa: E402


def _tree(scale):
    return {
        "params": {"dense": {"kernel": np.full((3, 2), scale, np.float32),
                             "bias": np.arange(2, dtype=np.float32) * scale}},
        "batch_stats": {"bn": {"mean": np.full((4,), scale, np.float32)}},
    }


def test_average_is_uniform_mean():
    avg = average_variables([_tree(1.0), _tree(2.0), _tree(5.0)])
    want = (1.0 + 2.0 + 5.0) / 3.0
    np.testing.assert_allclose(avg["params"]["dense"]["kernel"],
                               np.full((3, 2), want), rtol=1e-6)
    np.testing.assert_allclose(avg["batch_stats"]["bn"]["mean"],
                               np.full((4,), want), rtol=1e-6)
    assert avg["params"]["dense"]["kernel"].dtype == np.float32


def test_roundtrip_and_template_load(tmp_path):
    from nhans_tpu.train.checkpoint import load_variables, save_variables

    avg = average_variables([_tree(0.5), _tree(1.5)])
    out = os.path.join(str(tmp_path), "avg_ck")
    save_variables(out, avg)
    import jax
    template = jax.tree_util.tree_map(np.zeros_like, avg)
    back = load_variables(out, template)
    np.testing.assert_allclose(
        np.asarray(back["params"]["dense"]["kernel"]),
        avg["params"]["dense"]["kernel"], rtol=1e-6)
