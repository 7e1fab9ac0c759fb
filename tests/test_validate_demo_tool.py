"""Unit tests for tools/validate_demo.py's separator-context derivation.

The source_separation demo dirs ship only ``mixed`` and the published
model's separated output (no speaker context recordings); the tool
carves target/interference contexts from the first 2 s.  These tests
check the derivation on synthetic two-source mixtures where ground
truth is known exactly.

No JAX; pure numpy, safe to run next to a live TPU process.
"""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "validate_demo", os.path.join(REPO, "tools", "validate_demo.py"))
validate_demo = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(validate_demo)

derive = validate_demo.derive_separator_contexts


def _two_sources(n=5 * 16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    target = 8000 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(7 * t))
    interf = 4000 * rng.standard_normal(n)
    return target, interf


def test_exact_recovery_when_golden_is_true_target():
    target, interf = _two_sources()
    mixed = target + interf
    pos, neg = derive(mixed, target)
    assert len(pos) == 2 * 16000 and len(neg) == 2 * 16000
    # scale projection: a == <m,g>/<g,g>; with golden == the true source,
    # the residual context must be (almost exactly) the interference
    # up to the projection's scalar bias
    corr = np.dot(neg, interf[:len(neg)]) / (
        np.linalg.norm(neg) * np.linalg.norm(interf[:len(neg)]) + 1e-9)
    assert corr > 0.99


def test_rescaled_golden_is_projected_back():
    target, interf = _two_sources(seed=1)
    mixed = target + interf
    # published outputs are peak-normalized to a different scale
    golden = 0.137 * target
    pos, neg = derive(mixed, golden)
    # target context recovers the MIXED-scale target, not the golden scale
    scale = np.linalg.norm(pos) / (np.linalg.norm(target[:len(pos)]) + 1e-9)
    assert 0.95 < scale < 1.05
    corr = np.dot(pos, target[:len(pos)]) / (
        np.linalg.norm(pos) * np.linalg.norm(target[:len(pos)]) + 1e-9)
    assert corr > 0.999


def test_length_mismatch_uses_common_prefix():
    target, interf = _two_sources(seed=2)
    mixed = target + interf
    golden = target[: len(target) - 4321]
    pos, neg = derive(mixed, golden)
    assert len(pos) == 2 * 16000 and len(neg) == 2 * 16000
    assert np.isfinite(pos).all() and np.isfinite(neg).all()
