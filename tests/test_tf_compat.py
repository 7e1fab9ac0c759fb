"""TF-checkpoint importer tests.

The shipped reference checkpoints have their weight payloads LFS-stripped
(reference .MISSING_LARGE_BLOBS), but the .index files are intact — enough
to validate (a) the pure-Python bundle-format reader and (b) that our
static name map covers the real variable set name-for-name and
shape-for-shape.  These tests skip when the reference mount is absent.
"""

import os

import numpy as np
import pytest

import jax

REF_SN = ("/root/reference/N_HANS___Selective_Noise/trained_model/"
          "81448_0-1000000")
REF_SS = ("/root/reference/N_HANS___Source_Separation/trained_model/"
          "81457_2-545000")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_SN + ".index"),
                               reason="reference checkpoints not mounted")


@needs_ref
def test_bundle_reader_parses_reference_index():
    from nhans_tpu.compat.tf_bundle import TFBundleReader
    r = TFBundleReader(REF_SN)
    assert len(r.entries) == 571
    assert r.shape("last_dense/w") == (13312, 201)
    assert r.shape("last_conv/w") == (5, 1, 512, 512)
    assert r.shape("embedding/noise_resblock1_1_conv1/w") == (8, 4, 1, 64)
    assert r.shape("resblock1_1_conv1_noise_pos_emb/w") == (512, 64)
    # payloads are stripped in this mount
    assert not r.has_payload("last_dense/w")


@needs_ref
@pytest.mark.parametrize("prefix,task,extra", [
    (REF_SN, "denoiser", set()),
    # the separator keeps an unused global_step Variable (default TF name
    # 'Variable', reference Source_Separation/main.py:383)
    (REF_SS, "separator", {"Variable"}),
])
def test_name_map_is_exact(prefix, task, extra):
    from nhans_tpu.compat.tf_import import check_name_map_against_index
    missing, unmapped = check_name_map_against_index(prefix, task)
    assert missing == [], f"mapped names absent from ckpt: {missing[:10]}"
    assert set(unmapped) == extra, f"ckpt names not mapped: {unmapped[:10]}"


@needs_ref
def test_name_map_shapes_match_model():
    """Every mapped checkpoint tensor must have exactly the element count
    of the corresponding flax parameter."""
    from nhans_tpu.compat.tf_bundle import TFBundleReader
    from nhans_tpu.compat.tf_import import tf_name_map, _get_in
    from nhans_tpu.config import Config
    from nhans_tpu.models import init_variables

    r = TFBundleReader(REF_SN)
    _, variables = init_variables(Config.denoiser(), jax.random.PRNGKey(0))
    for tf_name, (coll, path) in tf_name_map("denoiser").items():
        tf_shape = r.shape(tf_name)
        ours = _get_in(variables[coll], path)
        assert int(np.prod(tf_shape)) == int(np.prod(ours.shape)), (
            tf_name, tf_shape, ours.shape)


def test_import_roundtrip_synthetic(tmp_path):
    """Write a synthetic bundle in the TF format and import it."""
    from nhans_tpu.compat import tf_bundle as tb

    # Build a minimal index: leveldb-format table with one data block.
    import struct

    def varint(n):
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out

    def proto_bytes(field, payload):
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def proto_varint(field, v):
        return varint(field << 3) + varint(v)

    # tensor: float32 [2,3]
    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    shape = proto_bytes(2, proto_varint(1, 2)) + proto_bytes(
        2, proto_varint(1, 3))
    entry = (proto_varint(1, 1)  # dtype float32
             + proto_bytes(2, shape)
             + proto_varint(3, 0) + proto_varint(4, 0)
             + proto_varint(5, data.nbytes))

    def block(entries):
        body = b""
        for key, val in entries:
            body += varint(0) + varint(len(key)) + varint(len(val))
            body += key + val
        body += struct.pack("<I", 0) + struct.pack("<I", 1)
        return body

    data_block = block([(b"t", entry)])
    blocks = data_block + b"\x00" + struct.pack("<I", 0)
    handle = varint(0) + varint(len(data_block))
    index_block = block([(b"t", handle)])
    io_ = len(blocks)
    blocks += index_block + b"\x00" + struct.pack("<I", 0)
    footer = varint(0) + varint(0) + varint(io_) + varint(len(index_block))
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    prefix = str(tmp_path / "ck")
    with open(prefix + ".index", "wb") as f:
        f.write(blocks + footer)
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(data.tobytes())

    r = tb.TFBundleReader(prefix)
    assert r.shape("t") == (2, 3)
    assert r.has_payload("t")
    np.testing.assert_array_equal(r.read("t"), data)


@needs_ref
@pytest.mark.slow
def test_full_571_tensor_import_roundtrip(tmp_path, rng):
    """End-to-end import proof without the stripped payloads (round-1
    VERDICT item 9): write a COMPLETE synthetic bundle with the real
    index's 571 names/shapes, run import_tf_checkpoint, and verify the
    imported flax model's forward pass against the numpy TF-semantics
    oracle consuming the same TF-named tensors directly."""
    from nhans_tpu.compat.tf_bundle import TFBundleReader, write_bundle
    from nhans_tpu.compat.tf_import import import_tf_checkpoint
    from nhans_tpu.config import Config
    from nhans_tpu.models import init_variables
    from tests import reference_model as RM

    real = TFBundleReader(REF_SN)
    assert len(real.entries) == 571

    tensors = {}
    for name in real.keys():
        shape = real.shape(name)
        arr = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        if name.endswith("pop_variance") or name.endswith("gamma"):
            arr = np.abs(arr) + 0.5
        tensors[name] = arr
    prefix = str(tmp_path / "synthetic-1000000")
    write_bundle(prefix, tensors)

    check = TFBundleReader(prefix)
    assert len(check.entries) == 571
    for name in real.keys():
        assert check.shape(name) == real.shape(name), name
        assert check.has_payload(name)

    cfg = Config.denoiser()
    model, variables = init_variables(cfg, jax.random.PRNGKey(0))
    imported = import_tf_checkpoint(prefix, variables, task="denoiser")

    mixed = rng.standard_normal((2, 35, 201)).astype(np.float32)
    ctx_a = rng.standard_normal((2, 200, 201)).astype(np.float32)
    ctx_b = rng.standard_normal((2, 200, 201)).astype(np.float32)
    ref_out = RM.model_forward(
        mixed.astype(np.float64), ctx_a.astype(np.float64),
        ctx_b.astype(np.float64),
        {k: np.asarray(v, np.float64) for k, v in tensors.items()})
    got = np.asarray(model.apply(imported, mixed, ctx_a, ctx_b, False))
    # relative-L2 criterion: fp32 flax vs fp64 oracle accumulates ~1e-3
    # relative noise at these (unnormalized random-weight) activation
    # scales; a single transposed/misrouted tensor yields O(1) error
    rel = (np.linalg.norm(got - ref_out)
           / max(np.linalg.norm(ref_out), 1e-9))
    assert rel < 3e-3, f"relative L2 error {rel}"
