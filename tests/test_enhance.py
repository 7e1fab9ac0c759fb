"""End-to-end Enhancer test on CPU (tiny buckets/chunks).

With a fresh random init the head is zero-initialized (reference parity:
last_dense has w_std=0, main.py:238), so enhancement is an identity on the
log-magnitude pipeline — which makes the whole wav -> STFT -> windows ->
model -> iSTFT program checkable against pure-DSP reconstruction.
"""

import numpy as np
import jax
import pytest

from nhans_tpu.config import Config
from nhans_tpu.infer.enhance import Enhancer, context_samples
from nhans_tpu.models import init_variables


@pytest.mark.slow
def test_enhance_identity_at_init(rng):
    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    enh = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1,))

    mixed = rng.standard_normal(12000) * 1000
    pos = np.zeros(4000)
    neg = rng.standard_normal(9000) * 500
    out = enh.enhance(mixed, pos, neg)

    n = cfg.audio.trim_to_whole_frames(12000)
    f = cfg.audio.num_frames(n)
    expect_len = 160 * (f - 1) + 400
    assert len(out["denoised"]) == expect_len
    assert np.isfinite(out["denoised"]).all()
    # zero-init head => denoised == mixed_processed exactly
    np.testing.assert_allclose(out["denoised"], out["mixed_processed"],
                               atol=1e-6)
    # and mixed_processed reconstructs the normalized input (interior)
    xn = mixed / (np.max(np.abs(mixed)) + 1e-6)
    np.testing.assert_allclose(out["mixed_processed"][400:-400],
                               xn[400:expect_len - 400], atol=2e-3)
    # compensation math (reference apply.py:463-472)
    comp = enh.compensate(out["denoised"], out["removed"],
                          float(out["snr_est"]), compensate=0.5)
    np.testing.assert_allclose(
        comp, out["denoised"] + 0.5 * out["removed"], atol=1e-7)
    auto = enh.compensate(out["denoised"], out["removed"], 10.0, ac=True)
    np.testing.assert_allclose(
        auto, out["denoised"] + 0.5 * out["removed"], atol=1e-7)


def test_context_samples():
    cfg = Config.denoiser()
    # 200 frames x 160 hop + 400-160 remainder = 32240 samples
    assert context_samples(cfg) == 32240


@pytest.mark.slow
def test_enhance_long_matches_unsegmented(rng):
    """Segmented long-audio enhancement must equal the one-shot program
    (windows only see +-17 frames; OLA is linear)."""
    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    enh = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1, 3))

    mixed = rng.standard_normal(40000) * 1000  # 2.5 s
    pos = np.zeros(4000)
    neg = rng.standard_normal(9000) * 500

    whole = enh.enhance(mixed, pos, neg)
    seg = enh.enhance_long(mixed, pos, neg, segment_seconds=1.0,
                           segment_batch=2)
    n = len(whole["denoised"])
    assert len(seg["denoised"]) == n
    np.testing.assert_allclose(seg["denoised"][:n], whole["denoised"],
                               atol=2e-4)
    np.testing.assert_allclose(seg["mixed_processed"][:n],
                               whole["mixed_processed"], atol=2e-4)


@pytest.mark.slow
def test_packed_params_match_plain(rng):
    """pack_params=True (one device buffer per dtype, re-sliced inside
    the program) must be bit-identical to passing the raw pytree."""
    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(1), train=False)
    mixed = rng.standard_normal(9000) * 1000
    pos = np.zeros(4000)
    neg = rng.standard_normal(5000) * 500
    kw = dict(window_chunk=32, buckets_seconds=(1,))
    out_packed = Enhancer(cfg, variables, pack_params=True,
                          **kw).enhance(mixed, pos, neg)
    out_plain = Enhancer(cfg, variables, pack_params=False,
                         **kw).enhance(mixed, pos, neg)
    np.testing.assert_array_equal(out_packed["denoised"],
                                  out_plain["denoised"])
    np.testing.assert_array_equal(out_packed["mixed_processed"],
                                  out_plain["mixed_processed"])


@pytest.mark.slow
def test_enhance_stream_matches_batch(rng):
    """The pipelined stream (depth>1 program calls in flight) must yield
    exactly the per-batch results, in submission order."""
    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(3), train=False)
    enh = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1,))
    pos = np.zeros(4000)
    batches = []
    for i in range(3):
        mixed = rng.standard_normal(8000) * (500 + 200 * i)
        neg = rng.standard_normal(5000) * 300
        batches.append(([mixed], [pos], [neg]))
    streamed = list(enh.enhance_stream(iter(batches), depth=2))
    assert len(streamed) == 3
    for got, batch in zip(streamed, batches):
        want = enh.enhance_batch(*batch)
        np.testing.assert_array_equal(got["denoised"][0],
                                      want["denoised"][0])
        np.testing.assert_allclose(got["snr_est"], want["snr_est"],
                                   rtol=1e-6)


@pytest.mark.slow
def test_ctx_cache_memoizes(rng):
    """Same context bytes across calls -> one cached embedding entry
    (same device buffers); different contexts -> distinct entries."""
    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(2), train=False)
    enh = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1,))
    mixed1 = rng.standard_normal(8000) * 1000
    mixed2 = rng.standard_normal(8000) * 1000
    pos = np.zeros(4000)
    neg1 = rng.standard_normal(5000) * 500
    neg2 = rng.standard_normal(5000) * 500
    enh.enhance(mixed1, pos, neg1)
    assert len(enh._ctx_cache) == 1
    (k1, e1), = enh._ctx_cache.items()
    enh.enhance(mixed2, pos, neg1)          # same contexts, new utterance
    assert list(enh._ctx_cache) == [k1]
    assert enh._ctx_cache[k1][0] is e1[0]   # embeddings reused, not rebuilt
    enh.enhance(mixed1, pos, neg2)          # different -context
    assert len(enh._ctx_cache) == 2


@pytest.mark.slow
def test_enhancer_mesh_matches_single_device(rng):
    """Multi-chip serving: an Enhancer sharded over an 8-device data mesh
    (shard_map over the batch axis — utterances are independent, no
    collectives) must produce the single-device results exactly, for
    both batched and segmented-long paths, including batches smaller
    than the mesh (padded rows)."""
    from nhans_tpu.parallel.mesh import make_mesh

    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(5), train=False)
    enh1 = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1,))
    enh8 = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1,),
                    mesh=make_mesh(data=8))

    pos = np.zeros(4000)
    mixed = [rng.standard_normal(8000) * (400 + 100 * i) for i in range(3)]
    negs = [rng.standard_normal(5000) * 300 for _ in range(3)]
    a = enh1.enhance_batch(mixed, [pos] * 3, negs)
    b = enh8.enhance_batch(mixed, [pos] * 3, negs)
    for i in range(3):
        np.testing.assert_allclose(a["denoised"][i], b["denoised"][i],
                                   atol=2e-4)
    np.testing.assert_allclose(a["snr_est"], b["snr_est"], rtol=1e-3)

    long = rng.standard_normal(40000) * 800
    neg = negs[0]
    la = enh1.enhance_long(long, pos, neg, segment_seconds=1.0,
                           segment_batch=4)
    lb = enh8.enhance_long(long, pos, neg, segment_seconds=1.0,
                           segment_batch=4)
    np.testing.assert_allclose(la["denoised"], lb["denoised"], atol=2e-4)


@pytest.mark.slow
def test_recon_residual_cap_bounds_blowup(rng):
    """AudioConfig.recon_residual_cap: rig the (normally zero-init) head
    bias to predict a +12-nat residual on bin 0 — the off-manifold
    low-bin blowup observed on unseen separator voices (docs/QUALITY.md).
    With the default cap the output stays bounded near the mixture's
    scale; with the cap disabled the same variables produce the e^12
    rumble.  Healthy (zero-residual) outputs are untouched by the cap."""
    import dataclasses
    import jax.numpy as jnp

    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    rigged = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    b = np.array(rigged["params"]["last_dense"]["b"])
    b[0] = 12.0
    rigged = jax.tree_util.tree_map(lambda x: x, rigged)
    rigged["params"] = dict(rigged["params"])
    rigged["params"]["last_dense"] = {
        "w": rigged["params"]["last_dense"]["w"], "b": jnp.asarray(b)}

    mixed = rng.standard_normal(12000) * 1000
    pos = np.zeros(4000)
    neg = rng.standard_normal(9000) * 500

    capped = Enhancer(cfg, rigged, window_chunk=32, buckets_seconds=(1,))
    out_c = capped.enhance(mixed, pos, neg)
    uncap_cfg = cfg.replace(audio=dataclasses.replace(
        cfg.audio, recon_residual_cap=0.0))
    uncapped = Enhancer(uncap_cfg, rigged, window_chunk=32,
                        buckets_seconds=(1,))
    out_u = uncapped.enhance(mixed, pos, neg)

    rms_c = np.sqrt(np.mean(out_c["denoised"] ** 2))
    rms_u = np.sqrt(np.mean(out_u["denoised"] ** 2))
    rms_m = np.sqrt(np.mean(out_c["mixed_processed"] ** 2))
    assert rms_u > 50 * rms_m        # the blowup is real without the cap
    assert rms_c < 10 * rms_m        # and bounded with it

    # inert on healthy outputs: zero-init head, cap on == cap off
    healthy_c = Enhancer(cfg, variables, window_chunk=32,
                         buckets_seconds=(1,))
    healthy_u = Enhancer(uncap_cfg, variables, window_chunk=32,
                         buckets_seconds=(1,))
    a = healthy_c.enhance(mixed, pos, neg)["denoised"]
    bb = healthy_u.enhance(mixed, pos, neg)["denoised"]
    np.testing.assert_allclose(a, bb, atol=1e-6)


@pytest.mark.slow
def test_ctx_cache_reuse_across_folder_chunks(rng):
    """Folder mode (cli/_app.py) sends files through enhance_batch in
    chunks of 8 with the SAME conditioning recordings replicated per
    row: chunk 2 with identical contexts and the same padded batch size
    must reuse the cached embedding batch (no re-encode), while a
    ragged remainder chunk (different padded B) is a separate entry."""
    cfg = Config.denoiser()
    _, variables = init_variables(cfg, jax.random.PRNGKey(7), train=False)
    enh = Enhancer(cfg, variables, window_chunk=32, buckets_seconds=(1,))
    pos = np.zeros(4000)
    neg = rng.standard_normal(5000) * 500

    def chunk(n_files):
        waves = [rng.standard_normal(8000) * 1000 for _ in range(n_files)]
        return enh.enhance_batch(waves, [pos] * n_files, [neg] * n_files)

    chunk(7)                                  # folder chunk 1 (pads to 8)
    assert len(enh._ctx_cache) == 1
    (k1, e1), = enh._ctx_cache.items()
    chunk(7)                                  # folder chunk 2, same ctx
    assert list(enh._ctx_cache) == [k1]
    assert enh._ctx_cache[k1][0] is e1[0]     # same device buffers
    chunk(3)                                  # ragged remainder (pads to 4)
    assert len(enh._ctx_cache) == 2


@pytest.mark.slow
def test_enhancer_freq_pad_bit_exact(rng):
    """Serving defaults to the MXU lane-padded tower (cli/_app.py): the
    full Enhancer pipeline under freq_pad_to=256 must reproduce the
    native-geometry output exactly with the same variables."""
    import dataclasses

    cfg0 = Config.denoiser()
    _, variables = init_variables(cfg0, jax.random.PRNGKey(11),
                                  train=False)
    cfg_pad = cfg0.replace(model=dataclasses.replace(
        cfg0.model, freq_pad_to=256))
    mixed = rng.standard_normal(12000) * 1000
    pos = np.zeros(4000)
    neg = rng.standard_normal(9000) * 500
    out0 = Enhancer(cfg0, variables, window_chunk=32,
                    buckets_seconds=(1,)).enhance(mixed, pos, neg)
    outp = Enhancer(cfg_pad, variables, window_chunk=32,
                    buckets_seconds=(1,)).enhance(mixed, pos, neg)
    np.testing.assert_array_equal(np.asarray(out0["denoised"]),
                                  np.asarray(outp["denoised"]))
