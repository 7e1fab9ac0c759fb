"""Independent numpy forward pass of the reference N-HANS graph.

This is a literal, loop-style re-derivation of the reference model
(reference N_HANS___Selective_Noise/main.py:98-256, blocks.py:23-108)
operating on a parameter dict keyed by the ORIGINAL TF variable names
(e.g. ``embedding/noise_resblock1_1_conv1/w``).  It serves as a
cross-framework oracle: nhans_tpu's flax model, with its parameters
exported through the inverted compat name map, must produce the same
outputs.  Inference mode only (population BN stats).
"""

import numpy as np


def conv2d_same(x, w, stride_hw, padding="SAME"):
    """x [N,H,W,C], w [kh,kw,ci,co]; TF SAME/VALID padding semantics."""
    n, h, ww, ci = x.shape
    kh, kw, _, co = w.shape
    sh, sw = stride_hw
    if padding == "SAME":
        oh = -(-h // sh)
        ow = -(-ww // sw)
        ph = max((oh - 1) * sh + kh - h, 0)
        pw = max((ow - 1) * sw + kw - ww, 0)
        pt, pb = ph // 2, ph - ph // 2
        pl, pr = pw // 2, pw - pw // 2
    else:
        oh = (h - kh) // sh + 1
        ow = (ww - kw) // sw + 1
        pt = pb = pl = pr = 0
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    out = np.zeros((n, oh, ow, co), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + oh * sh:sh, j:j + ow * sw:sw, :]
            out += patch @ w[i, j].astype(np.float64)
    return out


def batch_norm_eval(x, p, scope):
    beta = p[f"{scope}/beta"].reshape(-1)
    gamma = p[f"{scope}/gamma"].reshape(-1)
    mean = p[f"{scope}/pop_mean"].reshape(-1)
    var = p[f"{scope}/pop_variance"].reshape(-1)
    return (x - mean) / np.sqrt(var + 1e-3) * gamma + beta


def dense(x, p, scope, with_bias):
    out = x @ p[f"{scope}/w"].astype(np.float64)
    if with_bias:
        out = out + p[f"{scope}/b"].reshape(-1)
    return out


def relu(x):
    return np.maximum(x, 0)


def noise_resnet_block(x, p, kernel, stride, n_fmaps, scope):
    path1 = conv2d_same(x, p[f"{scope}_conv1/w"], stride)
    path1 = relu(batch_norm_eval(path1, p, f"{scope}_conv1"))
    path1 = conv2d_same(path1, p[f"{scope}_conv2/w"], (1, 1))
    path1 = path1 + p[f"{scope}_conv2/b"].reshape(-1)
    if x.shape[-1] == n_fmaps:
        path2 = x
    else:
        path2 = conv2d_same(x, p[f"{scope}_transform/w"], stride)
        path2 = path2 + p[f"{scope}_transform/b"].reshape(-1)
    return relu(batch_norm_eval(path1 + path2, p, f"{scope}_addition"))


def cont_embed(n, p, scope):
    out = np.arange(n, dtype=np.float64).reshape(n, 1)
    out = dense(out, p, f"{scope}_dense1", False)
    out = relu(batch_norm_eval(out, p, f"{scope}{scope}_dense1"))
    out = dense(out, p, f"{scope}_dense2", False)
    out = relu(batch_norm_eval(out, p, f"{scope}{scope}_dense2"))
    return dense(out, p, f"{scope}_dense3", False)


def process_noise_t_f(match_to, emb_a, emb_b, p, scope, sfx_a, sfx_b):
    nf = match_to.shape[3]
    a = dense(emb_a, p, f"{scope}_{sfx_a}", True)[:, None, None, :]
    b = dense(emb_b, p, f"{scope}_{sfx_b}", True)[:, None, None, :]
    ts, fs = match_to.shape[1], match_to.shape[2]
    t = cont_embed(ts, p, f"{scope}_temb")[None, :, None, :]
    f = cont_embed(fs, p, f"{scope}_femb")[None, None, :, :]
    return a, b, t, f


def resnet_block(x, emb_a, emb_b, p, kernel, stride, n_fmaps, scope,
                 sfx_a, sfx_b):
    path1 = conv2d_same(x, p[f"{scope}_conv1/w"], (stride, stride))
    a, b, t, f = process_noise_t_f(path1, emb_a, emb_b, p, f"{scope}_conv1",
                                   sfx_a, sfx_b)
    path1 = path1 + a + b + t + f
    path1 = relu(batch_norm_eval(path1, p, f"{scope}_conv1"))
    path1 = conv2d_same(path1, p[f"{scope}_conv2/w"], (1, 1))
    path1 = path1 + p[f"{scope}_conv2/b"].reshape(-1)
    a, b, t, f = process_noise_t_f(path1, emb_a, emb_b, p, f"{scope}_conv2",
                                   sfx_a, sfx_b)
    path1 = path1 + a + b + t + f
    if x.shape[-1] == n_fmaps:
        path2 = x
    else:
        path2 = conv2d_same(x, p[f"{scope}_transform/w"], (stride, stride))
        path2 = path2 + p[f"{scope}_transform/b"].reshape(-1)
    return relu(batch_norm_eval(path1 + path2, p, f"{scope}_addition"))


def embedding_tower(ctx, p):
    """ctx [N, frames, 201] -> [N, 512] (reference main.py:190-202)."""
    nout = ctx[..., None]
    nout = noise_resnet_block(nout, p, (8, 4), (3, 2), 64,
                              "embedding/noise_resblock1_1")
    nout = noise_resnet_block(nout, p, (8, 4), (3, 2), 128,
                              "embedding/noise_resblock2_1")
    nout = noise_resnet_block(nout, p, (4, 4), (1, 1), 256,
                              "embedding/noise_resblock3_1")
    nout = noise_resnet_block(nout, p, (4, 4), (1, 2), 512,
                              "embedding/noise_resblock4_1")
    return nout.mean(axis=(1, 2))


def model_forward(mixed, ctx_a, ctx_b, p, task="denoiser"):
    """Full eval-mode forward: returns denoised central frames [N, 201]
    (reference main.py:219-242)."""
    sfx_a, sfx_b = (("noise_pos_emb", "noise_neg_emb") if task == "denoiser"
                    else ("noise_emb", "clean_emb"))
    emb_a = embedding_tower(ctx_a, p)
    emb_b = embedding_tower(ctx_b, p)
    out = mixed[..., None].astype(np.float64)
    blocks = [(4, 1, 64, "resblock1_1"), (4, 1, 64, "resblock1_2"),
              (4, 2, 128, "resblock2_1"), (4, 1, 128, "resblock2_2"),
              (3, 2, 256, "resblock3_1"), (3, 1, 256, "resblock3_2"),
              (3, 2, 512, "resblock4_1"), (3, 1, 512, "resblock4_2")]
    for k, s, c, scope in blocks:
        out = resnet_block(out, emb_a, emb_b, p, k, s, c, scope,
                           sfx_a, sfx_b)
    out = conv2d_same(out, p["last_conv/w"], (1, 1), padding="VALID")
    out = relu(batch_norm_eval(out, p, "last_conv"))
    out = out.reshape(out.shape[0], -1)
    out = dense(out, p, "last_dense", True)
    central = mixed[:, mixed.shape[1] // 2, :]
    return central + out
