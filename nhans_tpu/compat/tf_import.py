"""TF-checkpoint -> nhans_tpu variable mapping.

Maps every variable name of the reference's Saver checkpoints (verified
against the shipped ``.index`` files,
N_HANS___Selective_Noise/trained_model/81448_0-1000000 and
N_HANS___Source_Separation/trained_model/81457_2-545000) onto the flax
parameter tree of ``NHANSNet``.

Name conventions in the reference graph (reference main.py:98-256,
blocks.py:23-108):

* context tower: ``embedding/noise_resblock{i}_1_{conv1,conv2,transform,
  addition}/...`` where the BN after conv1 reuses the ``_conv1`` scope and
  the output BN lives under ``_addition``,
* main tower: ``resblock{j}_{k}...`` (j=1..4 stages, k=1..2),
* conditioning: ``..._conv{c}_{noise_pos_emb|noise_neg_emb}`` for the
  denoiser, ``..._{noise_emb|clean_emb}`` for the separator, plus
  ``..._conv{c}_{temb,femb}_dense{1,2,3}`` MLPs whose BatchNorms carry a
  doubled scope (``batch_norm(..., scope_name + scope_name + '_dense1')``,
  reference main.py:131,134),
* head: ``last_conv`` (+ BN in the same scope) and ``last_dense``.

Shape conventions: conv kernels are already HWIO, dense kernels [in, out];
biases [1, ..., C] and BN tensors [1, ..., 1, C] are squeezed to [C].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from nhans_tpu.compat.tf_bundle import TFBundleReader

Path = Tuple[str, ...]


def _bn(m: Dict[str, Tuple[str, Path]], tf_scope: str, fx: Path) -> None:
    m[f"{tf_scope}/beta"] = ("params", fx + ("beta",))
    m[f"{tf_scope}/gamma"] = ("params", fx + ("gamma",))
    m[f"{tf_scope}/pop_mean"] = ("batch_stats", fx + ("pop_mean",))
    m[f"{tf_scope}/pop_variance"] = ("batch_stats", fx + ("pop_variance",))


def tf_name_map(task: str = "denoiser") -> Dict[str, Tuple[str, Path]]:
    """{tf_variable_name: (collection, flax_path)} for every model
    variable."""
    m: Dict[str, Tuple[str, Path]] = {}

    # ---- context-embedding tower (shared)
    for i in range(1, 5):
        tb = f"embedding/noise_resblock{i}_1"
        fx: Path = ("embedding", f"block{i}")
        m[f"{tb}_conv1/w"] = ("params", fx + ("conv1", "w"))
        _bn(m, f"{tb}_conv1", fx + ("bn1",))
        m[f"{tb}_conv2/w"] = ("params", fx + ("conv2", "w"))
        m[f"{tb}_conv2/b"] = ("params", fx + ("conv2", "b"))
        m[f"{tb}_transform/w"] = ("params", fx + ("transform", "w"))
        m[f"{tb}_transform/b"] = ("params", fx + ("transform", "b"))
        _bn(m, f"{tb}_addition", fx + ("bn_out",))

    # ---- main tower
    sfx_a, sfx_b = (("noise_pos_emb", "noise_neg_emb") if task == "denoiser"
                    else ("noise_emb", "clean_emb"))
    for n in range(1, 9):
        j, k = (n + 1) // 2, 2 - (n % 2)
        tb = f"resblock{j}_{k}"
        fx = (f"resblock{n}",)
        m[f"{tb}_conv1/w"] = ("params", fx + ("conv1", "w"))
        _bn(m, f"{tb}_conv1", fx + ("bn1",))
        m[f"{tb}_conv2/w"] = ("params", fx + ("conv2", "w"))
        m[f"{tb}_conv2/b"] = ("params", fx + ("conv2", "b"))
        if n in (1, 3, 5, 7):  # channel-changing blocks have a shortcut conv
            m[f"{tb}_transform/w"] = ("params", fx + ("transform", "w"))
            m[f"{tb}_transform/b"] = ("params", fx + ("transform", "b"))
        _bn(m, f"{tb}_addition", fx + ("bn_out",))
        for ci in (1, 2):
            base = f"{tb}_conv{ci}"
            inj = fx + (f"inject{ci}",)
            m[f"{base}_{sfx_a}/w"] = ("params", inj + ("proj_a", "w"))
            m[f"{base}_{sfx_a}/b"] = ("params", inj + ("proj_a", "b"))
            m[f"{base}_{sfx_b}/w"] = ("params", inj + ("proj_b", "w"))
            m[f"{base}_{sfx_b}/b"] = ("params", inj + ("proj_b", "b"))
            for emb in ("temb", "femb"):
                s = f"{base}_{emb}"
                e = inj + (emb,)
                for d in (1, 2, 3):
                    m[f"{s}_dense{d}/w"] = ("params", e + (f"dense{d}", "w"))
                for d in (1, 2):  # doubled scope (reference main.py:131,134)
                    _bn(m, f"{s}{s}_dense{d}", e + (f"bn{d}",))

    # ---- head
    m["last_conv/w"] = ("params", ("last_conv", "w"))
    _bn(m, "last_conv", ("last_bn",))
    m["last_dense/w"] = ("params", ("last_dense", "w"))
    m["last_dense/b"] = ("params", ("last_dense", "b"))
    return m


def _set_in(tree, path: Path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _get_in(tree, path: Path):
    node = tree
    for p in path:
        node = node[p]
    return node


def import_tf_checkpoint(prefix: str, variables, task: str = "denoiser",
                         strict: bool = True):
    """Load a reference Saver checkpoint into a variables pytree.

    ``variables`` must be an initialized {'params', 'batch_stats'} tree
    (used for shape checking); returns a new tree with imported values.
    """
    reader = TFBundleReader(prefix)
    mapping = tf_name_map(task)

    # deep-copy into plain mutable nested dicts of numpy arrays
    import copy
    out = jax.device_get(jax.tree_util.tree_map(np.asarray, variables))
    if hasattr(out, "unfreeze"):
        out = out.unfreeze()
    out = copy.deepcopy(dict(out))

    missing, mismatched = [], []
    for tf_name, (coll, path) in mapping.items():
        if tf_name not in reader.entries:
            missing.append(tf_name)
            continue
        value = reader.read(tf_name)
        target = _get_in(out[coll], path)
        v = np.asarray(value, np.float32).reshape(-1)
        if v.size != np.asarray(target).size:
            mismatched.append((tf_name, value.shape, np.shape(target)))
            continue
        _set_in(out[coll], path, v.reshape(np.shape(target)))
    if strict and (missing or mismatched):
        raise ValueError(f"TF import failed: missing={missing[:5]} "
                         f"({len(missing)} total), mismatched={mismatched[:5]}")
    return out


def check_name_map_against_index(prefix: str, task: str) -> Tuple[list, list]:
    """Compare the static name map with a real .index: returns
    (names_missing_from_ckpt, ckpt_names_not_mapped).  Used by tests
    against the shipped reference indices."""
    reader = TFBundleReader(prefix)
    mapping = tf_name_map(task)
    ours = set(mapping.keys())
    theirs = set(reader.keys())
    return sorted(ours - theirs), sorted(theirs - ours)
