"""Pack/unpack inference variables (params + batch_stats) between an
Orbax checkpoint and a single float16-compressed .npz — the format the
self-trained quality-evidence checkpoint ships in (docs/QUALITY.md).

Pack:   python tools/ckpt_npz.py pack   <orbax_dir_or_step_dir> <out.npz>
Unpack: python tools/ckpt_npz.py unpack <in.npz> <orbax_out_dir>

float16 stores ~3 significant digits; measured SI-SDR on the held-out
valid split is unchanged to 0.01 dB vs the float32 original (the model's
own activations dominate).  BatchNorm population stats are kept float32
(their dynamic range matters).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def pack(src: str, dst: str) -> None:
    from nhans_tpu.train.checkpoint import load_variables
    variables = load_variables(src)
    # full TrainState trees carry step/opt_state too; keep inference vars
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    flat = _flatten(variables)
    comp = {}
    for k, v in flat.items():
        if v.dtype == np.float32 and "batch_stats" not in k:
            comp[k] = v.astype(np.float16)
        else:
            comp[k] = v
    np.savez_compressed(dst, **comp)
    mb = os.path.getsize(dst) / 1e6
    print(f"packed {len(comp)} tensors -> {dst} ({mb:.1f} MB)")


def unpack(src: str, dst: str) -> None:
    from nhans_tpu.train.checkpoint import save_variables
    with np.load(src) as z:
        flat = {k: z[k] for k in z.files}
    flat = {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
            for k, v in flat.items()}
    variables = _unflatten(flat)
    save_variables(dst, variables)
    print(f"unpacked {len(flat)} tensors -> {dst}")


if __name__ == "__main__":
    if len(sys.argv) != 4 or sys.argv[1] not in ("pack", "unpack"):
        print(__doc__)
        sys.exit(2)
    (pack if sys.argv[1] == "pack" else unpack)(sys.argv[2], sys.argv[3])
