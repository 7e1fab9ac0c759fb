"""Training driver: the reference's ``main_loop`` (reference
main.py:361-608) rebuilt around one pjit train step.

Differences by design (all SURVEY.md §7 decisions):
* no triple-graph/triple-session split — a single jitted step does
  augmentation + forward + backward + update on device,
* evaluation reuses the in-memory state instead of round-tripping weights
  through disk (reference main.py:480-487),
* checkpoint auto-resume: if the checkpoint dir already has steps, training
  continues from the latest (TPU preemption recovery; the reference only
  has manual --restore_path),
* monitors are persisted (JSONL) instead of the reference's never-written
  tf.Summary protos (main.py:586-589).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nhans_tpu.config import Config
from nhans_tpu.data.loader import EvalLoader, TrainLoader, prefetch_to_device
from nhans_tpu.parallel.mesh import batch_sharding, make_mesh
from nhans_tpu.train.checkpoint import Checkpointer
from nhans_tpu.train.evaluate import Evaluator
from nhans_tpu.train.metrics import MetricsWriter, Monitor
from nhans_tpu.train.step import (create_state, make_train_step,
                                  param_counts)


class Trainer:
    def __init__(self, cfg: Config, mesh=None, eval_utts: Optional[int] = 16,
                 eval_kwargs: Optional[dict] = None):
        self.cfg = cfg
        t = cfg.train
        self.mesh = mesh if mesh is not None else make_mesh(
            data=t.data_axis or None, model=t.model_axis)
        self.model, self.state, self.tx = create_state(
            cfg, jax.random.PRNGKey(cfg.data.seed))
        from nhans_tpu.data.banks import banks_enabled
        self.banked = banks_enabled(cfg)
        use_model_axis = self.mesh.shape.get("model", 1) > 1
        self.step_fn = make_train_step(cfg, self.model, self.tx,
                                       mesh=self.mesh, donate=t.donate_state,
                                       state=(self.state if use_model_axis
                                              else None),
                                       use_model_axis=use_model_axis,
                                       banked=self.banked)
        self._use_model_axis = use_model_axis
        self.ckpt = Checkpointer(t.checkpoint_dir, t.checkpoints_to_keep,
                                 t.model_name)
        self.evaluator = Evaluator(cfg, self.model, **(eval_kwargs or {}))
        self.writer = MetricsWriter(t.summaries_dir, t.model_name)
        self.monitor = Monitor(t.train_monitor_every, self.writer)
        self.eval_utts = eval_utts
        self.tstep = 0

        # global batch = utterances * slices_per_step examples; utterance
        # count rounded up to a multiple of the data-axis size.  The
        # loader feeds each HOST its share of the global batch.
        ndev = self.mesh.shape["data"]
        k = cfg.data.slices_per_step
        self.batch_utts = -(-max(t.train_mb // k, 1) // ndev) * ndev
        self.local_utts = self.batch_utts // jax.process_count()

        trainable, non_trainable = param_counts(self.state)
        print(f"#trainable variables: {trainable}")
        print(f"#non-trainable variables: {non_trainable}")

        self._restore()

    # ------------------------------------------------------------------ #

    def _restore(self) -> None:
        t = self.cfg.train
        # Abstract (shape/dtype) restore template: materializing the
        # initial state to host here would be a ~350 MB device->host
        # fetch of weights about to be overwritten — pure startup cost
        # (and a stall surface on a degraded device tunnel).
        abstract = lambda tree: jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                           np.result_type(x)), tree)
        template = abstract(self.state)
        if t.restore_path:
            print(f"Restoring model from {t.restore_path}")
            from nhans_tpu.train.checkpoint import (checkpoint_keys,
                                                    load_variables)
            # Branch on checkpoint KIND read from the on-disk metadata
            # (full train state carries opt_state+step; an inference-vars
            # checkpoint — e.g. an unpacked release .npz, tools/ckpt_npz.py
            # — only params+batch_stats).  A genuine restore failure
            # (corruption, shape mismatch) then propagates with Orbax's
            # error instead of being silently rerouted to the other path.
            keys = checkpoint_keys(t.restore_path)
            if {"opt_state", "step"} <= keys:
                self.state = load_variables(t.restore_path, template)
                self.tstep = int(np.asarray(self.state.step))
            else:
                # Graft the variables onto the fresh state and fine-tune
                # from step 0 with a fresh optimizer.  Mirrors the
                # reference's Saver variables-only restore semantics
                # (reference main.py:428-432, step parsed from the
                # filename rather than stored).
                infer = load_variables(
                    t.restore_path,
                    {"params": abstract(self.state.params),
                     "batch_stats": abstract(self.state.batch_stats)})
                self.state = self.state.replace(
                    params=infer["params"],
                    batch_stats=infer["batch_stats"])
                self.tstep = 0
                print("Restored inference variables only "
                      "(fine-tune: fresh optimizer, step 0)")
        elif self.ckpt.latest_step() is not None:
            step, self.state = self.ckpt.restore(template=template)
            self.tstep = step
            print(f"Auto-resumed from checkpoint step {step}")

    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _beat(self, phase: str) -> None:
        hb = getattr(self, "_heartbeat", None)
        if hb is not None:
            hb.beat(phase)

    def save_and_eval(self, async_eval: bool = False) -> None:
        t = self.cfg.train
        if jax.process_index() == 0:
            print("Saving and restoring the model")
        self._beat(f"save_and_eval(step {self.tstep}): device_get snapshot")
        # EVERY process participates in the save: Orbax coordinates the
        # write through jax.distributed barriers, and skipping it on
        # non-zero processes deadlocks/corrupts multi-host runs.  The
        # state is fully replicated, so the host snapshot is identical
        # on every process and Orbax's primary host does the writing.
        snapshot = jax.device_get(self.state)
        self._beat(f"save_and_eval(step {self.tstep}): orbax save")
        self.ckpt.save(self.tstep, snapshot)
        self._beat(f"save_and_eval(step {self.tstep}): eval")
        step = self.tstep
        if jax.process_index() != 0:
            return  # eval + wav dumps stay process-0 duties

        def _eval():
            print("----------------- TEST MONITOR ----------------------")
            loader = EvalLoader(self.cfg, limit=self.eval_utts)
            metrics = self.evaluator.run(
                {"params": snapshot.params,
                 "batch_stats": snapshot.batch_stats},
                loader, step=step, modelname=t.model_name,
                wav_dump_folder=t.wav_dump_folder or None,
                dump_results=t.dump_results or None,
                max_utts=self.eval_utts, return_metrics=True)
            self.writer.write(step, metrics)
            print("-----------------------------------------------------")

        if async_eval:
            # eval from the checkpoint snapshot on a host thread; eval
            # programs interleave with train steps on the device instead
            # of blocking the loop (the reference blocks, main.py:594-595)
            if getattr(self, "_eval_thread", None) and \
                    self._eval_thread.is_alive():
                self._eval_thread.join()
            import threading
            self._eval_thread = threading.Thread(target=_eval, daemon=True)
            self._eval_thread.start()
        else:
            _eval()

    def train(self) -> None:
        cfg, t = self.cfg, self.cfg.train
        state_sh = NamedSharding(self.mesh, P())
        if self._use_model_axis:
            # tensor-parallel layout: wide conv/dense output channels
            # over the 'model' axis (parallel/sharding_rules); the step
            # is jitted with matching in/out shardings and donation, so
            # the placement here is the one the hot loop keeps
            from nhans_tpu.parallel.sharding_rules import state_sharding
            place = state_sharding(self.mesh, self.state,
                                   use_model_axis=True)
        else:
            place = state_sh
        self.state = jax.device_put(self.state, place)
        banks = None
        if self.banked:
            # whole corpus -> HBM once; per-step transfer = index triples
            # (data/banks.py; bounds the axon client's H2D leak to
            # ~KB/step and removes host decode from the hot loop)
            from nhans_tpu.data.banks import BankIndexLoader, DeviceBanks
            dbanks = DeviceBanks(cfg, sharding=state_sh)
            banks = dbanks.banks
            print(f"device corpus banks: {len(dbanks.speech_paths)} speech"
                  f" + {len(dbanks.noise_paths)} noise files, "
                  f"{dbanks.nbytes >> 20} MB in HBM")
            loader = BankIndexLoader(dbanks, self.local_utts,
                                     start_step=self.tstep)
        else:
            loader = TrainLoader(cfg, self.local_utts)
        stream = prefetch_to_device(loader, batch_sharding(self.mesh))
        base_key = jax.random.PRNGKey(cfg.data.seed + 17)

        if t.eval_before_training:
            print("processing eval before training")
            self.save_and_eval()

        profiling = False
        pending = []  # device scalars; only synced at monitor boundaries
        # stall watchdog: a hung device call (dead remote tunnel) warns +
        # dumps stacks instead of blocking silently (utils/watchdog.py)
        from nhans_tpu.utils.watchdog import Heartbeat
        self._heartbeat = Heartbeat(name="trainer").start()
        try:
            while self.tstep < t.batches:
                # jax.profiler trace of steps ~10-20 (TPU timeline,
                # input-pipeline vs device split; SURVEY.md §5 tracing)
                if t.profile_dir and self.tstep == 10 and not profiling:
                    jax.profiler.start_trace(t.profile_dir)
                    profiling = True
                if profiling and self.tstep >= 20:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {t.profile_dir}")
                self._beat(f"train step {self.tstep}")
                t_in = time.perf_counter()
                batch = next(stream)
                input_wait = time.perf_counter() - t_in
                key = jax.random.fold_in(base_key, self.tstep)
                if self.banked:
                    self.state, metrics = self.step_fn(
                        self.state, banks, batch, key)
                else:
                    self.state, metrics = self.step_fn(
                        self.state, batch, key)
                self.tstep += 1
                pending.append((metrics, input_wait))
                if self.tstep % t.train_monitor_every == 0:
                    first = self.tstep - len(pending) + 1
                    for i, (m, iw) in enumerate(pending):
                        m = jax.device_get(m)  # one sync per monitor window
                        self.monitor.update(first + i, {
                            "loss": float(m["loss"]),
                            "grad_norm": float(m["grad_norm"]),
                        }, iw)
                    pending = []
                if self.tstep % t.eval_every == 0:
                    self.save_and_eval(async_eval=t.async_eval)
            if t.eval_after_training:
                print("processing eval after training")
                self.save_and_eval()
        finally:
            self._beat("shutdown: join eval thread")
            th = getattr(self, "_eval_thread", None)
            if th is not None and th.is_alive():
                th.join()
            loader.close()
            self.ckpt.wait()
            self.writer.close()
            self._heartbeat.stop()
