"""Deterministic evaluation + waveform reconstruction dumps.

Reference semantics (reference main.py:264-353,473-550; reader.py:398-420):
* valid/test SNRs derive from md5(cleanpath) — reproduced in EvalLoader,
* contexts = first 200 frames of the conditioning signals,
* the model is evaluated at every frame position (stride 1) past the
  context region; ``location == 0`` marks utterance starts (here each
  utterance is simply processed whole, so reassembly is trivial),
* reconstruction = exp(log-mag) with the *mixed* phase -> iSTFT,
* wav dumps named ``{model}_{step}_{clean}_{noiseA}_{noiseB}_{snrA}_
  {snrB}_{kind}.wav`` (reference main.py:339-353).

TPU-first: mixing, STFT, windowing, model, loss, and iSTFT reconstruction
run as one jitted program per length bucket; windows stream through the
main tower in fixed chunks with the contexts encoded once.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nhans_tpu.config import Config
from nhans_tpu.dsp import mixing as mx
from nhans_tpu.dsp import spectral as sp
from nhans_tpu.nn.model import NHANSNet, freq_loss_weights
from nhans_tpu.utils import wavio


class Evaluator:
    """Batched deterministic evaluator.

    Utterances are grouped into length-bucketed batches (``eval_batch``
    utterances per program call) and all windows stream through the main
    tower in global fixed-size chunks — the Enhancer execution pattern —
    instead of the reference's (and round 1's) one-utterance-at-a-time
    B=1 programs, making full-split eval feasible.  ``_programs`` is
    lock-guarded: async eval threads and the final sync eval may race the
    cache (trainer.py save_and_eval).
    """

    def __init__(self, cfg: Config, model: NHANSNet,
                 window_chunk: int = 1024, eval_batch: int = 8,
                 buckets_seconds=(4, 8, 16, 32, 64, 128)):
        import threading
        self.cfg = cfg
        self.model = model
        self.WC = int(window_chunk)
        self.eval_batch = int(eval_batch)
        self.buckets = [int(s * cfg.audio.sample_rate) for s in buckets_seconds]
        self._programs = {}
        self._lock = threading.Lock()

    def _build(self, L: int, B: int):
        cfg = self.cfg
        a, m, task = cfg.audio, cfg.model, cfg.task
        fl, fs = a.frame_length, a.frame_step
        W, C = m.window_frames, m.context_frames
        F = sp.num_frames(L, fl, fs)
        nwin_per = max(F - C, 1)
        WC = min(self.WC, max(256, -(-(B * nwin_per) // 256) * 256))
        pad_b, pad_a = ((W + 1) // 2) - 1, W // 2
        weights = freq_loss_weights(m.num_features)

        def program(variables, clean, na, nb, n_clean, n_a, n_b,
                    snr_a, snr_b, peaks):
            # --- deterministic mixing (md5 SNRs chosen host-side);
            # peaks [B, 3] are whole-file maxima from the loader
            n_clean = n_clean - jnp.remainder(
                jnp.maximum(n_clean - fl, 0), fs)
            clean = mx.peak_normalize(clean, n_clean, peaks[:, 0])
            na_n = mx.peak_normalize(na, n_a, peaks[:, 1])
            if task.two_noise_mixing:
                nb_n = mx.peak_normalize(nb, n_b, peaks[:, 2])
                mixed, target, pos_s, neg_s = mx.mix_two_noise(
                    clean, na_n, nb_n, n_clean, n_a, n_b, snr_a, snr_b)
                ctx_a_sig, ctx_b_sig = pos_s, neg_s
            else:
                target, _noise_scaled, mixed, k = mx.mix_one_noise(
                    clean, na_n, n_clean, n_a, snr_a)
                # interference context = FULL-length noise * K (reference
                # combine_signals, Source_Separation/reader.py:140-146)
                ctx_a_sig, ctx_b_sig = k[..., None] * na_n, target

            lm_mixed, ph_mixed = sp.spectrogram(mixed, fl, fs, a.log_eps)
            lm_target, ph_target = sp.spectrogram(target, fl, fs, a.log_eps)
            lm_a, ph_a = sp.spectrogram(ctx_a_sig, fl, fs, a.log_eps)
            lm_b, ph_b = sp.spectrogram(ctx_b_sig, fl, fs, a.log_eps)
            nf = 1 + jnp.maximum(n_clean - fl, 0) // fs          # [B]

            # contexts: first C frames (reference reader.py:408-413)
            emb_a, emb_b = self.model.apply(variables, None, lm_a[:, :C],
                                            lm_b[:, :C], False)

            # stride-1 windows past the context region, gathered globally
            # in fixed chunks from the flat padded spectrogram (Enhancer
            # pattern: no [B, nwin, W, nfeat] materialization)
            rest = lm_mixed[:, C:]                               # [B, Fr, nf]
            Fr = rest.shape[1]
            Fp = Fr + W - 1
            padded = jnp.pad(rest, ((0, 0), (pad_b, pad_a), (0, 0)))
            flat_spec = padded.reshape(B * Fp, m.num_features)
            nwin = B * nwin_per
            nch = -(-nwin // WC)
            karange = jnp.arange(W, dtype=jnp.int32)

            def chunk_fn(ci):
                widx = ci * WC + jnp.arange(WC, dtype=jnp.int32)
                widx = jnp.minimum(widx, nwin - 1)
                b = widx // nwin_per
                f = widx % nwin_per
                rows = b * Fp + f
                idx = rows[:, None] + karange[None, :]
                wchunk = flat_spec[idx]
                return self.model.apply(variables, wchunk, None, None,
                                        False, emb_a=emb_a[b], emb_b=emb_b[b])

            res = jax.lax.map(chunk_fn, jnp.arange(nch, dtype=jnp.int32))
            res = res.reshape(nch * WC, m.num_features)[:nwin]
            res = res.reshape(B, nwin_per, m.num_features)
            denoised_lm = rest[:, :nwin_per] + res               # [B, nw, nf]
            # reconstruction-only amplification cap
            # (AudioConfig.recon_residual_cap); the eval LOSS above stays
            # on the raw model output
            cap = self.cfg.audio.recon_residual_cap
            denoised_lm_rec = (rest[:, :nwin_per] + jnp.minimum(res, cap)
                               if cap > 0 else denoised_lm)

            valid = (jnp.arange(nwin_per)[None, :]
                     < (nf - C)[:, None])                        # [B, nw]
            se = jnp.square(denoised_lm - lm_target[:, C:C + nwin_per])
            example_loss = jnp.mean(se * weights, axis=-1)       # [B, nw]
            loss = (jnp.sum(example_loss * valid)
                    / jnp.maximum(jnp.sum(valid), 1))

            # --- reconstructions with mixed phase (reference main.py:301-306)
            mask = valid[..., None].astype(denoised_lm.dtype)
            ph = ph_mixed[:, C:C + nwin_per]

            def recon(lm, phase):
                mag = jnp.exp(lm[:, :nwin_per]) * mask
                return sp.istft(mag * jnp.cos(phase[:, :nwin_per]),
                                mag * jnp.sin(phase[:, :nwin_per]), fl, fs)

            wavs = {
                "mixed": recon(lm_mixed[:, C:], ph),
                "denoised": recon(denoised_lm_rec, ph),
                "target": recon(lm_target[:, C:], ph_target[:, C:]),
            }
            if task.two_noise_mixing:
                wavs["posNoise"] = recon(lm_a[:, C:], ph_a[:, C:])
                wavs["negNoise"] = recon(lm_b[:, C:], ph_b[:, C:])
            n_out = fs * (jnp.maximum(nf - C, 1) - 1) + fl       # [B]
            return loss, example_loss, valid, wavs, n_out

        return jax.jit(program)

    def _program_for(self, n: int, B: int = 1):
        L = next((b for b in self.buckets if b >= n), None) or n
        with self._lock:
            if (L, B) not in self._programs:
                self._programs[(L, B)] = self._build(L, B)
            return self._programs[(L, B)], L

    def run(self, variables, loader, step: int = 0, modelname: str = "nhans",
            wav_dump_folder: Optional[str] = None,
            dump_results: Optional[str] = None,
            max_utts: Optional[int] = None,
            return_metrics: bool = False):
        """Evaluate over a loader; returns mean loss (or a metrics dict
        with SI-SDR when ``return_metrics``).  Optionally dumps
        reconstruction wavs + channel npys like the reference
        (main.py:339-353,539-543).  SI-SDR of denoised-vs-target and
        mixed-vs-target is reported alongside the loss — the quality
        metric BASELINE.md tracks (the reference only prints loss)."""
        from nhans_tpu.utils.scoring import estoi, pesq_score, si_sdr, stoi
        losses, counts = [], []
        sisdr_out, sisdr_in, sisdr_conf = [], [], []
        stoi_out, stoi_in, pesq_out = [], [], []
        estoi_out, estoi_in = [], []
        fs = self.cfg.audio.sample_rate

        def groups():
            """Yield lists of <= eval_batch examples (utterance batching)."""
            buf = []
            for i, ex in enumerate(loader):
                if max_utts is not None and i >= max_utts:
                    break
                buf.append(ex)
                if len(buf) == self.eval_batch:
                    yield buf
                    buf = []
            if buf:
                yield buf

        utt_index = 0
        for group in groups():
            nreal = len(group)
            longest = max(max(ex["clean_len"] for ex in group), fs)
            # pad the group to the full batch (repeat last example) so
            # ragged final groups reuse the same compiled program
            ge = group + [group[-1]] * (self.eval_batch - nreal)
            B = len(ge)
            program, L = self._program_for(longest, B)
            buf = np.zeros((3, B, L), np.float32)
            lens = np.zeros((3, B), np.int32)
            snrs = np.zeros((2, B), np.float32)
            peaks = np.zeros((B, 3), np.float32)
            for r, ex in enumerate(ge):
                for j, k in enumerate(("clean", "noise_a", "noise_b")):
                    x = ex[k][:L]
                    buf[j, r, :len(x)] = x
                lens[0, r] = min(ex["clean_len"], L)
                lens[1, r] = min(ex["len_a"], L)
                lens[2, r] = min(ex["len_b"], L)
                snrs[0, r], snrs[1, r] = ex["snr_a"], ex["snr_b"]
                peaks[r] = np.asarray(
                    ex.get("peaks",
                           [np.abs(buf[j, r]).max() for j in range(3)]),
                    np.float32)
            loss, ex_loss, valid, wavs, n_out = program(
                variables, buf[0], buf[1], buf[2],
                lens[0], lens[1], lens[2], snrs[0], snrs[1], peaks)
            ex_loss = np.asarray(ex_loss)
            valid = np.asarray(valid)
            n_out = np.asarray(n_out)
            host_wavs = {k: np.asarray(v) for k, v in wavs.items()}
            for r in range(nreal):
                ex = group[r]
                nv = int(valid[r].sum())
                losses.append(float((ex_loss[r] * valid[r]).sum()))
                counts.append(nv)
                n = int(n_out[r])
                den = host_wavs["denoised"][r, :n]
                mix = host_wavs["mixed"][r, :n]
                tgt = host_wavs["target"][r, :n]
                sisdr_out.append(si_sdr(den, tgt))
                sisdr_in.append(si_sdr(mix, tgt))
                if not self.cfg.task.two_noise_mixing:
                    # separator confusion diagnostic: SI-SDR of the
                    # output against the INTERFERER (= mixed - target).
                    # out-vs-interferer > out-vs-target flags
                    # wrong-speaker extraction — a conditioning/
                    # discrimination failure, distinct from low
                    # separation fidelity (docs/QUALITY.md round 2)
                    sisdr_conf.append(si_sdr(den, mix - tgt))
                s = stoi(den, tgt, fs)
                if np.isfinite(s):
                    stoi_out.append(s)
                    stoi_in.append(stoi(mix, tgt, fs))
                    estoi_out.append(estoi(den, tgt, fs))
                    estoi_in.append(estoi(mix, tgt, fs))
                p = pesq_score(den, tgt, fs)
                if p is not None:
                    pesq_out.append(p)
                if wav_dump_folder:
                    stem = (lambda p:
                            os.path.splitext(os.path.basename(p))[0])
                    names = {
                        "clean": stem(ex["cleanpath"]),
                        "a": stem(ex["path_a"]),
                        "b": stem(ex["path_b"]) if ex["path_b"] else "none",
                    }
                    for kind, w in host_wavs.items():
                        fname = (f"{modelname}_{step}_{names['clean']}_"
                                 f"{names['a']}_{names['b']}_{ex['snr_a']}_"
                                 f"{ex['snr_b']}_{kind}.wav")
                        wavio.write_wav(
                            os.path.join(wav_dump_folder, fname),
                            w[r, :n], fs)
                if dump_results:
                    # per-channel npy dumps (reference main.py:539-543
                    # dumps every model output channel; here: per-window
                    # loss + the reconstruction waveforms)
                    os.makedirs(dump_results, exist_ok=True)
                    np.save(os.path.join(
                        dump_results,
                        f"{modelname}_eval_{step}_loss_{utt_index}"),
                        ex_loss[r][valid[r].astype(bool)])
                    for kind, w in host_wavs.items():
                        np.save(os.path.join(
                            dump_results,
                            f"{modelname}_eval_{step}_{kind}_{utt_index}"),
                            w[r, :n])
                utt_index += 1
        total = max(sum(counts), 1)
        mean_loss = sum(losses) / total
        print(f"loss: {mean_loss}")
        metrics = {
            "eval_loss": mean_loss,
            "si_sdr": float(np.mean(sisdr_out)) if sisdr_out else 0.0,
            "si_sdr_mixed": float(np.mean(sisdr_in)) if sisdr_in else 0.0,
        }
        metrics["si_sdr_gain"] = metrics["si_sdr"] - metrics["si_sdr_mixed"]
        if sisdr_conf:
            metrics["si_sdr_interferer"] = float(np.mean(sisdr_conf))
            metrics["confused_utts"] = int(sum(
                c > o for c, o in zip(sisdr_conf, sisdr_out)))
        print(f"si_sdr: {metrics['si_sdr']:.2f} dB "
              f"(mixed: {metrics['si_sdr_mixed']:.2f} dB, "
              f"gain: {metrics['si_sdr_gain']:+.2f} dB)")
        if stoi_out:
            metrics["stoi"] = float(np.mean(stoi_out))
            metrics["stoi_mixed"] = float(np.mean(stoi_in))
            print(f"stoi: {metrics['stoi']:.3f} "
                  f"(mixed: {metrics['stoi_mixed']:.3f})")
            metrics["estoi"] = float(np.mean(estoi_out))
            metrics["estoi_mixed"] = float(np.mean(estoi_in))
            print(f"estoi: {metrics['estoi']:.3f} "
                  f"(mixed: {metrics['estoi_mixed']:.3f})")
        if pesq_out:  # optional pesq package (utils/scoring.py)
            metrics["pesq"] = float(np.mean(pesq_out))
            print(f"pesq: {metrics['pesq']:.2f}")
        if return_metrics:
            return metrics
        return mean_loss
