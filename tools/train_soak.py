"""Full-size training soak on real hardware (VERDICT r2 next-round #7).

123M ZipVoice, B=8, T=1024 frames, bf16 compute, ScaledAdam + Eden, the
stochastic regularizers LIVE — a few hundred real optimizer steps proving
bf16 numerical robustness at scale (the reference's grad-scale-watchdog
territory, ref train_zipvoice.py:678-697), plus a mid-run checkpoint save ->
fresh-process-equivalent resume -> continue, asserting loss continuity.

Data is synthetic (seeded random mel features + token ids): the loss cannot
converge to speech, but it must stay finite, trend down from init, and be
CONTINUOUS across the resume.  Writes BENCH_train_soak.jsonl (one record per
logged step + a final summary record) for the repo.

Usage:  python tools/train_soak.py [--steps 250] [--resume-at 120]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_batch(cfg, step: int, b: int = 8, t: int = 1024):
    rng = np.random.default_rng(1000 + step)
    lens = rng.integers(int(0.9 * t), t + 1, (b,)).astype(np.int32)
    return {
        "tokens": rng.integers(1, cfg.vocab_size, (b, 128)).astype(np.int32),
        "tokens_lens": np.full((b,), 100, np.int32),
        "features": (rng.standard_normal((b, t, cfg.feat_dim)) * 0.1).astype(
            np.float32),
        "features_lens": lens,
    }


def build_trainer(cfg, exp_dir: str):
    import jax

    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig
    from zipvoice_tpu.train.trainer import Trainer, TrainerOptions

    return Trainer(
        model_cfg=cfg,
        params=init_zipvoice(jax.random.PRNGKey(0), cfg),
        opt=scaled_adam(clipping_scale=2.0),
        train_cfg=TrainConfig(compute_dtype="bfloat16",
                              use_regularizers=True),
        options=TrainerOptions(exp_dir=exp_dir, seed=11, log_interval=10,
                               max_duration=200.0),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--resume-at", type=int, default=120)
    ap.add_argument("--out", type=str,
                    default=str(Path(__file__).resolve().parents[1]
                                / "BENCH_train_soak.jsonl"))
    ap.add_argument("--exp-dir", type=str, default="/tmp/zipvoice_soak")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + CPU smoke test of the soak logic")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--remat", type=str, default="full",
                    choices=["full", "all", "dots", "xprobs", "xprobs_ff", "names"],
                    help="rematerialization policy (run the soak with the "
                         "profile_train winner)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_compilation")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # noqa: BLE001
        pass

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.nn.zipformer import set_remat_policy, set_scan_layers

    set_scan_layers(True)
    set_remat_policy(None if args.remat == "full" else args.remat)
    if args.tiny:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        cfg = ZipVoiceConfig(
            fm_decoder_downsampling_factor=(1,), fm_decoder_num_layers=(1,),
            fm_decoder_cnn_module_kernel=(3,), fm_decoder_feedforward_dim=32,
            fm_decoder_num_heads=2, fm_decoder_dim=16,
            text_encoder_num_layers=1, text_encoder_feedforward_dim=16,
            text_encoder_cnn_module_kernel=3, text_encoder_num_heads=2,
            text_encoder_dim=16, time_embed_dim=8, text_embed_dim=16,
            query_head_dim=4, value_head_dim=4, pos_head_dim=2, pos_dim=4,
            feat_dim=8, vocab_size=12, pad_id=0,
        )
        args.batch, args.frames = 2, 64
    else:
        cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)

    out_path = Path(args.out)
    records = []

    def log(rec):
        records.append(rec)
        with open(out_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(json.dumps(rec), flush=True)

    trainer = build_trainer(cfg, args.exp_dir)
    ckpt_path = str(Path(args.exp_dir) / "soak-checkpoint.pt")

    t_start = time.monotonic()
    losses = []
    window_before_resume = []
    for step in range(1, args.steps + 1):
        m = trainer.train_step(make_batch(cfg, step, args.batch, args.frames))
        loss = float(m["loss"])
        losses.append(loss)
        assert np.isfinite(loss), f"non-finite loss at step {step}"
        if step % 10 == 0 or step == 1:
            log({"step": step, "loss": loss, "lr": float(m["lr"]),
                 "wall_s": round(time.monotonic() - t_start, 1)})
        if step == args.resume_at:
            trainer.save(ckpt_path)
            window_before_resume = losses[-10:]
            # fresh trainer, fresh optimizer state containers -> resume
            trainer = build_trainer(cfg, args.exp_dir)
            trainer.resume(ckpt_path)
            assert trainer.batch_idx_train == step, (
                trainer.batch_idx_train, step)
            log({"event": "resumed", "step": step})

    first_window = float(np.mean(losses[:10]))
    last_window = float(np.mean(losses[-10:]))
    after_resume = losses[args.resume_at:args.resume_at + 10]
    continuity_gap = abs(float(np.mean(after_resume))
                         - float(np.mean(window_before_resume)))
    spread = max(1e-6, float(np.std(losses[args.resume_at - 20:
                                           args.resume_at])))
    summary = {
        "event": "summary",
        "steps": args.steps,
        "first10_loss": round(first_window, 5),
        "last10_loss": round(last_window, 5),
        "loss_decreased": last_window < first_window,
        "resume_continuity_gap": round(continuity_gap, 5),
        "resume_continuous": continuity_gap < 6 * spread,
        "all_finite": True,
        "sec_per_step_steady": round(
            (time.monotonic() - t_start) / args.steps, 3),
        "device": str(jax.devices()[0]),
    }
    log(summary)
    assert summary["loss_decreased"], "loss did not decrease over the soak"
    assert summary["resume_continuous"], (
        f"loss discontinuity across resume: {continuity_gap}")
    print("SOAK OK", flush=True)


if __name__ == "__main__":
    main()
