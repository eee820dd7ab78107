"""Worker process for tests/test_distributed.py (2-process jax.distributed).

Run as: python distributed_worker.py <process_id> <coordinator_port> <outdir>

Exercises the real multi-host wiring (VERDICT r2 weak #5): gloo CPU
collectives over two processes x 4 virtual devices, the per-host
DurationBucketSampler shard, shard_batch's make_array_from_process_local_data
path, three DP train steps through the Trainer, and the process-0 checkpoint
gate (ref common.py:181-203 is the NCCL equivalent being replaced).
"""

import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    outdir = Path(sys.argv[3])

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.data.dataset import DurationBucketSampler, Utterance
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.parallel.mesh import make_mesh
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig
    from zipvoice_tpu.train.trainer import Trainer, TrainerOptions

    # --- per-host sampler shard: equal batch counts by construction
    rng = np.random.default_rng(0)
    utts = [
        Utterance(uid=f"u{i}", text="x", wav_path="",
                  duration=float(rng.uniform(2.0, 8.0)))
        for i in range(41)
    ]
    sampler = DurationBucketSampler(
        utts, max_duration=20.0, seed=7, num_buckets=4,
        process_index=pid, process_count=2,
    )
    sampler.set_epoch(1)
    my_batches = list(iter(sampler))
    my_uids = sorted(u.uid for b in my_batches for u in b)

    # --- tiny model + DP mesh over all 8 global devices
    cfg = ZipVoiceConfig(
        fm_decoder_downsampling_factor=(1,),
        fm_decoder_num_layers=(1,),
        fm_decoder_cnn_module_kernel=(3,),
        fm_decoder_feedforward_dim=32,
        fm_decoder_num_heads=2,
        fm_decoder_dim=16,
        text_encoder_num_layers=1,
        text_encoder_feedforward_dim=16,
        text_encoder_cnn_module_kernel=3,
        text_encoder_num_heads=2,
        text_encoder_dim=16,
        time_embed_dim=8,
        text_embed_dim=16,
        query_head_dim=4,
        value_head_dim=4,
        pos_head_dim=2,
        pos_dim=4,
        feat_dim=8,
        vocab_size=12,
        pad_id=0,
    )
    mesh = make_mesh(n_model=1)
    assert mesh.devices.size == 8

    exp_dir = outdir / "exp"
    trainer = Trainer(
        model_cfg=cfg,
        params=init_zipvoice(jax.random.PRNGKey(0), cfg),
        opt=scaled_adam(clipping_scale=2.0),
        train_cfg=TrainConfig(compute_dtype="float32",
                              use_regularizers=True),
        options=TrainerOptions(exp_dir=str(exp_dir), seed=3,
                               max_duration=20.0),
        mesh=mesh,
    )

    # --- 3 DP steps on synthetic per-host batches (B_local=2 -> global 4,
    # sharded over data=8? no: global batch 4 on data axis 8 would not
    # divide; use B_local=4 -> global 8)
    losses = []
    for step in range(3):
        srng = np.random.default_rng(100 + step)  # same data on both hosts'
        # manifest shard would differ per host; what must MATCH is params.
        batch = {
            "tokens": srng.integers(
                1, cfg.vocab_size, (4, 8)).astype(np.int32),
            "tokens_lens": np.full((4,), 6, np.int32),
            "features": srng.standard_normal((4, 32, cfg.feat_dim)).astype(
                np.float32) * (1.0 + pid),  # per-host DIFFERENT shard
            "features_lens": np.full((4,), 32, np.int32),
        }
        metrics = trainer.train_step(batch)
        losses.append(float(metrics["loss"]))

    # --- checkpoint gate: both processes ask; only process 0 may write
    trainer.save(str(outdir / f"ckpt-proc{pid}.pt"))

    # --- replicated params must be bit-identical across processes
    flat = jax.tree_util.tree_leaves(trainer.params)
    h = hashlib.sha256()
    for leaf in flat:
        h.update(np.asarray(jax.device_get(leaf)).tobytes())
    report = {
        "pid": pid,
        "n_batches": len(my_batches),
        "uids": my_uids,
        "losses": losses,
        "param_hash": h.hexdigest(),
    }
    (outdir / f"proc{pid}.json").write_text(json.dumps(report))
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
