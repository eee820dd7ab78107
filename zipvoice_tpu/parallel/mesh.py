"""Device mesh + sharding rules.

The reference's only parallelism is DDP over NCCL (ref zipvoice/utils/
common.py:181-203, SURVEY.md §2.10).  The TPU-native equivalent is a 1-D
``data`` mesh: batch sharded over ICI, parameters/optimizer state replicated,
gradient psum inserted by XLA from the sharding annotations.  A second
``model`` axis is provisioned for tensor-parallel extensions at larger
scales (unused at 123M, where DP is compute-optimal).

Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
then spans all processes and batches shard per-host over DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-dim sharding.

    Single-process: a plain sharded device_put.  Multi-process: each process
    holds its PER-HOST shard (the DurationBucketSampler shards the manifest
    by host), so the global array is assembled with
    make_array_from_process_local_data — device_put alone cannot target the
    other hosts' (non-addressable) devices."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, s), batch)
    nproc = jax.process_count()

    def put(a):
        a = np.asarray(a)
        global_shape = (a.shape[0] * nproc,) + a.shape[1:]
        return jax.make_array_from_process_local_data(s, a, global_shape)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def tp_param_shardings(mesh: Mesh, params):
    """Tensor-parallel parameter shardings (Megatron-style column/row split
    of the feedforward linears over the ``model`` axis; everything else
    replicated).  The feedforward hidden dim is the one axis in this
    architecture that is both large (4x-ish the encoder dim) and cleanly
    divisible, so its two matmuls carry the column->row split; attention and
    conv modules stay replicated (head counts are small and odd at 123M).
    XLA/GSPMD inserts the reduce-scatter/all-gather pair per layer from these
    annotations alone."""

    def leaf_sharding(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(keys)
        if "feed_forward" in joined and getattr(leaf, "ndim", 0) >= 1:
            if joined.endswith("in_proj/weight"):
                return NamedSharding(mesh, P(None, "model"))
            if joined.endswith("in_proj/bias"):
                return NamedSharding(mesh, P("model"))
            if joined.endswith("out_proj/weight"):
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def tp_opt_state_shardings(mesh: Mesh, opt_state, param_shardings):
    """Shardings for a ScaledAdamState: the param-shaped moment trees
    (exp_avg_sq, delta) follow the parameter shardings; every reduced
    quantity (rms, scale moments, clipping history) is replicated."""
    repl = NamedSharding(mesh, P())
    return type(opt_state)(
        step=repl,
        exp_avg_sq=param_shardings,
        delta=param_shardings,
        param_rms=jax.tree.map(lambda _: repl, opt_state.param_rms),
        scale_grads=jax.tree.map(lambda _: repl, opt_state.scale_grads),
        scale_exp_avg_sq=jax.tree.map(
            lambda _: repl, opt_state.scale_exp_avg_sq
        ),
        model_norms=repl,
        model_norm_threshold=repl,
    )


# ---------------------------------------------------------------------------
# sequence (time) parallelism — inference
# ---------------------------------------------------------------------------

def make_seq_mesh(n_seq: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the time dimension for sequence-parallel inference.

    The reference has no SP (SURVEY §5.7: sequence length is handled
    architecturally by the 30 s cap + U-Net downsampling); this is the
    TPU-native extension for longer-than-30s single-utterance synthesis:
    shard T over ICI and let GSPMD insert the attention all-gathers and
    conv halo exchanges (verified equal to the unsharded sampler in
    tests/test_sequence_parallel.py)."""
    devices = devices if devices is not None else jax.devices()
    n_seq = n_seq or len(devices)
    return Mesh(np.asarray(devices[:n_seq]).reshape(n_seq), ("seq",))


def seq_activation_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, F) arrays sharded along T over the ``seq`` axis."""
    return NamedSharding(mesh, P(None, "seq", None))


def sp_sample_jit(sample_fn, mesh: Mesh):
    """jit ``sample_fn(params, tokens, tokens_lens, prompt_features,
    prompt_features_lens, features_lens, noise)`` with the frame-axis
    arrays (prompt_features, noise, output) sharded over ``seq`` and
    everything else replicated.  T must be divisible by the mesh size."""
    seq3 = seq_activation_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        sample_fn,
        in_shardings=(rep, rep, rep, seq3, rep, rep, seq3),
        out_shardings=seq3,
    )


def make_dp_sp_mesh(n_data: int, n_seq: int, devices=None) -> Mesh:
    """2-D ``data x seq`` mesh: batch over data, frame axis over seq —
    training-side sequence parallelism for long utterances (beyond the
    reference, which caps utterances at 30 s instead; SURVEY §5.7)."""
    devices = devices if devices is not None else jax.devices()
    devs = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(devs, ("data", "seq"))
