"""Worker for tests/test_multiprocess.py — one REAL `jax.distributed` process.

Exercises the paths the single-process 8-device conftest mesh cannot reach
(SURVEY.md §4 item 5, VERDICT r3 missing #5):
  * `initialize_multihost` with explicit coordinator/num/id,
  * `put_batch`'s `jax.make_array_from_process_local_data` branch
    (process_count > 1), with each process contributing only its
    `host_batch_slice` of the global batch,
  * one dp x tp sharded MLM train step whose gradient all-reduce crosses
    PROCESS boundaries (Gloo CPU collectives), not just devices.

Writes {"loss": ..., "process_count": ...} as JSON to argv[4].
"""

import json
import os
import sys


def main():
    proc_id, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    # the sitecustomize force-registers the remote-TPU plugin; env is not
    # enough (CLAUDE.md) — override the platform before the first op
    jax.config.update("jax_platforms", "cpu")

    from outeffhop_tpu.parallel.mesh import (
        host_batch_slice,
        initialize_multihost,
        make_mesh,
        put_batch,
    )

    is_multi = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )
    assert is_multi, "expected a multi-process runtime"
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp

    from outeffhop_tpu.models.bert import BertConfig, init_bert_params
    from outeffhop_tpu.parallel import make_adamw, make_mlm_train_step, shard_params
    from outeffhop_tpu.parallel.train import init_train_state

    mesh = make_mesh(n_model=2)  # 2 data (one per process) x 2 model

    cfg = BertConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        attn_softmax="softmax1",
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    tx = make_adamw(params, lr=1e-3, warmup_steps=2, total_steps=10, accum_steps=1)
    state = init_train_state(params, tx)

    # the same GLOBAL batch in every process; each contributes only its slice
    rs = np.random.RandomState(0)
    global_bs, seq = 8, 16
    ids = rs.randint(0, cfg.vocab_size, (global_bs, seq)).astype(np.int32)
    labels = np.where(
        rs.rand(global_bs, seq) < 0.15,
        rs.randint(0, cfg.vocab_size, (global_bs, seq)),
        -100,
    ).astype(np.int32)
    sl = host_batch_slice(global_bs)
    batch = put_batch(
        mesh,
        {
            "input_ids": ids[sl],
            "attention_mask": np.ones((global_bs, seq), np.int32)[sl],
            "labels": labels[sl],
        },
    )
    assert batch["input_ids"].shape == (global_bs, seq)  # global view

    step = make_mlm_train_step(cfg, tx, mesh=mesh)
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jnp.asarray(loss))
    with open(out_path, "w") as f:
        json.dump(
            {"loss": loss, "process_count": jax.process_count(),
             "device_count": jax.device_count(), "step": int(state.step)},
            f,
        )


if __name__ == "__main__":
    main()
