"""True multi-PROCESS distributed test (SURVEY.md §4 item 5, VERDICT r3 #7).

The rest of the suite simulates multi-chip with a single-process 8-device CPU
mesh, which never executes `initialize_multihost`, Gloo cross-process
collectives, or `put_batch`'s `make_array_from_process_local_data` branch.
Here we spawn 2 real `jax.distributed` CPU processes (2 local devices each),
run one dp x tp sharded MLM train step, and check (a) both processes agree,
(b) the loss equals a single-process run of the identical global batch —
the same single-device-equivalence bar `tests/test_parallel.py` sets.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=240)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["device_count"] == 4
        assert r["step"] == 1
        assert np.isfinite(r["loss"])
    # both processes observe the same (replicated) global loss
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6

    # single-process golden run of the SAME global batch on the conftest mesh
    import jax
    import jax.numpy as jnp

    from outeffhop_tpu.models.bert import BertConfig, init_bert_params
    from outeffhop_tpu.parallel import make_adamw, make_mlm_train_step, shard_params
    from outeffhop_tpu.parallel.mesh import make_mesh, put_batch
    from outeffhop_tpu.parallel.train import init_train_state

    cfg = BertConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        attn_softmax="softmax1",
    )
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    params = shard_params(init_bert_params(jax.random.PRNGKey(0), cfg), mesh)
    tx = make_adamw(params, lr=1e-3, warmup_steps=2, total_steps=10, accum_steps=1)
    state = init_train_state(params, tx)
    rs = np.random.RandomState(0)
    global_bs, seq = 8, 16
    ids = rs.randint(0, cfg.vocab_size, (global_bs, seq)).astype(np.int32)
    labels = np.where(
        rs.rand(global_bs, seq) < 0.15,
        rs.randint(0, cfg.vocab_size, (global_bs, seq)),
        -100,
    ).astype(np.int32)
    batch = put_batch(
        mesh,
        {
            "input_ids": ids,
            "attention_mask": np.ones((global_bs, seq), np.int32),
            "labels": labels,
        },
    )
    step = make_mlm_train_step(cfg, tx, mesh=mesh)
    _, loss = step(state, batch, jax.random.PRNGKey(1))
    assert abs(float(jnp.asarray(loss)) - results[0]["loss"]) < 5e-5, (
        f"2-process loss {results[0]['loss']} != single-process {float(loss)}"
    )
