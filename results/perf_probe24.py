"""Round-4 probe #24: on-chip validation of the two host-boundary fixes.

(a) telemetry-on vs telemetry-off eval (VERDICT r3 #8 done-criterion:
    within 2x). Round 3's eval_loop called float(v) per probe per batch —
    a blocking ~100 ms tunnel round trip each; round 4 accumulates on device
    and crosses the host boundary once at the end.
(b) MSE weight-range freeze time for one BERT-scale tensor (VERDICT r3 #9
    done-criterion: < 1 s on chip). Round 3's 2-D grid dispatched 12,800
    eager programs; round 4 runs one jitted lax.map over the whole grid.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def telemetry_probe():
    from outeffhop_tpu.drivers.common import eval_loop
    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params

    cfg = BertConfig(
        vocab_size=8192, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=512, attn_softmax="softmax1",
    )
    params = jax.jit(lambda k: init_bert_params(k, cfg))(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    batches = [
        {
            "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (16, 128)), jnp.int32),
            "attention_mask": jnp.ones((16, 128), jnp.int32),
            "labels": jnp.asarray(
                np.where(rs.rand(16, 128) < 0.15,
                         rs.randint(0, cfg.vocab_size, (16, 128)), -100), jnp.int32),
        }
        for _ in range(32)
    ]

    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    def loss_and_count(batch, qctx, tape):
        logits = bert_mlm_forward(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            q=qctx, tape=tape, deterministic=True,
        )
        labels = batch["labels"]
        mask = labels != -100
        safe = jnp.where(mask, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(mask, nll, 0.0)), jnp.sum(mask)

    for telem in (False, True):
        eval_loop(loss_and_count, batches[:2], collect_telemetry=telem)  # warm
        t0 = time.perf_counter()
        loss, td = eval_loop(loss_and_count, batches, collect_telemetry=telem)
        dt = time.perf_counter() - t0
        print(
            f"eval 32 batches telemetry={telem}: {dt:.2f} s"
            + (f"  ({len(td)} aggregates)" if telem else ""),
            flush=True,
        )


def mse_probe():
    from outeffhop_tpu.quant.ranges import MSEEstimator

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(3072, 768), jnp.float32)  # BERT FFN weight

    for symmetric, per_channel, label in (
        (True, True, "1d symmetric per-channel"),
        (False, False, "2d asymmetric per-tensor (12,800-cell grid)"),
    ):
        est = MSEEstimator(symmetric=symmetric, per_channel=per_channel)
        t0 = time.perf_counter()
        state = est.update(est.init_state(), w)
        jax.block_until_ready(jnp.zeros(()))  # fence dispatch queue
        cold = time.perf_counter() - t0
        # steady state: _grid_losses_jit is module-level-jitted, so every
        # same-shape tensor after the first reuses the compile — the number
        # that matters for a 72-site model freeze is the warm one
        w2 = w * 1.01
        t0 = time.perf_counter()
        est.update(est.init_state(), w2)
        jax.block_until_ready(jnp.zeros(()))
        warm = time.perf_counter() - t0
        print(
            f"MSE weight freeze [{label}]: cold {cold:.2f} s (incl. remote "
            f"compile), warm {warm:.3f} s",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    telemetry_probe()
    mse_probe()
