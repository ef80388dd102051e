"""Multi-host (2-process) distributed training test on CPU.

The TPU-native analogue of a multi-node DDP test (SURVEY.md §4c, §5.8):
two OS processes form a jax.distributed cluster, each with 4 virtual CPU
devices, build one global ("data","model") mesh, load disjoint per-host
batch shards, and run sharded train steps. Losses must agree across hosts
(they see the same global computation).
"""

import json
import os
import subprocess
import sys
import socket
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = str(Path(__file__).resolve().parents[1])

WORKER = r"""
import sys, os, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 8, jax.devices()
assert jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
from tpu1x.model_zoo import genie_tiny
from tpu1x.models.st_maskgit import STMaskGIT
from tpu1x.parallel.mesh import make_mesh, put_global_batch
from tpu1x.train.optim import build_optimizer
from tpu1x.train.step import create_train_state, make_train_step, shard_train_state
from tpu1x.data.token_store import RawTokenDataset, ShardedBatchLoader, write_token_dataset

data_dir = sys.argv[3]
cfg = genie_tiny(T=4, num_prompt_frames=1)
mesh = make_mesh(tp=2)  # 4 x 2 over 8 global devices
model = STMaskGIT(cfg)
tx = build_optimizer(cfg, learning_rate=1e-3, num_training_steps=10)
state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
state, _ = shard_train_state(state, mesh, fsdp=True)
step = make_train_step(model, tx, cfg, donate=False)

ds = RawTokenDataset(data_dir, window_size=cfg.T, stride=1)
loader = ShardedBatchLoader(ds, global_batch_size=8,
                            process_index=jax.process_index(),
                            process_count=jax.process_count(), seed=1)
losses = []
last_tokens = None
for i, batch in enumerate(loader.epoch(0)):
    tokens = put_global_batch(jnp.asarray(batch["tokens"]), mesh)
    last_tokens = tokens
    state, m = step(state, tokens)
    losses.append(float(m["loss"]))
    if i >= 2:
        break

# multi-host sharded checkpoint round-trip: every process writes only its
# own shards (async Orbax), restore materializes into the same shardings
from tpu1x.train.checkpoint import Checkpointer

def checksum(tree):
    return float(sum(jnp.sum(x.astype(jnp.float32)) for x in
                     jax.tree_util.tree_leaves(tree)))

ckpt = Checkpointer(sys.argv[4])
want_sum = checksum(state.params)
ckpt.save(state, "step_3", wait=True)

fresh = create_train_state(model, tx, jax.random.PRNGKey(9), cfg)
fresh, _ = shard_train_state(fresh, mesh, fsdp=True)
restored = ckpt.restore("step_3", fresh)
got_sum = checksum(restored.params)
restored, m = step(restored, last_tokens)
print("RESULT", json.dumps({"pid": pid, "losses": losses,
                            "step_restored": int(restored.step),
                            "want_sum": want_sum, "got_sum": got_sum,
                            "post_restore_loss": float(m["loss"])}),
      flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    from tpu1x.data.token_store import write_token_dataset
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 64, (64, 4, 4)).astype(np.uint32)
    write_token_dataset(tmp_path / "ds", tokens, vocab_size=64,
                        segment_ids=np.zeros(64, dtype=np.int32))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(pid),
             str(tmp_path / "ds"), str(tmp_path / "ckpt")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results.append(json.loads(line[len("RESULT "):]))
    # both hosts observe the same global losses
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-5)
    assert len(results[0]["losses"]) == 3
    assert all(np.isfinite(results[0]["losses"]))
    # checkpoint round-trip: params survive save/restore bit-identically
    # (per-host shards only), step counter restored, training continues
    for r in results:
        assert r["step_restored"] == 4, r
        np.testing.assert_allclose(r["got_sum"], r["want_sum"], rtol=1e-6)
        assert np.isfinite(r["post_restore_loss"])
    np.testing.assert_allclose(results[0]["post_restore_loss"],
                               results[1]["post_restore_loss"], rtol=1e-5)
