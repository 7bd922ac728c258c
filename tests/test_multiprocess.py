"""Multi-PROCESS (multi-host) training path, executed for real.

Spawns 2 subprocesses x 4 virtual CPU devices each, connected through
``jax.distributed.initialize`` (gloo collectives) — the TPU-native stand-in
for the reference's torchrun multi-node bootstrap
(``/root/reference/prismatic/overwatch/overwatch.py:52-64``). Each process
feeds ONLY its per-host shard of the global batch (the reference analog is
``DistributedSampler``, ``training/strategies/base_strategy.py:507-520``);
``shard_batch`` assembles the global array via
``jax.make_array_from_process_local_data``. Asserts:

- one sharded train step produces the SAME loss on both processes, matching
  a single-process 8-device run of the same global batch;
- an Orbax save/restore round-trips the sharded train state across processes.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
sys.path.insert(0, sys.argv[1])
pid = int(sys.argv[2])
port = sys.argv[3]
out_dir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

from emmax_tpu.parallel.distributed import barrier, initialize_distributed

idx = initialize_distributed(coordinator_address=f"localhost:{port}",
                             num_processes=2, process_id=pid)
assert idx == pid and jax.process_count() == 2
assert jax.local_device_count() == 4 and len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.parallel import make_mesh, shard_params
from emmax_tpu.parallel.sharding import shard_batch
from emmax_tpu.training.checkpointing import CheckpointManager
from emmax_tpu.training.train_state import create_train_state, make_optimizer
from emmax_tpu.training.train_step import jit_train_step, make_train_step

cfg = tiny_vlm_config()
mesh = make_mesh((1, 8, 1))
params = init_vlm_params(jax.random.PRNGKey(0), cfg)   # identical on hosts
tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                       max_grad_norm=1.0, lr_scheduler_type="constant",
                       total_steps=10, stage="vla-full-train")
params = shard_params(params, mesh)
state = create_train_state(params, tx)
step = jit_train_step(make_train_step(cfg, tx, remat=False,
                                      compute_dtype=jnp.float32))

# global batch (same construction as the parent); this host feeds ONLY its
# contiguous half — rows [pid*4, (pid+1)*4)
rng = np.random.default_rng(0)
B, L = 8, 12
ids = rng.integers(3, cfg.llm.vocab_size, size=(B, L))
ids[:, 0] = 1
labels = ids.copy()
labels[:, :4] = IGNORE_INDEX
pixels = {name: rng.normal(size=(B, v.img_size, v.img_size, 3))
          .astype(np.float32) for name, v in cfg.vision}
lo, hi = pid * 4, (pid + 1) * 4
local = {"input_ids": ids[lo:hi].astype(np.int32),
         "attention_mask": np.ones((4, L), bool),
         "labels": labels[lo:hi].astype(np.int32),
         "pixel_values": {k: v[lo:hi] for k, v in pixels.items()}}
batch = shard_batch(local, mesh)
assert batch["input_ids"].shape == (B, L)              # global shape

state, metrics = step(state, batch)
loss = float(metrics["loss"])

# --- Orbax round-trip across processes (shared out_dir filesystem)
mgr = CheckpointManager(out_dir, async_save=False)
path = mgr.save(state, step=1, epoch=0, loss=loss)
barrier()
restored = mgr.restore(state, path)
diff = jax.jit(
    lambda a, b: sum(jnp.sum(jnp.abs(x.astype(jnp.float32)
                                     - y.astype(jnp.float32)))
                     for x, y in zip(jax.tree_util.tree_leaves(a),
                                     jax.tree_util.tree_leaves(b))),
    out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
)(restored.params, state.params)
result = {"pid": pid, "loss": loss, "restore_param_absdiff": float(diff),
          "restored_step": int(restored.step)}
with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
    json.dump(result, f)
barrier()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_loss() -> float:
    """Single-process 8-device run of the identical global batch."""
    from emmax_tpu.models.llama import IGNORE_INDEX
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.parallel import make_mesh, shard_params
    from emmax_tpu.parallel.sharding import shard_batch
    from emmax_tpu.training.train_state import (create_train_state,
                                                make_optimizer)
    from emmax_tpu.training.train_step import jit_train_step, make_train_step

    cfg = tiny_vlm_config()
    mesh = make_mesh((1, 8, 1))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-full-train")
    params = shard_params(params, mesh)
    state = create_train_state(params, tx)
    step = jit_train_step(make_train_step(cfg, tx, remat=False,
                                          compute_dtype=jnp.float32))
    rng = np.random.default_rng(0)
    B, L = 8, 12
    ids = rng.integers(3, cfg.llm.vocab_size, size=(B, L))
    ids[:, 0] = 1
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    pixels = {name: rng.normal(size=(B, v.img_size, v.img_size, 3))
              .astype(np.float32) for name, v in cfg.vision}
    batch = shard_batch({"input_ids": ids.astype(np.int32),
                         "attention_mask": np.ones((B, L), bool),
                         "labels": labels.astype(np.int32),
                         "pixel_values": pixels}, mesh)
    _, metrics = step(state, batch)
    return float(metrics["loss"])


def test_two_process_train_step_and_checkpoint(tmp_path):
    ref_loss = _reference_loss()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(REPO), str(pid), str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = [json.loads((tmp_path / f"result_{pid}.json").read_text())
               for pid in range(2)]
    # both processes observe the same global loss...
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    # ...which matches the single-process run of the same global batch
    assert results[0]["loss"] == pytest.approx(ref_loss, rel=1e-5)
    # Orbax round-trip restored the sharded state exactly
    for r in results:
        assert r["restore_param_absdiff"] == 0.0
        assert r["restored_step"] == 1
