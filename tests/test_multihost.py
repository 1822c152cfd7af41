"""Multi-host (multi-process) SPMD: unit tests for the process-level glue
(parallel/multihost.py) plus a REAL 2-process CPU smoke that initializes
jax.distributed over gloo, assembles global arrays from per-host shards,
and runs one identical training step on both hosts."""
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import numpy as np
import pytest

from rovit_kan_tpu.parallel.mesh import make_mesh
from rovit_kan_tpu.parallel.multihost import (
    global_mesh, local_batch_slice, make_global_array,
    maybe_initialize_distributed)

REPO = Path(__file__).resolve().parent.parent


def test_single_process_slice_covers_everything():
    assert local_batch_slice(32) == slice(0, 32)


def test_nondivisible_batch_raises(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="not divisible"):
        local_batch_slice(16)


def test_slices_partition_global_batch(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    rows = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        s = local_batch_slice(32)
        rows.extend(range(s.start, s.stop))
    assert rows == list(range(32))


def test_maybe_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False


def test_global_mesh_and_make_global_array():
    """Single-process degenerate case on the 8-device CPU mesh: the 'local'
    rows are the whole batch; the result must be batch-sharded and
    value-identical."""
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.arange(48, dtype=np.float32).reshape(16, 3),
             "y": np.arange(16, dtype=np.int32)}
    garr = make_global_array(batch, mesh)
    assert garr["x"].shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(garr["x"]), batch["x"])
    from rovit_kan_tpu.parallel.mesh import batch_sharding
    assert garr["x"].sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)


_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_platforms", "cpu")
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from rovit_kan_tpu.parallel.multihost import (
        maybe_initialize_distributed, global_mesh, local_batch_slice,
        make_global_array)
    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid)
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import RoViTKAN
    from rovit_kan_tpu.parallel.mesh import shard_batch
    from rovit_kan_tpu.training.trainer import Trainer

    mesh = global_mesh()
    assert mesh.devices.size == 8

    cfg = get_config()
    cfg.data.image_size = 32
    cfg.train.batch_size = 16
    cfg.flags.mixed_precision = False
    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False)
    trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0)
    state = trainer.init_state()

    # Every host builds the same logical global batch (same seed);
    # shard_batch's multi-process path device_puts only the local slice.
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randint(0, 256, (16, 32, 32, 3)).astype(np.uint8),
        "labels": rng.randint(0, 4, (16,)).astype(np.int32),
        "severity": rng.randint(0, 4, (16,)).astype(np.float32),
    }
    sharded = shard_batch(batch, mesh)
    shard_rows = {s.data.shape[0] for s in sharded["images"].addressable_shards}
    assert shard_rows == {2}, shard_rows        # 16 rows / 8 global devices

    state, metrics = trainer.train_step(
        state, sharded, jnp.int32(4), jnp.float32(1.0), jnp.float32(0.0))
    print(f"MH_LOSS {pid} {float(metrics['total_loss']):.6f}", flush=True)
""")


_CACHE_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_platforms", "cpu")
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from rovit_kan_tpu.parallel.multihost import (
        maybe_initialize_distributed, global_mesh)
    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid)

    import numpy as np
    from jax.experimental import multihost_utils
    from rovit_kan_tpu.data.device_cache import DeviceLoader

    class IdDS:
        def __init__(self, n):
            self.n = n
            self.reads = 0

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.reads += 1
            return np.full((8, 8, 3), i, np.uint8), int(i % 4), float(i % 4)

    mesh = global_mesh()                     # 8 devices over 2 processes
    ds = IdDS(32)
    loader = DeviceLoader(ds, 16, mesh=mesh, shard_data=True)
    # Each host decodes ONLY its 4 shards (16 samples) + the shape probe.
    assert ds.reads <= 32 // 2 + 1, ds.reads
    shard_rows = {s.data.shape[0]
                  for s in loader._images.addressable_shards}
    assert shard_rows == {4}, shard_rows     # 32/8 rows per device

    _, valid_plan = loader._sharded_eval_plan()
    seen = []
    for st, batch in enumerate(loader):
        labs = multihost_utils.process_allgather(batch["labels"],
                                                 tiled=True)
        ims = multihost_utils.process_allgather(batch["images"],
                                                tiled=True)
        valid = valid_plan[st].reshape(-1)
        for j in range(labs.shape[0]):
            if valid[j]:
                gid = int(ims[j, 0, 0, 0])
                assert labs[j] == gid % 4, (labs[j], gid)
                seen.append(gid)
    assert sorted(seen) == list(range(32)), sorted(seen)
    print(f"MH_CACHE_OK {pid} reads={ds.reads}", flush=True)
""")


def test_two_process_sharded_device_cache():
    """2 real processes x 4 CPU devices: the sharded device cache decodes
    only each host's own shards, assembles one global P('data') array,
    and shard-local gathers serve every sample exactly once."""
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        worker = Path(td) / "cache_worker.py"
        worker.write_text(_CACHE_WORKER)
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen(
            [sys.executable, str(worker), str(pid), port, str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for pid in range(2)]
        outs = [p.communicate(timeout=500)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
        assert all(f"MH_CACHE_OK {pid}" in out
                   for pid, out in enumerate(outs)), outs


_CKPT_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_platforms", "cpu")
    pid, port, repo, shared = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                               sys.argv[4])
    sys.path.insert(0, repo)
    from rovit_kan_tpu.parallel.multihost import maybe_initialize_distributed
    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid)

    from pathlib import Path
    import numpy as np
    from rovit_kan_tpu.utils.checkpoint import (
        load_checkpoint, promote_staging, save_checkpoint,
        wait_for_checkpoints)

    ck = Path(shared) / "ck"
    params1 = {"w": np.full((8, 8), 1.0, np.float32)}
    params2 = {"w": np.full((8, 8), 2.0, np.float32)}
    # Back-to-back async saves to the same path: exercises the proc-0
    # gated stage cleanup + the stage-clean/complete-pending barriers.
    save_checkpoint(ck, params1, epoch=1, block=False)
    save_checkpoint(ck, params2, epoch=2, block=False)
    wait_for_checkpoints()
    # promote on BOTH processes (the train.py --resume pattern): proc 0
    # owns the filesystem, the barrier keeps proc 1 from racing it.
    assert promote_staging(ck)
    out = load_checkpoint(ck)
    assert out["epoch"] == 2, out["epoch"]
    np.testing.assert_array_equal(out["params"]["w"], params2["w"])
    print(f"MH_CKPT_OK {pid}", flush=True)
""")


def test_two_process_checkpoint_protocol(tmp_path):
    """2 real processes sharing one checkpoint dir (the shared-storage
    multi-host layout): async saves, the commit->final swap, promote and
    load must all complete with process 0 owning the filesystem and the
    sync barriers keeping process 1 off its back — no crash, no torn
    state, both processes read the newest checkpoint."""
    worker = tmp_path / "ckpt_worker.py"
    worker.write_text(_CKPT_WORKER)
    shared = tmp_path / "shared"
    shared.mkdir()
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port, str(REPO),
         str(shared)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert all(f"MH_CKPT_OK {pid}" in out
               for pid, out in enumerate(outs)), outs
    # The staging dir must be gone (swapped into the final name).
    assert not (shared / "ck.next").exists()
    assert (shared / "ck.meta.json").exists()


def test_two_process_training_step(tmp_path):
    """Spawn 2 real processes, 4 CPU devices each; both must see an
    8-device global mesh, feed only local batch rows, and compute the
    identical training loss (gradient psum crosses the process boundary)."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port, str(REPO)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    losses = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        for line in out.splitlines():
            if line.startswith("MH_LOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    assert np.isfinite(losses[0])
