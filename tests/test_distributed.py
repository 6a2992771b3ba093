"""Multi-host (multi-process) plumbing: a REAL 2-process CPU run.

SURVEY.md section 2c names "pjit over DCN for multi-host" as the
batched-throughput design target; parallel/distributed.py is that code.
This test launches two actual OS processes, joins them with
`jax.distributed.initialize` over a localhost coordinator, builds the
process-spanning dp mesh, feeds per-process local data, and runs a
dp-sharded computation whose psum proves a cross-process collective
executed (the standard JAX multi-process CPU test pattern — no TPU pod
required to validate the mesh/collective path)."""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, {repo!r})
from image_stitching_tpu.parallel.distributed import (
    init_distributed, make_global_mesh, shard_local_batch)

pid = int(sys.argv[1])
assert init_distributed(coordinator_address={addr!r}, num_processes=2,
                        process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 procs x 2 cpu devices

mesh = make_global_mesh(("dp", "sp"), sp=1)
assert dict(mesh.shape) == {{"dp": 4, "sp": 1}}, mesh.shape

# Per-process local batch: process p owns rows [2p, 2p+1] of the global 4.
local = np.arange(2, dtype=np.float32)[:, None] + 2.0 * pid + \
    np.zeros((2, 8), np.float32)
glob = shard_local_batch(mesh, local)
assert glob.shape == (4, 8), glob.shape

from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

@jax.jit
def step(x):
    def local_fn(xs):
        # A per-shard transform plus a cross-process psum over dp (DCN).
        s = jax.lax.psum(xs.sum(), axis_name="dp")
        return xs * 2.0 + s
    return shard_map(local_fn, mesh=mesh, in_specs=P("dp"),
                     out_specs=P("dp"))(x)

out = step(glob)
# Global rows are 0,1,2,3 broadcast over 8 cols; sum = 6*8 = 48.
local_out = np.asarray(
    [s.data for s in out.addressable_shards]).reshape(2, 8)
expect = local * 2.0 + 48.0
np.testing.assert_allclose(local_out, expect)
print(f"proc{{pid}} OK", flush=True)
"""


_WORKER_PIPELINE = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, {repo!r})
from image_stitching_tpu.parallel.distributed import (
    init_distributed, make_global_mesh, shard_local_batch,
    batched_register_distributed)

pid = int(sys.argv[1])
assert init_distributed(coordinator_address={addr!r}, num_processes=2,
                        process_id=pid)
mesh = make_global_mesh(("dp", "sp"), sp=1)

# Deterministic global batch (seed-shared with the parent's single-process
# reference run); process p feeds ONLY its local rows [2p, 2p+1].
rng = np.random.default_rng(42)
base = rng.uniform(0, 255, (4, 96, 128)).astype(np.float32)
pairs_global = np.stack([base, np.roll(base, (7, 5), (1, 2))], axis=1)
local = pairs_global[2 * pid: 2 * pid + 2]
pairs = shard_local_batch(mesh, local)
keys_global = np.asarray(jax.random.split(jax.random.PRNGKey(0), 4))
keys = shard_local_batch(mesh, keys_global[2 * pid: 2 * pid + 2])

# REAL pipeline compute across processes: ORB detect + Hamming match +
# RANSAC on dp-sharded pairs (each process executes only its own pairs).
fn = batched_register_distributed(mesh, (96, 128), n_features=256,
                                  n_hyp=128)
h, conf, ninl = fn(pairs, keys)
loc = [np.asarray(s.data) for s in h.addressable_shards]
h_loc = np.concatenate(loc, axis=0)
conf_loc = np.concatenate(
    [np.asarray(s.data) for s in conf.addressable_shards], axis=0)
ninl_loc = np.concatenate(
    [np.asarray(s.data) for s in ninl.addressable_shards], axis=0)
np.savez(os.path.join({out!r}, f"shard{{pid}}.npz"),
         h=h_loc, conf=conf_loc, ninl=ninl_loc)
print(f"proc{{pid}} PIPELINE OK", flush=True)
"""


def test_two_process_cpu_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _WORKER.format(repo=repo, addr=f"127.0.0.1:{port}")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep the axon TPU plugin out of workers
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env,
                              cwd=str(tmp_path))
             for pid in range(2)]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode(errors="replace"))
        assert p.returncode == 0, f"proc{pid} failed:\n{outs[-1]}"
    assert "proc0 OK" in outs[0] and "proc1 OK" in outs[1]


def test_two_process_pipeline_compute_matches_single(tmp_path):
    """The ACTUAL pipeline compute (ORB detect + match + RANSAC via
    batched_register_distributed) executes across a REAL 2-process
    cluster, each process feeding only its local pairs, and the gathered
    (H, conf, n_inliers) are identical to a single-process run of the
    same global batch — SURVEY 2c's 'pjit over DCN' proven on the
    workload, not just the mesh."""
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _WORKER_PIPELINE.format(repo=repo, addr=f"127.0.0.1:{port}",
                                     out=str(tmp_path))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep the axon TPU plugin out of workers
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env,
                              cwd=str(tmp_path))
             for pid in range(2)]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=280)
        assert p.returncode == 0, \
            f"proc{pid} failed:\n{out.decode(errors='replace')}"

    # Single-process reference on the SAME global batch (this process's
    # conftest-configured CPU devices).
    import jax
    from image_stitching_tpu.parallel import make_batched_register, \
        make_mesh
    rng = np.random.default_rng(42)
    base = rng.uniform(0, 255, (4, 96, 128)).astype(np.float32)
    pairs_global = np.stack([base, np.roll(base, (7, 5), (1, 2))], axis=1)
    keys_global = jax.random.split(jax.random.PRNGKey(0), 4)
    # 4-wide dp mesh (the global batch is 4; conftest exposes 8 devices).
    mesh1 = make_mesh((4, 1), ("dp", "sp"))
    ref_fn = make_batched_register(mesh1, (96, 128), n_features=256,
                                   n_hyp=128)
    h_ref, conf_ref, ninl_ref = ref_fn(pairs_global, keys_global)

    # Process p owns global rows [2p, 2p+1] (shard_local_batch layout).
    for pid in range(2):
        shard = np.load(tmp_path / f"shard{pid}.npz")
        sl = slice(2 * pid, 2 * pid + 2)
        np.testing.assert_allclose(shard["h"], np.asarray(h_ref)[sl],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(shard["conf"],
                                   np.asarray(conf_ref)[sl], rtol=1e-5)
        assert np.array_equal(shard["ninl"], np.asarray(ninl_ref)[sl])
    # The rolled pairs must actually register (real inliers flowed over
    # the distributed path, not degenerate zeros).
    assert int(np.asarray(ninl_ref).min()) > 20
