"""True multi-process jax.distributed test: two controller processes, four
virtual CPU devices each, gloo collectives between them — the CPU stand-in
for a 2-host TPU pod (SURVEY.md §5.8: the reference has no distributed
execution at all; this path is this framework's replacement). The sharded
distance block computed across process boundaries must equal the
single-process result, and every host must see the full gathered output."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    out_npz = sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, {repo!r})
    from poppunk_tpu.parallel.distributed import (init_distributed,
                                                  is_primary, pod_mesh)
    ok = init_distributed(coordinator_address="localhost:" + port,
                          num_processes=nproc, process_id=proc_id)
    assert ok, "init_distributed returned False"
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    mesh = pod_mesh()
    # one query shard per host, r axis inside each process's devices
    assert dict(mesh.shape) == {{"q": nproc, "r": 4}}
    assert is_primary() == (proc_id == 0)

    import numpy as np
    from poppunk_tpu.parallel.dists import sharded_pairwise_block
    KLIST = (15, 18, 21); SS64 = 16; BBITS = 4
    from poppunk_tpu.ops.distances import plane_geometry
    _, wp, _ = plane_geometry(SS64, BBITS)
    def synth(n, seed):
        rng = np.random.default_rng(seed)
        w32 = 2 * SS64
        p = np.zeros((n, len(KLIST), BBITS, wp), dtype=np.uint32)
        p[..., :w32] = rng.integers(0, 2**32, (n, len(KLIST), BBITS, w32),
                                    dtype=np.uint32)
        return (p, rng.integers(1_000_000, 2_000_000, n).astype(np.int32),
                rng.dirichlet(np.ones(4), n).astype(np.float32))
    pq, lq, fq = synth(10, 1)
    pr, lr, fr = synth(23, 2)
    got = sharded_pairwise_block(mesh, pq, pr, lq, lr, fq, fr, KLIST,
                                 SS64, BBITS, use_pallas=False)
    if proc_id == 0:
        np.savez(out_npz, got=got)
    print("WORKER_DONE", proc_id)
""").format(repo=REPO)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_dists(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    out_npz = str(tmp_path / "result.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), str(i), "2", str(port), out_npz],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
        assert "WORKER_DONE" in out

    # cross-process result equals the in-process single-mesh result
    from poppunk_tpu.ops.distances import pairwise_block, plane_geometry

    KLIST = (15, 18, 21)
    SS64, BBITS = 16, 4
    _, wp, _ = plane_geometry(SS64, BBITS)

    def synth(n, seed):
        rng = np.random.default_rng(seed)
        w32 = 2 * SS64
        p = np.zeros((n, len(KLIST), BBITS, wp), dtype=np.uint32)
        p[..., :w32] = rng.integers(0, 2**32, (n, len(KLIST), BBITS, w32),
                                    dtype=np.uint32)
        return (p, rng.integers(1_000_000, 2_000_000, n).astype(np.int32),
                rng.dirichlet(np.ones(4), n).astype(np.float32))

    pq, lq, fq = synth(10, 1)
    pr, lr, fr = synth(23, 2)
    want = np.asarray(pairwise_block(pq, pr, lq, lr, fq, fr, KLIST, SS64,
                                     BBITS, use_pallas=False,
                                     use_mesh=False))
    got = np.load(out_npz)["got"]
    assert got.shape == want.shape == (10, 23, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)
