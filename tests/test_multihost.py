"""Multi-process (DCN) extraction path, tested with real jax.distributed.

Two CPU processes rendezvous via jax.distributed.initialize and run
extract_features_sharded's multi-host branch (per-process contiguous slices
+ process_allgather positional reassembly — the single-controller analog of
the reference's DistributedSliceSampler + broadcast gather,
/root/reference/ibl/evaluators.py:88-101). Round 1 shipped this branch
untested (VERDICT item 8)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys, os
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, %r)
    from openibl_tpu.parallel.extract import extract_features_sharded

    class Src:
        def __len__(self):
            return 10
        def load(self, i):
            return np.random.RandomState(i).randn(8, 8, 3).astype(np.float32)

    params = jnp.asarray(
        np.random.RandomState(99).randn(192, 16).astype(np.float32)
    )
    def apply_fn(p, images):
        return images.reshape(images.shape[0], -1) @ p

    got = extract_features_sharded(apply_fn, params, Src(), batch_size=3)

    flats = np.stack([Src().load(i).ravel() for i in range(10)])
    want = flats @ np.asarray(params)
    want /= np.linalg.norm(want, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    print(f"proc {pid}: multihost extraction OK {got.shape}", flush=True)
""" % REPO)


def _free_port():
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_extract_features_sharded_two_processes():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("SLURM_", "JAX_COORDINATOR"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, port, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "multihost extraction OK (10, 16)" in out


def test_maybe_init_distributed_fails_loudly():
    """A half-configured multi-process env must raise, not silently degrade
    (the reference fails loudly too, dist_utils.py:19)."""
    code = textwrap.dedent("""
        import os, sys
        os.environ.pop("XLA_FLAGS", None)
        os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:1"  # nothing there
        os.environ["JAX_NUM_PROCESSES"] = "2"
        os.environ["JAX_PROCESS_ID"] = "0"
        os.environ["JAX_DISTRIBUTED_INITIALIZATION_TIMEOUT_SECONDS"] = "5"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %r)
        from openibl_tpu.parallel.mesh import maybe_init_distributed
        try:
            maybe_init_distributed()
        except RuntimeError as e:
            assert "refusing to degrade" in str(e), e
            print("raised as expected", flush=True)
            sys.exit(0)
        print("did NOT raise", flush=True)
        sys.exit(1)
    """ % REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "raised as expected" in proc.stdout


def test_maybe_init_distributed_noop_without_env():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("SLURM_", "JAX_COORDINATOR", "COORDINATOR"))}
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        import jax
        jax.config.update("jax_platforms", "cpu")
        from openibl_tpu.parallel.mesh import maybe_init_distributed
        maybe_init_distributed()
        assert jax.process_count() == 1
        print("noop ok")
    """ % REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
