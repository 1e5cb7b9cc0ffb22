"""Driver-contract tests for __graft_entry__.py.

The driver imports the module and calls dryrun_multichip(N) directly — it
does NOT set XLA_FLAGS or JAX_PLATFORMS first, and may have initialized JAX
on whatever single real device exists before calling. Round-1 failed exactly
this contract (MULTICHIP_r01.json: "need 8 devices, have 1"), so these tests
invoke the function the driver's way, in subprocesses with the ambient
mesh-provisioning env stripped.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Env as the driver would have it: no virtual-device XLA flags.

    JAX_PLATFORMS stays cpu (inherited from conftest) so the test never
    touches the real TPU tunnel; __graft_entry__ must not rely on it.
    """
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def _run(code, timeout=600):
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Exactly the driver's call: import, then dryrun_multichip(8)."""
    proc = _run(
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "baseline DP step ok" in proc.stdout
    assert "SFRS DP step ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_jax_preinitialized():
    """Driver variant where JAX backends were already initialized (1 CPU
    device) before dryrun_multichip — the function must clear + re-provision."""
    proc = _run(
        # force CPU via jax.config, not the env var: the axon TPU plugin
        # ignores JAX_PLATFORMS, and touching the real backend here would
        # hang the test whenever the tunnel is degraded (CLAUDE.md gotchas)
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "assert len(jax.devices()) == 8\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SFRS DP step ok" in proc.stdout


def test_provision_noop_under_existing_cpu_mesh():
    """In-process: conftest already provisioned 8 CPU devices; provisioning
    must be a no-op (no clear_backends — live arrays would dangle)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones(3)  # a live buffer that must survive
    import __graft_entry__

    __graft_entry__._provision_virtual_cpu_mesh(8)
    assert len(jax.devices()) >= 8
    assert float(x.sum()) == 3.0
