"""Driver-contract test: ``__graft_entry__.dryrun_multichip`` must pass
in the *driver's* environment — a process whose default JAX platform may
be an attached TPU — not only under the test suite's conftest pinning.

Round-1 regression: the dryrun initialized the default (TPU) backend
before falling back to CPU devices, so default-placed ops dispatched to
the tunneled TPU and the driver run died on a libtpu version mismatch
(MULTICHIP_r01.json rc=1).  The fix runs the dryrun body in a fresh
``JAX_PLATFORMS=cpu`` subprocess; this test launches that path from a
clean python that does NOT inherit conftest's env pinning.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_hermetic_in_driver_env():
    env = dict(os.environ)
    # Simulate the driver: do not pre-pin a CPU platform.  Whatever
    # default platform the session has (axon TPU when attached) is what
    # dryrun_multichip must survive.
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True,
        timeout=1200)
    assert proc.returncode == 0, (
        "dryrun failed in driver env:\nstdout:\n{}\nstderr:\n{}".format(
            proc.stdout, proc.stderr))
    assert "dryrun_multichip(8) OK" in proc.stdout
