"""Root conftest: escape the axon PJRT plugin before pytest starts capturing.

This box injects an 'axon' PJRT plugin (remote-TPU tunnel) into every python
process via PYTHONPATH sitecustomize, and that sitecustomize imports jax
itself. With the plugin registered, even JAX_PLATFORMS=cpu programs
intermittently hang forever on result readback (futex wait, ~0 CPU). Tests
must run on the local CPU backend, so re-exec once with a cleaned PYTHONPATH.

This lives in the ROOT conftest because pytest imports it during startup,
before output capture redirects fd 1 — an exec from tests/conftest.py would
lose all output into the capture temp file.
"""

import os
import sys

_AXON_MARKER = ".axon_site"
# RRTMGP_TPU_TESTS=1 keeps the axon plugin loaded: the tests_tpu/ suite runs
# ON the real TPU (in-kernel McICA, megakernel-vs-XLA equivalence, f64
# dispatch) and is skipped on any other backend.
if (
    _AXON_MARKER in os.environ.get("PYTHONPATH", "")
    and os.environ.get("_RRTMGP_TPU_REEXEC") != "1"
    and os.environ.get("RRTMGP_TPU_TESTS") != "1"
):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if _AXON_MARKER not in p
    )
    env["_RRTMGP_TPU_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"  # the axon platform is gone once PYTHONPATH is cleaned
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
