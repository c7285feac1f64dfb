"""Root pytest conftest: run the test suite on pure CPU.

The environment registers a TPU PJRT client in *every* Python interpreter
at startup (sitecustomize), which claims the single TPU chip and can block
for minutes under contention.  Tests are CPU-only by design (8 virtual
devices; see tests/conftest.py), so if the TPU hook is active we re-exec
the test process once with the hook disabled.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "TOPOPT_TESTS_ALLOW_TPU"
):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:]
    )
