"""The driver's multi-chip dryrun must be unconditionally TPU-independent.

Round-2 regression (VERDICT.md weak #2): ``dryrun_multichip`` initialized the
TPU backend in-process and an unsharded ``device_put`` died on a libtpu
version mismatch. The fix runs the body in a ``JAX_PLATFORMS=cpu``
subprocess; these tests call it with the parent environment poisoned so any
in-child TPU backend touch fails loudly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_dryrun_multichip_with_poisoned_tpu_env(monkeypatch):
    # Simulate a broken TPU plugin/tunnel: if the child process resolved
    # platforms from the parent env it would try (and fail) to init a TPU
    # backend at a bogus address. The subprocess must override to cpu.
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1:1")
    monkeypatch.setenv("TPU_SKIP_MDS_QUERY", "1")
    graft.dryrun_multichip(2)
