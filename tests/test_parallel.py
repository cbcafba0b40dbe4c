"""Multi-device batched verification over the virtual CPU mesh.

Compile-heavy: gated behind SVT_SLOW (the graft dryrun exercises the same
path; with a warm .jax_cache this runs quickly)."""
import os

import numpy as np
import pytest


def test_dryrun_multichip_8():
    if not os.environ.get("SVT_SLOW"):
        pytest.skip("slow (full verifier compile); set SVT_SLOW=1")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
