"""Keep the driver's multi-chip gate green: run the dry run in-process.

`tests/conftest.py` already provides the 8-device virtual CPU backend, so
this exercises `_dryrun_impl` directly (the subprocess bootstrap path in
`dryrun_multichip` is only for environments that see fewer devices).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_full_epoch_cycle():
    import __graft_entry__ as g

    g._dryrun_impl(8)
