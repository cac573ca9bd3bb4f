"""Driver-contract tests for __graft_entry__.

The round-1 driver recorded MULTICHIP_r01.json rc=1 because
dryrun_multichip asserted on device count instead of provisioning a
virtual mesh. These tests pin the fixed contract: it must succeed both
when enough devices exist (inline) and when they don't (subprocess
re-exec onto a fake CPU mesh, SURVEY.md §4 "Multi-chip without a pod").
"""

import pytest

import __graft_entry__ as graft

pytestmark = pytest.mark.slow  # full 7-leg dryrun, ~2.5 min


def test_dryrun_multichip_inline_8_devices():
    # conftest provisions 8 virtual CPU devices -> inline path.
    graft.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_via_reexec():
    # Ask for more devices than this process has: must re-exec a child
    # with a larger virtual mesh and propagate success, not assert.
    graft.dryrun_multichip(16)
