"""Driver-contract checks: dryrun_multichip on the 8-CPU mesh and a tiny
version of entry()'s compile path."""

import sys

import pytest


sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)
