"""Driver-contract checks: dryrun_multichip on the 8-CPU mesh and a tiny
version of entry()'s compile path."""

import sys


sys.path.insert(0, "/root/repo")


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)
