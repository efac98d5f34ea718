"""Driver-contract tests for __graft_entry__.

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on an n-device virtual CPU mesh; these slow tests
bind both hooks into CI so a refactor can't silently break the contract
(conftest provides the 8 virtual devices)."""

import jax
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    flat = jax.tree_util.tree_leaves(out)
    assert flat and all(x.size for x in flat)


@pytest.mark.slow
def test_dryrun_multichip_8_devices(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    printed = capsys.readouterr().out
    for stage in ("fg ok", "bg ok", "odom ok", "pc ok", "fused ok"):
        assert stage in printed, printed
