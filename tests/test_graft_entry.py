import sys

import jax


sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, counters = out
    assert int(counters.extension) > 0


def test_dryrun_multichip():
    import __graft_entry__ as ge
    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    ge.dryrun_multichip(n)
