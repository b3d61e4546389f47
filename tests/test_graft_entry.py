"""Driver-interface guard: entry() compiles and dryrun_multichip runs on
the virtual CPU mesh (the same hooks the round driver invokes)."""
import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out[0]).shape[0] == 256


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
