"""Driver entry points (__graft_entry__.py) must keep compiling.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip`` on virtual devices at the end of every round; a
field added to an operator dataclass silently broke ``entry()`` once —
keep both under the suite.  (``dryrun_multichip`` itself runs ~5 sharded
legs and is exercised separately by the driver; here the cheap contract
is that ``entry()`` returns a jittable fn + args that solve the system.)
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_entry_compiles_and_solves():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    x = np.asarray(out)
    assert np.isfinite(x).all()
    # Maximum principle for the generated box (nodeset ids 100 / 1000).
    assert 100.0 <= float(np.abs(x).max()) <= 1000.0 + 1e-3
