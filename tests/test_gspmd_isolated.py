"""Drive the collective-heavy GSPMD test modules in fresh interpreters.

test_auto.py and test_dist.py exercise 8-virtual-device collectives, and
XLA:CPU's in-process rendezvous intermittently aborts or deadlocks the whole
pytest process on small/contended hosts (full analysis in conftest.py's
_COLLECTIVE_TIMEOUT_FLAGS note). Each module runs here in its own interpreter
with one bounded retry; in-process, those modules skip themselves unless
EMLIGHT_GSPMD_CHILD=1 (the env these wrappers set). Coverage is identical —
a child failure surfaces here with the child's output attached.
"""

import os

from conftest import run_module_isolated

_HERE = os.path.dirname(os.path.abspath(__file__))


def test_gspmd_modules_isolated():
    # One child for both modules: they compile the same single-device
    # reference steps (regression + GAN at tiny shapes), and the child keeps
    # its jit cache across modules (conftest skips cache-clearing under
    # EMLIGHT_GSPMD_CHILD), so those compiles happen once instead of twice.
    run_module_isolated(
        [os.path.join(_HERE, "test_dist.py"), os.path.join(_HERE, "test_auto.py")]
    )
