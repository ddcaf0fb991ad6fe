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


def test_auto_module_isolated():
    run_module_isolated(os.path.join(_HERE, "test_auto.py"))


def test_dist_module_isolated():
    run_module_isolated(os.path.join(_HERE, "test_dist.py"))
