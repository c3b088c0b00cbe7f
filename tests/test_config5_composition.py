"""Config-5 composition rehearsal (VERDICT r4 item 3).

Each flagship ingredient — global negatives, GradCache embedding_chunk,
scanned steps_per_call dispatch, int8 feature stores, LAMB — has its own
unit/dryrun coverage, but until r5 the exact composition shipped in
``configs/podslice_32k.json`` never EXECUTED as a whole.  This test runs
the same rehearsal the driver dryrun runs (``__graft_entry__.
config5_composition_rehearsal``): the real train CLI in subprocesses on
an 8-virtual-device mesh with every config-5 knob active simultaneously,
pinning composed-loss finiteness, resume equality (8+8 steps == 16), and
the eval CLI loading the composed checkpoint.

Not in the quick tier: four CLI subprocesses (~1 min each on the CPU
mesh) — the composition is guarded per-round by the driver dryrun; this
test keeps it runnable inside the suite.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_config5_composition_rehearsal():
    import __graft_entry__ as graft

    graft.config5_composition_rehearsal(8)
